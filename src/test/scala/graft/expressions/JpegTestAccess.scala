package graft.expressions

/** Test-only bridge to the package-private [[JpegDecode]] raw decoder so
  * pixel-level specs (e.g. the ImageIO cross-check) can compare actual
  * decoded bytes, not just statistics.
  */
object JpegTestAccess {
  /** (width, height, channels, interleaved pixels) or null. */
  def decode(b: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    val d = JpegDecode.decode(b)
    if (d == null) null else (d.width, d.height, d.channels, d.pix)
  }

  /** Same shape through the FULL progressive decoder. */
  def decodeProgressive(b: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    val d = JpegDecode.decodeProgressive(b)
    if (d == null) null else (d.width, d.height, d.channels, d.pix)
  }
}
