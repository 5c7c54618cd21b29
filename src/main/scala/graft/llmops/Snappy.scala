package graft.llmops

/** Snappy decoder — raw block format and the framing format (`.sz`).
  * Snappy is the Hadoop/Spark ecosystem's default light codec (parquet
  * pages, sequence files, shard side files), so corpus tooling meets it
  * constantly. Reference hook: arbitrary-binary document ingestion,
  * `aje_libs/documents/helpers/document_processor.py:10-83`.
  *
  * Raw block format: varint uncompressed length, then literal /
  * copy-1-byte / copy-2-byte / copy-4-byte elements (overlapping copies
  * legal). Framing format: stream-identifier chunk, compressed and
  * uncompressed data chunks with MASKED CRC32C of the uncompressed
  * bytes VERIFIED (JDK `CRC32C`), padding and skippable chunks stepped
  * over, reserved-unskippable refused. Refusals (`null`): bad varint,
  * offset 0 or beyond the window, over/under-run, length mismatch,
  * CRC mismatch, output beyond the 64 MB cap.
  */
object Snappy {

  private final val MaxOut = 64 << 20

  /** Masked CRC32C per the framing spec. */
  private[llmops] def maskedCrc(b: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32C
    c.update(b, off, len)
    val crc = c.getValue.toInt
    ((crc >>> 15) | (crc << 17)) + 0xa282ead8
  }

  /** Decode a RAW snappy block `[off, end)`; null on any corruption.
    * All length guards are subtraction-form (`len > end - i`) so a
    * crafted 4-byte literal length near Int.MaxValue cannot wrap the
    * addition negative and slip past the bounds check; a NonFatal
    * backstop keeps the never-throw contract even if one is missed.
    */
  def decodeRaw(b: Array[Byte], off: Int, end: Int): Array[Byte] =
    try decodeRaw0(b, off, end)
    catch { case scala.util.control.NonFatal(_) => null }

  private def decodeRaw0(b: Array[Byte], off: Int, end: Int): Array[Byte] = {
    if (b == null || off >= end) return null
    // varint uncompressed length
    var i = off
    var expected = 0L
    var shift = 0
    var cont = true
    while (cont) {
      if (i >= end || shift > 35) return null
      val x = b(i) & 0xff
      expected |= (x & 0x7fL) << shift
      shift += 7
      i += 1
      cont = (x & 0x80) != 0
    }
    if (expected > MaxOut) return null
    val n = expected.toInt
    val out = new Array[Byte](n)
    var o = 0
    while (i < end) {
      val tag = b(i) & 0xff
      i += 1
      (tag & 3) match {
        case 0 => // literal
          var len = (tag >>> 2) + 1
          if (len > 60) {
            val extra = len - 60
            if (extra > end - i) return null
            var v = 0L
            var k = 0
            while (k < extra) { v |= (b(i + k) & 0xffL) << (8 * k); k += 1 }
            v += 1
            i += extra
            if (v <= 0 || v > MaxOut) return null
            len = v.toInt
          }
          if (len > end - i || len > n - o) return null
          System.arraycopy(b, i, out, o, len)
          i += len
          o += len
        case c =>
          var len = 0
          var offset = 0
          if (c == 1) {
            if (i >= end) return null
            len = ((tag >>> 2) & 7) + 4
            offset = ((tag >>> 5) << 8) | (b(i) & 0xff)
            i += 1
          } else if (c == 2) {
            if (i + 2 > end) return null
            len = (tag >>> 2) + 1
            offset = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
            i += 2
          } else {
            if (i + 4 > end) return null
            len = (tag >>> 2) + 1
            val v = (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
              ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
            if (v > Int.MaxValue) return null
            offset = v.toInt
            i += 4
          }
          if (offset <= 0 || offset > o || len > n - o) return null
          var k = 0
          val from = o - offset
          while (k < len) { out(o + k) = out(from + k); k += 1 }
          o += len
      }
    }
    if (o != n) return null
    out
  }

  private val StreamId = "sNaPpY".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** True when the bytes open with the framing stream identifier. */
  def isFramed(b: Array[Byte]): Boolean =
    b != null && b.length >= 10 && (b(0) & 0xff) == 0xff && b(1) == 6 &&
      b(2) == 0 && b(3) == 0 && StreamId.indices.forall(i => b(4 + i) == StreamId(i))

  /** Decode a framed snappy stream; null on any failure. */
  def decodeFramed(b: Array[Byte]): Array[Byte] = {
    if (!isFramed(b)) return null
    val out = new java.io.ByteArrayOutputStream(math.min(b.length * 3, 1 << 20))
    var i = 10
    while (i < b.length) {
      if (i + 4 > b.length) return null
      val tpe = b(i) & 0xff
      val len = (b(i + 1) & 0xff) | ((b(i + 2) & 0xff) << 8) |
        ((b(i + 3) & 0xff) << 16)
      i += 4
      if (i + len > b.length) return null
      tpe match {
        case 0x00 => // compressed: masked crc + raw block
          if (len < 4) return null
          val crc = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
            ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
          val dec = decodeRaw(b, i + 4, i + len)
          if (dec == null) return null
          if (maskedCrc(dec, 0, dec.length) != crc) return null
          if (out.size().toLong + dec.length > MaxOut) return null
          out.write(dec, 0, dec.length)
        case 0x01 => // uncompressed: masked crc + bytes
          if (len < 4) return null
          val crc = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
            ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
          if (maskedCrc(b, i + 4, len - 4) != crc) return null
          if (out.size().toLong + len - 4 > MaxOut) return null
          out.write(b, i + 4, len - 4)
        case 0xff => // repeated stream identifier (concatenated streams)
          if (len != 6) return null
          var k = 0
          while (k < 6) { if (b(i + k) != StreamId(k)) return null; k += 1 }
        case t if t >= 0x80 => () // padding / skippable
        case _ => return null // reserved unskippable
      }
      i += len
    }
    out.toByteArray
  }
}
