package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType}

/** MJPEG-in-AVI frame extraction — `AviFrames(content)` walks the RIFF
  * container (chunk tree with even-byte padding, `LIST hdrl` /
  * `LIST movi` / optional `rec ` groups / `idx1`) and returns the video
  * frame payloads (`00dc`/`00db` chunks) as `array<binary>`, in stream
  * order. Each element is a complete still image — for MJPEG, a baseline
  * JPEG that [[JpegPixels]]/[[JpegDHash]] decode — so video becomes
  * "explode frames, then the image pipeline", the per-frame shape a
  * frame-dedup / frame-sampling curation pass needs.
  *
  * NULL for anything that is not a RIFF/AVI container with at least one
  * `movi` list and one video chunk; a malformed chunk tree refuses
  * rather than returning a partial frame list. All offset math in Long,
  * frame count capped at 4096 and total payload at 64 MB — the
  * PNG/JPEG allocation-bomb contract.
  *
  * Container parse only: the codec inside each frame chunk stays the
  * frame's own business (JPEG here; the reference pipeline is
  * document-only — engine-addition scope).
  */
case class AviFrames(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_avi_frames"

  override protected def nullSafeEval(input: Any): Any =
    AviFrames.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.expressions.AviFrames.compute($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): AviFrames =
    copy(child = newChild)
}

object AviFrames {

  private val MaxFrames = 4096
  private val MaxBytes = 64L * 1024 * 1024

  private def le32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFFL)) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)

  private def fourcc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(b: Array[Byte]): GenericArrayData = {
    if (b == null || b.length < 12) return null
    if (fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ") return null
    val riffLen = le32(b, 4)
    // the RIFF size covers 'AVI ' + all chunks; the declared span must
    // fit the actual bytes and be big enough to hold its own header
    if (riffLen < 4 || 8L + riffLen > b.length) return null
    val end = (8L + riffLen).toInt
    val frames = new scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    var total = 0L
    var sawMovi = false

    /** Walk the chunks in [from, to); `inMovi` collects video payloads.
      * Returns false on any malformation — a bad tree refuses wholesale.
      */
    def walk(from: Int, to: Int, inMovi: Boolean, depth: Int): Boolean = {
      var i = from
      while (i < to) {
        if (i + 8 > to) return false
        val id = fourcc(b, i)
        val len = le32(b, i + 4)
        val dataAt = i + 8
        if (len < 0 || dataAt.toLong + len > to) return false
        if (id == "LIST") {
          if (len < 4 || depth >= 8) return false
          val listType = fourcc(b, dataAt)
          if (listType == "movi") sawMovi = true
          // recurse into movi (and its rec  groups); skip hdrl/INFO/etc.
          if (listType == "movi" || (inMovi && listType == "rec ")) {
            if (!walk(dataAt + 4, (dataAt + len).toInt, inMovi = true,
                depth + 1)) return false
          }
        } else if (inMovi && id.charAt(0).isDigit && id.charAt(1).isDigit &&
            (id.endsWith("dc") || id.endsWith("db"))) {
          if (frames.length >= MaxFrames) return false
          total += len
          if (total > MaxBytes) return false
          frames += java.util.Arrays.copyOfRange(b, dataAt, (dataAt + len).toInt)
        }
        // chunks are word-aligned: odd sizes carry one pad byte
        i = (dataAt.toLong + len + (len & 1)).toInt
      }
      true
    }
    if (!walk(12, end, inMovi = false, 0)) return null
    if (!sawMovi || frames.isEmpty) return null
    new GenericArrayData(frames.toArray[Any])
  }
}
