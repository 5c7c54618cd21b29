package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Audio/video container metadata from binary headers — `AvMeta(content)`
  * returns `struct&lt;format string, channels int, sample_rate int, bits int,
  * duration_ms bigint&gt;` or NULL when the bytes are not a recognized
  * container. The audio/video sibling of [[ImageDims]]: the multimodal
  * curation filters that matter (length gates, sample-rate routing,
  * mono/stereo splits) need only fixed documented header fields, not a
  * codec — so they run at scan speed inside whole-stage codegen with zero
  * external deps, while sample/frame decode stays behind
  * [[graft.llmops.Multimodal]]'s documented stub.
  *
  * Parsed containers:
  *   - WAV (RIFF/WAVE): `fmt ` chunk → channels/rate/bits, `data` chunk
  *     size → duration via block alignment;
  *   - MP4/MOV (ISO BMFF): top-level box walk to `moov`/`mvhd` (v0 and
  *     v1) → timescale + duration; channels/rate/bits are NULL (they live
  *     per-track and gate nothing at curation time).
  */
case class AvMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = AvMeta.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_av_meta"

  override protected def nullSafeEval(input: Any): Any =
    AvMeta.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.expressions.AvMeta.compute($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): AvMeta =
    copy(child = newChild)
}

object AvMeta {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("bits", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFF).toLong) | ((b(i + 1) & 0xFF).toLong << 8) |
      ((b(i + 2) & 0xFF).toLong << 16) | ((b(i + 3) & 0xFF).toLong << 24)
  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFF).toLong << 24) | ((b(i + 1) & 0xFF).toLong << 16) |
      ((b(i + 2) & 0xFF).toLong << 8) | (b(i + 3) & 0xFF).toLong
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    b.length >= i + 4 && b(i) == t.charAt(0).toByte && b(i + 1) == t.charAt(1).toByte &&
      b(i + 2) == t.charAt(2).toByte && b(i + 3) == t.charAt(3).toByte

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 12) return null
    if (tag(b, 0, "RIFF") && tag(b, 8, "WAVE")) wav(b)
    else if (tag(b, 4, "ftyp")) mp4(b)
    else null
  }

  private def row(fmt: String, ch: Any, rate: Any, bits: Any, ms: Any): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(fmt), ch, rate, bits, ms))

  /** RIFF chunk walk: needs a complete `fmt ` chunk; `data` is optional
    * (streaming-truncated files report NULL duration instead of failing).
    */
  private def wav(b: Array[Byte]): InternalRow = {
    var i = 12
    var channels = -1; var rate = -1; var bits = -1; var blockAlign = -1
    var dataSize = -1L
    var walking = true
    while (walking && i + 8 <= b.length) {
      val size = le32(b, i + 4)
      val body = i + 8
      if (tag(b, i, "fmt ") && body + 16 <= b.length) {
        channels = le16(b, body + 2)
        rate = le32(b, body + 4).toInt
        blockAlign = le16(b, body + 12)
        bits = le16(b, body + 14)
      } else if (tag(b, i, "data")) {
        dataSize = size
      }
      // word-aligned advance in Long space: a corrupt 32-bit size must not
      // wrap the index negative or stall the walk
      val next = body.toLong + size + (size & 1L)
      if (next <= i || next > b.length) walking = false else i = next.toInt
    }
    if (channels < 0 || rate <= 0) return null
    val ms: Any =
      if (dataSize < 0 || blockAlign <= 0) null
      else java.lang.Long.valueOf(dataSize / blockAlign * 1000L / rate)
    row("wav", channels, rate, bits, ms)
  }

  /** ISO BMFF top-level box walk to moov/mvhd; v0 (32-bit) and v1
    * (64-bit) movie headers.
    */
  private def mp4(b: Array[Byte]): InternalRow = {
    var i = 0
    while (i + 8 <= b.length) {
      val size = be32(b, i)
      if (size < 8 || i + size > b.length) return row("mp4", null, null, null, null)
      if (tag(b, i + 4, "moov")) {
        val end = math.min(b.length.toLong, i + size).toInt
        var j = i + 8
        while (j + 8 <= end) {
          val s2 = be32(b, j)
          if (s2 < 8 || j + s2 > end) return row("mp4", null, null, null, null)
          if (tag(b, j + 4, "mvhd") && j + 12 <= end) {
            val version = b(j + 8) & 0xFF
            val ms: Any =
              if (version == 1 && j + 8 + 4 + 16 + 8 + 8 <= end) {
                val timescale = be32(b, j + 8 + 4 + 16)
                val duration = be64(b, j + 8 + 4 + 16 + 4)
                if (timescale > 0) java.lang.Long.valueOf(duration * 1000L / timescale) else null
              } else if (version == 0 && j + 8 + 4 + 8 + 4 + 4 <= end) {
                val timescale = be32(b, j + 8 + 4 + 8)
                val duration = be32(b, j + 8 + 4 + 8 + 4)
                if (timescale > 0) java.lang.Long.valueOf(duration * 1000L / timescale) else null
              } else null
            return row("mp4", null, null, null, ms)
          }
          j += s2.toInt
        }
        return row("mp4", null, null, null, null)
      }
      i += size.toInt
    }
    row("mp4", null, null, null, null)
  }
}
