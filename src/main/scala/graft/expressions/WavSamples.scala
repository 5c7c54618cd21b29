package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Full 16-bit PCM WAV sample decode — `WavSamples(content)` walks the
  * RIFF chunks (same layout rules as [[AvMeta]], which stops at headers)
  * and reads every interleaved sample, returning
  *
  * `struct<channels int, sample_rate int, n_frames long, samp_sum long,
  * samp_wsum long, peak_abs int>`
  *
  *  - `samp_sum`: sum of every signed sample value (all channels),
  *  - `samp_wsum`: position-weighted checksum
  *    `Σ (i mod 9973 + 1) · v(i)` over the 0-based interleaved sample
  *    index — order-sensitive, the same anti-permutation contract as
  *    [[PngPixels]]' `pix_wsum`,
  *  - `peak_abs`: max |v| (0 when the data chunk is empty).
  *
  * All-integer outputs, so the [[graft.llmops.MediaWriter]] closed-form
  * fixtures verify the decode exactly from (channels, nFrames, seed).
  * NULL for anything but PCM (format 1), 16-bit, with complete `fmt `
  * and `data` chunks — compressed/float/other-depth WAVs are refused
  * rather than half-decoded, mirroring [[PngPixels]]' envelope. Per-row
  * scan projection; the audio equivalent of pixel decode.
  */
case class WavSamples(child: Expression) extends UnaryExpression {

  override def dataType: DataType = WavSamples.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_wav_samples"

  override protected def nullSafeEval(input: Any): Any =
    WavSamples.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.expressions.WavSamples.compute($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): WavSamples =
    copy(child = newChild)
}

/** Located 16-bit PCM payload: `nSamples` little-endian shorts at
  * `dataOff` in `bytes`, interleaved by frame.
  */
private[expressions] final class WavPcm(val channels: Int,
    val sampleRate: Int, val bytes: Array[Byte], val dataOff: Int,
    val nSamples: Int) {
  @inline def sample(i: Int): Int =
    ((bytes(dataOff + 2 * i) & 0xFF) |
      (bytes(dataOff + 2 * i + 1) << 8)).toShort.toInt
}

object WavSamples {

  val schema: StructType = StructType(Seq(
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("samp_sum", LongType, nullable = false),
    StructField("samp_wsum", LongType, nullable = false),
    StructField("peak_abs", IntegerType, nullable = false)))

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (le16(b, i) | (le16(b, i + 2).toLong << 16)) & 0xFFFFFFFFL
  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    i + 4 <= b.length && b(i) == t.charAt(0) && b(i + 1) == t.charAt(1) &&
      b(i + 2) == t.charAt(2) && b(i + 3) == t.charAt(3)

  /** RIFF walk to a complete 16-bit PCM payload; null otherwise. Shared
    * front half of [[compute]] and [[WavEnvelopeHash]].
    */
  private[expressions] def decodePcm16(b: Array[Byte]): WavPcm = {
    if (b == null || b.length < 44) return null
    if (!tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return null
    var i = 12
    var channels = -1; var rate = -1L; var bits = -1; var fmtCode = -1
    var dataOff = -1; var dataSize = -1L
    var walking = true
    while (walking && i + 8 <= b.length) {
      val size = le32(b, i + 4)
      val body = i + 8
      if (tag(b, i, "fmt ") && body + 16 <= b.length) {
        fmtCode = le16(b, body)
        channels = le16(b, body + 2)
        rate = le32(b, body + 4)
        bits = le16(b, body + 14)
      } else if (tag(b, i, "data")) {
        dataOff = body
        dataSize = size
      }
      val next = body.toLong + size + (size & 1L)
      if (next <= i || next > b.length) walking = false else i = next.toInt
    }
    if (fmtCode != 1 || bits != 16 || channels <= 0 || rate <= 0 ||
        rate > Int.MaxValue || dataOff < 0) return null
    if (dataOff + dataSize > b.length) return null // truncated payload
    val nSamples = (dataSize / 2L).toInt
    if (nSamples % channels != 0) return null // ragged final frame
    new WavPcm(channels, rate.toInt, b, dataOff, nSamples)
  }

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(b: Array[Byte]): InternalRow = {
    val d = decodePcm16(b)
    if (d == null) return null
    var sum = 0L
    var wsum = 0L
    var peak = 0
    var i = 0
    while (i < d.nSamples) {
      val v = d.sample(i)
      sum += v
      wsum += (i % 9973 + 1).toLong * v
      val a = if (v < 0) -v else v
      if (a > peak) peak = a
      i += 1
    }
    new GenericInternalRow(Array[Any](d.channels, d.sampleRate,
      (d.nSamples / d.channels).toLong, sum, wsum, peak))
  }
}
