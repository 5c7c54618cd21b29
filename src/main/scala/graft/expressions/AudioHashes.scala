package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

import graft.llmops.{Mp3, Mp3Pcm}

/** Container-dispatching audio decode for the fingerprint family: RIFF
  * bytes take [[WavSamples.decodePcm16]]'s exact-integer path, MP3 sync
  * bytes take the full [[graft.llmops.Mp3]] decode with output rounded
  * (and clamped) to the same 16-bit integer domain, FLAC decodes
  * lossless (bit-equal to its WAV source), and OggS bytes take the
  * full [[graft.llmops.Vorbis]] decode (rounded like MP3). Everything
  * else — including the containers each decoder refuses (Layer I/II,
  * LSF, Ogg Opus, floor-0 Vorbis, 24-bit FLAC) — is NULL.
  */
private[expressions] object AudioPcm {

  /** Interleaved int samples + geometry, or null. */
  final class Clip(val channels: Int, val sampleRate: Int,
      val samples: Array[Int], val mp3Frames: Int)

  def decode(b: Array[Byte]): Clip = {
    if (b == null || b.length < 4) return null
    if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') {
      val d = WavSamples.decodePcm16(b)
      if (d == null) return null
      val out = new Array[Int](d.nSamples)
      var i = 0
      while (i < d.nSamples) { out(i) = d.sample(i); i += 1 }
      new Clip(d.channels, d.sampleRate, out, -1)
    } else if (b(0) == 'O' && b(1) == 'g' && b(2) == 'g' && b(3) == 'S') {
      // Ogg Vorbis: lossy like MP3, so samples round-and-clamp into
      // the shared 16-bit integer fingerprint domain
      val d = graft.llmops.Vorbis.decode(b)
      if (d == null) return null
      val out = new Array[Int](d.samples.length)
      var i = 0
      while (i < d.samples.length) {
        val v = Math.rint(d.samples(i))
        out(i) =
          if (v < -32768.0) -32768 else if (v > 32767.0) 32767 else v.toInt
        i += 1
      }
      new Clip(d.channels, d.sampleRate, out, -1)
    } else if (b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C') {
      // FLAC is lossless: a 16-bit clip decodes to the IDENTICAL sample
      // array as its WAV source, so fingerprints are bit-equal, not
      // merely near. Other bit depths refuse — the fingerprint domain
      // is 16-bit, matching the WAV arm's discipline.
      val d = graft.llmops.Flac.decode(b)
      if (d == null || d.bits != 16) return null
      new Clip(d.channels, d.sampleRate, d.samples, -1)
    } else {
      val d: Mp3Pcm = Mp3.decode(b)
      if (d == null) return null
      val out = new Array[Int](d.samples.length)
      var i = 0
      while (i < d.samples.length) {
        val v = Math.rint(d.samples(i))
        out(i) =
          if (v < -32768.0) -32768 else if (v > 32767.0) 32767 else v.toInt
        i += 1
      }
      new Clip(d.channels, d.sampleRate, out, d.frames)
    }
  }
}

/** [[WavEnvelopeHash]]'s container-agnostic sibling —
  * `AudioEnvelopeHash(content)` fingerprints WAV OR MP3 bytes with the
  * identical 65-cell energy-contour math, so a PCM clip and its MP3
  * encode land on the same 64 bits (the WAV↔MP3 twin gate pins this at
  * Hamming 0). On WAV input the result is bit-identical to
  * [[WavEnvelopeHash]] (same kernel), keeping the existing oracles'
  * closed-form replay valid for this expression too.
  */
case class AudioEnvelopeHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_audio_envelope_hash"

  override protected def nullSafeEval(input: Any): Any =
    AudioEnvelopeHash.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // freshName, never a literal: two of these in one whole-stage
      // span would redefine the local and kick the WHOLE stage to
      // interpreted (janino "Redefinition of local variable")
      val v = ctx.freshName("aeh")
      s"""
         |java.lang.Long $v = graft.expressions.AudioEnvelopeHash.compute($c);
         |if ($v == null) { ${ev.isNull} = true; } else { ${ev.value} = $v.longValue(); }
       """.stripMargin
      })

  override protected def withNewChildInternal(newChild: Expression): AudioEnvelopeHash =
    copy(child = newChild)
}

object AudioEnvelopeHash {
  def compute(b: Array[Byte]): java.lang.Long = {
    if (b == null || b.length < 4) return null
    if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F')
      return WavEnvelopeHash.compute(b) // exact-int streaming path
    val d = AudioPcm.decode(b)
    if (d == null) return null
    val s = d.samples
    WavEnvelopeHash.computeFrom(d.channels, s.length / d.channels, i => s(i))
  }
}

/** [[WavSpectralHash]]'s container-agnostic sibling: the 8×8
  * time-frequency gradient grid over WAV or MP3 bytes (same exact-integer
  * DFT kernel; MP3 samples rounded to the int domain first).
  */
case class AudioSpectralHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_audio_spectral_hash"

  override protected def nullSafeEval(input: Any): Any =
    AudioSpectralHash.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // freshName, never a literal: two of these in one whole-stage
      // span would redefine the local and kick the WHOLE stage to
      // interpreted (janino "Redefinition of local variable")
      val v = ctx.freshName("ash")
      s"""
         |java.lang.Long $v = graft.expressions.AudioSpectralHash.compute($c);
         |if ($v == null) { ${ev.isNull} = true; } else { ${ev.value} = $v.longValue(); }
       """.stripMargin
      })

  override protected def withNewChildInternal(newChild: Expression): AudioSpectralHash =
    copy(child = newChild)
}

object AudioSpectralHash {
  def compute(b: Array[Byte]): java.lang.Long = {
    if (b == null || b.length < 4) return null
    if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F')
      return WavSpectralHash.compute(b)
    val d = AudioPcm.decode(b)
    if (d == null) return null
    val s = d.samples
    WavSpectralHash.computeFrom(d.channels, s.length / d.channels, i => s(i))
  }
}

/** Decode-proof metadata for MP3 streams — `Mp3Samples(content)` returns
  * `struct<channels int, sample_rate int, n_frames bigint, mp3_frames
  * int>` from a FULL decode (every granule huffman-decoded and
  * synthesized), NULL for anything [[graft.llmops.Mp3]] refuses. The
  * audio sibling of [[WavSamples]]: with the writer's gapless tag,
  * `n_frames` is exactly the encoder input's frame count, so the gate
  * oracle replays it closed-form — a header-only sniff cannot fake it.
  */
case class Mp3Samples(child: Expression) extends UnaryExpression {

  override def dataType: DataType = Mp3Samples.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_mp3_samples"

  override protected def nullSafeEval(input: Any): Any =
    Mp3Samples.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.expressions.Mp3Samples.compute($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Mp3Samples =
    copy(child = newChild)
}

object Mp3Samples {
  val schema: StructType = StructType(Seq(
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("mp3_frames", IntegerType, nullable = false)))

  def compute(b: Array[Byte]): InternalRow = {
    val d = Mp3.decode(b)
    if (d == null) return null
    new GenericInternalRow(Array[Any](d.channels, d.sampleRate,
      d.samples.length.toLong / d.channels, d.frames))
  }
}

/** One-decode fusion of [[AudioEnvelopeHash]] and [[Mp3Samples]] —
  * `Mp3DecodeStats(content)` returns `struct<eh bigint, channels int,
  * sample_rate int, n_frames bigint, mp3_frames int>` where `eh` is
  * bit-identical to `AudioEnvelopeHash(content)` for EVERY input (same
  * dispatch, same kernels) and the four stat fields are
  * [[Mp3Samples]]'s, non-null only on the MP3 decode path (RIFF takes
  * the exact-int streaming envelope with null stats; Ogg/FLAC clips
  * hash but report null stats, matching Mp3Samples' refusal of them).
  * Exists because the MP3 twin gate needs BOTH the fingerprint and the
  * decode-proof counts — as separate expressions each ran its own full
  * huffman+synthesis decode of the same stream.
  */
case class Mp3DecodeStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = Mp3DecodeStats.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_mp3_decode_stats"

  override protected def nullSafeEval(input: Any): Any =
    Mp3DecodeStats.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.expressions.Mp3DecodeStats.compute($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Mp3DecodeStats =
    copy(child = newChild)
}

object Mp3DecodeStats {
  val schema: StructType = StructType(Seq(
    StructField("eh", LongType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("n_frames", LongType, nullable = true),
    StructField("mp3_frames", IntegerType, nullable = true)))

  def compute(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 4) return null
    if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') {
      val eh = WavEnvelopeHash.compute(b) // exact-int streaming path
      return new GenericInternalRow(Array[Any](
        if (eh == null) null else eh.longValue(), null, null, null, null))
    }
    val d = AudioPcm.decode(b)
    if (d == null) return null
    val s = d.samples
    val eh = WavEnvelopeHash.computeFrom(d.channels, s.length / d.channels,
      i => s(i))
    val ehv: Any = if (eh == null) null else eh.longValue()
    if (d.mp3Frames >= 0)
      new GenericInternalRow(Array[Any](ehv, d.channels, d.sampleRate,
        s.length.toLong / d.channels, d.mp3Frames))
    else
      new GenericInternalRow(Array[Any](ehv, null, null, null, null))
  }
}
