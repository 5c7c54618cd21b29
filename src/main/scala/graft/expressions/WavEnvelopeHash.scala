package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}

/** 64-bit time-domain energy-envelope fingerprint of a PCM WAV —
  * `WavEnvelopeHash(content)`: decode via [[WavSamples.decodePcm16]],
  * mono-mix each frame (plain channel sum — no division, no rounding
  * choice to disagree on), partition the frames into 65 cells by the
  * same exact floor-partition inverse [[PngDHash]] uses for its grid,
  * take each cell's energy Σ|mono|, and emit one bit per adjacent cell
  * pair: bit `k` is set iff cell `k+1` has higher MEAN energy than cell
  * `k` (cross-multiplied — `eR·cntL > eL·cntR` — so the math never
  * leaves integers; the products are compared as exact 128-bit values
  * via `Math.multiplyHigh`, so no payload — max channel count, max
  * amplitude, 2 GB clip — can overflow the comparison).
  *
  * This is the simplest member of the audio-fingerprint family
  * (Shazam/Chromaprint-class systems hash spectral landmarks; the
  * time-domain envelope is the no-FFT baseline): loudness CONTOUR
  * survives uniform gain change exactly (every energy scales, no
  * comparison flips) and re-encoding approximately, so near-duplicate
  * audio detection becomes the same banded Hamming join the engine
  * already runs for SimHash and image dHash
  * ([[graft.llmops.DedupOps.hammingNearDups]]).
  *
  * NULL for anything [[WavSamples]] refuses, and for clips shorter than
  * 65 frames (empty envelope cells would pin bits to a convention —
  * refuse, as [[PngDHash]] does below its grid).
  */
case class WavEnvelopeHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_wav_envelope_hash"

  override protected def nullSafeEval(input: Any): Any =
    WavEnvelopeHash.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // freshName, never a literal: two of these in one whole-stage
      // span would redefine the local and kick the WHOLE stage to
      // interpreted (janino "Redefinition of local variable")
      val v = ctx.freshName("eh")
      s"""
         |java.lang.Long $v = graft.expressions.WavEnvelopeHash.compute($c);
         |if ($v == null) { ${ev.isNull} = true; } else { ${ev.value} = $v.longValue(); }
       """.stripMargin
      })

  override protected def withNewChildInternal(newChild: Expression): WavEnvelopeHash =
    copy(child = newChild)
}

object WavEnvelopeHash {

  val Cells = 65

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(b: Array[Byte]): java.lang.Long = {
    val d = WavSamples.decodePcm16(b)
    if (d == null) return null
    computeFrom(d.channels, d.nSamples / d.channels, d.sample)
  }

  /** Container-independent core over an interleaved int-sample accessor —
    * the WAV path feeds PCM bytes, [[AudioEnvelopeHash]]'s MP3 path feeds
    * rounded decoder output; identical cell math either way, so a WAV and
    * an MP3 of the same content land on the same bits.
    */
  private[expressions] def computeFrom(channels: Int, frames: Int,
      sample: Int => Int): java.lang.Long = {
    if (frames < Cells) return null
    val energy = new Array[Long](Cells)
    val counts = new Array[Long](Cells)
    var n = 0
    while (n < frames) {
      // Long: fmt allows 65535 channels, and ~32k channels at full
      // amplitude overflows an Int sum (silently flipping envelope bits)
      var mono = 0L
      var c = 0
      while (c < channels) {
        mono += sample(n * channels + c)
        c += 1
      }
      // exact partition inverse: ⌈(n+1)·Cells/frames⌉ - 1 (see PngDHash)
      val cell = (((n + 1).toLong * Cells - 1) / frames).toInt
      energy(cell) += (if (mono < 0) -mono else mono)
      counts(cell) += 1L
      n += 1
    }
    var hash = 0L
    var k = 0
    while (k < Cells - 1) {
      if (gtU128(energy(k + 1), counts(k), energy(k), counts(k + 1)))
        hash |= 1L << k
      k += 1
    }
    java.lang.Long.valueOf(hash)
  }

  /** Exact `a·b > c·d` for non-negative longs via 128-bit products —
    * energies grow with clip length × channel count and the naive Long
    * product can overflow for long full-scale clips.
    */
  @inline private def gtU128(a: Long, b: Long, c: Long, d: Long): Boolean = {
    val hi1 = Math.multiplyHigh(a, b); val lo1 = a * b
    val hi2 = Math.multiplyHigh(c, d); val lo2 = c * d
    if (hi1 != hi2) hi1 > hi2
    else java.lang.Long.compareUnsigned(lo1, lo2) > 0
  }
}
