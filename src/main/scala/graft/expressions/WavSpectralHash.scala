package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}

/** 64-bit FREQUENCY-domain audio fingerprint — the spectral complement
  * of [[WavEnvelopeHash]] (which hashes the time-domain loudness
  * contour, and cannot distinguish two clips with the same energy
  * envelope but different pitch). `WavSpectralHash(content)` decodes
  * 16-bit PCM ([[WavSamples.decodePcm16]]), mono-mixes, splits the clip
  * into 8 equal time cells, and per cell measures the energy in DFT
  * bins 1..9 of the (decimated, ≤ 256-sample) cell signal; bit
  * `cell·8 + (k−1)` is set iff bin k+1 carries more energy than bin k.
  * A time × frequency gradient grid — dHash over the spectrogram, the
  * Chromaprint/Shazam family shape.
  *
  * Determinism is EXACT-INTEGER: the DFT uses a quantized cosine table
  * `round(cos(θ)·64)` (Niven's theorem keeps `cos·64` away from
  * rounding boundaries at every angle in play), so `re/im` are exact
  * Long sums — |mono| ≤ 2¹⁷, |coef| ≤ 64, m ≤ 256 keep `re² + im²`
  * within a signed 64-bit Long — and an external SQL engine replays
  * every bit. Energy ratios are invariant under gain (E scales g²
  * uniformly), so the fingerprint survives volume normalization exactly
  * like the envelope hash.
  *
  * For large-window spectral analysis proper, [[graft.llmops.Fft]] is
  * the O(n log n) radix-2 path; at fingerprint sizes (9 bins of ≤ 256
  * samples) the direct form is both cheaper and exactly replayable.
  *
  * NULL for anything [[WavSamples]] refuses, clips under 128 frames
  * (too short for 8 spectral cells to mean anything), or more than 2
  * channels (the exact-integer envelope above assumes a stereo mix;
  * refuse rather than overflow).
  */
case class WavSpectralHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_wav_spectral_hash"

  override protected def nullSafeEval(input: Any): Any =
    WavSpectralHash.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // freshName, never a literal: two of these in one whole-stage
      // span would redefine the local and kick the WHOLE stage to
      // interpreted (janino "Redefinition of local variable")
      val v = ctx.freshName("sh")
      s"""
         |java.lang.Long $v = graft.expressions.WavSpectralHash.compute($c);
         |if ($v == null) { ${ev.isNull} = true; } else { ${ev.value} = $v.longValue(); }
       """.stripMargin
      })

  override protected def withNewChildInternal(newChild: Expression): WavSpectralHash =
    copy(child = newChild)
}

object WavSpectralHash {

  val TimeCells = 8
  val Bands = 9 // DFT bins 1..9 → 8 adjacent-band comparisons per cell
  val MaxDftSamples = 256
  val CosScale = 64
  val MinFrames = 128

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(b: Array[Byte]): java.lang.Long = {
    val d = WavSamples.decodePcm16(b)
    if (d == null) return null
    computeFrom(d.channels, d.nSamples / d.channels, d.sample)
  }

  /** Container-independent core over an interleaved int-sample accessor
    * (see [[WavEnvelopeHash.computeFrom]]): WAV feeds PCM bytes,
    * [[AudioSpectralHash]]'s MP3 path feeds rounded decoder output.
    */
  private[expressions] def computeFrom(channels: Int, frames: Int,
      sample: Int => Int): java.lang.Long = {
    if (channels > 2) return null
    if (frames < MinFrames) return null
    var hash = 0L
    var cell = 0
    while (cell < TimeCells) {
      // floor partition: cell covers [c·frames/8, (c+1)·frames/8)
      val start = (cell.toLong * frames / TimeCells).toInt
      val end = ((cell + 1).toLong * frames / TimeCells).toInt
      val len = end - start
      val stride = (len + MaxDftSamples - 1) / MaxDftSamples
      val m = (len + stride - 1) / stride
      // decimated mono cell signal (|mono| ≤ 2·32767 — Int is exact)
      val xs = new Array[Int](m)
      var i = 0
      while (i < m) {
        val n = start + i * stride
        var mono = 0
        var c = 0
        while (c < channels) { mono += sample(n * channels + c); c += 1 }
        xs(i) = mono
        i += 1
      }
      val e = new Array[Long](Bands + 1)
      var k = 1
      while (k <= Bands) {
        var re = 0L
        var im = 0L
        var j = 0
        while (j < m) {
          val theta = 2.0 * math.Pi * k * j / m
          // floor(x + 0.5): Math.round's exact semantics, spelled the
          // same way in the SQL replay (round() half-away would differ
          // for negative halves)
          re += xs(j).toLong * Math.round(math.cos(theta) * CosScale)
          im += xs(j).toLong * Math.round(math.sin(theta) * CosScale)
          j += 1
        }
        e(k) = re * re + im * im
        k += 1
      }
      var band = 1
      while (band < Bands) {
        if (e(band + 1) > e(band)) hash |= 1L << (cell * 8 + band - 1)
        band += 1
      }
      cell += 1
    }
    java.lang.Long.valueOf(hash)
  }
}
