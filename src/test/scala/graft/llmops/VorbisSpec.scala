package graft.llmops

import org.scalatest.funsuite.AnyFunSuite

/** Ogg Vorbis codec pair: writer-twin round trips (mono/stereo, page
  * spanning, lapping trim), canonical-Huffman property checks, CRC and
  * structural refusal tiers, and the cross-container fingerprint
  * contract that makes WAV↔Ogg twins hash identically.
  */
class VorbisSpec extends AnyFunSuite {

  private def tone(total: Int, channels: Int,
      amp: Double = 8000.0): Array[Int] = {
    val out = new Array[Int](total * channels)
    var t = 0
    while (t < total) {
      var c = 0
      while (c < channels) {
        // per-channel mixture of two incommensurate tones + a slow
        // envelope so energy varies across fingerprint cells
        val env = 0.4 + 0.6 * math.abs(math.sin(t * 0.0011 * (c + 1)))
        val v = env * amp * (math.sin(t * 0.071 + c) +
          0.5 * math.sin(t * 0.0173 * (c + 2)))
        out(t * channels + c) = math.max(-32768, math.min(32767,
          math.round(v).toInt))
        c += 1
      }
      t += 1
    }
    out
  }

  test("mono round trip: decode(encode(x)) == x within quantizer noise") {
    val x = tone(3000, 1)
    val ogg = VorbisWriter.ogg(1, 8000, x)
    val d = Vorbis.decode(ogg)
    assert(d != null)
    assert(d.channels === 1 && d.sampleRate === 8000)
    assert(d.samples.length === x.length, "granule trim must hit exactly")
    var maxErr = 0.0
    var i = 0
    while (i < x.length) {
      maxErr = math.max(maxErr, math.abs(d.samples(i) - x(i)))
      i += 1
    }
    // two-pass cascade quantizer: reconstruction within ~0.1% of the
    // 16-bit domain
    assert(maxErr < 50.0, s"maxErr=$maxErr")
  }

  test("stereo round trip with page spanning (stream > one Ogg page)") {
    val x = tone(20000, 2) // 40000 samples, dozens of packets, many pages
    val ogg = VorbisWriter.ogg(2, 44100, x)
    // must span multiple audio pages
    def countPages(b: Array[Byte]): Int = {
      var n = 0
      var i = 0
      while (i + 4 <= b.length) {
        if (b(i) == 'O' && b(i + 1) == 'g' && b(i + 2) == 'g' &&
          b(i + 3) == 'S') n += 1
        i += 1
      }
      n
    }
    assert(countPages(ogg) >= 4)
    val d = Vorbis.decode(ogg)
    assert(d != null)
    assert(d.channels === 2 && d.samples.length === x.length)
    var sumSq = 0.0
    var i = 0
    while (i < x.length) {
      val e = d.samples(i) - x(i)
      sumSq += e * e
      i += 1
    }
    val rmse = math.sqrt(sumSq / x.length)
    assert(rmse < 20.0, s"rmse=$rmse")
  }

  test("odd lengths: lapping pad is trimmed to the exact sample count") {
    for (total <- Seq(1, 127, 128, 129, 1000)) {
      val x = tone(total, 1)
      val d = Vorbis.decode(VorbisWriter.ogg(1, 16000, x))
      assert(d != null, s"total=$total")
      assert(d.samples.length === total, s"total=$total")
    }
  }

  test("coupled profile: residue type 2 + square-polar coupling round trips") {
    val x = tone(8000, 2)
    val plain = Vorbis.decode(VorbisWriter.ogg(2, 8000, x))
    val coupled = Vorbis.decode(VorbisWriter.ogg(2, 8000, x, coupled = true))
    assert(coupled != null && coupled.channels === 2)
    assert(coupled.samples.length === x.length)
    var sumSq = 0.0
    var maxErr = 0.0
    var i = 0
    while (i < x.length) {
      val e = coupled.samples(i) - x(i)
      sumSq += e * e
      maxErr = math.max(maxErr, math.abs(e))
      i += 1
    }
    val rmse = math.sqrt(sumSq / x.length)
    // wide cascade: ~2x the uncoupled noise, still far inside the
    // fingerprint margins
    assert(rmse < 40.0, s"rmse=$rmse")
    assert(maxErr < 120.0, s"maxErr=$maxErr")
    // both profiles land on the same envelope bits as the WAV source
    import graft.expressions.AudioEnvelopeHash
    val wavHash = AudioEnvelopeHash.compute(
      MediaWriter.wavFromSamples(2, 8000, x.map(_.toShort)))
    val coupledHash = AudioEnvelopeHash.compute(
      VorbisWriter.ogg(2, 8000, x, coupled = true))
    assert(wavHash != null && coupledHash != null)
    assert(java.lang.Long.bitCount(wavHash ^ coupledHash) === 0)
    assert(plain != null && plain.samples.length === coupled.samples.length)
  }

  test("mixed 256/2048 blocksizes: transition windows and unequal lapping") {
    for (ch <- Seq(1, 2); total <- Seq(5000, 12001)) {
      val x = tone(total, ch)
      val ogg = VorbisWriter.oggMixed(ch, 16000, x)
      val d = Vorbis.decode(ogg)
      assert(d != null, s"ch=$ch total=$total")
      assert(d.channels === ch)
      assert(d.samples.length === x.length, s"ch=$ch total=$total")
      var sumSq = 0.0
      var maxErr = 0.0
      var i = 0
      while (i < x.length) {
        val e = d.samples(i) - x(i)
        sumSq += e * e
        maxErr = math.max(maxErr, math.abs(e))
        i += 1
      }
      val rmse = math.sqrt(sumSq / x.length)
      // every window transition (S->L, L->L, L->S, S->S) sits in this
      // stream; a lapping or window-flag bug shows up as edge glitches
      // orders of magnitude above quantizer noise. Long blocks carry
      // sqrt(1024/128) ~ 2.8x the short-block noise (error accumulates
      // across n/2 coefficients), hence the wider peak bound.
      assert(rmse < 30.0, s"ch=$ch total=$total rmse=$rmse")
      assert(maxErr < 400.0, s"ch=$ch total=$total maxErr=$maxErr")
    }
    // fingerprint transparency holds for the mixed profile too
    import graft.expressions.AudioEnvelopeHash
    val x = tone(12000, 1)
    val wavHash = AudioEnvelopeHash.compute(
      MediaWriter.wavFromSamples(1, 8000, x.map(_.toShort)))
    val mixedHash = AudioEnvelopeHash.compute(
      VorbisWriter.oggMixed(1, 8000, x))
    assert(wavHash != null && mixedHash != null)
    assert(java.lang.Long.bitCount(wavHash ^ mixedHash) === 0)
  }

  test("FFT iMDCT equals the direct kernel across blocksizes") {
    val rnd = new scala.util.Random(41)
    for (n <- Seq(64, 256, 512, 2048, 8192)) {
      val x = Array.fill(n / 2)(rnd.nextDouble() * 8 - 4)
      val direct = Vorbis.imdctDirect(x, n)
      val fast = Vorbis.imdctFft(x, n)
      var maxErr = 0.0
      var i = 0
      while (i < n) {
        maxErr = math.max(maxErr, math.abs(direct(i) - fast(i)))
        i += 1
      }
      assert(maxErr < 1e-8, s"n=$n maxErr=$maxErr")
    }
  }

  test("canonical codes: marker algorithm matches brute-force first fit") {
    // brute force: assign each entry the smallest codeword of its
    // length that is neither a prefix of nor prefixed by an assigned one
    def brute(lengths: Array[Int]): Array[Long] = {
      val assigned = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
      lengths.map { len =>
        if (len == 0) 0L
        else {
          var c = 0L
          def conflicts(c: Long): Boolean = assigned.exists { case (a, al) =>
            if (al <= len) (c >>> (len - al)) == a
            else (a >>> (al - len)) == c
          }
          while (c < (1L << len) && conflicts(c)) c += 1
          assert(c < (1L << len), "overpopulated in brute force")
          assigned += ((c, len))
          c
        }
      }
    }
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 200) {
      // random near-complete Kraft sets: start from a full tree split
      val lengths = scala.collection.mutable.ArrayBuffer(1, 1)
      var splits = rnd.nextInt(12)
      while (splits > 0) {
        val i = rnd.nextInt(lengths.length)
        if (lengths(i) < 24) {
          val l = lengths(i) + 1
          lengths(i) = l
          lengths.insert(i + 1, l)
        }
        splits -= 1
      }
      val arr = lengths.toArray
      val mine = Vorbis.canonicalCodes(arr)
      assert(mine != null, s"trial $trial")
      assert(mine.toSeq === brute(arr).toSeq, s"trial $trial: ${arr.toSeq}")
    }
    // overpopulated refuses
    assert(Vorbis.canonicalCodes(Array(1, 1, 1)) === null)
  }

  test("refusals: garbage, truncation, CRC corruption, Opus, ident stub") {
    val x = tone(2000, 1)
    val good = VorbisWriter.ogg(1, 8000, x)
    assert(Vorbis.decode(null) === null)
    assert(Vorbis.decode("OggS but not really a page".getBytes) === null)
    assert(Vorbis.decode("completely unrelated".getBytes) === null)
    // truncations: either refuse or decode a shorter prefix — never throw
    for (cut <- Seq(10, 30, 57, 100, good.length / 2, good.length - 7)) {
      val d = Vorbis.decode(good.take(cut))
      assert(d == null || d.samples.length < x.length, s"cut=$cut")
    }
    // flip a byte inside the first audio page body: its CRC fails and
    // the whole demux refuses (pages are the integrity unit)
    val c = good.clone()
    c(good.length - 20) = (c(good.length - 20) ^ 0x3C).toByte
    assert(Vorbis.decode(c) === null)
    // an Opus stream in an Ogg container is not Vorbis
    assert(Vorbis.decode(MediaWriter.ogg(2, 48000, opus = true)) === null)
    // the header-only metadata stub has no comment/setup packets
    assert(Vorbis.decode(MediaWriter.ogg(2, 44100)) === null)
  }

  test("forged giant final granule is ignored, never a negative-size crash") {
    // the granule field is 8 attacker-controlled bytes whose page CRC can
    // be recomputed to self-validate — granule*channels must not overflow
    // into a negative Arrays.copyOf length (r17 fix)
    val x = tone(2000, 2)
    val good = VorbisWriter.ogg(2, 8000, x)
    var last = -1
    var i = 0
    while (i + 4 <= good.length) {
      if (good(i) == 'O' && good(i + 1) == 'g' && good(i + 2) == 'g' &&
        good(i + 3) == 'S') last = i
      i += 1
    }
    assert(last > 0)
    val b = good.clone()
    val g = 0x7FFFFFFFFFFFFFF0L
    (0 until 8).foreach(k => b(last + 6 + k) = ((g >>> (8 * k)) & 0xff).toByte)
    val segs = b(last + 26) & 0xff
    var bodyLen = 0
    (0 until segs).foreach(k => bodyLen += (b(last + 27 + k) & 0xff))
    val pageLen = 27 + segs + bodyLen
    java.util.Arrays.fill(b, last + 22, last + 26, 0.toByte)
    val c = Vorbis.crc(b, last, pageLen)
    (0 until 4).foreach(k => b(last + 22 + k) = ((c >>> (8 * k)) & 0xff).toByte)
    val d = Vorbis.decode(b) // must not throw
    // the forged granule can't trim (it exceeds the sample count), so the
    // decode returns the untrimmed lapped grid or refuses — never crashes
    assert(d == null || d.samples.length >= x.length)
  }

  test("bit-flip fuzz: decode refuses or degrades, never throws") {
    val x = tone(2500, 1)
    val good = VorbisWriter.ogg(1, 8000, x)
    val r = new java.util.Random(2026)
    var survived = 0
    (0 until 400).foreach { _ =>
      val m = good.clone()
      val flips = 1 + r.nextInt(4)
      (0 until flips).foreach { _ =>
        val p = r.nextInt(m.length)
        m(p) = (m(p) ^ (1 << r.nextInt(8))).toByte
      }
      val d = Vorbis.decode(m) // never throws
      if (d != null) survived += 1
    }
    // page CRCs gate nearly every flip (a 3-page stream refuses whole);
    // the arm's contract is throw-freedom, not survival
    assert(survived >= 0)
  }

  test("truncation fuzz at every sixteenth of the stream") {
    val x = tone(2500, 2)
    val good = VorbisWriter.ogg(2, 8000, x)
    (1 to 15).foreach { k =>
      val d = Vorbis.decode(good.take(good.length * k / 16)) // never throws
      assert(d == null || d.samples.length <= x.length + 8192)
    }
  }

  test("WAV and Ogg twins share the fingerprint space at Hamming 0") {
    import graft.expressions.{AudioEnvelopeHash, AudioSpectralHash}
    for (ch <- Seq(1, 2)) {
      val x = tone(12000, ch)
      val wav = MediaWriter.wavFromSamples(ch, 8000, x.map(_.toShort))
      val ogg = VorbisWriter.ogg(ch, 8000, x)
      val he = AudioEnvelopeHash.compute(wav)
      val ho = AudioEnvelopeHash.compute(ogg)
      assert(he != null && ho != null, s"ch=$ch")
      assert(java.lang.Long.bitCount(he ^ ho) === 0,
        s"ch=$ch envelope hamming ${java.lang.Long.bitCount(he ^ ho)}")
      val se = AudioSpectralHash.compute(wav)
      val so = AudioSpectralHash.compute(ogg)
      assert(se != null && so != null, s"ch=$ch")
      assert(java.lang.Long.bitCount(se ^ so) <= 2,
        s"ch=$ch spectral hamming ${java.lang.Long.bitCount(se ^ so)}")
    }
  }

  test("AvMeta agrees with the writer's identification header") {
    val meta = graft.expressions.AvMeta.compute(
      VorbisWriter.ogg(2, 22050, tone(500, 2)))
    assert(meta != null)
    assert(meta.getString(0) === "vorbis")
    assert(meta.getInt(1) === 2)
    assert(meta.getInt(2) === 22050)
    // duration from the granule tail walk: 500 frames at 22050 Hz
    assert(meta.getLong(4) === 500L * 1000 / 22050)
    // the ident-only stub has granule 0 on its single page: NULL
    assert(graft.expressions.AvMeta.compute(
      MediaWriter.ogg(2, 44100)).isNullAt(4))
  }
}
