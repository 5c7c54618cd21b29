package graft.llmops

/** Decoded MP3 audio: interleaved per-frame samples (doubles in
  * 16-bit-PCM scale), plus the audio frame count for duration
  * cross-checks against [[graft.expressions.AvMeta]]'s header-only CBR
  * estimate.
  */
final class Mp3Pcm(val channels: Int, val sampleRate: Int,
    val samples: Array[Double], val frames: Int) {
  def nFrames: Long = samples.length.toLong / channels
}

/** MPEG-1 Layer III decoder — the compressed-audio sibling of
  * [[graft.llmops.DocumentText]]'s codec set and the JPEG decoder
  * ([[graft.expressions.Jpeg]]): full bitstream walk (frame headers,
  * side info, bit reservoir, scalefactors, spectral Huffman,
  * requantization, MS stereo, alias reduction, IMDCT, polyphase
  * synthesis) built on the public ISO/IEC 11172-3 layout, producing PCM
  * for the audio fingerprint family
  * ([[graft.expressions.AudioEnvelopeHash]]).
  *
  * ==Honest envelope==
  * Refused with NULL (never half-decoded):
  *   - anything but MPEG-1 Layer III (Layer I/II, MPEG-2/2.5 LSF, free
  *     format);
  *   - frames selecting spectral Huffman tables outside the
  *     structurally-validated subset in [[Mp3Tables]] (13/15/16–31 —
  *     the escape books could not be transcribed with confidence in a
  *     zero-egress sandbox);
  *   - window-switching granules (block_type ≠ 0): the in-repo writer
  *     emits long blocks only, and an untestable short-block path would
  *     be dead weight that cannot be validated end-to-end here;
  *   - intensity-stereo frames (mode_extension bit 0);
  *   - streams whose bit reservoir underflows on the very first frame,
  *     or with no complete decodable frame.
  * A frame whose `main_data_begin` reaches back past the buffered
  * reservoir mid-stream decodes as silence (stream stays aligned, the
  * documented ISO recovery), as does a corrupt granule.
  *
  * Gapless: when the stream opens with a Xing/`Info` frame carrying the
  * writer's delay/padding block ([[Mp3Writer]] emits the LAME-shaped
  * layout), the decoder trims exactly those samples, so
  * encode(x).decode == x sample-aligned — that alignment is what lets
  * the WAV↔MP3 twin gate demand envelope-hash Hamming 0 rather than
  * "close".
  *
  * Synthesis uses the closed-form analysis window's exact solved
  * inverse ([[Mp3Tables.SynthesisWindow]]): in-repo round trip is
  * perfect reconstruction up to quantization; third-party streams
  * reconstruct fingerprint-grade (see Mp3Tables doc).
  *
  * Reference surface: the document processor's binary media hooks
  * (aje_libs/documents/helpers/document_processor.py:10-83); the
  * reference delegates actual audio decode to external tooling the
  * sandbox does not have, so the engine carries its own.
  */
object Mp3 {

  /** Decoded-output envelope shared with the Vorbis/FLAC tier: a decode
    * whose PCM would exceed this refuses (null) rather than OOM.
    */
  private val MaxOutBytes = 64L * 1024 * 1024

  /** Total leading samples discarded when no Info tag is present is 0 —
    * third-party streams keep their full (delayed) grid; the in-repo
    * writer always stamps the tag with this chain's measured 1057.
    */
  val ChainDelay = 1057

  import Mp3Tables._

  private final class BitReader(val data: Array[Byte]) {
    var pos = 0 // bit position
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val byteI = pos >>> 3
        val b = if (byteI < data.length) data(byteI) & 0xFF else 0
        v = (v << 1) | ((b >>> (7 - (pos & 7))) & 1)
        pos += 1
        i += 1
      }
      v
    }
    /** Peek up to n bits without advancing (zero-padded past end). */
    def peek(n: Int): Int = {
      val p = pos
      val v = bits(n)
      pos = p
      v
    }
  }

  def sniff(b: Array[Byte]): Boolean = {
    if (b == null || b.length < 4) return false
    val off = id3Skip(b)
    if (off < 0) return false
    val len1 = frameLen(b, off)
    if (len1 <= 0) return false
    val end = id3v1End(b, off)
    val second = off + len1
    second <= end && (second == end || frameLen(b, second) > 0)
  }

  private def id3Skip(b: Array[Byte]): Int = {
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val size = ((b(6) & 0x7F) << 21) | ((b(7) & 0x7F) << 14) |
        ((b(8) & 0x7F) << 7) | (b(9) & 0x7F)
      val next = 10L + size
      if (next >= b.length) -1 else next.toInt
    } else 0
  }

  private def id3v1End(b: Array[Byte], off: Int): Int = {
    var end = b.length
    if (end - off >= 128 && b(end - 128) == 'T' && b(end - 127) == 'A' &&
        b(end - 126) == 'G') end -= 128
    end
  }

  /** Frame length at `i`, or -1 when not a valid MPEG-1 Layer III CBR
    * header (same acceptance as [[graft.expressions.AvMeta]]).
    */
  private def frameLen(b: Array[Byte], i: Int): Int = {
    if (i < 0 || i + 4 > b.length) return -1
    if ((b(i) & 0xFF) != 0xFF || (b(i + 1) & 0xFE) != 0xFA) return -1
    val brIdx = (b(i + 2) & 0xF0) >>> 4
    val srIdx = (b(i + 2) & 0x0C) >>> 2
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return -1
    val pad = (b(i + 2) & 0x02) >>> 1
    144000 * Bitrates(brIdx) / Rates(srIdx) + pad
  }

  private val Pow43: Array[Double] =
    Array.tabulate(16)(i => math.pow(i.toDouble, 4.0 / 3.0))

  private final class GranuleInfo {
    var part23 = 0; var bigValues = 0; var globalGain = 0
    var scalefacCompress = 0; var windowSwitching = false
    var tableSelect = new Array[Int](3)
    var region0 = 0; var region1 = 0
    var preflag = 0; var scalefacScale = 0; var count1Table = 0
  }

  /** Decode a complete clip; null when refused. */
  def decode(bytes: Array[Byte]): Mp3Pcm = {
    if (bytes == null) return null
    val start = id3Skip(bytes)
    if (start < 0) return null
    if (frameLen(bytes, start) <= 0) return null
    val end = id3v1End(bytes, start)

    var off = start
    var channels = 0
    var rateIdx = -1
    var frames = 0
    var xingFrames = -1
    var trimDelay = 0
    var trimPad = 0
    var firstFrame = true

    // reservoir: accumulated main data not yet consumed
    var resv = new Array[Byte](0)
    val pcm = new java.util.ArrayList[Array[Double]]() // per frame, interleaved

    // per-channel persistent state
    var mdctOverlap: Array[Array[Double]] = null // ch -> 576
    var polyV: Array[Array[Double]] = null       // ch -> 1024

    val sfBuf = Array.ofDim[Int](2, 2, 22) // ch, gr, band (gr dim for scfsi)

    while (off + 4 <= end) {
      val fl = frameLen(bytes, off)
      if (fl <= 0 || off + fl > end) {
        // stop at first invalid/truncated header past valid prefix
        off = end
      } else {
        val mode = (bytes(off + 3) & 0xC0) >>> 6
        val modeExt = (bytes(off + 3) & 0x30) >>> 4
        val ch = if (mode == 3) 1 else 2
        val sr = (bytes(off + 2) & 0x0C) >>> 2
        val crc = (bytes(off + 1) & 0x01) == 0
        if (firstFrame) {
          channels = ch; rateIdx = sr
          mdctOverlap = Array.ofDim[Double](ch, 576)
          polyV = Array.ofDim[Double](ch, 1024)
        } else if (ch != channels || sr != rateIdx) {
          return null // mid-stream format change: refuse
        }
        val sideLen = if (ch == 1) 17 else 32
        var p = off + 4
        if (crc) p += 2
        if (p + sideLen > off + fl) return null

        // Xing/Info detection (first frame only): tag sits right after
        // the (all-zero) side info
        val tagAt = p + sideLen
        val isInfo = firstFrame && tagAt + 4 <= off + fl && {
          val t = new String(bytes, tagAt, 4, "ISO-8859-1")
          t == "Xing" || t == "Info"
        }
        if (isInfo) {
          var q = tagAt + 4
          def be32(i: Int): Long =
            ((bytes(i) & 0xFFL) << 24) | ((bytes(i + 1) & 0xFFL) << 16) |
              ((bytes(i + 2) & 0xFFL) << 8) | (bytes(i + 3) & 0xFFL)
          if (q + 4 <= off + fl) {
            val flags = be32(q); q += 4
            if ((flags & 1) != 0 && q + 4 <= off + fl) { xingFrames = be32(q).toInt; q += 4 }
            if ((flags & 2) != 0) q += 4   // bytes
            if ((flags & 4) != 0) q += 100 // toc
            if ((flags & 8) != 0) q += 4   // quality
            // LAME-shaped block: 9-byte encoder string + 12 bytes, then
            // 3 bytes packing delay(12) | padding(12)
            val dp = q + 9 + 12
            if (dp + 3 <= off + fl) {
              val b0 = bytes(dp) & 0xFF; val b1 = bytes(dp + 1) & 0xFF
              val b2 = bytes(dp + 2) & 0xFF
              trimDelay = (b0 << 4) | (b1 >>> 4)
              trimPad = ((b1 & 0x0F) << 8) | b2
            }
          }
        } else {
          // ---- audio frame ----
          val side = new BitReader(java.util.Arrays.copyOfRange(bytes, p, p + sideLen))
          val mainDataBegin = side.bits(9)
          side.bits(if (ch == 1) 5 else 3) // private
          val scfsi = Array.ofDim[Int](ch)
          var c = 0
          while (c < ch) { scfsi(c) = side.bits(4); c += 1 }
          val gi = Array.ofDim[GranuleInfo](2, ch)
          var gr = 0
          var refused = false
          while (gr < 2 && !refused) {
            c = 0
            while (c < ch && !refused) {
              val g = new GranuleInfo
              g.part23 = side.bits(12)
              g.bigValues = side.bits(9)
              g.globalGain = side.bits(8)
              g.scalefacCompress = side.bits(4)
              g.windowSwitching = side.bits(1) == 1
              if (g.windowSwitching) refused = true // long-block streams only
              else {
                g.tableSelect(0) = side.bits(5)
                g.tableSelect(1) = side.bits(5)
                g.tableSelect(2) = side.bits(5)
                g.region0 = side.bits(4)
                g.region1 = side.bits(3)
              }
              g.preflag = side.bits(1)
              g.scalefacScale = side.bits(1)
              g.count1Table = side.bits(1)
              if (g.bigValues > 288) refused = true
              gi(gr)(c) = g
              c += 1
            }
            gr += 1
          }
          if (refused) return null
          if ((modeExt & 1) != 0 && mode == 1) return null // intensity stereo

          val mainLen = off + fl - (p + sideLen)
          val main = new Array[Byte](resv.length + mainLen)
          System.arraycopy(resv, 0, main, 0, resv.length)
          System.arraycopy(bytes, p + sideLen, main, resv.length, mainLen)
          val startByte = resv.length - mainDataBegin
          val framePcm = new Array[Double](1152 * ch)
          if (startByte < 0) {
            if (frames == 0 && mainDataBegin > 0) return null
            // reservoir underflow mid-stream: silent frame, stay aligned
          } else {
            val br = new BitReader(main)
            br.pos = startByte * 8
            val xr = Array.ofDim[Double](ch, 576)
            gr = 0
            var ok = true
            while (gr < 2 && ok) {
              c = 0
              while (c < ch && ok) {
                ok = decodeGranule(br, gi(gr)(c), rateIdx, sfBuf(c), gr,
                  scfsi(c), xr(c))
                c += 1
              }
              if (ok) {
                if (mode == 1 && (modeExt & 2) != 0 && ch == 2) msStereo(xr)
                c = 0
                while (c < ch) {
                  aliasReduce(xr(c))
                  val sub = imdctGranule(xr(c), mdctOverlap(c))
                  synthGranule(sub, polyV(c), framePcm, c, ch, gr)
                  c += 1
                }
              }
              gr += 1
            }
            if (!ok && frames == 0) return null
            if (!ok) java.util.Arrays.fill(framePcm, 0.0) // corrupt: silence
          }
          pcm.add(framePcm)
          frames += 1
          // same 64 MB decoded-output envelope as the Vorbis/FLAC tier —
          // without it a ~100 MB low-bitrate stream accumulates ~17 GB of
          // frame arrays and frames*1152*channels wraps the Int below
          if (frames.toLong * 1152 * channels * 8 > MaxOutBytes) return null
          val keep = math.min(main.length, 511)
          resv = java.util.Arrays.copyOfRange(main, main.length - keep, main.length)
        }
        firstFrame = false
        off += fl
      }
    }
    if (frames == 0) return null
    val raw = new Array[Double](frames * 1152 * channels)
    var i = 0
    val it = pcm.iterator()
    while (it.hasNext) {
      val f = it.next()
      System.arraycopy(f, 0, raw, i, f.length)
      i += f.length
    }
    // gapless trim (frame-count sanity: tag must match what we decoded)
    var out = raw
    if ((trimDelay > 0 || trimPad > 0) &&
        (xingFrames < 0 || xingFrames == frames)) {
      val total = frames * 1152
      val keep = total - trimDelay - trimPad
      if (keep > 0 && trimDelay >= 0 && trimPad >= 0)
        out = java.util.Arrays.copyOfRange(raw, trimDelay * channels,
          (trimDelay + keep) * channels)
    }
    new Mp3Pcm(channels, Rates(rateIdx), out, frames)
  }

  /** Scalefactors + Huffman + requantize for one granule/channel into
    * xr(576). False on any structural refusal.
    */
  private def decodeGranule(br: BitReader, g: GranuleInfo, rateIdx: Int,
      sf: Array[Array[Int]], gr: Int, scfsi: Int,
      xr: Array[Double]): Boolean = {
    val granuleStart = br.pos
    val granuleEnd = granuleStart + g.part23
    val (slen1, slen2) = Slen(g.scalefacCompress)
    // scfsi groups (long blocks): bands 0-5, 6-10, 11-15, 16-20
    val groups = Array((0, 6, slen1), (6, 11, slen1), (11, 16, slen2), (16, 21, slen2))
    var gi = 0
    while (gi < 4) {
      val (from, until, slen) = groups(gi)
      val share = gr == 1 && ((scfsi >> (3 - gi)) & 1) == 1
      var b = from
      while (b < until) {
        if (share) sf(gr)(b) = sf(0)(b)
        else sf(gr)(b) = if (slen == 0) 0 else br.bits(slen)
        b += 1
      }
      gi += 1
    }
    sf(gr)(21) = 0

    // Huffman: big values with region tables
    val bands = SfbLong(rateIdx)
    val bigEnd = 2 * g.bigValues
    if (bigEnd > 576) return false
    val r0 = g.region0 + 1
    val r1 = g.region0 + g.region1 + 2
    if (r0 >= bands.length || r1 >= bands.length) return false
    val bound1 = bands(r0)
    val bound2 = bands(r1)
    val is = new Array[Int](576)
    var line = 0
    while (line < bigEnd) {
      val region = if (line < bound1) 0 else if (line < bound2) 1 else 2
      val tid = g.tableSelect(region)
      if (tid == 0) {
        is(line) = 0; is(line + 1) = 0
      } else {
        val t = BigTables(tid)
        if (t == null) return false // unverified/escape table: refuse clip
        val look = br.peek(t.maxLen)
        val e = t.lut(look)
        if (e < 0) return false
        br.pos += e & 0xFF
        var x = (e >>> 12) & 0xF
        var y = (e >>> 8) & 0xF
        if (x != 0 && br.bits(1) == 1) x = -x
        if (y != 0 && br.bits(1) == 1) y = -y
        is(line) = x; is(line + 1) = y
        if (br.pos > granuleEnd) return false
      }
      line += 2
    }
    // count1 region
    val c1 = if (g.count1Table == 1) HB else HA
    while (br.pos < granuleEnd && line + 3 < 576) {
      val mark = br.pos
      val look = c1.peek(br)
      val e = c1.lut(look)
      if (e < 0) return false
      br.pos = mark + (e & 0xFF)
      val quad = (e >>> 8) & 0xF
      val vs = new Array[Int](4)
      var q = 0
      while (q < 4) {
        val mag = (quad >>> (3 - q)) & 1
        vs(q) = if (mag == 1 && br.bits(1) == 1) -mag else mag
        q += 1
      }
      if (br.pos > granuleEnd) {
        // final quad overran part2_3_length: standard recovery drops it
        br.pos = granuleEnd
      } else {
        is(line) = vs(0); is(line + 1) = vs(1)
        is(line + 2) = vs(2); is(line + 3) = vs(3)
        line += 4
      }
    }
    br.pos = granuleEnd

    // requantize
    val gain = math.pow(2.0, (g.globalGain - 210) / 4.0)
    val mult = 0.5 * (1 + g.scalefacScale)
    var b = 0
    var i = 0
    while (b < 22) {
      val bandEnd = bands(b + 1)
      val f = gain * math.pow(2.0,
        -mult * (sf(gr)(b) + (if (g.preflag == 1) Pretab(b) else 0)))
      while (i < bandEnd) {
        val v = is(i)
        xr(i) = if (v == 0) 0.0
          else if (v > 0) Pow43(v) * f
          else -Pow43(-v) * f
        i += 1
      }
      b += 1
    }
    true
  }

  private implicit final class HuffPeek(val t: Mp3Tables.Huff) extends AnyVal {
    def peek(br: BitReader): Int = br.peek(t.maxLen)
  }

  /** Test hook: run the decoder back half (alias reduction, IMDCT,
    * polyphase) over exact granule lines — lets the spec assert the
    * filterbank pair alone is perfect-reconstruction, separating codec
    * math from bitstream bugs.
    */
  private[llmops] def synthesizeForTest(
      lines: Array[Array[Double]]): Array[Double] = {
    val overlap = new Array[Double](576)
    val v = new Array[Double](1024)
    val out = new Array[Double](lines.length * 576)
    var g = 0
    while (g < lines.length) {
      val xr = lines(g).clone()
      aliasReduce(xr)
      val sub = imdctGranule(xr, overlap)
      val frame = new Array[Double](1152)
      synthGranule(sub, v, frame, 0, 1, g % 2)
      System.arraycopy(frame, (g % 2) * 576, out, g * 576, 576)
      g += 1
    }
    out
  }

  private def msStereo(xr: Array[Array[Double]]): Unit = {
    val inv = 1.0 / math.sqrt(2.0)
    var i = 0
    while (i < 576) {
      val m = xr(0)(i); val s = xr(1)(i)
      xr(0)(i) = (m + s) * inv
      xr(1)(i) = (m - s) * inv
      i += 1
    }
  }

  private def aliasReduce(xr: Array[Double]): Unit = {
    var sb = 1
    while (sb < 32) {
      var j = 0
      while (j < 8) {
        val u = 18 * sb - 1 - j
        val d = 18 * sb + j
        val a = xr(u); val b = xr(d)
        xr(u) = a * AliasCs(j) - b * AliasCa(j)
        xr(d) = b * AliasCs(j) + a * AliasCa(j)
        j += 1
      }
      sb += 1
    }
  }

  /** 576 lines -> 18×32 subband samples (time-major), with per-subband
    * overlap-add state and frequency inversion.
    */
  private def imdctGranule(xr: Array[Double],
      overlap: Array[Double]): Array[Double] = {
    val sub = new Array[Double](18 * 32) // t*32 + k
    var k = 0
    while (k < 32) {
      var i = 0
      while (i < 36) {
        var s = 0.0
        val row = CosImdct(i)
        var l = 0
        while (l < 18) { s += xr(k * 18 + l) * row(l); l += 1 }
        val w = s * MdctScale * Win36(i)
        if (i < 18) sub(i * 32 + k) = w + overlap(k * 18 + i)
        else overlap(k * 18 + (i - 18)) = w
        i += 1
      }
      k += 1
    }
    // frequency inversion: odd subbands, odd time slots
    var t = 1
    while (t < 18) {
      k = 1
      while (k < 32) { sub(t * 32 + k) = -sub(t * 32 + k); k += 2 }
      t += 2
    }
    sub
  }

  /** 18 polyphase blocks -> 576 PCM samples for channel c of granule gr,
    * written interleaved into framePcm.
    */
  private def synthGranule(sub: Array[Double], v: Array[Double],
      framePcm: Array[Double], c: Int, ch: Int, gr: Int): Unit = {
    val base = gr * 576
    var t = 0
    while (t < 18) {
      System.arraycopy(v, 0, v, 64, 960)
      var i = 0
      while (i < 64) {
        var s = 0.0
        val row = CosSynth(i)
        var k = 0
        while (k < 32) { s += row(k) * sub(t * 32 + k); k += 1 }
        v(i) = s
        i += 1
      }
      var j = 0
      while (j < 32) {
        var s = 0.0
        var bi = 0
        while (bi < 16) {
          val m = j + 32 * bi
          // ×16 balances the writer's /256 analysis scale (the solved
          // window was derived for /16); gain-invariant fingerprints are
          // unaffected for third-party streams
          val d = SynthesisWindow(m) * 16.0
          if (d != 0.0) {
            val half = bi >>> 1
            val q =
              if ((bi & 1) == 0) half * 128 + j
              else half * 128 + 96 + j
            s += d * v(q)
          }
          bi += 1
        }
        framePcm((base + t * 32 + j) * ch + c) = s
        j += 1
      }
      t += 1
    }
  }
}
