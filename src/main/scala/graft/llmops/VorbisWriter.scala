package graft.llmops

/** Ogg Vorbis writer twin of [[Vorbis]] — a spec-shaped encoder from
  * closed-form inputs: every byte derivable without clocks or
  * randomness, so fixtures can be replayed by an external oracle and
  * the WAV↔Ogg twin gate can demand envelope-hash equality rather
  * than "close".
  *
  * Encoding profile (all structures fully declared in the setup
  * header and decoded by the generic [[Vorbis]] machinery — nothing
  * here shortcuts the decoder):
  *   - blocksizes 256/256 (one mode, long windows only);
  *   - floor 1, zero partitions, flat at amplitude 1.0 (Y=255,
  *     multiplier 1) — the spectrum IS the residue;
  *   - residue type 1, partition size 8, two classes with a 1-bit
  *     classbook (class 0 = a TWO-PASS cascade through 256-level
  *     uniform scalar codebooks — coarse step 1/32 on [-4, 3.96875],
  *     fine step 1/8192 over the coarse residual; class 1 unused);
  *   - no coupling, one mapping, one submap.
  * The cascade leaves reconstruction within ~0.1% of the input
  * (time-domain error accumulates across n/2 coefficients, which is
  * why one 8-bit pass is not enough); this writer optimizes
  * verifiability, not bitrate.
  */
object VorbisWriter {

  private val N = 256
  private val N2 = N / 2
  // two-pass cascade quantizer, all bounds dyadic (float32-pack exactly):
  // coarse 256 levels on [-4, 3.96875] step 1/32, then a fine pass over
  // the coarse residual [-1/64, ~1/64] at step 1/8192 — time-domain
  // reconstruction error accumulates across n/2 coefficients, so the
  // fine pass is what keeps decode(encode(x)) inside ~0.1% of x
  private val QMin = -4.0
  private val QDelta = 1.0 / 32.0
  private val FMin = -1.0 / 64.0
  private val FDelta = 1.0 / 8192.0
  // coupled profile: the angle channel spans twice the coefficient
  // range (|a| <= |M| + |A|), so its cascade is twice as wide
  private val WMin = -8.0
  private val WDelta = 1.0 / 16.0
  private val GMin = -1.0 / 32.0
  private val GDelta = 1.0 / 4096.0

  // ------------------------------------------------- LSb-first writer

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def write(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) {
        cur |= ((v >> i) & 1) << nBits
        nBits += 1
        if (nBits == 8) { out.write(cur); cur = 0; nBits = 0 }
        i += 1
      }
    }
    def write32(v: Long): Unit = {
      write((v & 0xFFFF).toInt, 16)
      write(((v >> 16) & 0xFFFF).toInt, 16)
    }
    /** MSb-first codeword emission (Huffman codes enter the decode
      * tree top bit first).
      */
    def writeCode(code: Long, len: Int): Unit = {
      var d = len - 1
      while (d >= 0) {
        write(((code >>> d) & 1L).toInt, 1)
        d -= 1
      }
    }
    def bytes: Array[Byte] = {
      if (nBits > 0) { out.write(cur); cur = 0; nBits = 0 }
      out.toByteArray
    }
  }

  /** The spec's 21-bit-mantissa float pack; QMin/QDelta are dyadic so
    * the round trip is exact.
    */
  private def float32Pack(v: Double): Long = {
    if (v == 0.0) return 0L
    val sign = if (v < 0) 0x80000000L else 0L
    var m = math.abs(v)
    var e = 788
    while (m < (1 << 20) && e > 0) { m *= 2; e -= 1 }
    while (m >= (1 << 21)) { m /= 2; e += 1 }
    sign | (e.toLong << 21) | math.round(m)
  }

  // --------------------------------------------------------- headers

  private def commonHeader(packetType: Int, bw: BitWriter): Unit = {
    bw.write(packetType, 8)
    "vorbis".foreach(c => bw.write(c.toInt, 8))
  }

  private def identPacket(channels: Int, rate: Int,
      bs0exp: Int = 8, bs1exp: Int = 8): Array[Byte] = {
    val bw = new BitWriter
    commonHeader(1, bw)
    bw.write32(0) // version
    bw.write(channels, 8)
    bw.write32(rate.toLong & 0xFFFFFFFFL)
    bw.write32(0); bw.write32(0); bw.write32(0) // bitrates
    bw.write(bs0exp, 4)
    bw.write(bs1exp, 4)
    bw.write(1, 1) // framing
    bw.bytes
  }

  private def commentPacket(): Array[Byte] = {
    val bw = new BitWriter
    commonHeader(3, bw)
    val vendor = "graft"
    bw.write32(vendor.length.toLong)
    vendor.foreach(c => bw.write(c.toInt, 8))
    bw.write32(0) // no user comments
    bw.write(1, 1) // framing
    bw.bytes
  }

  /** `coupled` swaps the residue to type 2 over the channel-interleaved
    * vector with one square-polar coupling step (magnitude ch 0, angle
    * ch 1) and widens the cascade books — the setup shape real stereo
    * encoders emit, exercising the decoder's residue-2 + coupling
    * machinery end-to-end.
    */
  private def setupPacket(channels: Int, coupled: Boolean): Array[Byte] = {
    val qMin = if (coupled) WMin else QMin
    val qDelta = if (coupled) WDelta else QDelta
    val fMin = if (coupled) GMin else FMin
    val fDelta = if (coupled) GDelta else FDelta
    val resEnd = if (coupled) channels * N2 else N2
    val bw = new BitWriter
    commonHeader(5, bw)
    bw.write(2, 8) // codebook_count - 1 = 2 -> three books
    // ---- book 0: residue classbook, dim 1, entries {0,1}, 1-bit codes
    bw.write(0x564342, 24)
    bw.write(1, 16) // dims
    bw.write(2, 24) // entries
    bw.write(0, 1) // unordered
    bw.write(0, 1) // not sparse
    bw.write(0, 5) // entry 0: length 1
    bw.write(0, 5) // entry 1: length 1
    bw.write(0, 4) // lookup type 0
    // ---- book 1: 256-level uniform scalar quantizer, dim 1, 8-bit codes
    bw.write(0x564342, 24)
    bw.write(1, 16)
    bw.write(256, 24)
    bw.write(0, 1)
    bw.write(0, 1)
    var e = 0
    while (e < 256) { bw.write(7, 5); e += 1 } // all length 8
    bw.write(1, 4) // lookup type 1 (implicit lattice)
    bw.write32(float32Pack(qMin))
    bw.write32(float32Pack(qDelta))
    bw.write(7, 4) // value_bits - 1 = 7
    bw.write(0, 1) // sequence_p
    e = 0
    while (e < 256) { bw.write(e, 8); e += 1 } // multiplicands 0..255
    // ---- book 2: fine pass — same shape, step 1/8192 on [-1/64, +)
    bw.write(0x564342, 24)
    bw.write(1, 16)
    bw.write(256, 24)
    bw.write(0, 1)
    bw.write(0, 1)
    e = 0
    while (e < 256) { bw.write(7, 5); e += 1 }
    bw.write(1, 4)
    bw.write32(float32Pack(fMin))
    bw.write32(float32Pack(fDelta))
    bw.write(7, 4)
    bw.write(0, 1)
    e = 0
    while (e < 256) { bw.write(e, 8); e += 1 }
    // ---- time transforms: one zero placeholder
    bw.write(0, 6)
    bw.write(0, 16)
    // ---- floors: one, type 1, zero partitions, flat-capable
    bw.write(0, 6) // floor_count - 1
    bw.write(1, 16) // floor type 1
    bw.write(0, 5) // partitions = 0
    bw.write(0, 2) // multiplier - 1 = 0 -> 1
    bw.write(8, 4) // rangebits: X list = [0, 256]
    // ---- residues: one (type 1 uncoupled, type 2 coupled)
    bw.write(0, 6)
    bw.write(if (coupled) 2 else 1, 16) // residue type
    bw.write(0, 24) // begin
    bw.write(resEnd, 24) // end (type 2: over the interleaved vector)
    bw.write(7, 24) // partition_size - 1 -> 8
    bw.write(1, 6) // classifications - 1 -> 2
    bw.write(0, 8) // classbook = book 0
    bw.write(3, 3); bw.write(0, 1) // class 0 cascade: passes 0 and 1
    bw.write(0, 3); bw.write(0, 1) // class 1 cascade: no passes
    bw.write(1, 8) // class 0 pass 0 -> book 1 (coarse)
    bw.write(2, 8) // class 0 pass 1 -> book 2 (fine)
    // ---- mappings: one, type 0, 1 submap
    bw.write(0, 6)
    bw.write(0, 16) // mapping type
    bw.write(0, 1) // no submap count field -> 1 submap
    if (coupled) {
      bw.write(1, 1) // coupling present
      bw.write(0, 8) // steps - 1 = 0 -> one step
      bw.write(0, 1) // magnitude = channel 0 (ilog(ch-1) bits)
      bw.write(1, 1) // angle = channel 1
    } else bw.write(0, 1) // no coupling steps
    bw.write(0, 2) // reserved
    bw.write(0, 8) // time configuration placeholder
    bw.write(0, 8) // floor 0
    bw.write(0, 8) // residue 0
    // ---- modes: one, short blocks
    bw.write(0, 6)
    bw.write(0, 1) // blockflag
    bw.write(0, 16) // window type
    bw.write(0, 16) // transform type
    bw.write(0, 8) // mapping
    bw.write(1, 1) // framing
    bw.bytes
  }

  // ------------------------------------------------------------ audio

  private lazy val Window: Array[Double] = Array.tabulate(N) { i =>
    val s = math.sin(math.Pi / 2.0 * (i + 0.5) / N2)
    math.sin(math.Pi / 2.0 * s * s)
  }

  /** Forward MDCT scaled so the decoder's unnormalized inverse plus
    * power-complementary windowing reconstructs: X(k) = (4/n) *
    * sum_i w(i) x(i) cos(2pi/n (i + 0.5 + n/4)(k + 0.5)).
    */
  private def mdct(x: Array[Double]): Array[Double] = {
    val out = new Array[Double](N2)
    val base = math.Pi * 2.0 / N
    var k = 0
    while (k < N2) {
      var acc = 0.0
      var i = 0
      while (i < N) {
        acc += Window(i) * x(i) *
          math.cos(base * (i + 0.5 + N2 / 2.0) * (k + 0.5))
        i += 1
      }
      out(k) = acc * 4.0 / N
      k += 1
    }
    out
  }

  /** Square-polar FORWARD coupling — the exact inverse of the
    * decoder's unmixing: the larger-magnitude member becomes the
    * magnitude value, the signed difference the angle value.
    */
  private def couple(mv: Double, av: Double): (Double, Double) = {
    val m = if (math.abs(mv) >= math.abs(av)) mv else av
    val a = if (m > 0) mv - av else av - mv
    (m, a)
  }

  private def audioPacket(frame: Array[Array[Double]],
      coupled: Boolean): Array[Byte] = {
    val ch = frame.length
    val bw = new BitWriter
    bw.write(0, 1) // audio packet
    // mode number: ilog(0) = 0 bits; blockflag 0: no window flags
    var j = 0
    while (j < ch) { // flat unity floor per channel
      bw.write(1, 1) // nonzero
      bw.write(255, 8) // Y0
      bw.write(255, 8) // Y1
      j += 1
    }
    // Pass structure is the decoder's OUTER loop: pass 0 sweeps every
    // partition (classwords + coarse codes), then pass 1 sweeps again
    // (fine codes, no classwords).
    val spectra = frame.map(mdct)
    if (!coupled) {
      // residue type 1, per-channel vectors, 16 partitions each
      val q = spectra.map(_.map { v =>
        val qi = math.round((v - QMin) / QDelta).toInt
        if (qi < 0) 0 else if (qi > 255) 255 else qi
      })
      val fine = Array.tabulate(ch, N2) { (j, k) =>
        val r = spectra(j)(k) - (QMin + q(j)(k) * QDelta)
        val fi = math.round((r - FMin) / FDelta).toInt
        if (fi < 0) 0 else if (fi > 255) 255 else fi
      }
      var part = 0
      while (part < N2 / 8) { // pass 0
        j = 0
        while (j < ch) { bw.write(0, 1); j += 1 } // class 0 (codeword 0)
        j = 0
        while (j < ch) {
          var i = 0
          while (i < 8) {
            // uniform 8-bit canonical codes: codeword == entry number
            bw.writeCode(q(j)(part * 8 + i).toLong, 8)
            i += 1
          }
          j += 1
        }
        part += 1
      }
      part = 0
      while (part < N2 / 8) { // pass 1
        j = 0
        while (j < ch) {
          var i = 0
          while (i < 8) {
            bw.writeCode(fine(j)(part * 8 + i).toLong, 8)
            i += 1
          }
          j += 1
        }
        part += 1
      }
    } else {
      // residue type 2: forward-couple ch0/ch1 per coefficient, then
      // ONE interleaved vector of ch*N2 values; one classword per
      // partition (nVec = 1 in the decoder's loop)
      val vec = new Array[Double](ch * N2)
      var k = 0
      while (k < N2) {
        val (m, a) = couple(spectra(0)(k), spectra(1)(k))
        vec(k * ch) = m
        vec(k * ch + 1) = a
        k += 1
      }
      val q = vec.map { v =>
        val qi = math.round((v - WMin) / WDelta).toInt
        if (qi < 0) 0 else if (qi > 255) 255 else qi
      }
      val fine = Array.tabulate(ch * N2) { i =>
        val r = vec(i) - (WMin + q(i) * WDelta)
        val fi = math.round((r - GMin) / GDelta).toInt
        if (fi < 0) 0 else if (fi > 255) 255 else fi
      }
      val parts = ch * N2 / 8
      var part = 0
      while (part < parts) { // pass 0
        bw.write(0, 1) // one classword for the single interleaved vector
        var i = 0
        while (i < 8) { bw.writeCode(q(part * 8 + i).toLong, 8); i += 1 }
        part += 1
      }
      part = 0
      while (part < parts) { // pass 1
        var i = 0
        while (i < 8) { bw.writeCode(fine(part * 8 + i).toLong, 8); i += 1 }
        part += 1
      }
    }
    bw.bytes
  }

  // ---------------------------------------------- mixed-blocksize arm

  private val NL = 2048 // long blocksize of the mixed profile
  private val NL2 = NL / 2

  /** Vorbis window for block size n with transition slopes: slope
    * lengths follow the neighbors exactly as the decoder builds them
    * (short blocks always full slopes; a long block shrinks the slope
    * facing a short neighbor to bs0/2).
    */
  private def windowFor(n: Int, leftN: Int, rightN: Int): Array[Double] = {
    val leftStart = n / 4 - leftN / 2
    val rightStart = n - n / 4 - rightN / 2
    Array.tabulate(n) { i =>
      if (i < leftStart) 0.0
      else if (i < leftStart + leftN) {
        val sl = math.sin(math.Pi / 2.0 * (i - leftStart + 0.5) / leftN)
        math.sin(math.Pi / 2.0 * sl * sl)
      } else if (i < rightStart) 1.0
      else if (i < rightStart + rightN) {
        val j = rightN - 1 - (i - rightStart)
        val sl = math.sin(math.Pi / 2.0 * (j + 0.5) / rightN)
        math.sin(math.Pi / 2.0 * sl * sl)
      } else 0.0
    }
  }

  private def mdctG(x: Array[Double], n: Int,
      w: Array[Double]): Array[Double] = {
    val n2 = n / 2
    val out = new Array[Double](n2)
    val base = math.Pi * 2.0 / n
    var k = 0
    while (k < n2) {
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += w(i) * x(i) * math.cos(base * (i + 0.5 + n2 / 2.0) * (k + 0.5))
        i += 1
      }
      out(k) = acc * 4.0 / n
      k += 1
    }
    out
  }

  /** Audio packet of the mixed profile: 1-bit mode number (0 short /
    * 1 long), prev/next window flags on long blocks, flat floors, then
    * residue type 1 clamped to min(residue_end, n/2) exactly as the
    * decoder clamps.
    */
  private def audioPacketMixed(frame: Array[Array[Double]], n: Int,
      prevLong: Boolean, nextLong: Boolean,
      w: Array[Double]): Array[Byte] = {
    val ch = frame.length
    val n2 = n / 2
    val bw = new BitWriter
    bw.write(0, 1) // audio packet
    bw.write(if (n == NL) 1 else 0, 1) // mode number (2 modes -> 1 bit)
    if (n == NL) {
      bw.write(if (prevLong) 1 else 0, 1)
      bw.write(if (nextLong) 1 else 0, 1)
    }
    var j = 0
    while (j < ch) { // flat unity floor per channel
      bw.write(1, 1)
      bw.write(255, 8)
      bw.write(255, 8)
      j += 1
    }
    val spectra = frame.map(mdctG(_, n, w))
    val actualEnd = math.min(NL2, n2) // decoder clamps residue_end to n/2
    val q = spectra.map(_.map { v =>
      val qi = math.round((v - QMin) / QDelta).toInt
      if (qi < 0) 0 else if (qi > 255) 255 else qi
    })
    val fine = Array.tabulate(ch, n2) { (jj, k) =>
      val r = spectra(jj)(k) - (QMin + q(jj)(k) * QDelta)
      val fi = math.round((r - FMin) / FDelta).toInt
      if (fi < 0) 0 else if (fi > 255) 255 else fi
    }
    var part = 0
    while (part < actualEnd / 8) { // pass 0
      j = 0
      while (j < ch) { bw.write(0, 1); j += 1 }
      j = 0
      while (j < ch) {
        var i = 0
        while (i < 8) { bw.writeCode(q(j)(part * 8 + i).toLong, 8); i += 1 }
        j += 1
      }
      part += 1
    }
    part = 0
    while (part < actualEnd / 8) { // pass 1
      j = 0
      while (j < ch) {
        var i = 0
        while (i < 8) { bw.writeCode(fine(j)(part * 8 + i).toLong, 8); i += 1 }
        j += 1
      }
      part += 1
    }
    bw.bytes
  }

  /** Setup for the mixed profile: the uncoupled books, residue end at
    * the LONG spectrum size (the decoder clamps per block), and TWO
    * modes — short (blockflag 0) and long (blockflag 1).
    */
  private def setupPacketMixed(): Array[Byte] = {
    val bw = new BitWriter
    commonHeader(5, bw)
    bw.write(2, 8)
    // book 0: classbook
    bw.write(0x564342, 24); bw.write(1, 16); bw.write(2, 24)
    bw.write(0, 1); bw.write(0, 1); bw.write(0, 5); bw.write(0, 5)
    bw.write(0, 4)
    // book 1: coarse
    bw.write(0x564342, 24); bw.write(1, 16); bw.write(256, 24)
    bw.write(0, 1); bw.write(0, 1)
    var e = 0
    while (e < 256) { bw.write(7, 5); e += 1 }
    bw.write(1, 4)
    bw.write32(float32Pack(QMin)); bw.write32(float32Pack(QDelta))
    bw.write(7, 4); bw.write(0, 1)
    e = 0
    while (e < 256) { bw.write(e, 8); e += 1 }
    // book 2: fine
    bw.write(0x564342, 24); bw.write(1, 16); bw.write(256, 24)
    bw.write(0, 1); bw.write(0, 1)
    e = 0
    while (e < 256) { bw.write(7, 5); e += 1 }
    bw.write(1, 4)
    bw.write32(float32Pack(FMin)); bw.write32(float32Pack(FDelta))
    bw.write(7, 4); bw.write(0, 1)
    e = 0
    while (e < 256) { bw.write(e, 8); e += 1 }
    // time transforms
    bw.write(0, 6); bw.write(0, 16)
    // floor 1, flat-capable
    bw.write(0, 6); bw.write(1, 16)
    bw.write(0, 5); bw.write(0, 2); bw.write(8, 4)
    // residue type 1, end = long n/2 (decoder clamps for short blocks)
    bw.write(0, 6)
    bw.write(1, 16)
    bw.write(0, 24)
    bw.write(NL2, 24)
    bw.write(7, 24)
    bw.write(1, 6)
    bw.write(0, 8)
    bw.write(3, 3); bw.write(0, 1)
    bw.write(0, 3); bw.write(0, 1)
    bw.write(1, 8)
    bw.write(2, 8)
    // one mapping
    bw.write(0, 6)
    bw.write(0, 16); bw.write(0, 1); bw.write(0, 1); bw.write(0, 2)
    bw.write(0, 8); bw.write(0, 8); bw.write(0, 8)
    // TWO modes: 0 = short, 1 = long
    bw.write(1, 6) // mode_count - 1
    bw.write(0, 1); bw.write(0, 16); bw.write(0, 16); bw.write(0, 8)
    bw.write(1, 1); bw.write(0, 16); bw.write(0, 16); bw.write(0, 8)
    bw.write(1, 1) // framing
    bw.bytes
  }

  /** Mixed-blocksize encode (256/2048): the block-size sequence cycles
    * short,long,long,short so every window transition (S->L, L->L,
    * L->S, S->S) appears, with the spec's lapping timeline: frame k's
    * window starts at out_k + n_(k-1)/4 - n_k/4 absolute samples and
    * each adjacent pair emits (n_(k-1)+n_k)/4. What real encoders emit
    * (unequal blocksizes with window flags) — this is the in-repo
    * validation of the decoder's transition windows and unequal
    * lapping.
    */
  def oggMixed(channels: Int, sampleRate: Int, samples: Array[Int],
      serial: Int = 0x6d697865): Array[Byte] = {
    require(channels >= 1 && channels <= 8)
    require(samples.length % channels == 0)
    val total = samples.length / channels
    def sizeOf(k: Int): Int =
      if (Seq(1, 2).contains(k % 4)) NL else N // S,L,L,S cycle
    def sample(ch: Int, t: Int): Double =
      if (t < 0 || t >= total) 0.0
      else samples(t * channels + ch) / 32768.0
    val out = new java.io.ByteArrayOutputStream()
    out.write(page(serial, 0, 0, 2,
      Seq(identPacket(channels, sampleRate, 8, 11))))
    out.write(page(serial, 1, 0, 0,
      Seq(commentPacket(), setupPacketMixed())))
    var seq = 2
    val pending = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var pendingLaces = 0
    var outAbs = 0L // samples emitted by all completed pairs
    var start = -(sizeOf(0).toLong / 2) // frame 0's window start
    var k = 0
    var granule = 0L
    var done = false
    while (!done) {
      val n = sizeOf(k)
      val w = windowFor(n,
        if (n == NL) math.min(sizeOf(k - 1), n) / 2 else n / 2,
        if (n == NL) math.min(sizeOf(k + 1), n) / 2 else n / 2)
      val base = start
      val frame = Array.tabulate(channels, n) { (j, i) =>
        sample(j, (base + i).toInt)
      }
      val p = audioPacketMixed(frame, n,
        prevLong = sizeOf(k - 1) == NL, nextLong = sizeOf(k + 1) == NL, w)
      val laces = p.length / 255 + 1
      if (pendingLaces + laces > 255) {
        out.write(page(serial, seq, granule, 0, pending.toSeq))
        seq += 1
        pending.clear()
        pendingLaces = 0
      }
      pending += p
      pendingLaces += laces
      if (k > 0) outAbs += (sizeOf(k - 1) + n) / 4
      granule = math.min(outAbs, total.toLong)
      // next frame's window start per the pair-emission timeline
      start = outAbs + sizeOf(k).toLong / 4 - sizeOf(k + 1).toLong / 4
      done = outAbs >= total
      k += 1
    }
    if (pending.nonEmpty)
      out.write(page(serial, seq, total.toLong, 4, pending.toSeq))
    out.toByteArray
  }

  // -------------------------------------------------------------- Ogg

  private def page(serial: Int, seq: Int, granule: Long, headerType: Int,
      packets: Seq[Array[Byte]]): Array[Byte] = {
    val laces = new java.io.ByteArrayOutputStream()
    val body = new java.io.ByteArrayOutputStream()
    packets.foreach { p =>
      var rem = p.length
      var off = 0
      while (rem >= 255) {
        laces.write(255)
        body.write(p, off, 255)
        off += 255
        rem -= 255
      }
      laces.write(rem)
      body.write(p, off, rem)
    }
    val laceBytes = laces.toByteArray
    require(laceBytes.length <= 255, "too many segments for one page")
    val head = new java.io.ByteArrayOutputStream()
    head.write("OggS".getBytes("US-ASCII"))
    head.write(0)
    head.write(headerType)
    var i = 0
    while (i < 8) { head.write(((granule >> (8 * i)) & 0xFF).toInt); i += 1 }
    i = 0
    while (i < 4) { head.write((serial >> (8 * i)) & 0xFF); i += 1 }
    i = 0
    while (i < 4) { head.write((seq >> (8 * i)) & 0xFF); i += 1 }
    head.write(new Array[Byte](4)) // CRC placeholder
    head.write(laceBytes.length)
    head.write(laceBytes)
    head.write(body.toByteArray)
    val bytes = head.toByteArray
    val c = Vorbis.crc(bytes, 0, bytes.length)
    bytes(22) = (c & 0xFF).toByte
    bytes(23) = ((c >> 8) & 0xFF).toByte
    bytes(24) = ((c >> 16) & 0xFF).toByte
    bytes(25) = ((c >> 24) & 0xFF).toByte
    bytes
  }

  /** Encode interleaved 16-bit samples as a complete Ogg Vorbis
    * stream. Output decodes (by [[Vorbis]] or any Vorbis I decoder)
    * to exactly `samples.length / channels` frames, the final page
    * granule trimming the lapping padding.
    */
  def ogg(channels: Int, sampleRate: Int, samples: Array[Int],
      serial: Int = 0x67726166, coupled: Boolean = false): Array[Byte] = {
    require(channels >= 1 && channels <= 8)
    require(!coupled || channels == 2, "coupling profile is stereo")
    require(samples.length % channels == 0)
    val total = samples.length / channels
    val padded = ((total + N2 - 1) / N2) * N2
    val nFrames = padded / N2 + 1
    def sample(ch: Int, t: Int): Double =
      if (t < 0 || t >= total) 0.0
      else samples(t * channels + ch) / 32768.0
    val out = new java.io.ByteArrayOutputStream()
    out.write(page(serial, 0, 0, 2, Seq(identPacket(channels, sampleRate))))
    out.write(page(serial, 1, 0, 0,
      Seq(commentPacket(), setupPacket(channels, coupled))))
    var seq = 2
    var f = 0
    val pending = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var pendingLaces = 0
    var granule = 0L
    while (f < nFrames) {
      val frame = Array.tabulate(channels, N) { (j, i) =>
        sample(j, f * N2 - N2 + i)
      }
      val p = audioPacket(frame, coupled)
      val laces = p.length / 255 + 1
      if (pendingLaces + laces > 255) {
        out.write(page(serial, seq, granule, 0, pending.toSeq))
        seq += 1
        pending.clear()
        pendingLaces = 0
      }
      pending += p
      pendingLaces += laces
      granule = math.min((f.toLong) * N2, total.toLong)
      f += 1
    }
    if (pending.nonEmpty)
      out.write(page(serial, seq, total.toLong, 4, pending.toSeq))
    else {
      // unreachable with nFrames >= 1, but keep EOS well-formed
      out.write(page(serial, seq, total.toLong, 4, Seq.empty))
    }
    out.toByteArray
  }
}
