package graft.llmops

/** Constant tables for the MPEG-1 Layer III codec pair ([[Mp3]] decoder,
  * [[Mp3Writer]] encoder twin).
  *
  * ==Huffman tables==
  * Spectral Huffman codes transcribed from ISO/IEC 11172-3 Table B.7.
  * The build environment has no third-party MP3 implementation to
  * cross-check against (zero egress, no ffmpeg/LAME/mpg123 on disk), so
  * the shipped set is restricted to the tables that pass STRUCTURAL
  * validation — each must be a complete prefix code (Kraft sum exactly
  * 1, prefix-free, every code value consistent with its length; asserted
  * in Mp3Spec). Tables 1–3, 5–7, 9, 10 and the count1 tables A/B
  * validated on direct transcription. Table 8 required one length
  * correction ((x=1,y=5): len 8, not 10) found via the Kraft deficit and
  * the table's length symmetry; it is flagged here because that entry is
  * reconstructed rather than remembered. Tables 13, 15 and the linbits
  * escape families 16–23/24–31 (256-entry code books) could not be
  * transcribed with confidence and are NOT shipped: [[Mp3]] refuses
  * frames that select them (honest NULL, never a half-decode), and
  * [[Mp3Writer]] only emits the shipped subset. This bounds third-party
  * decode coverage (most LAME-encoded music selects the escape tables)
  * while keeping every shipped code path exercisable end-to-end by the
  * in-repo writer↔decoder contract.
  *
  * ==Synthesis window==
  * The polyphase prototype is NOT ISO Table B.3 (512 tabulated
  * constants, unavailable to transcribe): the analysis window is the
  * closed-form 64-tap MDCT sine window `sin(π(n+0.5)/64)/16`, and
  * [[synthesisWindow]] is its EXACT inverse under the ISO synthesis
  * machinery (V-buffer shift, 64-point matrixing, U interleave, 16-tap
  * window sum), solved offline as an overdetermined linear system over
  * impulse bases (residual 7e-15; round-trip 283 dB, re-asserted in
  * Mp3Spec). The solved window is a sine hump on [448,512) scaled by
  * ~1/cos(π/64) with a geometric boundary-phase tail (ratio tan²(π/128))
  * at positions ≡ 0,32 (mod 64); position 464 multiplies V[16], which is
  * identically zero (cos((16+16)(2k+1)π/64) = 0 ∀k), so its coefficient
  * is immaterial. Consequence: in-repo encode→decode is perfect
  * reconstruction (quantization is the only loss); third-party streams
  * synthesize through a shorter window than ISO's 512-tap prototype —
  * fingerprint-grade, not playback-grade, reconstruction, stated
  * honestly. Reference ingest surface this backs:
  * aje_libs/documents/helpers/document_processor.py:10-83 (binary media
  * hooks).
  */
private[llmops] object Mp3Tables {

  /** kbps by bitrate index (MPEG-1 Layer III); 0 and 15 invalid. */
  val Bitrates: Array[Int] =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** Sample rate by index; 3 reserved. */
  val Rates: Array[Int] = Array(44100, 48000, 32000)

  /** Long-block scalefactor band boundaries (23 entries, 22 bands) per
    * sample-rate index, ISO Table B.2. Used for region partitioning and
    * per-band scalefactor application.
    */
  val SfbLong: Array[Array[Int]] = Array(
    Array(0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90, 110, 134,
      162, 196, 238, 288, 342, 418, 576), // 44100
    Array(0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88, 106, 128,
      156, 190, 230, 276, 330, 384, 576), // 48000
    Array(0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102, 126, 156,
      194, 240, 296, 364, 448, 550, 576)) // 32000

  /** scalefac_compress → (slen1 for bands 0–10, slen2 for bands 11–20). */
  val Slen: Array[(Int, Int)] = Array(
    (0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
    (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3))

  /** Pretab (preflag boost per long band), ISO Table B.6. */
  val Pretab: Array[Int] =
    Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3, 2, 0)

  /** Alias-reduction butterflies, ISO Table B.8: cs/ca from the eight ci. */
  val AliasCs: Array[Double] = new Array[Double](8)
  val AliasCa: Array[Double] = new Array[Double](8)
  locally {
    val ci = Array(-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037)
    var j = 0
    while (j < 8) {
      val n = math.sqrt(1.0 + ci(j) * ci(j))
      AliasCs(j) = 1.0 / n
      AliasCa(j) = ci(j) / n
      j += 1
    }
  }

  /** One spectral Huffman table: `xy(code) = (x<<4)|y`, parallel length
    * array, plus encode maps. `maxXY` is the table's alphabet bound.
    */
  final class Huff(val id: Int, val maxXY: Int,
      entries: Array[(Int, Int, Int, Int)]) { // (x, y, len, code)
    val maxLen: Int = entries.map(_._3).max
    // dense decode LUT: top `maxLen` bits → (symbol<<8 | len)
    val lut: Array[Int] = {
      val a = new Array[Int](1 << maxLen)
      java.util.Arrays.fill(a, -1)
      for ((x, y, l, c) <- entries) {
        val shift = maxLen - l
        val base = c << shift
        var i = 0
        while (i < (1 << shift)) {
          a(base | i) = ((x << 4 | y) << 8) | l
          i += 1
        }
      }
      a
    }
    // encode: (x<<4|y) → code, len
    val encCode: Array[Int] = new Array[Int](256)
    val encLen: Array[Int] = new Array[Int](256)
    for ((x, y, l, c) <- entries) {
      encCode(x << 4 | y) = c
      encLen(x << 4 | y) = l
    }
    def kraftExact: Boolean = {
      var sum = 0L // in units of 2^-32
      for ((_, _, l, _) <- entries) sum += 1L << (32 - l)
      sum == (1L << 32)
    }
    def entryList: Seq[(Int, Int, Int, Int)] = entries.toSeq
  }

  private def huff(id: Int, maxXY: Int, spec: String): Huff = {
    val es = spec.trim.split("\n").map { line =>
      val Array(x, y, c) = line.trim.split("\\s+")
      (x.toInt, y.toInt, c.length, java.lang.Integer.parseInt(c, 2))
    }
    new Huff(id, maxXY, es)
  }

  val H1: Huff = huff(1, 1, """
    0 0 1
    0 1 001
    1 0 01
    1 1 000""")

  val H2: Huff = huff(2, 2, """
    0 0 1
    0 1 010
    0 2 000001
    1 0 011
    1 1 001
    1 2 00001
    2 0 00011
    2 1 00010
    2 2 000000""")

  val H3: Huff = huff(3, 2, """
    0 0 11
    0 1 10
    0 2 000001
    1 0 001
    1 1 01
    1 2 00001
    2 0 00011
    2 1 00010
    2 2 000000""")

  val H5: Huff = huff(5, 3, """
    0 0 1
    0 1 010
    0 2 000110
    0 3 0000101
    1 0 011
    1 1 001
    1 2 000100
    1 3 0000100
    2 0 000111
    2 1 000101
    2 2 0000111
    2 3 00000001
    3 0 0000110
    3 1 000001
    3 2 0000001
    3 3 00000000""")

  val H6: Huff = huff(6, 3, """
    0 0 111
    0 1 011
    0 2 00101
    0 3 0000001
    1 0 110
    1 1 10
    1 2 0011
    1 3 00010
    2 0 0101
    2 1 0100
    2 2 00100
    2 3 000001
    3 0 000011
    3 1 00011
    3 2 000010
    3 3 0000000""")

  val H7: Huff = huff(7, 5, """
    0 0 1
    0 1 010
    0 2 001010
    0 3 00010011
    0 4 00010000
    0 5 000001010
    1 0 011
    1 1 0011
    1 2 000111
    1 3 0001010
    1 4 0000101
    1 5 00000011
    2 0 001011
    2 1 00100
    2 2 0001101
    2 3 00010001
    2 4 00001000
    2 5 000000100
    3 0 0001100
    3 1 0001011
    3 2 00010010
    3 3 000001111
    3 4 000001011
    3 5 000000010
    4 0 0000111
    4 1 0000110
    4 2 00001001
    4 3 000001110
    4 4 000000011
    4 5 0000000001
    5 0 00000110
    5 1 00000100
    5 2 000000101
    5 3 0000000011
    5 4 0000000010
    5 5 0000000000""")

  val H8: Huff = huff(8, 5, """
    0 0 11
    0 1 100
    0 2 000110
    0 3 00010010
    0 4 00001100
    0 5 000000101
    1 0 101
    1 1 01
    1 2 0010
    1 3 00010000
    1 4 00001001
    1 5 00000011
    2 0 000111
    2 1 0011
    2 2 000101
    2 3 00001110
    2 4 00000111
    2 5 000000011
    3 0 00010011
    3 1 00010001
    3 2 00001111
    3 3 000001101
    3 4 000001010
    3 5 0000000100
    4 0 00001101
    4 1 0000101
    4 2 00001000
    4 3 000001011
    4 4 0000000101
    4 5 0000000001
    5 0 000001100
    5 1 00000100
    5 2 000000100
    5 3 000000001
    5 4 00000000001
    5 5 00000000000""")

  val H9: Huff = huff(9, 5, """
    0 0 111
    0 1 101
    0 2 01001
    0 3 001110
    0 4 00001111
    0 5 000000111
    1 0 110
    1 1 100
    1 2 0101
    1 3 00101
    1 4 000110
    1 5 00000111
    2 0 0111
    2 1 0110
    2 2 01000
    2 3 001000
    2 4 0001000
    2 5 00000101
    3 0 001111
    3 1 00110
    3 2 001001
    3 3 0001010
    3 4 0000101
    3 5 00000001
    4 0 0001011
    4 1 000111
    4 2 0001001
    4 3 0000110
    4 4 00000100
    4 5 000000001
    5 0 00001110
    5 1 0000100
    5 2 00000110
    5 3 00000010
    5 4 000000110
    5 5 000000000""")

  val H10: Huff = huff(10, 7, """
    0 0 1
    0 1 010
    0 2 001010
    0 3 00010111
    0 4 000100011
    0 5 000011110
    0 6 000001100
    0 7 0000010001
    1 0 011
    1 1 0011
    1 2 001000
    1 3 0001100
    1 4 00010010
    1 5 000010101
    1 6 00001100
    1 7 00000111
    2 0 001011
    2 1 001001
    2 2 0001111
    2 3 00010101
    2 4 000100000
    2 5 0000101000
    2 6 000010011
    2 7 000000110
    3 0 0001110
    3 1 0001101
    3 2 00010110
    3 3 000100010
    3 4 0000101110
    3 5 0000010111
    3 6 000010010
    3 7 0000000111
    4 0 00010100
    4 1 00010011
    4 2 000100001
    4 3 0000101111
    4 4 0000011011
    4 5 0000010110
    4 6 0000001001
    4 7 0000000011
    5 0 000011111
    5 1 000010110
    5 2 0000101001
    5 3 0000011010
    5 4 00000010101
    5 5 00000010100
    5 6 0000000101
    5 7 00000000011
    6 0 00001110
    6 1 00001101
    6 2 000001010
    6 3 0000001011
    6 4 0000010000
    6 5 0000000110
    6 6 00000000101
    6 7 00000000001
    7 0 000001001
    7 1 00001000
    7 2 000000111
    7 3 0000001000
    7 4 0000000100
    7 5 00000000100
    7 6 00000000010
    7 7 00000000000""")

  /** Count1 table A (quadruple v,w,x,y; symbol index = v<<3|w<<2|x<<1|y). */
  val HA: Huff = huff(32, 15, """
    0 0 1
    0 1 0101
    0 2 0100
    0 3 00101
    0 4 0110
    0 5 000101
    0 6 00100
    0 7 000100
    0 8 0111
    0 9 00011
    0 10 00110
    0 11 000000
    0 12 00111
    0 13 000010
    0 14 000011
    0 15 000001""")

  /** Count1 table B: 4-bit complement codes. */
  val HB: Huff = new Huff(33, 15,
    (0 to 15).map(v => (0, v, 4, 15 - v)).toArray)

  /** table_select → Huff (null = unsupported, frame refused). Index 0 is
    * the all-zero table (no bits read).
    */
  val BigTables: Array[Huff] = {
    val a = new Array[Huff](32)
    a(1) = H1; a(2) = H2; a(3) = H3; a(5) = H5; a(6) = H6
    a(7) = H7; a(8) = H8; a(9) = H9; a(10) = H10
    a
  }

  /** Encoder's table choice for a region's max |value| (all shipped,
    * smallest alphabet that fits). Returns 0 when the region is silent.
    */
  def tableFor(maxAbs: Int): Int = maxAbs match {
    case 0 => 0
    case 1 => 1
    case 2 => 2
    case 3 => 5
    case 4 | 5 => 9
    case 6 | 7 => 10
    case _ => -1
  }

  /** MDCT sine windows. */
  val Win36: Array[Double] =
    Array.tabulate(36)(i => math.sin(math.Pi * (i + 0.5) / 36))
  val Win64: Array[Double] =
    Array.tabulate(64)(i => math.sin(math.Pi * (i + 0.5) / 64))

  /** 36×18 IMDCT basis cos(π/72·(2i+1+18)(2k+1)). */
  val CosImdct: Array[Array[Double]] =
    Array.tabulate(36, 18)((i, k) =>
      math.cos(math.Pi / 72.0 * (2 * i + 1 + 18) * (2 * k + 1)))

  /** Inverse-MDCT scale making the windowed overlap-add chain unity. */
  val MdctScale: Double = 1.0 / 9.0

  /** Synthesis matrixing cos((16+i)(2k+1)π/64), i<64, k<32. */
  val CosSynth: Array[Array[Double]] =
    Array.tabulate(64, 32)((i, k) =>
      math.cos((16 + i) * (2 * k + 1) * math.Pi / 64.0))

  /** Analysis matrixing cos((2k+1)(i−16)π/64), k<32, i<64. */
  val CosAna: Array[Array[Double]] =
    Array.tabulate(32, 64)((k, i) =>
      math.cos((2 * k + 1) * (i - 16) * math.Pi / 64.0))

  /** Exact inverse synthesis window (see class doc): sparse solved
    * constants over a 512 array; all other positions are zero.
    */
  val SynthesisWindow: Array[Double] = {
    val d = new Array[Double](512)
    val pairs: Array[(Int, Double)] = Array(
      (416, -6.028164044768469e-4),
      (448, -0.024556017922419432),
      (449, -0.07365328220371414),
      (450, -0.12255830204144379),
      (451, -0.17116806819471764),
      (452, -0.2193654754791564),
      (453, -0.2670344121190217),
      (454, -0.3140600394706388),
      (455, -0.3603290686787576),
      (456, -0.40573003359933757),
      (457, -0.4501535593312179),
      (458, -0.4934926257098765),
      (459, -0.5356428251283488),
      (460, -0.5765026140643189),
      (461, -0.6159735577073429),
      (462, -0.6539605670969353),
      (463, -0.6903721282002132),
      (465, -0.7581220377027162),
      (466, -0.7892971706357682),
      (467, -0.8185708175504904),
      (468, -0.8458724556673939),
      (469, -0.8711363129489236),
      (470, -0.8943015265500305),
      (471, -0.9153122894421084),
      (472, -0.9341179848570366),
      (473, -0.9506733082273717),
      (474, -0.9649383763290365),
      (475, -0.9768788233635095),
      (476, -0.9864658837480187),
      (477, -0.9936764614143738),
      (478, -0.9984931854494012),
      (479, -1.0009044519430097),
      (480, -1.0003012720413036),
      (481, -0.9984931854493996),
      (482, -0.9936764614143723),
      (483, -0.9864658837480174),
      (484, -0.9768788233635093),
      (485, -0.9649383763290369),
      (486, -0.9506733082273702),
      (487, -0.9341179848570309),
      (488, -0.9153122894421092),
      (489, -0.8943015265500236),
      (490, -0.8711363129489219),
      (491, -0.8458724556673958),
      (492, -0.8185708175504919),
      (493, -0.7892971706357711),
      (494, -0.7581220377027192),
      (495, -0.7251205223772003),
      (496, -0.6903721282002114),
      (497, -0.6539605670969335),
      (498, -0.6159735577073407),
      (499, -0.5765026140643182),
      (500, -0.5356428251283492),
      (501, -0.49349262570987734),
      (502, -0.45015355933122003),
      (503, -0.4057300335993368),
      (504, -0.3603290686787598),
      (505, -0.31406003947063676),
      (506, -0.26703441211902046),
      (507, -0.21936547547916044),
      (508, -0.17116806819471342),
      (509, -0.1225583020414453),
      (510, -0.07365328220371459),
      (511, -0.024570825157888693),
      // geometric boundary-phase tail (ratio ~tan²(π/128)); terms below
      // 1e-7 kept for bit-stable 283 dB reconstruction in the spec
      (384, -1.479831211378263e-5),
      (352, -3.632781719331568e-7),
      (320, -8.917978577827057e-9),
      (288, -2.189234939165008e-10),
      (256, -5.375200284873927e-12),
      (224, -1.3229695117189522e-13))
    pairs.foreach { case (i, v) => d(i) = v }
    d
  }
}
