package graft.llmops

import java.io.ByteArrayOutputStream

/** Baseline JPEG (ITU-T T.81 sequential DCT, Huffman) encoder — the
  * full-decode partner of [[graft.expressions.JpegPixels]] /
  * [[graft.expressions.JpegDHash]] exactly as [[ImageWriter.pngWithPixels]]
  * partners the PNG decoder: gate queries and specs build real JPEG
  * streams (FDCT, quantization, canonical Huffman entropy coding, byte
  * stuffing, optional restart intervals, 4:4:4 and 4:2:0 chroma
  * subsampling) with known content instead of shipping binary fixtures.
  *
  * The encoder deliberately shares nothing with the decoder — its own
  * DCT basis, zigzag table, and canonical-code builder — so a roundtrip
  * spec exercises two independent implementations of the format.
  *
  * Exactness contract used by the oracle gates: with the flat
  * [[JpegWriter.QFlat8]] quant table, a block-constant image (every 8×8
  * block one value, chroma constant per chroma block) quantizes to a
  * DC-only spectrum with DC = value − 128 EXACTLY (the DC basis gain is
  * 8, the quantizer divides by 8), so decode reproduces every pixel
  * bit-for-bit and an external SQL engine can recompute decoded pixels
  * from the closed-form pattern alone. Arbitrary-content images are
  * lossy as real JPEG is; specs bound that error instead.
  */
object JpegWriter {

  /** Flat quantizer of 8 — the exact-roundtrip table for block-constant
    * content (8 divides the DC gain of 8).
    */
  val QFlat8: Array[Int] = Array.fill(64)(8)

  /** Annex K Table K.1 luminance quantizer (natural order). */
  val StdLumQ: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Annex K Table K.2 chrominance quantizer (natural order). */
  val StdChromQ: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  private val Basis: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    c / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  // --- Huffman tables ---------------------------------------------------

  /** A declared table: the DHT wire form (bits, vals) plus the canonical
    * encode map symbol → (code, length) it implies.
    */
  private final class HuffSpec(val bits: Array[Int], val vals: Array[Int]) {
    val code = new Array[Int](256)
    val len = new Array[Int](256)
    locally {
      var c = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        var j = 0
        while (j < bits(l - 1)) {
          require(c < (1 << l), "huffman declaration overflows code space")
          code(vals(k)) = c
          len(vals(k)) = l
          c += 1
          k += 1
          j += 1
        }
        c <<= 1
        l += 1
      }
      require(k == vals.length, "bits/vals length mismatch")
    }
  }

  /** Uniform tables — every DC category at 5 bits, every AC symbol at
    * 9 bits (162 symbols < 511, so the all-ones code stays unused as
    * T.81 requires). Trivially valid, and deliberately different in
    * shape from the multi-length Annex K tables so decoders see both.
    */
  private val UniformDc = new HuffSpec(
    Array(0, 0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0),
    Array.tabulate(12)(identity))
  private val UniformAc = new HuffSpec(
    Array(0, 0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0),
    (Seq(0x00) ++ (for (r <- 0 to 15; s <- 1 to 10) yield (r << 4) | s) ++
      Seq(0xF0)).sorted.toArray)
  /** 12-bit (SOF1) tables: DC categories reach 15 and AC sizes 14, so
    * the uniform layout widens — 16 DC symbols at 5 bits, 226 AC
    * symbols (EOB + r/s for s ≤ 14 + ZRL) at 9 bits.
    */
  private val Ext12Dc = new HuffSpec(
    Array(0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0),
    Array.tabulate(16)(identity))
  private val Ext12Ac = new HuffSpec(
    Array(0, 0, 0, 0, 0, 0, 0, 0, 226, 0, 0, 0, 0, 0, 0, 0),
    (Seq(0x00) ++ (for (r <- 0 to 15; s <- 1 to 14) yield (r << 4) | s) ++
      Seq(0xF0)).sorted.toArray)

  /** AC table for the PROGRESSIVE writer: the uniform 9-bit layout plus
    * the EOBn symbols `(r << 4) | 0` for r = 1..14 that G.1.2.2 EOB-run
    * coding needs (baseline never emits them, so [[UniformAc]] omits
    * them and must stay unchanged — its code assignment is baked into
    * every baseline golden).
    */
  private val ProgAc = new HuffSpec(
    Array(0, 0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0),
    (Seq(0x00, 0xF0) ++ (1 to 14).map(_ << 4) ++
      (for (r <- 0 to 15; s <- 1 to 10) yield (r << 4) | s)).sorted.toArray)

  /** Annex K Table K.3 (luminance DC). */
  private val StdDc = new HuffSpec(
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
    Array.tabulate(12)(identity))

  /** Annex K Table K.5 (luminance AC). */
  private val StdAc = new HuffSpec(
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125),
    Array(
      0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
      0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
      0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
      0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
      0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
      0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
      0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
      0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
      0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
      0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
      0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
      0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
      0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
      0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
      0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
      0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
      0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
      0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
      0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
      0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
      0xF9, 0xFA))

  // --- bit-level entropy writer ----------------------------------------

  private final class BitWriter(out: ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0

    def put(code: Int, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc & 0xFF)
          if ((acc & 0xFF) == 0xFF) out.write(0x00) // byte stuffing
          acc = 0
          n = 0
        }
        i -= 1
      }
    }

    /** Pad to a byte boundary with 1-bits (T.81 F.1.2.3). */
    def flushPad(): Unit = if (n > 0) put((1 << (8 - n)) - 1, 8 - n)
  }

  private def category(v: Int): Int = {
    var a = math.abs(v)
    var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  // --- public entry points ----------------------------------------------

  /** Grayscale baseline JPEG from a pixel function `pix(x, y) ∈ [0,255]`.
    * `quant` is in natural order; `restartInterval` > 0 emits DRI + RSTn
    * markers every that many MCUs; `stdTables` switches the multi-length
    * Annex K Huffman tables in for the uniform ones.
    */
  def gray(width: Int, height: Int, pix: (Int, Int) => Int,
      quant: Array[Int] = QFlat8, restartInterval: Int = 0,
      stdTables: Boolean = false, orientation: Int = 0,
      exifBigEndian: Boolean = false): Array[Byte] =
    encode(width, height, Array(new Plane(width, height, 1, 1, pix)),
      Array(quant), Array(0), restartInterval, stdTables, orientation,
      exifBigEndian)

  /** 12-bit grayscale (SOF1 extended sequential — the DICOM-era
    * medical/scanner precision): samples 0..4095, level shift 2048,
    * widened Huffman tables (DC categories to 15, AC sizes to 14).
    * The engine's decoder normalizes the decode to 8-bit output
    * (v >> 4), matching every other pixel source's contract.
    */
  def gray12(width: Int, height: Int, pix: (Int, Int) => Int,
      quant: Array[Int] = QFlat8,
      restartInterval: Int = 0): Array[Byte] =
    encode(width, height,
      Array(new Plane(width, height, 1, 1, pix, maxVal = 4095)),
      Array(quant), Array(0), restartInterval, stdTables = false,
      precision = 12)

  /** Color baseline JPEG from per-plane functions in YCbCr. `sub` = 1
    * writes 4:4:4 (chroma full resolution); `sub` = 2 writes 4:2:0 —
    * chroma functions are then sampled at chroma resolution
    * (`ceil(width/2) × ceil(height/2)`). Luma quantizes through table 0,
    * chroma through table 1.
    */
  def color(width: Int, height: Int, yP: (Int, Int) => Int,
      cbP: (Int, Int) => Int, crP: (Int, Int) => Int, sub: Int = 1,
      lumQuant: Array[Int] = QFlat8, chromQuant: Array[Int] = QFlat8,
      restartInterval: Int = 0, stdTables: Boolean = false,
      orientation: Int = 0, exifBigEndian: Boolean = false): Array[Byte] = {
    require(sub == 1 || sub == 2, s"sub must be 1 or 2: $sub")
    val planes =
      if (sub == 1) Array(
        new Plane(width, height, 1, 1, yP),
        new Plane(width, height, 1, 1, cbP),
        new Plane(width, height, 1, 1, crP))
      else Array(
        new Plane(width, height, 2, 2, yP),
        new Plane((width + 1) / 2, (height + 1) / 2, 1, 1, cbP),
        new Plane((width + 1) / 2, (height + 1) / 2, 1, 1, crP))
    encode(width, height, planes, Array(lumQuant, chromQuant),
      Array(0, 1, 1), restartInterval, stdTables, orientation, exifBigEndian)
  }

  /** 4-component Adobe CMYK (`transform` 0) or YCCK (2) baseline JPEG.
    * Plane functions supply the STORED channel values (Adobe's
    * inverted-ink convention: 255 = no ink): for transform 0 they are
    * c', m', y', k' directly; for transform 2 the first three are
    * written through the forward YCbCr (so a decoder's inverse
    * recovers c'm'y' before compositing). All four components 1×1.
    */
  def cmyk(width: Int, height: Int, cP: (Int, Int) => Int,
      mP: (Int, Int) => Int, yP: (Int, Int) => Int, kP: (Int, Int) => Int,
      transform: Int = 0, quant: Array[Int] = QFlat8,
      restartInterval: Int = 0): Array[Byte] = {
    require(transform == 0 || transform == 2,
      s"Adobe transform must be 0 (CMYK) or 2 (YCCK): $transform")
    val planes =
      if (transform == 0) Array(
        new Plane(width, height, 1, 1, cP),
        new Plane(width, height, 1, 1, mP),
        new Plane(width, height, 1, 1, yP),
        new Plane(width, height, 1, 1, kP))
      else {
        def lum(x: Int, y: Int): Int = {
          val r = cP(x, y); val g = mP(x, y); val b = yP(x, y)
          ((19595 * r + 38470 * g + 7471 * b + 32768) >> 16)
        }
        def cb(x: Int, y: Int): Int = {
          val r = cP(x, y); val g = mP(x, y); val b = yP(x, y)
          val v = 128 + ((-11059 * r - 21709 * g + 32768 * b + 32768) >> 16)
          if (v < 0) 0 else if (v > 255) 255 else v
        }
        def cr(x: Int, y: Int): Int = {
          val r = cP(x, y); val g = mP(x, y); val b = yP(x, y)
          val v = 128 + ((32768 * r - 27439 * g - 5329 * b + 32768) >> 16)
          if (v < 0) 0 else if (v > 255) 255 else v
        }
        Array(
          new Plane(width, height, 1, 1, lum),
          new Plane(width, height, 1, 1, cb),
          new Plane(width, height, 1, 1, cr),
          new Plane(width, height, 1, 1, kP))
      }
    encode(width, height, planes, Array(quant, quant),
      Array(0, 1, 1, 1), restartInterval, stdTables = false,
      adobeTransform = transform)
  }

  /** One component at its own resolution with its MCU sampling factors;
    * reads outside the declared area replicate the nearest edge sample
    * (the standard block-padding choice — irrelevant to decoded output,
    * which is cropped, but it keeps edge blocks smooth).
    */
  private final class Plane(val w: Int, val h: Int, val sh: Int, val sv: Int,
      pix: (Int, Int) => Int, maxVal: Int = 255) {
    def at(x: Int, y: Int): Int = {
      val cx = if (x < 0) 0 else if (x >= w) w - 1 else x
      val cy = if (y < 0) 0 else if (y >= h) h - 1 else y
      val v = pix(cx, cy)
      require(v >= 0 && v <= maxVal, s"sample out of range: $v")
      v
    }
  }

  private def be16(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >> 8) & 0xFF)
    out.write(v & 0xFF)
  }

  private def segment(out: ByteArrayOutputStream, marker: Int,
      body: Array[Byte]): Unit = {
    out.write(0xFF)
    out.write(marker)
    be16(out, body.length + 2)
    out.write(body, 0, body.length)
  }

  private def encode(width: Int, height: Int, planes: Array[Plane],
      quants: Array[Array[Int]], compQ: Array[Int], restartInterval: Int,
      stdTables: Boolean, orientation: Int = 0,
      exifBigEndian: Boolean = false,
      adobeTransform: Int = -1, precision: Int = 8): Array[Byte] = {
    require(precision == 8 || precision == 12, s"precision $precision")
    require(width > 0 && height > 0, s"bad dims: ${width}x$height")
    require(orientation >= 0 && orientation <= 8,
      s"EXIF orientation must be 0 (none) or 1..8: $orientation")
    quants.foreach(q => require(q.length == 64 && q.forall(v => v >= 1 && v <= 65535)))
    val nc = planes.length
    val dc =
      if (precision == 12) Ext12Dc else if (stdTables) StdDc else UniformDc
    val ac =
      if (precision == 12) Ext12Ac else if (stdTables) StdAc else UniformAc
    val out = new ByteArrayOutputStream()
    out.write(0xFF); out.write(0xD8) // SOI
    // APP0 / JFIF 1.1, no density, no thumbnail
    segment(out, 0xE0, "JFIF".getBytes("US-ASCII") ++
      Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    if (orientation > 0) {
      // APP1 / Exif: TIFF header + one-entry IFD0 (tag 0x0112 SHORT)
      val tiff = new ByteArrayOutputStream()
      def w16(v: Int): Unit =
        if (exifBigEndian) { tiff.write(v >> 8); tiff.write(v & 0xFF) }
        else { tiff.write(v & 0xFF); tiff.write(v >> 8) }
      def w32(v: Int): Unit =
        if (exifBigEndian) { w16(v >>> 16); w16(v & 0xFFFF) }
        else { w16(v & 0xFFFF); w16(v >>> 16) }
      tiff.write(if (exifBigEndian) 'M' else 'I')
      tiff.write(if (exifBigEndian) 'M' else 'I')
      w16(42)
      w32(8) // IFD0 right after the header
      w16(1) // one entry
      w16(0x0112); w16(3); w32(1) // Orientation, SHORT, count 1
      w16(orientation); w16(0) // value packed into the 4-byte field
      w32(0) // no next IFD
      segment(out, 0xE1,
        "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff.toByteArray)
    }
    if (adobeTransform >= 0) {
      // APP14 / Adobe: version 101, zero flags, the color transform
      segment(out, 0xEE, "Adobe".getBytes("US-ASCII") ++
        Array[Byte](0, 101, 0, 0, 0, 0, adobeTransform.toByte))
    }
    // DQT — tables in zigzag order on the wire
    quants.zipWithIndex.foreach { case (q, tq) =>
      val body = new Array[Byte](65)
      body(0) = tq.toByte
      var k = 0
      while (k < 64) { body(1 + k) = q(Zigzag(k)).toByte; k += 1 }
      require(q.forall(_ <= 255), "16-bit quant values not emitted by this writer")
      segment(out, 0xDB, body)
    }
    // SOF0 (8-bit) / SOF1 (12-bit extended sequential)
    val sof = new ByteArrayOutputStream()
    sof.write(precision); be16(sof, height); be16(sof, width); sof.write(nc)
    planes.zipWithIndex.foreach { case (p, c) =>
      sof.write(c + 1)
      sof.write((p.sh << 4) | p.sv)
      sof.write(compQ(c))
    }
    segment(out, if (precision == 12) 0xC1 else 0xC0, sof.toByteArray)
    // DHT — luma tables as id 0; for color, the same content again as id 1
    // (chroma), so decoders must resolve multi-table declarations
    val nTabs = if (nc == 1) 1 else 2
    (0 until nTabs).foreach { id =>
      Seq((0, dc), (1, ac)).foreach { case (tc, t) =>
        val body = new ByteArrayOutputStream()
        body.write((tc << 4) | id)
        t.bits.foreach(body.write)
        t.vals.foreach(body.write)
        segment(out, 0xC4, body.toByteArray)
      }
    }
    if (restartInterval > 0) {
      val dri = new ByteArrayOutputStream()
      be16(dri, restartInterval)
      segment(out, 0xDD, dri.toByteArray)
    }
    // SOS
    val sos = new ByteArrayOutputStream()
    sos.write(nc)
    (0 until nc).foreach { c =>
      val id = if (c == 0) 0 else nTabs - 1
      sos.write(c + 1)
      sos.write((id << 4) | id)
    }
    sos.write(0); sos.write(63); sos.write(0)
    segment(out, 0xDA, sos.toByteArray)

    // entropy-coded data
    val hmax = planes.map(_.sh).max
    val vmax = planes.map(_.sv).max
    val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
    val bw = new BitWriter(out)
    val preds = new Array[Int](nc)
    val block = new Array[Double](64)
    val zz = new Array[Int](64)
    var rst = 0
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.flushPad()
        out.write(0xFF); out.write(0xD0 + rst)
        rst = (rst + 1) & 7
        java.util.Arrays.fill(preds, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var c = 0
      while (c < nc) {
        val p = planes(c)
        val q = quants(compQ(c))
        var v2 = 0
        while (v2 < p.sv) {
          var h2 = 0
          while (h2 < p.sh) {
            val x0 = (mx * p.sh + h2) * 8
            val y0 = (my * p.sv + v2) * 8
            fdctQuant(p, x0, y0, q, block, zz,
              if (precision == 12) 2048 else 128)
            // DC difference
            val diff = zz(0) - preds(c)
            preds(c) = zz(0)
            val s = category(diff)
            bw.put(dc.code(s), dc.len(s))
            if (s > 0)
              bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
            // AC run-length
            var k = 1
            var run = 0
            while (k < 64) {
              if (zz(k) == 0) run += 1
              else {
                while (run >= 16) { bw.put(ac.code(0xF0), ac.len(0xF0)); run -= 16 }
                val sz = category(zz(k))
                val sym = (run << 4) | sz
                bw.put(ac.code(sym), ac.len(sym))
                bw.put(if (zz(k) < 0) zz(k) + (1 << sz) - 1 else zz(k), sz)
                run = 0
              }
              k += 1
            }
            if (run > 0) bw.put(ac.code(0x00), ac.len(0x00)) // EOB
            h2 += 1
          }
          v2 += 1
        }
        c += 1
      }
      mcu += 1
    }
    bw.flushPad()
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  /** PROGRESSIVE grayscale JPEG (SOF2, spectral selection): a first DC
    * scan (Ss=0, Se=0, Ah=0, Al=`dcAl`), DC refinement scans down to
    * Al=0 when `dcAl` > 0 (one raw bit per block per level), and one AC
    * scan (Ss=1, Se=63) with T.81 G.1.2.2 EOB-run coding. A full
    * progressive decoder reconstructs the image exactly; the engine's
    * DC-only fast path ([[graft.expressions.JpegDHash]]) reads just the
    * first scan. With `dcAl` = 0 and the flat quantizer, a
    * block-constant image carries its exact block means in that first
    * scan — the planted Hamming-0 twin of the baseline encoding.
    */
  def grayProgressive(width: Int, height: Int, pix: (Int, Int) => Int,
      quant: Array[Int] = QFlat8, dcAl: Int = 0,
      acBands: Seq[(Int, Int)] = Seq((1, 63)), acAl: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims: ${width}x$height")
    require(dcAl >= 0 && dcAl <= 13, s"dcAl out of range: $dcAl")
    require(acAl >= 0 && acAl <= 13, s"acAl out of range: $acAl")
    require(quant.length == 64 && quant.forall(v => v >= 1 && v <= 255))
    // bands must partition 1..63 (contiguous, disjoint, in order)
    require(acBands.nonEmpty && acBands.head._1 == 1 &&
      acBands.last._2 == 63 &&
      acBands.zip(acBands.tail).forall { case ((_, e), (s2, _)) => s2 == e + 1 } &&
      acBands.forall { case (s2, e) => s2 <= e },
      s"acBands must partition 1..63: $acBands")
    val p = new Plane(width, height, 1, 1, pix)
    val bwBlocks = (width + 7) / 8
    val bhBlocks = (height + 7) / 8
    // quantized spectra of every block, zigzag order
    val spectra = new Array[Array[Int]](bwBlocks * bhBlocks)
    val tmp = new Array[Double](64)
    var bi = 0
    var byi = 0
    while (byi < bhBlocks) {
      var bxi = 0
      while (bxi < bwBlocks) {
        val zz = new Array[Int](64)
        fdctQuant(p, bxi * 8, byi * 8, quant, tmp, zz)
        spectra(bi) = zz
        bi += 1
        bxi += 1
      }
      byi += 1
    }

    val out = new ByteArrayOutputStream()
    out.write(0xFF); out.write(0xD8) // SOI
    segment(out, 0xE0, "JFIF".getBytes("US-ASCII") ++
      Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    val dqt = new Array[Byte](65)
    dqt(0) = 0
    var k = 0
    while (k < 64) { dqt(1 + k) = quant(Zigzag(k)).toByte; k += 1 }
    segment(out, 0xDB, dqt)
    // SOF2 — progressive DCT, Huffman
    val sof = new ByteArrayOutputStream()
    sof.write(8); be16(sof, height); be16(sof, width); sof.write(1)
    sof.write(1); sof.write(0x11); sof.write(0)
    segment(out, 0xC2, sof.toByteArray)
    // DHT: DC table 0 + AC table 0 (progressive layout with EOBn) up front
    Seq((0, UniformDc), (1, ProgAc)).foreach { case (tc, t) =>
      val body = new ByteArrayOutputStream()
      body.write(tc << 4)
      t.bits.foreach(body.write)
      t.vals.foreach(body.write)
      segment(out, 0xC4, body.toByteArray)
    }

    def sos(ss: Int, se: Int, ah: Int, al: Int): Unit = {
      val s = new ByteArrayOutputStream()
      s.write(1); s.write(1); s.write(0) // one component, tables 0/0
      s.write(ss); s.write(se); s.write((ah << 4) | al)
      segment(out, 0xDA, s.toByteArray)
    }

    // scan 1: first-order DC, point-transformed by dcAl
    sos(0, 0, 0, dcAl)
    val bw1 = new BitWriter(out)
    var pred = 0
    bi = 0
    while (bi < spectra.length) {
      val v = spectra(bi)(0) >> dcAl
      val diff = v - pred
      pred = v
      val s = category(diff)
      bw1.put(UniformDc.code(s), UniformDc.len(s))
      if (s > 0)
        bw1.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      bi += 1
    }
    bw1.flushPad()

    // DC refinement scans: one raw bit per block per remaining level
    var al = dcAl - 1
    while (al >= 0) {
      sos(0, 0, al + 1, al)
      val bwr = new BitWriter(out)
      bi = 0
      while (bi < spectra.length) {
        bwr.put((spectra(bi)(0) >> al) & 1, 1)
        bi += 1
      }
      bwr.flushPad()
      al -= 1
    }

    // AC first-order scans: one per spectral band at Al = acAl, values
    // through the MAGNITUDE point transform (T.81 G.1.2.2 — sign·(|v|>>Al),
    // unlike DC's arithmetic shift), cross-block EOB runs
    for ((bs, be) <- acBands) {
      sos(bs, be, 0, acAl)
      val bw2 = new BitWriter(out)
      var eobrun = 0
      def flushEobrun(): Unit = {
        while (eobrun > 0) {
          // one EOBn covers up to 32767 blocks: 2^r + r extra bits, r ≤ 14
          val n = math.min(eobrun, 32767)
          var r = 0
          while ((2 << r) <= n) r += 1 // largest r with 2^r ≤ n
          bw2.put(ProgAc.code(r << 4), ProgAc.len(r << 4))
          if (r > 0) bw2.put(n - (1 << r), r)
          eobrun -= n
        }
      }
      bi = 0
      while (bi < spectra.length) {
        val zz = spectra(bi)
        def pt(k: Int): Int = {
          val a = math.abs(zz(k)) >> acAl
          if (zz(k) < 0) -a else a
        }
        var last = be
        while (last >= bs && pt(last) == 0) last -= 1
        if (last < bs) eobrun += 1 // band all-zero: extend the EOB run
        else {
          flushEobrun()
          var k2 = bs
          var run = 0
          while (k2 <= last) {
            val v = pt(k2)
            if (v == 0) run += 1
            else {
              while (run >= 16) {
                bw2.put(ProgAc.code(0xF0), ProgAc.len(0xF0)); run -= 16
              }
              val sz = category(v)
              val sym = (run << 4) | sz
              bw2.put(ProgAc.code(sym), ProgAc.len(sym))
              bw2.put(if (v < 0) v + (1 << sz) - 1 else v, sz)
              run = 0
            }
            k2 += 1
          }
          if (last < be) eobrun += 1 // trailing zeros close as an EOB
        }
        bi += 1
      }
      flushEobrun()
      bw2.flushPad()
    }

    // AC refinement scans (successive approximation): per precision
    // level, per band — position-simulated mirror of the decoder's
    // G.1.2.3 walk (per-block EOB with tail correction bits; newly
    // significant coefficients as (run-of-zero-history, 1) symbols with
    // interleaved correction bits for skipped nonzero-history slots)
    var aal = acAl - 1
    while (aal >= 0) {
      for ((bs, be) <- acBands) {
        sos(bs, be, aal + 1, aal)
        val bwr = new BitWriter(out)
        val lvl = aal
        bi = 0
        while (bi < spectra.length) {
          val zz = spectra(bi)
          def hist(k: Int): Int = math.abs(zz(k)) >> (lvl + 1)
          def bit(k: Int): Int = (math.abs(zz(k)) >> lvl) & 1
          var k = bs
          var done = false
          while (!done) {
            var j = k
            var r = 0
            var found = false
            while (j <= be && !found) {
              if (hist(j) != 0) j += 1
              else if (bit(j) == 1) found = true
              else { r += 1; j += 1 }
            }
            if (!found) {
              // EOB (run 1): decoder consumes tail correction bits k..be
              bwr.put(ProgAc.code(0x00), ProgAc.len(0x00))
              var kk = k
              while (kk <= be) {
                if (hist(kk) != 0) bwr.put(bit(kk), 1)
                kk += 1
              }
              done = true
            } else if (r > 15) {
              bwr.put(ProgAc.code(0xF0), ProgAc.len(0xF0)) // ZRL
              var rr = 15
              var kk = k
              var stop = false
              while (!stop) {
                if (hist(kk) != 0) { bwr.put(bit(kk), 1); kk += 1 }
                else if (rr == 0) { stop = true; kk += 1 } // landing slot
                else { rr -= 1; kk += 1 }
              }
              k = kk
            } else {
              bwr.put(ProgAc.code((r << 4) | 1), ProgAc.len((r << 4) | 1))
              bwr.put(if (zz(j) < 0) 0 else 1, 1) // 1 = positive (decoder contract)
              var kk = k
              while (kk < j) {
                if (hist(kk) != 0) bwr.put(bit(kk), 1)
                kk += 1
              }
              k = j + 1
              if (k > be) done = true // walked exactly past the band end
            }
          }
          bi += 1
        }
        bwr.flushPad()
      }
      aal -= 1
    }
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  /** Separable FDCT of the level-shifted 8×8 block at (x0, y0), then
    * quantization (round-half-up) into zigzag order.
    */
  private def fdctQuant(p: Plane, x0: Int, y0: Int, quant: Array[Int],
      tmp: Array[Double], zz: Array[Int], levelShift: Int = 128): Unit = {
    val K = Basis
    // t(u, y) = Σ_x K(u)(x) · s(x, y)
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) {
          s += K(u)(x) * (p.at(x0 + x, y0 + y) - levelShift); x += 1
        }
        tmp(u * 8 + y) = s
        y += 1
      }
      u += 1
    }
    // F(u, v) = Σ_y K(v)(y) · t(u, y); store quantized at zigzag index
    var k = 0
    while (k < 64) {
      val nat = Zigzag(k)
      val fu = nat % 8
      val fv = nat / 8
      var s = 0.0
      var y = 0
      while (y < 8) { s += K(fv)(y) * tmp(fu * 8 + y); y += 1 }
      zz(k) = math.round(s / quant(nat)).toInt
      k += 1
    }
  }
}
