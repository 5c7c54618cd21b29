package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Baseline JPEG (ITU-T T.81 sequential DCT, Huffman) decoder — the JPEG
  * sibling of [[PngPixels.decodeRaw]], JDK-only: marker walk, DQT/DHT
  * table parsing, interleaved-MCU Huffman entropy decode (byte
  * unstuffing, restart markers), dequantization, separable double IDCT,
  * nearest-neighbor chroma upsampling and libjpeg fixed-point
  * YCbCr→RGB.
  *
  * Refusal envelope (NULL, never throw — same contract as the PNG/WAV
  * decoders): accepts baseline SOF0 (8-bit) and extended-sequential
  * SOF1 (8- or 12-bit; 12-bit samples level-shift at 2048 and
  * normalize to the engine's 8-bit pixel contract as v >> 4), 1, 3
  * or 4 components, sampling factors in {1, 2}, one interleaved scan
  * covering every component, with all referenced Huffman/quant
  * tables declared.
  * 4-component streams need Adobe APP14 provenance (transform 0 = CMYK
  * direct, 2 = YCCK) and composite to RGB under the inverted-ink
  * convention (R = c'·k'/255); Progressive (SOF2) gets the same CMYK
  * treatment through the shared compose. Arithmetic-coded and
  * hierarchical streams are refused rather than half-decoded. All size math is done
  * in Long and the decoded allocation is capped (64 MB of pixels), so a
  * forged header cannot become an allocation bomb.
  *
  * The reference ingests documents only (aje_libs/documents/helpers/
  * document_processor.py:10-83) — image decode is engine-addition scope
  * for the multimodal curation path, closing the one arm
  * [[graft.llmops.Multimodal]] still stubbed after PNG (round 7).
  */
private[expressions] object JpegDecode {

  /** Decoded image: interleaved `pix` (RGB for 3-component, single
    * byte per pixel for grayscale), stride = width·channels.
    */
  final class JpegRaw(val width: Int, val height: Int, val channels: Int,
      val pix: Array[Byte])

  /** Natural position of zigzag index k (T.81 Figure A.6). */
  val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Orthonormal 1-D DCT basis, `K(u)(x) = c(u)/2 · cos((2x+1)uπ/16)`
    * with c(0) = 1/√2 — one table serves both FDCT (writer twin) and
    * IDCT because the basis is orthogonal.
    */
  val Basis: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    c / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Canonical Huffman decode table (T.81 F.2.2.3: MINCODE / MAXCODE /
    * VALPTR per code length). Returns null from [[Huff.build]] when the
    * (bits, vals) declaration is inconsistent or overflows the code
    * space.
    */
  private final class Huff(val mincode: Array[Int], val maxcode: Array[Int],
      val valptr: Array[Int], val vals: Array[Int], val bits: Array[Int])

  private object Huff {
    def build(bits: Array[Int], vals: Array[Int]): Huff = {
      if (vals.length != bits.sum || vals.length == 0 || vals.length > 256)
        return null
      val mincode = new Array[Int](17)
      val maxcode = new Array[Int](17)
      val valptr = new Array[Int](17)
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valptr(l) = k
        mincode(l) = code
        code += bits(l - 1)
        k += bits(l - 1)
        maxcode(l) = if (bits(l - 1) > 0) code - 1 else -1
        if (code > (1 << l)) return null // Kraft overflow: not a prefix code
        code <<= 1
        l += 1
      }
      new Huff(mincode, maxcode, valptr, vals, bits)
    }
  }

  /** Entropy-segment bit reader: MSB-first, 0xFF00 unstuffing; any bare
    * marker inside the scan flips `failed` (restart markers are consumed
    * only at the byte-aligned positions [[readRestart]] expects).
    */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var cur = 0
    private var cnt = 0
    var failed = false

    def nextBit(): Int = {
      if (failed) return 0
      if (cnt == 0) {
        if (pos >= b.length) { failed = true; return 0 }
        var v = b(pos) & 0xFF
        pos += 1
        if (v == 0xFF) {
          if (pos >= b.length) { failed = true; return 0 }
          val m = b(pos) & 0xFF
          if (m != 0x00) { failed = true; return 0 } // marker mid-entropy
          pos += 1
          v = 0xFF
        }
        cur = v
        cnt = 8
      }
      cnt -= 1
      (cur >> cnt) & 1
    }

    def receive(s: Int): Int = {
      var v = 0
      var i = 0
      while (i < s) { v = (v << 1) | nextBit(); i += 1 }
      v
    }

    /** Byte-align and consume the expected RSTn marker. */
    def readRestart(n: Int): Unit = {
      cnt = 0
      if (pos + 2 > b.length || (b(pos) & 0xFF) != 0xFF ||
          (b(pos + 1) & 0xFF) != (0xD0 + (n & 7))) { failed = true; return }
      pos += 2
    }

    def huffDecode(t: Huff): Int = {
      var code = 0
      var l = 1
      while (l <= 16) {
        code = (code << 1) | nextBit()
        if (failed) return -1
        if (t.bits(l - 1) > 0 && code <= t.maxcode(l))
          return t.vals(t.valptr(l) + code - t.mincode(l))
        l += 1
      }
      failed = true
      -1
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** libjpeg fixed-point chroma term: `(t + 32768) >> 16` — arithmetic
    * shift, i.e. floor division by 2^16, exactly `floor((t+32768)/65536.0)`
    * for an external SQL replay.
    */
  private def fx(t: Int): Int = (t + 32768) >> 16

  /** EXIF orientation (1-8) from the APP1 segment's TIFF IFD0, or -1
    * when absent/invalid — both byte orders (II/MM), bounds-checked
    * against the segment, never thrown. Scans only the header section
    * (stops at SOS), so it is cheap enough to run beside a decode.
    */
  private[expressions] def exifOrientation(b: Array[Byte]): Int = {
    if (b == null || b.length < 4) return -1
    if ((b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return -1
    var i = 2
    while (i + 4 <= b.length) {
      if ((b(i) & 0xFF) != 0xFF) return -1
      var mi = i + 1
      while (mi < b.length && (b(mi) & 0xFF) == 0xFF) mi += 1
      if (mi >= b.length) return -1
      val m = b(mi) & 0xFF
      if (m == 0xD9 || m == 0xDA) return -1 // entropy data: no APP1 found
      if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) { i = mi + 1 }
      else {
        if (mi + 3 > b.length) return -1
        val len = ((b(mi + 1) & 0xFF) << 8) | (b(mi + 2) & 0xFF)
        if (len < 2 || mi.toLong + 1L + len > b.length) return -1
        val segEnd = mi + 1 + len
        if (m == 0xE1 && len >= 16 &&
            b(mi + 3) == 'E' && b(mi + 4) == 'x' && b(mi + 5) == 'i' &&
            b(mi + 6) == 'f' && b(mi + 7) == 0 && b(mi + 8) == 0) {
          val t = mi + 9 // TIFF header
          if (t + 8 > segEnd) return -1
          val big =
            if (b(t) == 'M' && b(t + 1) == 'M') true
            else if (b(t) == 'I' && b(t + 1) == 'I') false
            else return -1
          def r16(o: Int): Int =
            if (big) ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)
            else ((b(o + 1) & 0xFF) << 8) | (b(o) & 0xFF)
          def r32(o: Int): Long =
            if (big) (r16(o).toLong << 16) | r16(o + 2)
            else (r16(o + 2).toLong << 16) | r16(o)
          if (r16(t + 2) != 42) return -1
          val ifd = r32(t + 4)
          if (ifd < 8 || t + ifd + 2 > segEnd) return -1
          val ifdAt = (t + ifd).toInt
          val n = r16(ifdAt)
          var e = 0
          while (e < n) {
            val at = ifdAt + 2 + e * 12
            if (at + 12 > segEnd) return -1
            if (r16(at) == 0x0112 && r16(at + 2) == 3 && r32(at + 4) == 1L) {
              val v = r16(at + 8)
              return if (v >= 1 && v <= 8) v else -1
            }
            e += 1
          }
          return -1
        }
        i = segEnd
      }
    }
    -1
  }

  // scan-level component state
  private final class Comp {
    var id = 0
    var h = 0
    var v = 0
    var tq = 0
    var dcTab = 0
    var acTab = 0
    var pred = 0
    var planeW = 0
    var planeH = 0
    var plane: Array[Byte] = null
  }

  /** DC-only luma reconstruction of a PROGRESSIVE (SOF2) JPEG: the
    * block-mean gray values decoded from the FIRST DC scan. `vals` is a
    * `bw×bh` raster of clamped gray means (one per 8×8 luma block);
    * `h0/v0/hmax/vmax` map a full-resolution pixel to its luma block:
    * `bx = (x·h0/hmax)/8`, `by = (y·v0/vmax)/8`.
    *
    * A 9×8 difference hash needs nothing finer — the grid cells average
    * whole pixel regions anyway — so this is the honest progressive arm
    * of [[JpegDHash]]: exact for the DC content (bit-exact vs baseline
    * on block-constant images), approximate only in the successive-
    * approximation low bits when the file uses `Al > 0`, and refused
    * (`null`) rather than guessed for everything else the envelope
    * excludes (arithmetic coding, 12-bit, 4 components).
    */
  private[expressions] final class DcLumaMap(val width: Int, val height: Int,
      val bw: Int, val bh: Int, val h0: Int, val v0: Int,
      val hmax: Int, val vmax: Int, val vals: Array[Int])

  /** Decode the first DC scan of a progressive JPEG into a [[DcLumaMap]],
    * or null for anything outside the envelope: must be SOF2, 8-bit,
    * 1 or 3 components, sampling in {1,2}; scans before the luma DC scan
    * are skipped by marker scan; the file must close with EOI. Handles
    * interleaved and single-component DC scans, restart intervals, and
    * the `Al` point-transform shift.
    */
  private[expressions] def decodeProgressiveDcLuma(b: Array[Byte]): DcLumaMap = {
    if (b == null || b.length < 4) return null
    if ((b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return null
    // completeness contract: the stream must close with EOI
    if ((b(b.length - 2) & 0xFF) != 0xFF || (b(b.length - 1) & 0xFF) != 0xD9)
      return null
    val qt = new Array[Array[Int]](4)
    val dcT = new Array[Huff](4)
    var width = 0
    var height = 0
    var comps: Array[Comp] = null
    var restartInt = 0
    var i = 2
    while (i + 4 <= b.length) {
      if ((b(i) & 0xFF) != 0xFF) return null
      var mi = i + 1
      while (mi < b.length && (b(mi) & 0xFF) == 0xFF) mi += 1
      if (mi >= b.length) return null
      val m = b(mi) & 0xFF
      if (m == 0xD9) return null // EOI before the luma DC scan
      if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) { i = mi + 1 }
      else {
        if (mi + 3 > b.length) return null
        val len = ((b(mi + 1) & 0xFF) << 8) | (b(mi + 2) & 0xFF)
        if (len < 2 || mi.toLong + 1L + len > b.length) return null
        var s = mi + 3
        val segEnd = mi + 1 + len
        m match {
          case 0xDB => // DQT — same wire format as the baseline path
            while (s < segEnd) {
              val pq = (b(s) & 0xFF) >> 4
              val tq = b(s) & 0x0F
              if (tq > 3 || pq > 1) return null
              val n = if (pq == 0) 64 else 128
              if (s + 1 + n > segEnd) return null
              val tab = new Array[Int](64)
              var k = 0
              while (k < 64) {
                val v =
                  if (pq == 0) b(s + 1 + k) & 0xFF
                  else ((b(s + 1 + 2 * k) & 0xFF) << 8) | (b(s + 2 + 2 * k) & 0xFF)
                if (v == 0) return null
                tab(k) = v
                k += 1
              }
              qt(tq) = tab
              s += 1 + n
            }
          case 0xC4 => // DHT — only DC-class tables are kept
            while (s < segEnd) {
              val tc = (b(s) & 0xFF) >> 4
              val th = b(s) & 0x0F
              if (tc > 1 || th > 3 || s + 17 > segEnd) return null
              val bits = Array.tabulate(16)(j => b(s + 1 + j) & 0xFF)
              val total = bits.sum
              if (s + 17 + total > segEnd) return null
              val vals = Array.tabulate(total)(j => b(s + 17 + j) & 0xFF)
              val huff = Huff.build(bits, vals)
              if (huff == null) return null
              if (tc == 0) dcT(th) = huff
              s += 17 + total
            }
          case 0xC2 => // SOF2 progressive — the one frame type served here
            if (comps != null) return null
            if (segEnd - s < 6 || (b(s) & 0xFF) != 8) return null
            height = ((b(s + 1) & 0xFF) << 8) | (b(s + 2) & 0xFF)
            width = ((b(s + 3) & 0xFF) << 8) | (b(s + 4) & 0xFF)
            val nc = b(s + 5) & 0xFF
            if (width <= 0 || height <= 0 || (nc != 1 && nc != 3)) return null
            if (segEnd - s != 6 + 3 * nc) return null
            if (width.toLong * height * nc > 64L * 1024 * 1024) return null
            comps = Array.fill(nc)(new Comp)
            var c = 0
            while (c < nc) {
              val o = s + 6 + 3 * c
              comps(c).id = b(o) & 0xFF
              comps(c).h = (b(o + 1) & 0xFF) >> 4
              comps(c).v = b(o + 1) & 0x0F
              comps(c).tq = b(o + 2) & 0x0F
              if (comps(c).h < 1 || comps(c).h > 2 ||
                  comps(c).v < 1 || comps(c).v > 2 || comps(c).tq > 3)
                return null
              c += 1
            }
          case 0xC0 | 0xC1 | 0xC3 | 0xC5 | 0xC6 | 0xC7 |
               0xC9 | 0xCA | 0xCB | 0xCD | 0xCE | 0xCF =>
            return null // wrong frame type for the progressive path
          case 0xDD =>
            if (segEnd - s != 2) return null
            restartInt = ((b(s) & 0xFF) << 8) | (b(s + 1) & 0xFF)
          case 0xDA => // SOS
            if (comps == null) return null
            val ns = b(s) & 0xFF
            if (ns < 1 || ns > comps.length ||
                segEnd - s != 1 + 2 * ns + 3) return null
            val scanComps = new Array[Int](ns)
            var j = 0
            while (j < ns) {
              val cs = b(s + 1 + 2 * j) & 0xFF
              val c = comps.indexWhere(_.id == cs)
              if (c < 0) return null
              scanComps(j) = c
              comps(c).dcTab = (b(s + 2 + 2 * j) & 0xFF) >> 4
              if (comps(c).dcTab > 3) return null
              j += 1
            }
            val ss = b(segEnd - 3) & 0xFF
            val se = b(segEnd - 2) & 0xFF
            val ah = (b(segEnd - 1) & 0xFF) >> 4
            val al = b(segEnd - 1) & 0x0F
            if (ss == 0 && ah == 0 && scanComps.contains(0)) {
              if (se != 0) return null // a DC scan must stop at Se=0
              return decodeDcScan(b, segEnd, width, height, comps,
                scanComps, qt, dcT, restartInt, al)
            }
            // not the luma first-DC scan: skip its entropy data to the
            // next marker (restart markers and stuffed 0xFF00 are part
            // of the data)
            var p = segEnd
            var found = -1
            while (found < 0 && p + 1 < b.length) {
              if ((b(p) & 0xFF) == 0xFF) {
                val nm = b(p + 1) & 0xFF
                if (nm != 0x00 && !(nm >= 0xD0 && nm <= 0xD7) && nm != 0xFF)
                  found = p
                // FF FF is a FILL byte before a marker (T.81 B.1.1.2):
                // advance ONE so the second FF can still start the
                // marker — advancing two would jump past `FF FF DA`
                else if (nm == 0xFF) p += 1
                else p += 2
              } else p += 1
            }
            if (found < 0) return null
            i = found
            // continue the outer walk from the marker we found
          case _ => ()
        }
        if (m != 0xDA) i = segEnd
      }
    }
    null
  }

  /** Decode one first-order DC scan (interleaved or single-component)
    * and return the luma block-mean map.
    */
  private def decodeDcScan(b: Array[Byte], start: Int, width: Int,
      height: Int, comps: Array[Comp], scanComps: Array[Int],
      qt: Array[Array[Int]], dcT: Array[Huff], restartInt: Int,
      al: Int): DcLumaMap = {
    var hmax = 1
    var vmax = 1
    comps.foreach { c =>
      if (c.h > hmax) hmax = c.h
      if (c.v > vmax) vmax = c.v
    }
    val luma = comps(0)
    val q = qt(luma.tq)
    if (q == null) return null
    var sc = 0
    while (sc < scanComps.length) {
      if (dcT(comps(scanComps(sc)).dcTab) == null) return null
      comps(scanComps(sc)).pred = 0
      sc += 1
    }
    val r = new BitReader(b, start)
    var rst = 0

    def gray(dequantDc: Int): Int =
      // DC-only IDCT: flat block of coef/8, then level shift — identical
      // to idctBlock on a DC-only spectrum
      clamp(math.round(dequantDc / 8.0).toInt + 128)

    if (scanComps.length > 1) {
      // interleaved: h×v blocks per scan component per MCU
      val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
      val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
      val bw = mcusX * luma.h
      val bh = mcusY * luma.v
      val vals = new Array[Int](bw * bh)
      var mcu = 0
      val nMcus = mcusX * mcusY
      while (mcu < nMcus) {
        if (restartInt > 0 && mcu > 0 && mcu % restartInt == 0) {
          r.readRestart(rst)
          rst = (rst + 1) & 7
          var k = 0
          while (k < scanComps.length) {
            comps(scanComps(k)).pred = 0; k += 1
          }
          if (r.failed) return null
        }
        val mx = mcu % mcusX
        val my = mcu / mcusX
        var sci = 0
        while (sci < scanComps.length) {
          val cc = comps(scanComps(sci))
          var v2 = 0
          while (v2 < cc.v) {
            var h2 = 0
            while (h2 < cc.h) {
              val t = r.huffDecode(dcT(cc.dcTab))
              if (r.failed || t > 11) return null
              val diff = extend(r.receive(t), t)
              if (r.failed) return null
              cc.pred += diff
              if (scanComps(sci) == 0)
                vals((my * cc.v + v2) * bw + mx * cc.h + h2) =
                  gray((cc.pred << al) * q(0))
              h2 += 1
            }
            v2 += 1
          }
          sci += 1
        }
        mcu += 1
      }
      new DcLumaMap(width, height, bw, bh, luma.h, luma.v, hmax, vmax, vals)
    } else {
      // single-component scan: one block per MCU, raster over the
      // component's own block grid (T.81 A.2.4 dimensions)
      val cc = comps(scanComps(0))
      if (scanComps(0) != 0) return null // only the luma map is wanted
      val compW = (width * cc.h + hmax - 1) / hmax
      val compH = (height * cc.v + vmax - 1) / vmax
      val bw = (compW + 7) / 8
      val bh = (compH + 7) / 8
      val vals = new Array[Int](bw * bh)
      var blk = 0
      val nBlocks = bw * bh
      while (blk < nBlocks) {
        if (restartInt > 0 && blk > 0 && blk % restartInt == 0) {
          r.readRestart(rst)
          rst = (rst + 1) & 7
          cc.pred = 0
          if (r.failed) return null
        }
        val t = r.huffDecode(dcT(cc.dcTab))
        if (r.failed || t > 11) return null
        val diff = extend(r.receive(t), t)
        if (r.failed) return null
        cc.pred += diff
        vals(blk) = gray((cc.pred << al) * q(0))
        blk += 1
      }
      new DcLumaMap(width, height, bw, bh, cc.h, cc.v, hmax, vmax, vals)
    }
  }

  /** Baseline or progressive, whichever the frame header declares —
    * each path refuses the other's frame type fast, so the double call
    * costs one header walk.
    */
  def decodeAny(b: Array[Byte]): JpegRaw = {
    val d = decode(b)
    if (d != null) d else decodeProgressive(b)
  }

  /** FULL progressive (SOF2) decode — T.81 annex G: spectral selection,
    * successive approximation (DC and AC refinement scans, EOB-run
    * coding with correction bits), interleaved and single-component DC
    * scans, restart intervals. Coefficients accumulate across scans in
    * zigzag order per MCU-padded block grid; reconstruction reuses the
    * baseline dequantize + IDCT + upsample/color path, so a progressive
    * and a baseline encoding of the same spectra decode bit-identically
    * (the q134 gate and ProgressiveJpegSpec pin this, plus a JDK
    * ImageIO cross-check on streams our writer did not produce).
    *
    * Refusals (NULL): anything but SOF2/8-bit/1,3,4 components
    * (4 needs Adobe APP14 CMYK/YCCK provenance, as in baseline)/
    * sampling ∈ {1,2}; malformed scan progressions (DC scan with
    * Se ≠ 0, interleaved AC scan, Ah ≠ Al+1 on refinement, undefined
    * tables); a component with no DC scan by EOI; streams that do not
    * close with EOI; > 16M pixels (the coefficient store is 4 B/pixel —
    * the allocation-bomb cap scaled for it).
    */
  private[expressions] def decodeProgressive(b: Array[Byte]): JpegRaw = {
    if (b == null || b.length < 4) return null
    if ((b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return null
    if ((b(b.length - 2) & 0xFF) != 0xFF || (b(b.length - 1) & 0xFF) != 0xD9)
      return null
    val qt = new Array[Array[Int]](4)
    val dcT = new Array[Huff](4)
    val acT = new Array[Huff](4)
    var width = 0
    var height = 0
    var comps: Array[Comp] = null
    var sawDc: Array[Boolean] = null
    var coefs: Array[Array[Int]] = null // per comp, zigzag, block-major
    var bwPad: Array[Int] = null
    var bhPad: Array[Int] = null
    var bwReal: Array[Int] = null
    var bhReal: Array[Int] = null
    var hmax = 1
    var vmax = 1
    var mcusX = 0
    var mcusY = 0
    var restartInt = 0
    var adobe = -1 // APP14 Adobe transform (0=CMYK 1=YCbCr 2=YCCK)
    var i = 2
    // i+2 (not +4): the closing EOI is the final two bytes and its case
    // below is where reconstruction happens
    while (i + 2 <= b.length) {
      if ((b(i) & 0xFF) != 0xFF) return null
      var mi = i + 1
      while (mi < b.length && (b(mi) & 0xFF) == 0xFF) mi += 1
      if (mi >= b.length) return null
      val m = b(mi) & 0xFF
      if (m == 0xD9) {
        // EOI: reconstruct — every component must have its DC plane
        if (comps == null || sawDc.exists(!_)) return null
        var c = 0
        while (c < comps.length) {
          val cc = comps(c)
          val q = qt(cc.tq)
          if (q == null) return null
          cc.planeW = bwPad(c) * 8
          cc.planeH = bhPad(c) * 8
          cc.plane = new Array[Byte](cc.planeW * cc.planeH)
          val coef = coefs(c)
          val nat = new Array[Int](64)
          val tmp = new Array[Double](64)
          var blk = 0
          val nBlocks = bwPad(c) * bhPad(c)
          while (blk < nBlocks) {
            val base = blk * 64
            var k = 0
            while (k < 64) { nat(Zigzag(k)) = coef(base + k) * q(k); k += 1 }
            idctBlock(nat, tmp, cc.plane, cc.planeW,
              (blk % bwPad(c)) * 8, (blk / bwPad(c)) * 8)
            blk += 1
          }
          c += 1
        }
        if (comps.length == 4 && adobe != 0 && adobe != 2)
          return null // 4-component needs Adobe CMYK/YCCK provenance
        return compose(width, height, comps, hmax, vmax, adobe)
      }
      if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) { i = mi + 1 }
      else {
        if (mi + 3 > b.length) return null
        val len = ((b(mi + 1) & 0xFF) << 8) | (b(mi + 2) & 0xFF)
        if (len < 2 || mi.toLong + 1L + len > b.length) return null
        var s = mi + 3
        val segEnd = mi + 1 + len
        m match {
          case 0xDB =>
            while (s < segEnd) {
              val pq = (b(s) & 0xFF) >> 4
              val tq = b(s) & 0x0F
              if (tq > 3 || pq > 1) return null
              val n = if (pq == 0) 64 else 128
              if (s + 1 + n > segEnd) return null
              val tab = new Array[Int](64)
              var k = 0
              while (k < 64) {
                val v =
                  if (pq == 0) b(s + 1 + k) & 0xFF
                  else ((b(s + 1 + 2 * k) & 0xFF) << 8) | (b(s + 2 + 2 * k) & 0xFF)
                if (v == 0) return null
                tab(k) = v
                k += 1
              }
              qt(tq) = tab
              s += 1 + n
            }
          case 0xC4 =>
            while (s < segEnd) {
              val tc = (b(s) & 0xFF) >> 4
              val th = b(s) & 0x0F
              if (tc > 1 || th > 3 || s + 17 > segEnd) return null
              val bits = Array.tabulate(16)(j => b(s + 1 + j) & 0xFF)
              val total = bits.sum
              if (s + 17 + total > segEnd) return null
              val vals = Array.tabulate(total)(j => b(s + 17 + j) & 0xFF)
              val huff = Huff.build(bits, vals)
              if (huff == null) return null
              if (tc == 0) dcT(th) = huff else acT(th) = huff
              s += 17 + total
            }
          case 0xC2 =>
            if (comps != null) return null
            if (segEnd - s < 6 || (b(s) & 0xFF) != 8) return null
            height = ((b(s + 1) & 0xFF) << 8) | (b(s + 2) & 0xFF)
            width = ((b(s + 3) & 0xFF) << 8) | (b(s + 4) & 0xFF)
            val nc = b(s + 5) & 0xFF
            if (width <= 0 || height <= 0 || (nc != 1 && nc != 3 && nc != 4)) return null
            if (segEnd - s != 6 + 3 * nc) return null
            // coefficient store is 4 B/pixel/component: tighter cap than
            // the baseline's byte planes
            if (width.toLong * height * nc > 16L * 1024 * 1024) return null
            comps = Array.fill(nc)(new Comp)
            var c = 0
            while (c < nc) {
              val o = s + 6 + 3 * c
              comps(c).id = b(o) & 0xFF
              comps(c).h = (b(o + 1) & 0xFF) >> 4
              comps(c).v = b(o + 1) & 0x0F
              comps(c).tq = b(o + 2) & 0x0F
              if (comps(c).h < 1 || comps(c).h > 2 ||
                  comps(c).v < 1 || comps(c).v > 2 || comps(c).tq > 3)
                return null
              c += 1
            }
            if (nc == 1) { comps(0).h = 1; comps(0).v = 1 }
            comps.foreach { cc =>
              if (cc.h > hmax) hmax = cc.h
              if (cc.v > vmax) vmax = cc.v
            }
            mcusX = (width + 8 * hmax - 1) / (8 * hmax)
            mcusY = (height + 8 * vmax - 1) / (8 * vmax)
            sawDc = new Array[Boolean](nc)
            coefs = new Array[Array[Int]](nc)
            bwPad = new Array[Int](nc)
            bhPad = new Array[Int](nc)
            bwReal = new Array[Int](nc)
            bhReal = new Array[Int](nc)
            c = 0
            while (c < nc) {
              val cc = comps(c)
              bwPad(c) = mcusX * cc.h
              bhPad(c) = mcusY * cc.v
              val compW = (width * cc.h + hmax - 1) / hmax
              val compH = (height * cc.v + vmax - 1) / vmax
              bwReal(c) = (compW + 7) / 8
              bhReal(c) = (compH + 7) / 8
              coefs(c) = new Array[Int](bwPad(c) * bhPad(c) * 64)
              c += 1
            }
          case 0xC0 | 0xC1 | 0xC3 | 0xC5 | 0xC6 | 0xC7 |
               0xC9 | 0xCA | 0xCB | 0xCD | 0xCE | 0xCF =>
            return null
          case 0xDD =>
            if (segEnd - s != 2) return null
            restartInt = ((b(s) & 0xFF) << 8) | (b(s + 1) & 0xFF)
          case 0xDA =>
            if (comps == null) return null
            val ns = b(s) & 0xFF
            if (ns < 1 || ns > comps.length ||
                segEnd - s != 1 + 2 * ns + 3) return null
            val scanComps = new Array[Int](ns)
            var j = 0
            while (j < ns) {
              val cs = b(s + 1 + 2 * j) & 0xFF
              val c = comps.indexWhere(_.id == cs)
              if (c < 0) return null
              scanComps(j) = c
              comps(c).dcTab = (b(s + 2 + 2 * j) & 0xFF) >> 4
              comps(c).acTab = b(s + 2 + 2 * j) & 0x0F
              if (comps(c).dcTab > 3 || comps(c).acTab > 3) return null
              j += 1
            }
            val ss = b(segEnd - 3) & 0xFF
            val se = b(segEnd - 2) & 0xFF
            val ah = (b(segEnd - 1) & 0xFF) >> 4
            val al = b(segEnd - 1) & 0x0F
            if (al > 13 || (ah != 0 && ah != al + 1)) return null
            val endPos =
              if (ss == 0) {
                if (se != 0) return null
                if (ah == 0) scanComps.foreach(c => sawDc(c) = true)
                decodeProgDcScan(b, segEnd, comps, scanComps, dcT,
                  restartInt, ah, al, coefs, bwPad, bwReal, bhReal,
                  mcusX, mcusY)
              } else {
                if (ns != 1 || se < ss || se > 63) return null
                val c = scanComps(0)
                if (!sawDc(c) && ah == 0) {
                  // AC before the component's DC scan: out-of-order
                  // progression, refuse
                  return null
                }
                decodeProgAcScan(b, segEnd, acT(comps(c).acTab),
                  restartInt, ss, se, ah, al, coefs(c), bwPad(c),
                  bwReal(c), bhReal(c))
              }
            if (endPos < 0) return null
            i = endPos
          case 0xEE => // APP14: Adobe color-transform tag
            if (segEnd - s >= 12 && b(s) == 'A' && b(s + 1) == 'd' &&
                b(s + 2) == 'o' && b(s + 3) == 'b' && b(s + 4) == 'e')
              adobe = b(s + 11) & 0xFF
          case _ => ()
        }
        if (m != 0xDA) i = segEnd
      }
    }
    null
  }

  /** Progressive DC scan (first or refinement, interleaved or not) into
    * the zigzag coefficient stores; returns the byte position after the
    * scan's entropy data, or -1 on refusal.
    */
  private def decodeProgDcScan(b: Array[Byte], start: Int,
      comps: Array[Comp], scanComps: Array[Int], dcT: Array[Huff],
      restartInt: Int, ah: Int, al: Int, coefs: Array[Array[Int]],
      bwPad: Array[Int], bwReal: Array[Int], bhReal: Array[Int],
      mcusX: Int, mcusY: Int): Int = {
    var sc = 0
    while (sc < scanComps.length) {
      val cc = comps(scanComps(sc))
      if (ah == 0 && dcT(cc.dcTab) == null) return -1
      cc.pred = 0
      sc += 1
    }
    val r = new BitReader(b, start)
    var rst = 0
    if (scanComps.length > 1) {
      var mcu = 0
      val nMcus = mcusX * mcusY
      while (mcu < nMcus) {
        if (restartInt > 0 && mcu > 0 && mcu % restartInt == 0) {
          r.readRestart(rst)
          rst = (rst + 1) & 7
          var k = 0
          while (k < scanComps.length) { comps(scanComps(k)).pred = 0; k += 1 }
          if (r.failed) return -1
        }
        val mx = mcu % mcusX
        val my = mcu / mcusX
        var sci = 0
        while (sci < scanComps.length) {
          val ci = scanComps(sci)
          val cc = comps(ci)
          var v2 = 0
          while (v2 < cc.v) {
            var h2 = 0
            while (h2 < cc.h) {
              val idx = ((my * cc.v + v2) * bwPad(ci) + mx * cc.h + h2) * 64
              if (ah == 0) {
                val t = r.huffDecode(dcT(cc.dcTab))
                if (r.failed || t > 11) return -1
                cc.pred += extend(r.receive(t), t)
                if (r.failed) return -1
                coefs(ci)(idx) = cc.pred << al
              } else {
                coefs(ci)(idx) |= r.nextBit() << al
                if (r.failed) return -1
              }
              h2 += 1
            }
            v2 += 1
          }
          sci += 1
        }
        mcu += 1
      }
    } else {
      val ci = scanComps(0)
      val cc = comps(ci)
      val bw = bwReal(ci)
      val bh = bhReal(ci)
      var blk = 0
      val nBlocks = bw * bh
      while (blk < nBlocks) {
        if (restartInt > 0 && blk > 0 && blk % restartInt == 0) {
          r.readRestart(rst)
          rst = (rst + 1) & 7
          cc.pred = 0
          if (r.failed) return -1
        }
        val idx = ((blk / bw) * bwPad(ci) + blk % bw) * 64
        if (ah == 0) {
          val t = r.huffDecode(dcT(cc.dcTab))
          if (r.failed || t > 11) return -1
          cc.pred += extend(r.receive(t), t)
          if (r.failed) return -1
          coefs(ci)(idx) = cc.pred << al
        } else {
          coefs(ci)(idx) |= r.nextBit() << al
          if (r.failed) return -1
        }
        blk += 1
      }
    }
    r.pos
  }

  /** Progressive AC scan (first or refinement) over one component's real
    * block grid — T.81 G.1.2.2/G.1.2.3 EOB runs, ZRL, correction bits.
    * Returns position after the entropy data, or -1.
    */
  private def decodeProgAcScan(b: Array[Byte], start: Int, ac: Huff,
      restartInt: Int, ss: Int, se: Int, ah: Int, al: Int,
      coef: Array[Int], bwPad: Int, bw: Int, bh: Int): Int = {
    if (ac == null) return -1
    val r = new BitReader(b, start)
    var rst = 0
    var eobrun = 0
    val p1 = 1 << al
    val m1 = -1 << al
    var blk = 0
    val nBlocks = bw * bh
    while (blk < nBlocks) {
      if (restartInt > 0 && blk > 0 && blk % restartInt == 0) {
        r.readRestart(rst)
        rst = (rst + 1) & 7
        eobrun = 0
        if (r.failed) return -1
      }
      val base = ((blk / bw) * bwPad + blk % bw) * 64
      if (ah == 0) {
        // first-order AC scan
        if (eobrun > 0) eobrun -= 1
        else {
          var k = ss
          var done = false
          while (k <= se && !done) {
            val rs = r.huffDecode(ac)
            if (r.failed) return -1
            val run = rs >> 4
            val size = rs & 0x0F
            if (size == 0) {
              if (run == 15) k += 16 // ZRL
              else {
                eobrun = (1 << run) - 1
                if (run > 0) { eobrun += r.receive(run); if (r.failed) return -1 }
                done = true
              }
            } else {
              k += run
              if (k > se) return -1
              coef(base + k) = extend(r.receive(size), size) << al
              if (r.failed) return -1
              k += 1
            }
          }
        }
      } else {
        // refinement scan: correction bits on already-nonzero history
        var k = ss
        if (eobrun == 0) {
          var break = false
          while (k <= se && !break) {
            val rs = r.huffDecode(ac)
            if (r.failed) return -1
            var run = rs >> 4
            var newVal = 0
            val size = rs & 0x0F
            if (size == 0) {
              if (run != 15) {
                eobrun = 1 << run
                if (run > 0) { eobrun += r.receive(run); if (r.failed) return -1 }
                break = true
              }
              // run == 15 (ZRL): advance past 16 zero-history coefficients
            } else {
              if (size != 1) return -1
              newVal = if (r.nextBit() == 1) p1 else m1
              if (r.failed) return -1
            }
            if (!break) {
              var placed = false
              while (k <= se && !placed) {
                val cur = coef(base + k)
                if (cur != 0) {
                  if (r.nextBit() == 1 && (cur & p1) == 0)
                    coef(base + k) = cur + (if (cur >= 0) p1 else m1)
                  if (r.failed) return -1
                  k += 1
                } else {
                  if (run == 0) {
                    // landing slot: newly-significant coefficient (size=1)
                    // or the 16th zero of a ZRL — either way advance past
                    if (newVal != 0) coef(base + k) = newVal
                    k += 1
                    placed = true
                  } else { run -= 1; k += 1 }
                }
              }
              if (!placed && newVal != 0) return -1 // no slot for the new coef
            }
          }
        }
        if (eobrun > 0) {
          // EOB-run tail: correction bits only
          while (k <= se) {
            val cur = coef(base + k)
            if (cur != 0) {
              if (r.nextBit() == 1 && (cur & p1) == 0)
                coef(base + k) = cur + (if (cur >= 0) p1 else m1)
              if (r.failed) return -1
            }
            k += 1
          }
          eobrun -= 1
        }
      }
      blk += 1
    }
    r.pos
  }

  def decode(b: Array[Byte]): JpegRaw = {
    if (b == null || b.length < 4) return null
    if ((b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return null
    val qt = new Array[Array[Int]](4) // zigzag order, as declared in DQT
    val dcT = new Array[Huff](4)
    val acT = new Array[Huff](4)
    var width = 0
    var height = 0
    var comps: Array[Comp] = null
    var restartInt = 0
    var adobe = -1 // APP14 Adobe transform (0=CMYK 1=YCbCr 2=YCCK)
    var prec12 = false // SOF1 12-bit samples (output normalizes >> 4)
    var i = 2
    while (i + 4 <= b.length) {
      if ((b(i) & 0xFF) != 0xFF) return null
      var mi = i + 1
      while (mi < b.length && (b(mi) & 0xFF) == 0xFF) mi += 1 // fill bytes
      if (mi >= b.length) return null
      val m = b(mi) & 0xFF
      if (m == 0xD9) return null // EOI before any scan completed
      if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) { i = mi + 1 } // standalone
      else {
        if (mi + 3 > b.length) return null
        val len = ((b(mi + 1) & 0xFF) << 8) | (b(mi + 2) & 0xFF)
        if (len < 2 || mi.toLong + 1L + len > b.length) return null
        var s = mi + 3
        val segEnd = mi + 1 + len
        m match {
          case 0xDB => // DQT
            while (s < segEnd) {
              val pq = (b(s) & 0xFF) >> 4
              val tq = b(s) & 0x0F
              if (tq > 3 || pq > 1) return null
              val n = if (pq == 0) 64 else 128
              if (s + 1 + n > segEnd) return null
              val tab = new Array[Int](64)
              var k = 0
              while (k < 64) {
                val v =
                  if (pq == 0) b(s + 1 + k) & 0xFF
                  else ((b(s + 1 + 2 * k) & 0xFF) << 8) | (b(s + 2 + 2 * k) & 0xFF)
                if (v == 0) return null
                tab(k) = v
                k += 1
              }
              qt(tq) = tab
              s += 1 + n
            }
          case 0xC4 => // DHT
            while (s < segEnd) {
              val tc = (b(s) & 0xFF) >> 4
              val th = b(s) & 0x0F
              if (tc > 1 || th > 3 || s + 17 > segEnd) return null
              val bits = Array.tabulate(16)(j => b(s + 1 + j) & 0xFF)
              val total = bits.sum
              if (s + 17 + total > segEnd) return null
              val vals = Array.tabulate(total)(j => b(s + 17 + j) & 0xFF)
              val huff = Huff.build(bits, vals)
              if (huff == null) return null
              if (tc == 0) dcT(th) = huff else acT(th) = huff
              s += 17 + total
            }
          case 0xC0 | 0xC1 => // SOF0 baseline / SOF1 extended sequential
            if (comps != null) return null
            val prec = if (segEnd - s < 6) -1 else b(s) & 0xFF
            // SOF0 is 8-bit by definition; SOF1 admits 12-bit samples
            if (prec != 8 && !(m == 0xC1 && prec == 12)) return null
            prec12 = prec == 12
            height = ((b(s + 1) & 0xFF) << 8) | (b(s + 2) & 0xFF)
            width = ((b(s + 3) & 0xFF) << 8) | (b(s + 4) & 0xFF)
            val nc = b(s + 5) & 0xFF
            if (width <= 0 || height <= 0 || (nc != 1 && nc != 3 && nc != 4)) return null
            if (segEnd - s != 6 + 3 * nc) return null
            if (width.toLong * height * nc > 64L * 1024 * 1024) return null
            comps = Array.fill(nc)(new Comp)
            var c = 0
            while (c < nc) {
              val o = s + 6 + 3 * c
              comps(c).id = b(o) & 0xFF
              comps(c).h = (b(o + 1) & 0xFF) >> 4
              comps(c).v = b(o + 1) & 0x0F
              comps(c).tq = b(o + 2) & 0x0F
              if (comps(c).h < 1 || comps(c).h > 2 ||
                  comps(c).v < 1 || comps(c).v > 2 || comps(c).tq > 3)
                return null
              c += 1
            }
          case 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 |
               0xC9 | 0xCA | 0xCB | 0xCD | 0xCE | 0xCF =>
            return null // non-sequential frame types: refuse, don't half-decode
          case 0xDD => // DRI
            if (segEnd - s != 2) return null
            restartInt = ((b(s) & 0xFF) << 8) | (b(s + 1) & 0xFF)
          case 0xDA => // SOS — decode and return
            if (comps == null) return null
            val ns = b(s) & 0xFF
            if (ns != comps.length || segEnd - s != 1 + 2 * ns + 3) return null
            var j = 0
            while (j < ns) {
              val cs = b(s + 1 + 2 * j) & 0xFF
              val c = comps.indexWhere(_.id == cs)
              if (c < 0) return null
              comps(c).dcTab = (b(s + 2 + 2 * j) & 0xFF) >> 4
              comps(c).acTab = b(s + 2 + 2 * j) & 0x0F
              if (comps(c).dcTab > 3 || comps(c).acTab > 3) return null
              j += 1
            }
            // baseline spectral selection / approximation must be 0..63, 0
            if ((b(segEnd - 3) & 0xFF) != 0 || (b(segEnd - 2) & 0xFF) != 63 ||
                (b(segEnd - 1) & 0xFF) != 0) return null
            var c2 = 0
            while (c2 < comps.length) {
              val cc = comps(c2)
              if (qt(cc.tq) == null || dcT(cc.dcTab) == null ||
                  acT(cc.acTab) == null) return null
              c2 += 1
            }
            if (comps.length == 4 && adobe != 0 && adobe != 2)
              return null // 4-component needs Adobe CMYK/YCCK provenance
            return decodeScan(b, segEnd, width, height, comps, qt, dcT, acT,
              restartInt, adobe, prec12)
          case 0xEE => // APP14: Adobe color-transform tag
            if (segEnd - s >= 12 && b(s) == 'A' && b(s + 1) == 'd' &&
                b(s + 2) == 'o' && b(s + 3) == 'b' && b(s + 4) == 'e')
              adobe = b(s + 11) & 0xFF
          case _ => () // APPn / COM / DNL: skip
        }
        i = segEnd
      }
    }
    null
  }

  private def decodeScan(b: Array[Byte], start: Int, width: Int, height: Int,
      comps: Array[Comp], qt: Array[Array[Int]], dcT: Array[Huff],
      acT: Array[Huff], restartInt: Int, adobe: Int = -1,
      prec12: Boolean = false): JpegRaw = {
    // T.81 A.2.2: a single-component scan is non-interleaved — one block
    // per MCU, declared sampling factors notwithstanding
    if (comps.length == 1) { comps(0).h = 1; comps(0).v = 1 }
    var hmax = 1
    var vmax = 1
    comps.foreach { c =>
      if (c.h > hmax) hmax = c.h
      if (c.v > vmax) vmax = c.v
    }
    val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
    comps.foreach { c =>
      c.planeW = mcusX * c.h * 8
      c.planeH = mcusY * c.v * 8
      // bounded by (w+15)(h+15)·4 ≤ ~4× the 64 MB pixel cap
      c.plane = new Array[Byte](c.planeW * c.planeH)
      c.pred = 0
    }
    val r = new BitReader(b, start)
    val coef = new Array[Int](64)
    val tmp = new Array[Double](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    var rst = 0
    while (mcu < nMcus) {
      if (restartInt > 0 && mcu > 0 && mcu % restartInt == 0) {
        r.readRestart(rst)
        rst = (rst + 1) & 7
        comps.foreach(_.pred = 0)
        if (r.failed) return null
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var c = 0
      while (c < comps.length) {
        val cc = comps(c)
        val q = qt(cc.tq)
        var v2 = 0
        while (v2 < cc.v) {
          var h2 = 0
          while (h2 < cc.h) {
            java.util.Arrays.fill(coef, 0)
            // DC
            val t = r.huffDecode(dcT(cc.dcTab))
            if (r.failed || t > (if (prec12) 15 else 11)) return null
            val diff = extend(r.receive(t), t)
            if (r.failed) return null
            cc.pred += diff
            coef(0) = cc.pred * q(0)
            // AC
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = r.huffDecode(acT(cc.acTab))
              if (r.failed) return null
              val run = rs >> 4
              val size = rs & 0x0F
              if (size == 0) {
                if (run == 15) k += 16 // ZRL
                else eob = true
              } else {
                k += run
                if (k > 63) return null
                coef(Zigzag(k)) = extend(r.receive(size), size) * q(k)
                if (r.failed) return null
                k += 1
              }
            }
            idctBlock(coef, tmp, cc.plane, cc.planeW,
              (mx * cc.h + h2) * 8, (my * cc.v + v2) * 8, prec12)
            h2 += 1
          }
          v2 += 1
        }
        c += 1
      }
      mcu += 1
    }
    // the stream must close with EOI (pad bits, then optional fill 0xFFs,
    // then FFD9) — same completeness contract as PNG's required IEND, so
    // a truncated tail refuses instead of passing off a partial decode
    var p = r.pos
    while (p < b.length && (b(p) & 0xFF) == 0xFF) p += 1
    if (p >= b.length || (b(p) & 0xFF) != 0xD9 || p == r.pos) return null
    compose(width, height, comps, hmax, vmax, adobe)
  }

  /** Separable double-precision IDCT of one dequantized block into the
    * component plane at (x0, y0), with level shift and clamp.
    */
  private def idctBlock(coef: Array[Int], tmp: Array[Double],
      plane: Array[Byte], planeW: Int, x0: Int, y0: Int,
      prec12: Boolean = false): Unit = {
    val K = Basis
    // rows: tmp(v*8+x) = Σ_u K(u)(x) · F(v*8+u)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += K(u)(x) * coef(v * 8 + u); u += 1 }
        tmp(v * 8 + x) = s
        x += 1
      }
      v += 1
    }
    // cols: f(x,y) = Σ_v K(v)(y) · tmp(v*8+x)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var vv = 0
        while (vv < 8) { s += K(vv)(y) * tmp(vv * 8 + x); vv += 1 }
        plane((y0 + y) * planeW + x0 + x) =
          (if (prec12) {
            // 12-bit: level shift 2048, clamp to the 12-bit range,
            // then normalize to the engine's 8-bit pixel contract
            val v = math.round(s).toInt + 2048
            val c = if (v < 0) 0 else if (v > 4095) 4095 else v
            (c >> 4).toByte
          } else clamp(math.round(s).toInt + 128).toByte)
        x += 1
      }
      y += 1
    }
  }

  /** Upsample (nearest: source index `x·h/hmax`, exact in SQL) and
    * convert to interleaved output; 3 components = JFIF YCbCr→RGB in
    * libjpeg fixed point, 1 component = grayscale passthrough.
    */
  private def compose(width: Int, height: Int, comps: Array[Comp],
      hmax: Int, vmax: Int, adobe: Int = -1): JpegRaw = {
    val nc = comps.length
    if (nc == 4) {
      // Adobe CMYK (transform 0) / YCCK (transform 2). Adobe stores
      // INVERTED ink (255 = no ink), so with stored values c',m',y',k'
      // the naive composite is R = c'·k'/255 (YCCK runs the YCbCr
      // inverse first to recover c'm'y'). Output is composited RGB —
      // the same 3-channel contract every other color source lands as.
      val rgb = new Array[Byte](width * height * 3)
      val c0 = comps(0); val c1 = comps(1)
      val c2 = comps(2); val c3 = comps(3)
      var y = 0
      while (y < height) {
        val y0 = y * c0.v / vmax; val y1 = y * c1.v / vmax
        val y2 = y * c2.v / vmax; val y3 = y * c3.v / vmax
        var x = 0
        while (x < width) {
          val s0 = c0.plane(y0 * c0.planeW + x * c0.h / hmax) & 0xFF
          val s1 = c1.plane(y1 * c1.planeW + x * c1.h / hmax) & 0xFF
          val s2 = c2.plane(y2 * c2.planeW + x * c2.h / hmax) & 0xFF
          val k = c3.plane(y3 * c3.planeW + x * c3.h / hmax) & 0xFF
          var ic = s0; var im = s1; var iy = s2
          if (adobe == 2) { // YCCK: YCbCr inverse recovers c'm'y'
            val pb = s1 - 128
            val pr = s2 - 128
            ic = clamp(s0 + fx(91881 * pr))
            im = clamp(s0 + fx(-22554 * pb - 46802 * pr))
            iy = clamp(s0 + fx(116130 * pb))
          }
          val o = (y * width + x) * 3
          rgb(o) = ((ic * k) / 255).toByte
          rgb(o + 1) = ((im * k) / 255).toByte
          rgb(o + 2) = ((iy * k) / 255).toByte
          x += 1
        }
        y += 1
      }
      return new JpegRaw(width, height, 3, rgb)
    }
    val out = new Array[Byte](width * height * nc)
    if (nc == 1) {
      val c = comps(0)
      var y = 0
      while (y < height) {
        System.arraycopy(c.plane, y * c.planeW, out, y * width, width)
        y += 1
      }
      return new JpegRaw(width, height, 1, out)
    }
    val cy = comps(0)
    val cb = comps(1)
    val cr = comps(2)
    var y = 0
    while (y < height) {
      val yY = y * cy.v / vmax
      val yB = y * cb.v / vmax
      val yR = y * cr.v / vmax
      var x = 0
      while (x < width) {
        val lum = cy.plane(yY * cy.planeW + x * cy.h / hmax) & 0xFF
        val pb = (cb.plane(yB * cb.planeW + x * cb.h / hmax) & 0xFF) - 128
        val pr = (cr.plane(yR * cr.planeW + x * cr.h / hmax) & 0xFF) - 128
        val o = (y * width + x) * 3
        out(o) = clamp(lum + fx(91881 * pr)).toByte
        out(o + 1) = clamp(lum + fx(-22554 * pb - 46802 * pr)).toByte
        out(o + 2) = clamp(lum + fx(116130 * pb)).toByte
        x += 1
      }
      y += 1
    }
    new JpegRaw(width, height, 3, out)
  }
}

/** Full baseline-JPEG pixel decode — `JpegPixels(content)` entropy-decodes
  * every block ([[JpegDecode]]) and returns the same per-image statistics
  * struct as [[PngPixels]]:
  *
  * `struct<width int, height int, channels int, pix_sum long,
  * pix_wsum long, mean_r double, mean_g double, mean_b double>`
  *
  * over the interleaved decoded pixel stream (RGB for 3-component
  * images; for grayscale the stream is one byte per pixel and all three
  * means equal the gray mean). `pix_wsum = Σ (p mod 9973 + 1)·v(p)` is
  * order-sensitive, so a decoder that misplaces blocks, mis-upsamples,
  * or permutes channels cannot match it. NULL for anything outside
  * [[JpegDecode]]'s baseline envelope. Per-row scan projection — decoded
  * pixels never leave the expression.
  */
case class JpegPixels(child: Expression) extends UnaryExpression {

  override def dataType: DataType = PngPixels.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jpeg_pixels"

  override protected def nullSafeEval(input: Any): Any =
    JpegPixels.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.expressions.JpegPixels.compute($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): JpegPixels =
    copy(child = newChild)
}

object JpegPixels {

  /** Static kernel shared by interpreted eval and generated code.
    * Baseline AND full-progressive streams decode
    * ([[JpegDecode.decodeAny]]); the refusal envelope is the union of
    * both paths' documented contracts.
    */
  def compute(b: Array[Byte]): InternalRow = {
    val d = JpegDecode.decodeAny(b)
    if (d == null) return null
    val n = d.width.toLong * d.height
    var pixSum = 0L
    var wSum = 0L
    val chanSum = new Array[Long](d.channels)
    var p = 0
    val total = d.pix.length
    while (p < total) {
      val v = d.pix(p) & 0xFF
      pixSum += v
      wSum += (p % 9973 + 1) * v.toLong
      chanSum(p % d.channels) += v
      p += 1
    }
    val mr = chanSum(0).toDouble / n
    val (mg, mb) =
      if (d.channels == 3) (chanSum(1).toDouble / n, chanSum(2).toDouble / n)
      else (mr, mr)
    new GenericInternalRow(Array[Any](d.width, d.height, d.channels, pixSum,
      wSum, mr, mg, mb))
  }
}

/** 64-bit perceptual difference hash of a baseline JPEG — identical grid,
  * grayscale reduction and bit layout to [[PngDHash]] (shared
  * [[PngDHash.gradientHash]] kernel), so a PNG and a JPEG of the same
  * image land near each other in one Hamming space and the banded
  * near-dup join ([[graft.llmops.DedupOps.hammingNearDups]]) works
  * across formats. Grayscale JPEGs hash their luma directly; color ones
  * reduce decoded RGB with the same integer `(r+g+b)/3`. NULL for
  * anything [[JpegDecode]] refuses or images smaller than the 9×8 grid.
  */
case class JpegDHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jpeg_dhash"

  override protected def nullSafeEval(input: Any): Any =
    JpegDHash.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // freshName, never a literal: two of these in one whole-stage
      // span would redefine the local and kick the WHOLE stage to
      // interpreted (janino "Redefinition of local variable")
      val v = ctx.freshName("jdh")
      s"""
         |java.lang.Long $v = graft.expressions.JpegDHash.compute($c);
         |if ($v == null) { ${ev.isNull} = true; } else { ${ev.value} = $v.longValue(); }
       """.stripMargin
      })

  override protected def withNewChildInternal(newChild: Expression): JpegDHash =
    copy(child = newChild)
}

/** EXIF orientation of a JPEG (tag 0x0112 in the APP1 TIFF IFD0): 1-8,
  * NULL when the segment is absent or malformed. The per-row input of
  * orientation-aware pipelines — and the reason [[JpegDHashOriented]]
  * exists: cameras store sensor-rotated pixels and a display transform,
  * so two bytewise-different files can be the same picture.
  */
case class JpegExifOrientation(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jpeg_exif_orientation"

  override protected def nullSafeEval(input: Any): Any =
    JpegExifOrientation.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // freshName, never a literal: two of these in one whole-stage
      // span would redefine the local and kick the WHOLE stage to
      // interpreted (janino "Redefinition of local variable")
      val v = ctx.freshName("jo")
      s"""
         |java.lang.Integer $v = graft.expressions.JpegExifOrientation.compute($c);
         |if ($v == null) { ${ev.isNull} = true; } else { ${ev.value} = $v.intValue(); }
       """.stripMargin
      })

  override protected def withNewChildInternal(newChild: Expression): JpegExifOrientation =
    copy(child = newChild)
}

object JpegExifOrientation {
  /** Static kernel shared by interpreted eval and generated code. */
  def compute(b: Array[Byte]): java.lang.Integer = {
    val o = JpegDecode.exifOrientation(b)
    if (o < 1) null else java.lang.Integer.valueOf(o)
  }
}

/** Orientation-NORMALIZED perceptual hash — [[JpegDHash]] computed in
  * display space: the EXIF transform (rotate/flip, orientations 1-8;
  * absent = 1) is applied to the GRID COORDINATES while pixels stay in
  * sensor order, so a camera file and its physically-rotated re-save
  * hash identically. Without this, every orientation-6 phone photo is
  * Hamming-far from its rotated copy and image dedup silently misses
  * them. NULL when undecodable or when the DISPLAY dimensions are under
  * the 9×8 grid.
  */
case class JpegDHashOriented(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jpeg_dhash_oriented"

  override protected def nullSafeEval(input: Any): Any =
    JpegDHashOriented.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // freshName, never a literal: two of these in one whole-stage
      // span would redefine the local and kick the WHOLE stage to
      // interpreted (janino "Redefinition of local variable")
      val v = ctx.freshName("jho")
      s"""
         |java.lang.Long $v = graft.expressions.JpegDHashOriented.compute($c);
         |if ($v == null) { ${ev.isNull} = true; } else { ${ev.value} = $v.longValue(); }
       """.stripMargin
      })

  override protected def withNewChildInternal(newChild: Expression): JpegDHashOriented =
    copy(child = newChild)
}

object JpegDHashOriented {

  /** Progressive arm: the oriented hash from the DC-only luma map —
    * identical display transform on the grid coordinates, gray from the
    * block means.
    */
  private def dcMapHashOriented(dcm: JpegDecode.DcLumaMap,
      o: Int): java.lang.Long = {
    val w = dcm.width
    val h = dcm.height
    val tw = if (o >= 5) h else w
    val th = if (o >= 5) w else h
    if (tw < PngDHash.GridW || th < PngDHash.GridH) return null
    val gw = PngDHash.GridW
    val gh = PngDHash.GridH
    val sums = new Array[Long](gw * gh)
    val cnts = new Array[Long](gw * gh)
    var y = 0
    while (y < h) {
      val by = (y * dcm.v0 / dcm.vmax) >> 3
      var x = 0
      while (x < w) {
        val tx = o match {
          case 1 | 4 => x
          case 2 | 3 => w - 1 - x
          case 5 | 8 => y
          case _ => h - 1 - y // 6 | 7
        }
        val ty = o match {
          case 1 | 2 => y
          case 3 | 4 => h - 1 - y
          case 5 | 6 => x
          case _ => w - 1 - x // 7 | 8
        }
        val bx = (x * dcm.h0 / dcm.hmax) >> 3
        val cell = PngDHash.cellIndex(ty, th, gh) * gw +
          PngDHash.cellIndex(tx, tw, gw)
        sums(cell) += dcm.vals(by * dcm.bw + bx)
        cnts(cell) += 1L
        x += 1
      }
      y += 1
    }
    java.lang.Long.valueOf(PngDHash.gradientHash(sums, cnts))
  }

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(b: Array[Byte]): java.lang.Long = {
    val d = JpegDecode.decode(b)
    if (d == null) {
      val dcm = JpegDecode.decodeProgressiveDcLuma(b)
      if (dcm == null) return null
      val po0 = JpegDecode.exifOrientation(b)
      return dcMapHashOriented(dcm, if (po0 < 1) 1 else po0)
    }
    val o0 = JpegDecode.exifOrientation(b)
    val o = if (o0 < 1) 1 else o0
    val w = d.width
    val h = d.height
    val tw = if (o >= 5) h else w
    val th = if (o >= 5) w else h
    if (tw < PngDHash.GridW || th < PngDHash.GridH) return null
    val gw = PngDHash.GridW
    val gh = PngDHash.GridH
    val sums = new Array[Long](gw * gh)
    val cnts = new Array[Long](gw * gh)
    val nc = d.channels
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        // display position of sensor pixel (x, y) under the EXIF map
        val tx = o match {
          case 1 | 4 => x
          case 2 | 3 => w - 1 - x
          case 5 | 8 => y
          case _ => h - 1 - y // 6 | 7
        }
        val ty = o match {
          case 1 | 2 => y
          case 3 | 4 => h - 1 - y
          case 5 | 6 => x
          case _ => w - 1 - x // 7 | 8
        }
        val p = (y * w + x) * nc
        val gray =
          if (nc == 1) d.pix(p) & 0xFF
          else ((d.pix(p) & 0xFF) + (d.pix(p + 1) & 0xFF) +
            (d.pix(p + 2) & 0xFF)) / 3
        val cell = PngDHash.cellIndex(ty, th, gh) * gw +
          PngDHash.cellIndex(tx, tw, gw)
        sums(cell) += gray
        cnts(cell) += 1L
        x += 1
      }
      y += 1
    }
    java.lang.Long.valueOf(PngDHash.gradientHash(sums, cnts))
  }
}

object JpegDHash {

  /** Grid hash from a progressive DC-only luma map: the same per-pixel
    * cell accumulation as the baseline path, with every pixel's gray
    * taken from its 8×8 block's DC mean. Bit-exact vs the full decode
    * on block-constant content; within the DC approximation elsewhere —
    * which is the point of a difference hash.
    */
  private[expressions] def dcMapHash(dcm: JpegDecode.DcLumaMap): java.lang.Long = {
    if (dcm.width < PngDHash.GridW || dcm.height < PngDHash.GridH) return null
    val gw = PngDHash.GridW
    val gh = PngDHash.GridH
    val sums = new Array[Long](gw * gh)
    val cnts = new Array[Long](gw * gh)
    var y = 0
    while (y < dcm.height) {
      val cy = PngDHash.cellIndex(y, dcm.height, gh)
      val by = (y * dcm.v0 / dcm.vmax) >> 3
      var x = 0
      while (x < dcm.width) {
        val cx = PngDHash.cellIndex(x, dcm.width, gw)
        val bx = (x * dcm.h0 / dcm.hmax) >> 3
        val cell = cy * gw + cx
        sums(cell) += dcm.vals(by * dcm.bw + bx)
        cnts(cell) += 1L
        x += 1
      }
      y += 1
    }
    java.lang.Long.valueOf(PngDHash.gradientHash(sums, cnts))
  }

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(b: Array[Byte]): java.lang.Long = {
    val d = JpegDecode.decode(b)
    if (d == null) {
      // progressive arm: a 9×8 hash needs only the DC plane, which the
      // first scan of an SOF2 stream carries in full
      val dcm = JpegDecode.decodeProgressiveDcLuma(b)
      if (dcm == null) return null
      return dcMapHash(dcm)
    }
    if (d.width < PngDHash.GridW || d.height < PngDHash.GridH)
      return null
    val gw = PngDHash.GridW
    val gh = PngDHash.GridH
    val sums = new Array[Long](gw * gh)
    val cnts = new Array[Long](gw * gh)
    val nc = d.channels
    var y = 0
    while (y < d.height) {
      val cy = PngDHash.cellIndex(y, d.height, gh)
      var x = 0
      while (x < d.width) {
        val cx = PngDHash.cellIndex(x, d.width, gw)
        val p = (y * d.width + x) * nc
        val gray =
          if (nc == 1) d.pix(p) & 0xFF
          else ((d.pix(p) & 0xFF) + (d.pix(p + 1) & 0xFF) +
            (d.pix(p + 2) & 0xFF)) / 3
        val cell = cy * gw + cx
        sums(cell) += gray
        cnts(cell) += 1L
        x += 1
      }
      y += 1
    }
    java.lang.Long.valueOf(PngDHash.gradientHash(sums, cnts))
  }
}
