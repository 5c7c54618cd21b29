package graft.llmops

import java.io.ByteArrayOutputStream

/** GIF writer twin of [[graft.expressions.GifDecode]] — real, decodable
  * GIF87a/89a streams for fixtures and round-trip proofs, built
  * independently of the decoder (its own LZW dictionary build, its own
  * interlace row schedule) so a round-trip equality actually checks two
  * implementations against the spec rather than one against itself.
  *
  * Knobs cover the layouts crawls deliver: global vs per-image local
  * color tables, interlaced rows, multi-frame animations with Graphic
  * Control Extensions (per-frame disposal, delay, transparency),
  * partial-canvas frames at an offset, 87a vs 89a version tags, and
  * LZW streams that exercise dictionary resets at 4096 entries.
  */
object GifWriter {

  /** One animation frame: `indices` are palette indices row-major in
    * DISPLAY order (the writer handles interlace reordering),
    * `localPalette` overrides the global table for this frame,
    * `transparentIdx` pixels leave the canvas unchanged, `disposal` is
    * the GCE disposal method (0/1 leave, 2 background, 3 previous).
    */
  final case class Frame(left: Int, top: Int, width: Int, height: Int,
      indices: Array[Byte], interlaced: Boolean = false,
      localPalette: Option[Array[Byte]] = None,
      transparentIdx: Option[Int] = None, disposal: Int = 0,
      delayCs: Int = 4)

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)

  /** 256-entry grayscale palette: index i → (i, i, i). */
  def grayPalette: Array[Byte] = {
    val p = new Array[Byte](768)
    var i = 0
    while (i < 256) {
      p(i * 3) = i.toByte; p(i * 3 + 1) = i.toByte; p(i * 3 + 2) = i.toByte
      i += 1
    }
    p
  }

  /** Full stream from palette + frames. `globalPalette = None` writes
    * no GCT (every frame must then carry a local table — the layout the
    * decoder's no-table refusal and black-background convention cover).
    */
  def gif(width: Int, height: Int, frames: Seq[Frame],
      globalPalette: Option[Array[Byte]] = Some(grayPalette),
      bgIndex: Int = 0, version: String = "89a"): Array[Byte] = {
    require(version == "87a" || version == "89a", s"bad version $version")
    val out = new ByteArrayOutputStream()
    out.write(s"GIF$version".getBytes("US-ASCII"))
    out.write(le16(width)); out.write(le16(height))
    globalPalette match {
      case Some(p) =>
        val bits = paletteBits(p)
        out.write(0x80 | ((bits - 1) << 4) | (bits - 1))
        out.write(bgIndex)
        out.write(0) // aspect
        out.write(pad(p, bits))
      case None =>
        out.write(0); out.write(0); out.write(0)
    }
    for (f <- frames) {
      val needGce = f.transparentIdx.isDefined || f.disposal != 0
      if (needGce) {
        out.write(0x21); out.write(0xF9); out.write(4)
        out.write((f.disposal << 2) | (if (f.transparentIdx.isDefined) 1 else 0))
        out.write(le16(f.delayCs))
        out.write(f.transparentIdx.getOrElse(0))
        out.write(0)
      }
      out.write(0x2C)
      out.write(le16(f.left)); out.write(le16(f.top))
      out.write(le16(f.width)); out.write(le16(f.height))
      f.localPalette match {
        case Some(p) =>
          val bits = paletteBits(p)
          out.write(0x80 | (if (f.interlaced) 0x40 else 0) | (bits - 1))
          out.write(pad(p, bits))
        case None =>
          out.write(if (f.interlaced) 0x40 else 0)
      }
      val paletteSize = (f.localPalette orElse globalPalette)
        .map(p => pad(p, paletteBits(p)).length / 3).getOrElse(256)
      val minCode = math.max(2, 32 - Integer.numberOfLeadingZeros(paletteSize - 1))
      val streamOrder =
        if (f.interlaced) interlaceReorder(f.indices, f.width, f.height)
        else f.indices
      out.write(minCode)
      val z = lzwEncode(streamOrder, minCode)
      var off = 0
      while (off < z.length) {
        val n = math.min(255, z.length - off)
        out.write(n)
        out.write(z, off, n)
        off += n
      }
      out.write(0) // block terminator
    }
    out.write(0x3B)
    out.toByteArray
  }

  /** Single grayscale frame from a pixel function — the fixture
    * workhorse, mirroring `JpegWriter.gray` / `ImageWriter.pngFromPixels`
    * so one closed-form pattern plants cross-format twins.
    */
  def gray(width: Int, height: Int, f: (Int, Int) => Int,
      interlaced: Boolean = false, version: String = "89a",
      localPalette: Boolean = false): Array[Byte] = {
    val idx = Array.tabulate(height * width)(k =>
      (f(k % width, k / width) & 0xFF).toByte)
    gif(width, height,
      Seq(Frame(0, 0, width, height, idx, interlaced = interlaced,
        localPalette = if (localPalette) Some(grayPalette) else None)),
      globalPalette = if (localPalette) None else Some(grayPalette),
      version = version)
  }

  /** Full-frame grayscale animation, one pattern per frame. */
  def animatedGray(width: Int, height: Int,
      pats: Seq[(Int, Int) => Int], disposal: Int = 0): Array[Byte] =
    gif(width, height, pats.map { p =>
      Frame(0, 0, width, height,
        Array.tabulate(height * width)(k =>
          (p(k % width, k / width) & 0xFF).toByte),
        disposal = disposal)
    })

  /** Palette size in index bits (1..8); GIF stores tables at power-of-2
    * entry counts, so short palettes are padded by [[pad]].
    */
  private def paletteBits(p: Array[Byte]): Int = {
    val entries = p.length / 3
    require(entries >= 2 && entries <= 256, s"palette entries $entries")
    math.max(1, 32 - Integer.numberOfLeadingZeros(entries - 1))
  }

  private def pad(p: Array[Byte], bits: Int): Array[Byte] = {
    val want = 3 * (1 << bits)
    if (p.length == want) p else java.util.Arrays.copyOf(p, want)
  }

  /** Display-order rows → GIF interlace stream order (pass starts
    * 0/4/2/1, steps 8/8/4/2).
    */
  private def interlaceReorder(indices: Array[Byte], w: Int,
      h: Int): Array[Byte] = {
    val out = new Array[Byte](indices.length)
    var sy = 0
    val passes = Array((0, 8), (4, 8), (2, 4), (1, 2))
    for ((start, step) <- passes) {
      var y = start
      while (y < h) {
        System.arraycopy(indices, y * w, out, sy * w, w)
        sy += 1
        y += step
      }
    }
    out
  }

  /** GIF-variant LZW compression: LSB-first bit packing, initial code
    * width `minCodeSize+1`, clear code emitted first and again whenever
    * the dictionary fills at 4096 entries, EOI last. The dictionary is
    * a flat open-addressed map keyed on `(prefixCode << 8) | byte`.
    */
  def lzwEncode(indices: Array[Byte], minCodeSize: Int): Array[Byte] = {
    require(minCodeSize >= 2 && minCodeSize <= 8, s"minCodeSize $minCodeSize")
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new ByteArrayOutputStream()
    var bitBuf = 0
    var bitCnt = 0
    var width = minCodeSize + 1
    def emit(code: Int): Unit = {
      bitBuf |= code << bitCnt
      bitCnt += width
      while (bitCnt >= 8) {
        out.write(bitBuf & 0xFF)
        bitBuf >>>= 8
        bitCnt -= 8
      }
    }
    val dict = new java.util.HashMap[Integer, Integer]()
    var next = eoi + 1
    emit(clear)
    if (indices.isEmpty) {
      emit(eoi)
      if (bitCnt > 0) out.write(bitBuf & 0xFF)
      return out.toByteArray
    }
    var prev: Int = indices(0) & 0xFF
    var i = 1
    while (i < indices.length) {
      val b = indices(i) & 0xFF
      val key = Integer.valueOf((prev << 8) | b)
      val hit = dict.get(key)
      if (hit != null) {
        prev = hit.intValue()
      } else {
        emit(prev)
        // width sync: the decoder's dictionary lags the encoder's by one
        // entry (it builds entry k while READING emission k+1), so the
        // grow check uses `next` BEFORE this emission's insert — the
        // giflib ordering; checking after the insert widens one code too
        // late and desynchronizes every stream long enough to grow
        if (next == (1 << width) && width < 12) width += 1
        if (next < 4096) {
          dict.put(key, Integer.valueOf(next))
          next += 1
        } else { // dictionary full: reset, mirroring the decoder's clear
          emit(clear)
          dict.clear()
          next = eoi + 1
          width = minCodeSize + 1
        }
        prev = b
      }
      i += 1
    }
    emit(prev)
    emit(eoi)
    if (bitCnt > 0) out.write(bitBuf & 0xFF)
    out.toByteArray
  }
}
