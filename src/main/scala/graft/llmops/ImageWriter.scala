package graft.llmops

import java.io.ByteArrayOutputStream

/** Minimal, structurally valid image byte builders (PNG/GIF/BMP/JPEG
  * headers + terminators, no pixel payload) — the synthetic-input partner
  * of [[graft.expressions.ImageDims]], exactly as [[OoxmlWriter]] partners
  * the OOXML parsers: gate queries and specs build real binary headers
  * with known dimensions instead of shipping binary fixtures. Deterministic
  * bytes for identical inputs.
  */
object ImageWriter {

  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def be32(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, (v >>> 24).toByte)

  /** PNG signature + IHDR (real CRC) + empty IEND. */
  def png(width: Int, height: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    val ihdr = "IHDR".getBytes("US-ASCII") ++ be32(width) ++ be32(height) ++
      Array[Byte](8, 2, 0, 0, 0) // bit depth 8, truecolor
    out.write(be32(13))
    out.write(ihdr)
    val crc = new java.util.zip.CRC32(); crc.update(ihdr)
    out.write(be32(crc.getValue.toInt))
    val iend = "IEND".getBytes("US-ASCII")
    out.write(be32(0)); out.write(iend)
    val crc2 = new java.util.zip.CRC32(); crc2.update(iend)
    out.write(be32(crc2.getValue.toInt))
    out.toByteArray
  }

  /** COMPLETE PNG with real pixel data — the full-decode partner of
    * [[graft.expressions.PngPixels]] the way the header-only [[png]]
    * partners [[graft.expressions.ImageDims]]. 8-bit truecolor (RGB,
    * `channels = 3`) or truecolor-alpha (RGBA, 4); scanlines are
    * deflate-compressed into one IDAT with row `y` written under filter
    * type `y % 5`, so a decoder must implement ALL five PNG filters
    * (None/Sub/Up/Average/Paeth) to reconstruct the image.
    *
    * Pixel bytes are the closed form
    * `v(x, y, c) = (3x + 7y + 11c + seed) mod 256` — chosen so an
    * external SQL engine can compute the expected pixel statistics from
    * (width, height, seed) alone, with no image library, and verify the
    * decode exactly.
    */
  def pngWithPixels(width: Int, height: Int, seed: Int,
      channels: Int = 3): Array[Byte] =
    pngFromPixels(width, height,
      Array.tabulate(height, width * channels) { (y, i) =>
        val x = i / channels
        val c = i % channels
        ((3 * x + 7 * y + 11 * c + seed) % 256).toByte
      }, channels)

  /** COMPLETE PNG from caller-supplied pixel bytes —
    * `pixels(y)(x*channels + c)` in scanline order — for fixtures whose
    * content must be controlled exactly (e.g. crafting images a known
    * Hamming distance apart in [[graft.expressions.PngDHash]] space,
    * which the closed-form [[pngWithPixels]] pattern cannot do). Same
    * encoding as [[pngWithPixels]]: row `y` filtered with type `y % 5`,
    * one deflated IDAT.
    */
  def pngFromPixels(width: Int, height: Int, raw: Array[Array[Byte]],
      channels: Int = 3): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims: ${width}x$height")
    require(channels == 3 || channels == 4, s"channels must be 3|4: $channels")
    val bpp = channels
    val stride = width * bpp
    require(raw.length == height && raw.forall(_.length == stride),
      s"pixels must be $height rows × $stride bytes")
    // filter each scanline (encode direction: filtered = raw - predictor)
    val filtered = new ByteArrayOutputStream()
    for (y <- 0 until height) {
      val f = y % 5
      filtered.write(f)
      val row = raw(y)
      val prior = if (y == 0) new Array[Byte](stride) else raw(y - 1)
      var i = 0
      while (i < stride) {
        val cur = row(i) & 0xFF
        val left = if (i >= bpp) row(i - bpp) & 0xFF else 0
        val up = prior(i) & 0xFF
        val upLeft = if (i >= bpp) prior(i - bpp) & 0xFF else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => // Paeth
            val p = left + up - upLeft
            val pa = math.abs(p - left)
            val pb = math.abs(p - up)
            val pc = math.abs(p - upLeft)
            if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft
        }
        filtered.write((cur - pred) & 0xFF)
        i += 1
      }
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(filtered.toByteArray)
    deflater.finish()
    val idat = new ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!deflater.finished()) idat.write(buf, 0, deflater.deflate(buf))
    deflater.end()

    val out = new ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.write(be32(data.length))
      val td = typ.getBytes("US-ASCII") ++ data
      out.write(td)
      val crc = new java.util.zip.CRC32(); crc.update(td)
      out.write(be32(crc.getValue.toInt))
    }
    val colorType: Byte = if (channels == 4) 6 else 2
    chunk("IHDR", be32(width) ++ be32(height) ++
      Array[Byte](8, colorType, 0, 0, 0))
    chunk("IDAT", idat.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Adam7 pass geometry (xStart, yStart, xStep, yStep). */
  private val Adam7 = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** Generic PNG encode across the full spec surface: any legal
    * depth/colorType combo, sequential or Adam7, filter 0 rows, one
    * zlib IDAT. `sample(x, y)` returns the per-channel UNSCALED samples
    * at the target depth (e.g. 0..15 for depth 4, 0..65535 for 16).
    * The writer twin of the extended decoder — independent bit packing
    * and its own interlace schedule, so round trips check two
    * implementations against the spec.
    */
  def pngEncode(width: Int, height: Int, depth: Int, colorType: Int,
      sample: (Int, Int) => Array[Int], interlaced: Boolean = false,
      palette: Array[Byte] = null, trns: Array[Byte] = null): Array[Byte] = {
    val channels = colorType match {
      case 0 | 3 => 1
      case 2 => 3
      case 4 => 2
      case 6 => 4
      case _ => throw new IllegalArgumentException(s"colorType $colorType")
    }
    val bitsPP = channels * depth
    val passes =
      if (!interlaced) Array((0, 0, 1, 1, width, height))
      else Adam7.map { case (xs, ys, xd, yd) =>
        (xs, ys, xd, yd,
          if (width > xs) (width - xs + xd - 1) / xd else 0,
          if (height > ys) (height - ys + yd - 1) / yd else 0)
      }
    val rawOut = new ByteArrayOutputStream()
    for ((xs, ys, xd, yd, pw, ph) <- passes if pw > 0 && ph > 0) {
      val rowBytes = (pw * bitsPP + 7) / 8
      val row = new Array[Byte](rowBytes)
      var y = 0
      while (y < ph) {
        java.util.Arrays.fill(row, 0.toByte)
        var bitPos = 0
        var x = 0
        while (x < pw) {
          val s = sample(xs + x * xd, ys + y * yd)
          var c = 0
          while (c < channels) {
            val v = s(c)
            if (depth == 16) {
              row(bitPos >> 3) = ((v >> 8) & 0xFF).toByte
              row((bitPos >> 3) + 1) = (v & 0xFF).toByte
              bitPos += 16
            } else if (depth == 8) {
              row(bitPos >> 3) = (v & 0xFF).toByte
              bitPos += 8
            } else { // big-endian packing within the byte
              val shift = 8 - depth - (bitPos & 7)
              row(bitPos >> 3) =
                (row(bitPos >> 3) | ((v & ((1 << depth) - 1)) << shift)).toByte
              bitPos += depth
            }
            c += 1
          }
          x += 1
        }
        rawOut.write(0) // filter: None
        rawOut.write(row)
        y += 1
      }
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(rawOut.toByteArray)
    deflater.finish()
    val idat = new ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!deflater.finished()) idat.write(buf, 0, deflater.deflate(buf))
    deflater.end()

    val out = new ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.write(be32(data.length))
      val td = typ.getBytes("US-ASCII") ++ data
      out.write(td)
      val crc = new java.util.zip.CRC32(); crc.update(td)
      out.write(be32(crc.getValue.toInt))
    }
    chunk("IHDR", be32(width) ++ be32(height) ++
      Array[Byte](depth.toByte, colorType.toByte, 0, 0,
        if (interlaced) 1 else 0))
    if (palette != null) chunk("PLTE", palette)
    if (trns != null) chunk("tRNS", trns)
    chunk("IDAT", idat.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Grayscale PNG at any legal depth (1/2/4/8/16); `f` returns the
    * UNSCALED sample (0..2^depth−1).
    */
  def pngGray(width: Int, height: Int, f: (Int, Int) => Int,
      depth: Int = 8, interlaced: Boolean = false): Array[Byte] =
    pngEncode(width, height, depth, 0,
      (x, y) => Array(f(x, y)), interlaced)

  /** Palette PNG (color type 3) at depth 1/2/4/8; `idx` returns the
    * palette index, `palette` is packed RGB triples, optional `trns`
    * gives per-entry alpha.
    */
  def pngIndexed(width: Int, height: Int, palette: Array[Byte],
      idx: (Int, Int) => Int, depth: Int = 8,
      trns: Array[Byte] = null, interlaced: Boolean = false): Array[Byte] =
    pngEncode(width, height, depth, 3,
      (x, y) => Array(idx(x, y)), interlaced, palette, trns)

  /** Gray+alpha PNG (color type 4, depth 8). */
  def pngGrayAlpha(width: Int, height: Int, f: (Int, Int) => Int,
      a: (Int, Int) => Int): Array[Byte] =
    pngEncode(width, height, 8, 4, (x, y) => Array(f(x, y), a(x, y)))

  /** Truecolor PNG via the generic encoder — the interlaced/16-bit
    * twin of [[pngFromPixels]]; `f` returns (r, g, b) at the depth.
    */
  def pngRgb(width: Int, height: Int, f: (Int, Int) => (Int, Int, Int),
      depth: Int = 8, interlaced: Boolean = false): Array[Byte] =
    pngEncode(width, height, depth, 2,
      (x, y) => { val (r, g, b) = f(x, y); Array(r, g, b) }, interlaced)

  /** TIFF writer twin of [[graft.expressions.TiffDecode]]: grayscale
    * (1/4/8 bits, either photometric), 8-bit RGB, or palette-color;
    * both byte orders; strip OR tiled layouts (`tileWidth`/`tileLength`
    * — §15 requires multiples of 16); segment compression none,
    * PackBits, TIFF LZW (early-change convention) or Deflate (zlib);
    * optional Predictor 2 horizontal differencing (8-bit modes).
    * `px(x, y)` is the gray level / palette index / packed 0xRRGGBB
    * per mode.
    */
  def tiffImage(width: Int, height: Int, px: (Int, Int) => Int,
      bits: Int = 8, rgb: Boolean = false, palette: Array[Int] = null,
      photometric: Int = -1, littleEndian: Boolean = true,
      rowsPerStrip: Int = 0, packBits: Boolean = false,
      lzw: Boolean = false, deflate: Boolean = false,
      predictor: Boolean = false,
      tileWidth: Int = 0, tileLength: Int = 0,
      planar: Boolean = false): Array[Byte] = {
    val blob = tiffIfdBlob(width, height, px, bits, rgb, palette,
      photometric, littleEndian, rowsPerStrip, packBits, lzw, deflate,
      predictor, tileWidth, tileLength, base = 8, nextIfd = 0,
      planar = planar)
    (if (littleEndian) Array[Byte]('I', 'I', 42, 0, 8, 0, 0, 0)
    else Array[Byte]('M', 'M', 0, 42, 0, 0, 0, 8)) ++ blob
  }

  /** Multi-page TIFF (IFD chain) — the shape scanned documents ship
    * in: one page per (width, height, px) triple, shared encoding
    * knobs, each IFD's next pointer chaining to the following page.
    */
  def tiffMultipage(pages: Seq[(Int, Int, (Int, Int) => Int)],
      bits: Int = 8, littleEndian: Boolean = true,
      lzw: Boolean = false, deflate: Boolean = false,
      packBits: Boolean = false, rowsPerStrip: Int = 0,
      tileWidth: Int = 0, tileLength: Int = 0): Array[Byte] = {
    require(pages.nonEmpty)
    // blob sizes are base/next independent: measure with dummies first
    val sizes = pages.map { case (w, h, px) =>
      tiffIfdBlob(w, h, px, bits, false, null, -1, littleEndian,
        rowsPerStrip, packBits, lzw, deflate, false, tileWidth,
        tileLength, base = 8, nextIfd = 0).length
    }
    val bases = sizes.scanLeft(8)(_ + _)
    val out = new ByteArrayOutputStream()
    out.write(if (littleEndian) Array[Byte]('I', 'I', 42, 0, 8, 0, 0, 0)
    else Array[Byte]('M', 'M', 0, 42, 0, 0, 0, 8))
    pages.zipWithIndex.foreach { case ((w, h, px), i) =>
      out.write(tiffIfdBlob(w, h, px, bits, false, null, -1, littleEndian,
        rowsPerStrip, packBits, lzw, deflate, false, tileWidth,
        tileLength, base = bases(i),
        nextIfd = if (i == pages.length - 1) 0 else bases(i + 1)))
    }
    out.toByteArray
  }

  private def tiffIfdBlob(width: Int, height: Int, px: (Int, Int) => Int,
      bits: Int, rgb: Boolean, palette: Array[Int],
      photometric: Int, littleEndian: Boolean,
      rowsPerStrip: Int, packBits: Boolean,
      lzw: Boolean, deflate: Boolean,
      predictor: Boolean,
      tileWidth: Int, tileLength: Int,
      base: Int, nextIfd: Int, planar: Boolean = false): Array[Byte] = {
    require(!rgb || bits == 8 || bits == 16)
    require(palette == null || bits <= 8, "palette indices are 4/8-bit")
    require(!planar || (rgb && tileWidth == 0),
      "planar config 2 is RGB strips only")
    require(Seq(packBits, lzw, deflate).count(identity) <= 1,
      "pick at most one compression")
    require(!predictor || bits == 8, "Predictor 2 needs 8-bit samples")
    val tiled = tileWidth > 0 || tileLength > 0
    require(!tiled || (tileWidth % 16 == 0 && tileLength % 16 == 0),
      "tile dims must be multiples of 16 (TIFF 6.0 section 15)")
    val compId =
      if (packBits) 32773 else if (lzw) 5 else if (deflate) 8 else 1
    val spp = if (rgb) 3 else 1
    val photo =
      if (photometric >= 0) photometric
      else if (rgb) 2 else if (palette != null) 3 else 1
    val levels = 1 << bits
    val rps = if (rowsPerStrip <= 0) height else rowsPerStrip

    // fill one segment's raw bytes from the pixel function; coordinates
    // beyond the image (tile padding) stay zero
    def rawSegment(x0: Int, y0: Int, cols: Int, rows: Int,
        segRowBytes: Int): Array[Byte] = {
      val raw = new Array[Byte](rows * segRowBytes)
      for (ry <- 0 until rows; cx <- 0 until cols) {
        val x = x0 + cx
        val y = y0 + ry
        if (x < width && y < height) {
          val v = px(x, y)
          def put16(p: Int, s16: Int): Unit =
            if (littleEndian) {
              raw(p) = (s16 & 0xFF).toByte
              raw(p + 1) = ((s16 >> 8) & 0xFF).toByte
            } else {
              raw(p) = ((s16 >> 8) & 0xFF).toByte
              raw(p + 1) = (s16 & 0xFF).toByte
            }
          if (rgb && bits == 16) {
            // 8-bit channel values widened v*257 (the PNG 16-bit move)
            val p = ry * segRowBytes + cx * 6
            put16(p, ((v >> 16) & 0xFF) * 257)
            put16(p + 2, ((v >> 8) & 0xFF) * 257)
            put16(p + 4, (v & 0xFF) * 257)
          } else if (rgb) {
            val p = ry * segRowBytes + cx * 3
            raw(p) = ((v >> 16) & 0xFF).toByte
            raw(p + 1) = ((v >> 8) & 0xFF).toByte
            raw(p + 2) = (v & 0xFF).toByte
          } else if (bits == 16) {
            val wide = (v & 0xFF) * 257
            put16(ry * segRowBytes + cx * 2,
              if (photo == 0) 65535 - wide else wide)
          } else {
            val stored =
              if (photo == 0) levels - 1 - (v & (levels - 1))
              else v & (levels - 1)
            val bitOff = cx * bits
            val shift = 8 - bits - (bitOff & 7)
            raw(ry * segRowBytes + (bitOff >> 3)) =
              (raw(ry * segRowBytes + (bitOff >> 3)) | (stored << shift)).toByte
          }
        }
      }
      if (predictor) { // §14: row-wise sample differencing, back to front
        var p = 0
        while (p < raw.length) {
          var i = segRowBytes - 1
          while (i >= spp) {
            raw(p + i) = (raw(p + i) - raw(p + i - spp)).toByte
            i -= 1
          }
          p += segRowBytes
        }
      }
      raw
    }
    def compress(raw: Array[Byte]): Array[Byte] = compId match {
      case 32773 => packBitsEncode(raw)
      case 5 => lzwEncode(raw)
      case 8 => deflateEncode(raw)
      case _ => raw
    }
    // planar config 2: one full set of strips per channel, rows carry
    // a single sample each (predictor stride 1)
    def planeSegment(c: Int, y0: Int, rows: Int,
        segRowBytes: Int): Array[Byte] = {
      val raw = new Array[Byte](rows * segRowBytes)
      for (ry <- 0 until rows; x <- 0 until width) {
        val v = px(x, y0 + ry)
        val chan = c match {
          case 0 => (v >> 16) & 0xFF
          case 1 => (v >> 8) & 0xFF
          case _ => v & 0xFF
        }
        if (bits == 16) {
          val wide = chan * 257
          val p = ry * segRowBytes + x * 2
          if (littleEndian) {
            raw(p) = (wide & 0xFF).toByte
            raw(p + 1) = ((wide >> 8) & 0xFF).toByte
          } else {
            raw(p) = ((wide >> 8) & 0xFF).toByte
            raw(p + 1) = (wide & 0xFF).toByte
          }
        } else raw(ry * segRowBytes + x) = chan.toByte
      }
      if (predictor) {
        var pr = 0
        while (pr < raw.length) {
          var i = segRowBytes - 1
          while (i >= 1) {
            raw(pr + i) = (raw(pr + i) - raw(pr + i - 1)).toByte
            i -= 1
          }
          pr += segRowBytes
        }
      }
      raw
    }
    val (strips, _) =
      if (planar) {
        val segRowBytes = (width * bits + 7) / 8
        ((for (c <- 0 until 3; y0 <- 0 until height by rps) yield
          compress(planeSegment(c, y0, math.min(rps, height - y0),
            segRowBytes))), 0)
      } else if (tiled) {
        val across = (width + tileWidth - 1) / tileWidth
        val down = (height + tileLength - 1) / tileLength
        val segRowBytes = (tileWidth * bits * spp + 7) / 8
        ((for (ty <- 0 until down; tx <- 0 until across) yield
          compress(rawSegment(tx * tileWidth, ty * tileLength,
            tileWidth, tileLength, segRowBytes))), across)
      } else {
        val rowBytes = (width * bits * spp + 7) / 8
        ((0 until height by rps).map { y0 =>
          compress(rawSegment(0, y0, width,
            math.min(rps, height - y0), rowBytes))
        }, 0)
      }
    def w16(v: Int): Array[Byte] =
      if (littleEndian) Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
      else Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def w32(v: Int): Array[Byte] =
      if (littleEndian) Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
      else Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
        ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

    // tags, ascending: 256,257,258,259,262,[273],277,[278,279],
    // [317],[320],[322,323,324,325]
    val nTags = (if (tiled) 10 else 9) + (if (planar) 1 else 0) +
      (if (predictor) 1 else 0) + (if (palette != null) 1 else 0)
    val ifdOff = base
    val ifdSize = 2 + nTags * 12 + 4
    var extraOff = ifdOff + ifdSize // offset-stored arrays land here
    val extra = new ByteArrayOutputStream()
    def arrayValue(vals: Seq[Int], typ: Int): Array[Byte] = {
      // returns the 4-byte value field; spills to `extra` when too big
      val sz = if (typ == 3) 2 else 4
      if (vals.length * sz <= 4) {
        val f = new ByteArrayOutputStream()
        vals.foreach(v => f.write(if (typ == 3) w16(v) else w32(v)))
        while (f.size() < 4) f.write(0)
        f.toByteArray
      } else {
        val at = extraOff
        vals.foreach(v => extra.write(if (typ == 3) w16(v) else w32(v)))
        extraOff += vals.length * sz
        w32(at)
      }
    }
    // strip offsets need the data start, which depends on extra size —
    // compute in two passes: first reserve palette/bits arrays, then
    // strips after all extras
    val bitsField = arrayValue(Seq.fill(spp)(bits), 3)
    val palField =
      if (palette == null) null
      else arrayValue(
        (0 until levels).map(i => ((palette(i) >> 16) & 0xFF) * 257) ++
          (0 until levels).map(i => ((palette(i) >> 8) & 0xFF) * 257) ++
          (0 until levels).map(i => (palette(i) & 0xFF) * 257), 3)
    val offFieldSpill = strips.length * 4 > 4
    val cntFieldSpill = offFieldSpill
    val offAt = extraOff
    if (offFieldSpill) extraOff += strips.length * 4
    val cntAt = extraOff
    if (cntFieldSpill) extraOff += strips.length * 4
    val dataStart = extraOff
    val stripOffsets = strips.scanLeft(dataStart)(_ + _.length).init
    if (offFieldSpill)
      stripOffsets.foreach(o => extra.write(w32(o)))
    if (cntFieldSpill)
      strips.foreach(s => extra.write(w32(s.length)))

    val out = new ByteArrayOutputStream()
    out.write(w16(nTags))
    def tag(id: Int, typ: Int, count: Int, field: Array[Byte]): Unit = {
      out.write(w16(id)); out.write(w16(typ)); out.write(w32(count))
      out.write(field)
    }
    def shortField(v: Int): Array[Byte] = w16(v) ++ Array[Byte](0, 0)
    tag(256, 4, 1, w32(width))
    tag(257, 4, 1, w32(height))
    tag(258, 3, spp, bitsField)
    tag(259, 3, 1, shortField(compId))
    tag(262, 3, 1, shortField(photo))
    if (!tiled)
      tag(273, 4, strips.length,
        if (offFieldSpill) w32(offAt) else w32(stripOffsets.head))
    tag(277, 3, 1, shortField(spp))
    if (!tiled) {
      tag(278, 4, 1, w32(rps))
      tag(279, 4, strips.length,
        if (cntFieldSpill) w32(cntAt) else w32(strips.head.length))
    }
    if (planar) tag(284, 3, 1, shortField(2))
    if (predictor) tag(317, 3, 1, shortField(2))
    if (palField != null) tag(320, 3, 3 * levels, palField)
    if (tiled) {
      tag(322, 4, 1, w32(tileWidth))
      tag(323, 4, 1, w32(tileLength))
      tag(324, 4, strips.length,
        if (offFieldSpill) w32(offAt) else w32(stripOffsets.head))
      tag(325, 4, strips.length,
        if (cntFieldSpill) w32(cntAt) else w32(strips.head.length))
    }
    out.write(w32(nextIfd)) // next IFD in the chain (0 = last)
    out.write(extra.toByteArray)
    strips.foreach(out.write)
    out.toByteArray
  }

  /** TIFF LZW encode (6.0 §13): MSB-first variable-width codes 9→12
    * bits with the early-change convention mirrored by
    * [[graft.expressions.TiffDecode]]; emits Clear at stream start and
    * again before the table fills (at next code 4094), EOI at end.
    */
  def lzwEncode(raw: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(raw.length / 2 + 16)
    var cur = 0L
    var curBits = 0
    var codeSize = 9
    var next = 258
    val dict = new java.util.HashMap[Integer, Integer](8192)
    def put(code: Int): Unit = {
      cur = (cur << codeSize) | code
      curBits += codeSize
      while (curBits >= 8) {
        out.write(((cur >>> (curBits - 8)) & 0xFF).toInt)
        curBits -= 8
      }
    }
    put(256) // Clear
    var prev = -1
    var i = 0
    while (i < raw.length) {
      val k = raw(i) & 0xFF
      if (prev < 0) prev = k
      else {
        val key = Integer.valueOf((prev << 8) | k)
        val e = dict.get(key)
        if (e != null) prev = e.intValue()
        else {
          put(prev)
          dict.put(key, Integer.valueOf(next))
          next += 1
          // width pairing with the early-change decoder: the decoder
          // (which lags this table by one entry) bumps at 2^w - 1, so
          // the emitter bumps when the next assignment would be 2^w
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
          if (next == 4094) { // leave room: Clear + reset, spec note
            put(256)
            dict.clear()
            next = 258
            codeSize = 9
          }
          prev = k
        }
      }
      i += 1
    }
    if (prev >= 0) put(prev)
    put(257) // EOI
    if (curBits > 0) out.write(((cur << (8 - curBits)) & 0xFF).toInt)
    out.toByteArray
  }

  /** TIFF Deflate (8): one zlib stream per segment. */
  def deflateEncode(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    try {
      d.setInput(raw)
      d.finish()
      val out = new ByteArrayOutputStream(raw.length / 2 + 16)
      val buf = new Array[Byte](8192)
      while (!d.finished()) {
        val n = d.deflate(buf)
        out.write(buf, 0, n)
      }
      out.toByteArray
    } finally d.end()
  }

  /** PackBits encode (TIFF 6.0 §9): repeat runs ≥ 3 become two-byte
    * runs, everything else literal groups of ≤ 128.
    */
  def packBitsEncode(raw: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var i = 0
    while (i < raw.length) {
      var run = 1
      while (i + run < raw.length && raw(i + run) == raw(i) && run < 128)
        run += 1
      if (run >= 3) {
        out.write(1 - run) // -(run-1)
        out.write(raw(i))
        i += run
      } else {
        var lit = i
        var litLen = 0
        while (lit + litLen < raw.length && litLen < 128 && {
          // stop a literal group when a ≥3 repeat starts
          var r = 1
          while (lit + litLen + r < raw.length &&
            raw(lit + litLen + r) == raw(lit + litLen) && r < 3) r += 1
          r < 3
        }) litLen += 1
        if (litLen == 0) litLen = 1
        out.write(litLen - 1)
        out.write(raw, lit, litLen)
        i += litLen
      }
    }
    out.toByteArray
  }

  /** GIF89a header + logical screen descriptor + trailer. */
  def gif(width: Int, height: Int): Array[Byte] =
    "GIF89a".getBytes("US-ASCII") ++ le16(width) ++ le16(height) ++
      Array[Byte](0, 0, 0, 0x3B)

  /** Complete uncompressed BMP: `bpp` 24 (BGR rows) or 1/4/8 with a
    * BGRA palette; bottom-up by default, top-down with `topDown`;
    * 4-byte row padding. `px(x, y)` is (r, g, b) at 24bpp, a palette
    * index otherwise. The pixel-bearing twin of the header-only [[bmp]].
    */
  /** ICO writer twin: a favicon directory whose entries are headerless
    * 24-bpp DIBs (doubled height, bottom-up XOR rows, zeroed AND mask)
    * or, when `png` is set for an entry, an embedded PNG — both
    * real-world layouts. `images`: (width, height, gray(x,y), asPng).
    */
  def ico(images: Seq[(Int, Int, (Int, Int) => Int, Boolean)]): Array[Byte] = {
    require(images.nonEmpty && images.size <= 1024)
    val bodies = images.map { case (w, h, g, asPng) =>
      if (asPng)
        pngFromPixels(w, h,
          Array.tabulate(h, w * 3)((y, i) => g(i / 3, y).toByte))
      else {
        val out = new ByteArrayOutputStream()
        out.write(le32(40)) // BITMAPINFOHEADER
        out.write(le32(w))
        out.write(le32(2 * h)) // doubled: XOR + AND planes
        out.write(le16(1)); out.write(le16(24))
        out.write(le32(0)) // BI_RGB
        out.write(le32(0)); out.write(le32(0)); out.write(le32(0))
        out.write(le32(0)); out.write(le32(0))
        val xorRow = ((24 * w + 31) / 32) * 4
        var y = h - 1
        while (y >= 0) { // bottom-up
          val row = new Array[Byte](xorRow)
          var x = 0
          while (x < w) {
            val v = g(x, y) & 0xFF
            row(x * 3) = v.toByte; row(x * 3 + 1) = v.toByte
            row(x * 3 + 2) = v.toByte
            x += 1
          }
          out.write(row)
          y -= 1
        }
        val andRow = ((w + 31) / 32) * 4
        out.write(new Array[Byte](andRow * h)) // fully opaque mask
        out.toByteArray
      }
    }
    val out = new ByteArrayOutputStream()
    out.write(le16(0)); out.write(le16(1)); out.write(le16(images.size))
    var off = 6 + 16 * images.size
    images.zip(bodies).foreach { case ((w, h, _, _), body) =>
      out.write(if (w >= 256) 0 else w)
      out.write(if (h >= 256) 0 else h)
      out.write(0); out.write(0) // colors, reserved
      out.write(le16(1)); out.write(le16(24))
      out.write(le32(body.length))
      out.write(le32(off))
      off += body.length
    }
    bodies.foreach(b => out.write(b, 0, b.length))
    out.toByteArray
  }

  /** Netpbm writers — the PNM twin family. `kind`: 2 = ASCII graymap,
    * 5 = binary graymap (16-bit when `maxval` > 255: values widen
    * v*257 so the high-byte reduction reads back exactly v), 6 = binary
    * pixmap (gray written to all three channels).
    */
  def pnm(width: Int, height: Int, gray: (Int, Int) => Int, kind: Int = 5,
      maxval: Int = 255, comment: String = null): Array[Byte] = {
    require(kind == 2 || kind == 5 || kind == 6, s"pnm kind $kind")
    val out = new ByteArrayOutputStream()
    def s(str: String): Unit =
      out.write(str.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    s(s"P$kind\n")
    if (comment != null) s(s"# $comment\n")
    s(s"$width $height\n$maxval\n")
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val g = gray(x, y) & 0xFF
        val v = if (maxval > 255) g * 257 else g
        kind match {
          case 2 => s((if (x > 0) " " else "") + v)
          case 5 =>
            if (maxval > 255) { out.write(v >>> 8); out.write(v & 0xFF) }
            else out.write(v)
          case _ =>
            var k = 0
            while (k < 3) {
              if (maxval > 255) { out.write(v >>> 8); out.write(v & 0xFF) }
              else out.write(v)
              k += 1
            }
        }
        x += 1
      }
      if (kind == 2) s("\n")
      y += 1
    }
    out.toByteArray
  }

  /** P4 binary bitmap: `black(x,y)` true → bit 1 (black), row-padded. */
  def pnmBitmap(width: Int, height: Int,
      black: (Int, Int) => Boolean): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(s"P4\n$width $height\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val rowBytes = (width + 7) / 8
    var y = 0
    while (y < height) {
      val row = new Array[Byte](rowBytes)
      var x = 0
      while (x < width) {
        if (black(x, y)) row(x / 8) = (row(x / 8) | (0x80 >>> (x % 8))).toByte
        x += 1
      }
      out.write(row)
      y += 1
    }
    out.toByteArray
  }

  def bmpFromPixels(width: Int, height: Int,
      px: (Int, Int) => (Int, Int, Int), topDown: Boolean = false): Array[Byte] =
    bmpRaw(width, height, 24, null, topDown, (x, y) => {
      val (r, g, b) = px(x, y); Array(b, g, r)
    })

  /** Indexed BMP at 1/4/8 bpp; `palette` is packed RGB triples. */
  def bmpIndexed(width: Int, height: Int, palette: Array[Byte],
      idx: (Int, Int) => Int, bpp: Int = 8,
      topDown: Boolean = false): Array[Byte] = {
    require(bpp == 1 || bpp == 4 || bpp == 8, s"bpp $bpp")
    bmpRaw(width, height, bpp, palette, topDown, null, idx)
  }

  private def bmpRaw(width: Int, height: Int, bpp: Int,
      palette: Array[Byte], topDown: Boolean,
      bgr: (Int, Int) => Array[Int],
      idx: (Int, Int) => Int = null): Array[Byte] = {
    val palN = if (palette == null) 0 else palette.length / 3
    val rowSize = ((bpp * width + 31) / 32) * 4
    val dataOff = 54 + 4 * palN
    val out = new ByteArrayOutputStream()
    out.write('B'); out.write('M')
    out.write(le32(dataOff + rowSize * height))
    out.write(le32(0)); out.write(le32(dataOff))
    out.write(le32(40)) // BITMAPINFOHEADER
    out.write(le32(width))
    out.write(le32(if (topDown) -height else height))
    out.write(le16(1)); out.write(le16(bpp))
    out.write(le32(0)) // BI_RGB
    out.write(le32(0)); out.write(le32(0)); out.write(le32(0))
    out.write(le32(palN)); out.write(le32(0))
    for (i <- 0 until palN) { // BGRA quads
      out.write(palette(i * 3 + 2)); out.write(palette(i * 3 + 1))
      out.write(palette(i * 3)); out.write(0)
    }
    val row = new Array[Byte](rowSize)
    val ys = if (topDown) 0 until height else (height - 1) to 0 by -1
    for (y <- ys) {
      java.util.Arrays.fill(row, 0.toByte)
      var bitPos = 0
      for (x <- 0 until width) {
        if (bpp == 24) {
          val v = bgr(x, y)
          row(x * 3) = v(0).toByte
          row(x * 3 + 1) = v(1).toByte
          row(x * 3 + 2) = v(2).toByte
        } else {
          val v = idx(x, y)
          val shift = 8 - bpp - (bitPos & 7)
          row(bitPos >> 3) = (row(bitPos >> 3) | ((v & ((1 << bpp) - 1)) << shift)).toByte
          bitPos += bpp
        }
      }
      out.write(row)
    }
    out.toByteArray
  }

  /** BMP file header + BITMAPINFOHEADER (24bpp, no pixel data). */
  /** RLE-compressed indexed BMP (BI_RLE8 / BI_RLE4) — writer twin of
    * the decoder's RLE walk. Rows encode as maximal runs (encoded
    * mode) except runs shorter than `absBelow` pixels, which emit
    * absolute mode (word-padded) so both stream forms are exercised;
    * every row ends with end-of-line, the image with end-of-bitmap.
    */
  def bmpRle(width: Int, height: Int, palette: Array[Byte],
      idx: (Int, Int) => Int, bpp: Int = 8,
      absBelow: Int = 3): Array[Byte] = {
    require(bpp == 4 || bpp == 8, s"RLE bpp must be 4 or 8: $bpp")
    val palN = palette.length / 3
    val data = new ByteArrayOutputStream()
    // rows bottom-up per spec
    for (y <- (height - 1) to 0 by -1) {
      var x = 0
      while (x < width) {
        val v = idx(x, y)
        var run = 1
        while (x + run < width && idx(x + run, y) == v && run < 255)
          run += 1
        if (run >= absBelow || run >= width - x) {
          // encoded mode (RLE4: both nibbles the same value)
          data.write(run)
          data.write(if (bpp == 8) v & 0xFF else ((v & 0xF) << 4) | (v & 0xF))
          x += run
        } else {
          // absolute mode: gather until a long run starts (3..255 px)
          var cnt = run
          while (x + cnt < width && cnt < 255 && {
            val nv = idx(x + cnt, y)
            var r = 1
            while (x + cnt + r < width && idx(x + cnt + r, y) == nv &&
              r < absBelow) r += 1
            r < absBelow
          }) cnt += 1
          if (cnt < 3) { // absolute mode needs >= 3: pad with encoded runs
            var k = 0
            while (k < cnt) {
              data.write(1)
              data.write(if (bpp == 8) idx(x + k, y) & 0xFF
              else ((idx(x + k, y) & 0xF) << 4) | (idx(x + k, y) & 0xF))
              k += 1
            }
          } else {
            data.write(0)
            data.write(cnt)
            if (bpp == 8) {
              var k = 0
              while (k < cnt) { data.write(idx(x + k, y) & 0xFF); k += 1 }
              if ((cnt & 1) == 1) data.write(0) // word pad
            } else {
              var k = 0
              while (k < cnt) {
                val hi = idx(x + k, y) & 0xF
                val lo = if (k + 1 < cnt) idx(x + k + 1, y) & 0xF else 0
                data.write((hi << 4) | lo)
                k += 2
              }
              if ((((cnt + 1) / 2) & 1) == 1) data.write(0) // word pad
            }
          }
          x += cnt
        }
      }
      data.write(0); data.write(0) // end of line
    }
    data.write(0); data.write(1) // end of bitmap
    val body = data.toByteArray
    val dataOff = 54 + 4 * palN
    val out = new ByteArrayOutputStream()
    out.write('B'); out.write('M')
    out.write(le32(dataOff + body.length))
    out.write(le32(0)); out.write(le32(dataOff))
    out.write(le32(40))
    out.write(le32(width))
    out.write(le32(height)) // RLE is always bottom-up
    out.write(le16(1)); out.write(le16(bpp))
    out.write(le32(if (bpp == 8) 1 else 2)) // BI_RLE8 / BI_RLE4
    out.write(le32(body.length)); out.write(le32(0)); out.write(le32(0))
    out.write(le32(palN)); out.write(le32(0))
    for (i <- 0 until palN) {
      out.write(palette(i * 3 + 2)); out.write(palette(i * 3 + 1))
      out.write(palette(i * 3)); out.write(0)
    }
    out.write(body)
    out.toByteArray
  }

  /** 16-bit BMP — BI_RGB X1R5G5B5 by default, BI_BITFIELDS R5G6B5
    * when `rgb565`. Channels quantize by `(v*max + 127)/255`, the
    * exact inverse of the decoder's `(v*255 + max/2)/max` widening,
    * so a write→decode round-trip lands on the dequantized lattice
    * deterministically.
    */
  def bmp16(width: Int, height: Int, px: (Int, Int) => (Int, Int, Int),
      rgb565: Boolean = false, topDown: Boolean = false): Array[Byte] = {
    val dataOff = if (rgb565) 66 else 54
    val rowSize = ((16 * width + 31) / 32) * 4
    val out = new ByteArrayOutputStream()
    out.write('B'); out.write('M')
    out.write(le32(dataOff + rowSize * height))
    out.write(le32(0)); out.write(le32(dataOff))
    out.write(le32(40)) // BITMAPINFOHEADER
    out.write(le32(width))
    out.write(le32(if (topDown) -height else height))
    out.write(le16(1)); out.write(le16(16))
    out.write(le32(if (rgb565) 3 else 0)) // BI_BITFIELDS / BI_RGB
    out.write(le32(0)); out.write(le32(0)); out.write(le32(0))
    out.write(le32(0)); out.write(le32(0))
    if (rgb565) {
      out.write(le32(0xF800)); out.write(le32(0x07E0)); out.write(le32(0x001F))
    }
    val row = new Array[Byte](rowSize)
    val ys = if (topDown) 0 until height else (height - 1) to 0 by -1
    for (y <- ys) {
      java.util.Arrays.fill(row, 0.toByte)
      for (x <- 0 until width) {
        val (r, g, b) = px(x, y)
        val gMax = if (rgb565) 63 else 31
        val gShift = 5
        val rShift = if (rgb565) 11 else 10
        val pix = ((r * 31 + 127) / 255 << rShift) |
          ((g * gMax + 127) / 255 << gShift) | ((b * 31 + 127) / 255)
        row(x * 2) = pix.toByte
        row(x * 2 + 1) = (pix >> 8).toByte
      }
      out.write(row)
    }
    out.toByteArray
  }

  /** 32-bit BI_BITFIELDS BMP with explicit 8-bit channel masks —
    * defaults to the NONSTANDARD RGBx byte order (red in the low
    * byte), so a correct decode must route channels by mask, not by
    * the BGRx convention.
    */
  def bmp32Bitfields(width: Int, height: Int,
      px: (Int, Int) => (Int, Int, Int), rMask: Int = 0x000000FF,
      gMask: Int = 0x0000FF00, bMask: Int = 0x00FF0000): Array[Byte] = {
    val rSh = Integer.numberOfTrailingZeros(rMask)
    val gSh = Integer.numberOfTrailingZeros(gMask)
    val bSh = Integer.numberOfTrailingZeros(bMask)
    val out = new ByteArrayOutputStream()
    out.write('B'); out.write('M')
    out.write(le32(66 + 4 * width * height))
    out.write(le32(0)); out.write(le32(66))
    out.write(le32(40))
    out.write(le32(width)); out.write(le32(height))
    out.write(le16(1)); out.write(le16(32))
    out.write(le32(3)) // BI_BITFIELDS
    out.write(le32(0)); out.write(le32(0)); out.write(le32(0))
    out.write(le32(0)); out.write(le32(0))
    out.write(le32(rMask)); out.write(le32(gMask)); out.write(le32(bMask))
    for (y <- (height - 1) to 0 by -1; x <- 0 until width) {
      val (r, g, b) = px(x, y)
      out.write(le32((r << rSh) | (g << gSh) | (b << bSh)))
    }
    out.toByteArray
  }

  def bmp(width: Int, height: Int): Array[Byte] =
    "BM".getBytes("US-ASCII") ++ le32(54) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(width) ++ le32(height) ++ le16(1) ++ le16(24) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)

  /** JPEG SOI + SOF0 frame header (one component) + EOI. */
  def jpeg(width: Int, height: Int): Array[Byte] =
    Array(0xFF, 0xD8).map(_.toByte) ++
      Array(0xFF, 0xC0).map(_.toByte) ++ be16(11) ++ Array[Byte](8) ++
      be16(height) ++ be16(width) ++ Array[Byte](1, 1, 0x11, 0) ++
      Array(0xFF, 0xD9).map(_.toByte)
}
