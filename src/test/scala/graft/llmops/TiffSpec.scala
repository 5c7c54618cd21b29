package graft.llmops

import graft.SparkTestBase
import graft.expressions.{ImageHistStats, PngDHash, TiffDHash, TiffDecode, TiffPages}

class TiffSpec extends SparkTestBase {

  private def gray(seed: Int)(x: Int, y: Int): Int =
    ((5 + seed % 7) * (x / 8) + (13 + seed % 11) * (y / 8) + seed) % 256

  private def px(d: TiffDecode.Rgb, x: Int, y: Int): (Int, Int, Int) = {
    val p = (y * d.width + x) * 3
    (d.rgb(p) & 0xFF, d.rgb(p + 1) & 0xFF, d.rgb(p + 2) & 0xFF)
  }

  test("gray 8-bit round trips: byte orders, strips, PackBits, photometrics") {
    val w = 25; val h = 17
    val g = gray(4) _
    for (le <- Seq(true, false); rps <- Seq(0, 5); pb <- Seq(false, true)) {
      val bytes = ImageWriter.tiffImage(w, h, g, littleEndian = le,
        rowsPerStrip = rps, packBits = pb)
      val d = TiffDecode.decode(bytes)
      assert(d != null, s"le=$le rps=$rps pb=$pb")
      for (y <- 0 until h; x <- 0 until w)
        assert(px(d, x, y)._1 === g(x, y), s"($x,$y) le=$le rps=$rps pb=$pb")
    }
    // WhiteIsZero stores inverted but decodes to the same display values
    val wiz = TiffDecode.decode(
      ImageWriter.tiffImage(w, h, g, photometric = 0))
    for (y <- 0 until h; x <- 0 until w)
      assert(px(wiz, x, y)._1 === g(x, y), s"wiz ($x,$y)")
  }

  test("sub-byte gray, RGB and palette round trips") {
    val w = 21; val h = 12
    for (bits <- Seq(1, 4)) {
      val levels = 1 << bits
      val scale = 255 / (levels - 1)
      def gq(x: Int, y: Int) = gray(bits)(x, y) % levels
      val d = TiffDecode.decode(ImageWriter.tiffImage(w, h, gq, bits = bits))
      assert(d != null, s"bits=$bits")
      for (y <- 0 until h; x <- 0 until w)
        assert(px(d, x, y)._1 === gq(x, y) * scale, s"($x,$y) bits=$bits")
    }
    def rgb(x: Int, y: Int) =
      ((x * 7 + y) % 256 << 16) | ((y * 5 + x) % 256 << 8) | ((x ^ y) % 256)
    val dr = TiffDecode.decode(ImageWriter.tiffImage(w, h, rgb, rgb = true,
      littleEndian = false, packBits = true))
    assert(dr != null)
    for (y <- 0 until h; x <- 0 until w) {
      val v = rgb(x, y)
      assert(px(dr, x, y) === (((v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF)),
        s"rgb ($x,$y)")
    }
    val pal = Array.tabulate(16)(i =>
      ((i * 17) << 16) | ((255 - i * 17) << 8) | (i * 10))
    val dp = TiffDecode.decode(ImageWriter.tiffImage(w, h,
      (x, y) => (x + y) % 16, bits = 4, palette = pal))
    assert(dp != null)
    for (y <- 0 until h; x <- 0 until w) {
      val v = pal((x + y) % 16)
      assert(px(dp, x, y) === (((v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF)),
        s"pal ($x,$y)")
    }
  }

  test("LZW, Deflate, predictor and tiled layouts round trip") {
    val w = 37; val h = 29
    val g = gray(3) _
    for (le <- Seq(true, false);
        (tag, enc) <- Seq(
          "lzw" -> ((pred: Boolean) => ImageWriter.tiffImage(w, h, g,
            littleEndian = le, lzw = true, predictor = pred)),
          "deflate" -> ((pred: Boolean) => ImageWriter.tiffImage(w, h, g,
            littleEndian = le, deflate = true, predictor = pred)),
          "lzwstrips" -> ((pred: Boolean) => ImageWriter.tiffImage(w, h, g,
            littleEndian = le, lzw = true, predictor = pred,
            rowsPerStrip = 7)),
          "tiled" -> ((pred: Boolean) => ImageWriter.tiffImage(w, h, g,
            littleEndian = le, tileWidth = 16, tileLength = 16,
            predictor = pred)),
          "tiledlzw" -> ((pred: Boolean) => ImageWriter.tiffImage(w, h, g,
            littleEndian = le, lzw = true, tileWidth = 16, tileLength = 16,
            predictor = pred)),
          "tileddeflate" -> ((pred: Boolean) => ImageWriter.tiffImage(w, h,
            g, littleEndian = le, deflate = true, tileWidth = 32,
            tileLength = 16, predictor = pred)));
        pred <- Seq(false, true)) {
      val d = TiffDecode.decode(enc(pred))
      assert(d != null, s"$tag le=$le pred=$pred")
      for (y <- 0 until h; x <- 0 until w)
        assert(px(d, x, y)._1 === g(x, y), s"$tag le=$le pred=$pred ($x,$y)")
    }
    // RGB through LZW + predictor (3-sample differencing) and tiles
    def rgbf(x: Int, y: Int) =
      ((x * 7 + y) % 256 << 16) | ((y * 5 + x) % 256 << 8) | ((x ^ y) % 256)
    for (bytes <- Seq(
        ImageWriter.tiffImage(w, h, rgbf, rgb = true, lzw = true,
          predictor = true),
        ImageWriter.tiffImage(w, h, rgbf, rgb = true, deflate = true,
          tileWidth = 16, tileLength = 16, predictor = true))) {
      val d = TiffDecode.decode(bytes)
      assert(d != null)
      for (y <- 0 until h; x <- 0 until w) {
        val v = rgbf(x, y)
        assert(px(d, x, y) ===
          (((v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF)), s"rgb ($x,$y)")
      }
    }
    // an LZW stream long enough to cross the 9->10->11-bit widths and
    // a mid-stream Clear: incompressible pseudo-random bytes
    val wide = 200; val tall = 60
    def noisy(x: Int, y: Int) = (x * 131 + y * 197 + ((x * y) >> 3)) % 256
    val big = TiffDecode.decode(
      ImageWriter.tiffImage(wide, tall, noisy, lzw = true))
    assert(big != null)
    for (y <- 0 until tall; x <- 0 until wide by 7)
      assert(px(big, x, y)._1 === noisy(x, y), s"noisy ($x,$y)")
  }

  test("ImageIO reads the writer's LZW/Deflate/tiled streams") {
    val w = 41; val h = 23
    val g = gray(9) _
    for ((tag, bytes) <- Seq(
        "lzw" -> ImageWriter.tiffImage(w, h, g, lzw = true),
        "lzwpred" -> ImageWriter.tiffImage(w, h, g, lzw = true,
          predictor = true),
        "deflate" -> ImageWriter.tiffImage(w, h, g, deflate = true),
        "tiledlzw" -> ImageWriter.tiffImage(w, h, g, lzw = true,
          tileWidth = 16, tileLength = 16),
        "lzwbe" -> ImageWriter.tiffImage(w, h, g, lzw = true,
          littleEndian = false))) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO refused $tag")
      for (y <- 0 until h; x <- 0 until w)
        assert(img.getRaster.getSample(x, y, 0) === g(x, y), s"$tag ($x,$y)")
    }
    // a stream long enough to cross the 9->10->11-bit code widths:
    // pins the early-change pairing against a foreign decoder
    def noisy(x: Int, y: Int) = (x * 131 + y * 197 + ((x * y) >> 3)) % 256
    val big = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      ImageWriter.tiffImage(200, 60, noisy, lzw = true)))
    assert(big != null, "ImageIO refused the wide-code LZW stream")
    for (y <- 0 until 60; x <- 0 until 200 by 7)
      assert(big.getRaster.getSample(x, y, 0) === noisy(x, y), s"($x,$y)")
  }

  test("decoder reads ImageIO's LZW and Deflate encodes") {
    val w = 33; val h = 21
    def mk(compression: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, gray(5)(x, y))
      val wr = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
      val p = wr.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionType(compression)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      wr.setOutput(ios)
      wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
      ios.close(); wr.dispose()
      bos.toByteArray
    }
    for (comp <- Seq("LZW", "Deflate", "ZLib", "PackBits")) {
      val d = TiffDecode.decode(mk(comp))
      assert(d != null, s"refused ImageIO $comp stream")
      for (y <- 0 until h; x <- 0 until w)
        assert(px(d, x, y)._1 === gray(5)(x, y), s"$comp ($x,$y)")
    }
    // foreign LZW across the 9->10->11-bit widths (the reverse of the
    // writer-side wide-code pin)
    def noisy(x: Int, y: Int) = (x * 137 + y * 211 + ((x * y) >> 2)) % 256
    val big = new java.awt.image.BufferedImage(220, 60,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 60; x <- 0 until 220)
      big.getRaster.setSample(x, y, 0, noisy(x, y))
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
    val p = wr.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionType("LZW")
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    wr.setOutput(ios)
    wr.write(null, new javax.imageio.IIOImage(big, null, null), p)
    ios.close(); wr.dispose()
    val d = TiffDecode.decode(bos.toByteArray)
    assert(d != null, "refused ImageIO wide-code LZW stream")
    for (y <- 0 until 60; x <- 0 until 220 by 7)
      assert(px(d, x, y)._1 === noisy(x, y), s"wide ($x,$y)")
  }

  test("16-bit gray and RGB round trip; high-byte reduction; ImageIO agrees") {
    val w = 29; val h = 15
    val g = gray(7) _
    for (le <- Seq(true, false); pm <- Seq(1, 0)) {
      val d = TiffDecode.decode(ImageWriter.tiffImage(w, h, g, bits = 16,
        littleEndian = le, photometric = pm))
      assert(d != null, s"le=$le pm=$pm")
      for (y <- 0 until h; x <- 0 until w)
        assert(px(d, x, y)._1 === g(x, y), s"16g ($x,$y) le=$le pm=$pm")
    }
    // 16-bit through LZW and tiles
    for (bytes <- Seq(
        ImageWriter.tiffImage(w, h, g, bits = 16, lzw = true),
        ImageWriter.tiffImage(w, h, g, bits = 16, deflate = true,
          tileWidth = 16, tileLength = 16))) {
      val d = TiffDecode.decode(bytes)
      assert(d != null)
      for (y <- 0 until h; x <- 0 until w)
        assert(px(d, x, y)._1 === g(x, y))
    }
    // 16-bit RGB
    def rgbf(x: Int, y: Int) =
      ((x * 7 + y) % 256 << 16) | ((y * 5 + x) % 256 << 8) | ((x ^ y) % 256)
    val dr = TiffDecode.decode(ImageWriter.tiffImage(w, h, rgbf, rgb = true,
      bits = 16, littleEndian = false))
    assert(dr != null)
    for (y <- 0 until h; x <- 0 until w) {
      val v = rgbf(x, y)
      assert(px(dr, x, y) ===
        (((v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF)), s"rgb16 ($x,$y)")
    }
    // ImageIO reads the writer's 16-bit stream as v*257 wide samples
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      ImageWriter.tiffImage(w, h, g, bits = 16)))
    assert(img != null)
    for (y <- 0 until h; x <- 0 until w)
      assert(img.getRaster.getSample(x, y, 0) === g(x, y) * 257, s"($x,$y)")
    // and our decoder reduces a foreign 16-bit gray stream by high byte
    val big = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      big.getRaster.setSample(x, y, 0, g(x, y) * 256 + 37)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(big, "tiff", bos))
    val mine = TiffDecode.decode(bos.toByteArray)
    if (mine != null) // accept-or-refuse per the compression ImageIO picked
      for (y <- 0 until h; x <- 0 until w)
        assert(px(mine, x, y)._1 === g(x, y), s"foreign16 ($x,$y)")
  }

  test("multi-page IFD chains: decodePages, PNG stills, hash-space membership") {
    val specs = (0 until 5).map { k =>
      (20 + k, 12 + k, gray(k + 2) _)
    }
    for (le <- Seq(true, false); lzw <- Seq(false, true)) {
      val bytes = ImageWriter.tiffMultipage(specs, littleEndian = le,
        lzw = lzw)
      val pages = TiffDecode.decodePages(bytes)
      assert(pages != null && pages.length === 5, s"le=$le lzw=$lzw")
      for ((p, k) <- pages.zipWithIndex) {
        assert(p.width === 20 + k && p.height === 12 + k)
        for (y <- 0 until p.height; x <- 0 until p.width)
          assert(px(p, x, y)._1 === gray(k + 2)(x, y),
            s"page $k ($x,$y) le=$le lzw=$lzw")
      }
      // single-page decode still reads page 1 only
      val first = TiffDecode.decode(bytes)
      assert(first != null && first.width === 20)
    }
    // TiffPages: PNG stills land in the shared hash space
    val bytes = ImageWriter.tiffMultipage(
      Seq((27, 16, gray(6) _), (27, 16, gray(9) _)))
    val arr = TiffPages.compute(bytes)
    assert(arr != null && arr.numElements() === 2)
    val p0 = arr.getBinary(0)
    assert(PngDHash.compute(p0) === TiffDHash.compute(
      ImageWriter.tiffImage(27, 16, gray(6))))
    // ImageIO agrees page 1 of the chain is readable
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(img != null && img.getWidth === 27)
    // truncation: a severed chain refuses wholesale
    for (cut <- Seq(40, bytes.length / 2, bytes.length - 6))
      assert(TiffDecode.decodePages(bytes.take(cut)) === null, s"cut=$cut")
  }

  test("multi-page TIFFs ride the still-sequence family (VideoFrames arm)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val M = Multimodal
    // a scanned doc (2 pages) + an animated GIF compositing the SAME
    // two patterns: container-blind frame hashes must pair them
    val tiff = ImageWriter.tiffMultipage(
      Seq((24, 16, gray(3) _), (24, 16, gray(11) _)), lzw = true)
    val gif = GifWriter.animatedGray(24, 16, Seq(gray(3) _, gray(11) _))
    val df = Seq((1L, tiff), (2L, gif)).toDF("doc_id", "content")
    val sigs = M.videoFrameSignatures(df, "doc_id", "content")
      .orderBy("key", "frame_idx").collect()
    assert(sigs.length === 4)
    val byKey = sigs.groupBy(_.getAs[Long]("key"))
    assert(byKey(1L).map(_.getAs[Long]("fhash")).toSeq ===
      byKey(2L).map(_.getAs[Long]("fhash")).toSeq,
      "TIFF pages and GIF frames of the same patterns hash identically")
    // videoNearDups pairs the scanned doc with its GIF re-encode
    val pairs = M.videoNearDups(df, "doc_id", "content").collect()
    assert(pairs.length === 1)
    assert(pairs(0).getAs[Double]("frac") === 1.0)
  }

  test("planar configuration 2: per-channel strip planes round trip") {
    val w = 26; val h = 14
    def rgbf(x: Int, y: Int) =
      ((x * 7 + y) % 256 << 16) | ((y * 5 + x) % 256 << 8) | ((x ^ y) % 256)
    for (le <- Seq(true, false); lzw <- Seq(false, true);
        pred <- Seq(false, true); rps <- Seq(0, 5); b16 <- Seq(false, true)
        if !(pred && b16)) {
      val bytes = ImageWriter.tiffImage(w, h, rgbf, rgb = true,
        bits = if (b16) 16 else 8, littleEndian = le, lzw = lzw,
        predictor = pred, rowsPerStrip = rps, planar = true)
      val d = TiffDecode.decode(bytes)
      assert(d != null, s"le=$le lzw=$lzw pred=$pred rps=$rps b16=$b16")
      for (y <- 0 until h; x <- 0 until w) {
        val v = rgbf(x, y)
        assert(px(d, x, y) ===
          (((v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF)),
          s"($x,$y) le=$le lzw=$lzw pred=$pred rps=$rps b16=$b16")
      }
    }
    // ImageIO agrees on a planar stream
    val bytes = ImageWriter.tiffImage(w, h, rgbf, rgb = true, planar = true,
      rowsPerStrip = 4)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO refused the planar stream")
    for (y <- 0 until h; x <- 0 until w)
      assert((img.getRGB(x, y) & 0xFFFFFF) === rgbf(x, y), s"io ($x,$y)")
    // planar hash-space membership: same pixels, chunky == planar
    val a = TiffDHash.compute(ImageWriter.tiffImage(w, h, rgbf, rgb = true))
    val b = TiffDHash.compute(bytes)
    assert(a != null && a === b)
  }

  test("JDK ImageIO agrees on the writer's streams") {
    val w = 19; val h = 13
    val g = gray(8) _
    for ((tag, bytes) <- Seq(
        "gray" -> ImageWriter.tiffImage(w, h, g),
        "graybe" -> ImageWriter.tiffImage(w, h, g, littleEndian = false),
        "strips" -> ImageWriter.tiffImage(w, h, g, rowsPerStrip = 4),
        "packbits" -> ImageWriter.tiffImage(w, h, g, packBits = true))) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO refused $tag")
      val raster = img.getRaster
      for (y <- 0 until h; x <- 0 until w)
        assert(raster.getSample(x, y, 0) === g(x, y), s"$tag ($x,$y)")
    }
  }

  test("decoder accepts a foreign encoder: ImageIO's TIFF writer") {
    val w = 23; val h = 11
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = gray(12)(x, y)
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "tiff", bos))
    val mine = TiffDecode.decode(bos.toByteArray)
    assert(mine != null, "default ImageIO stream must decode (LZW covered)")
    assert(mine.width === w && mine.height === h)
    for (y <- 0 until h; x <- 0 until w)
      assert(px(mine, x, y)._1 === gray(12)(x, y), s"($x,$y)")
  }

  test("tiff joins the cross-format hash space; histogram arm works") {
    val w = 27; val h = 16
    val g = gray(6) _
    val tiffHash = TiffDHash.compute(ImageWriter.tiffImage(w, h, g))
    val pngHash = PngDHash.compute(ImageWriter.pngFromPixels(w, h,
      Array.tabulate(h, w * 3)((y, i) => g(i / 3, y).toByte)))
    assert(tiffHash != null && tiffHash === pngHash)
    // PackBits + big-endian + inverted photometric: same pixels, same hash
    assert(TiffDHash.compute(ImageWriter.tiffImage(w, h, g,
      littleEndian = false, packBits = true, photometric = 0)) === pngHash)
    val stats = ImageHistStats.compute(
      ImageWriter.tiffImage(16, 16, (_, _) => 77))
    assert(stats != null && stats.getInt(2) === 3)
    assert(stats.getDouble(3) === 0.0 && stats.getInt(4) === 77)
  }

  test("refusals: dims-only stub, truncation, strip overruns") {
    // the dims-only MediaWriter stub has no strip tags: refuse
    assert(TiffDecode.decode(MediaWriter.tiff(100, 50)) === null)
    val good = ImageWriter.tiffImage(20, 10, gray(1))
    assert(TiffDecode.decode(good) != null)
    for (cut <- Seq(3, 7, 30, good.length / 2, good.length - 5))
      assert(TiffDecode.decode(good.take(cut)) === null, s"cut=$cut")
    assert(TiffDecode.decode("II*".getBytes("ISO-8859-1") ++ Array[Byte](0) ++ "garbage".getBytes) === null)
    assert(TiffDecode.decode("not a tiff".getBytes) === null)
    assert(TiffDecode.decode(null) === null)
  }

  test("tile-bomb refusal: a 64-bpp tile far wider than the image refuses") {
    // tileW=2^19 × tileL=64 passes the 64M-PIXEL cap, but at 16-bit RGBA
    // (64 bpp) the decoded segment buffer would be 268 MB — the decode
    // target itself must be capped (compressed input, so the blob size
    // bounds nothing)
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Int): Unit = { w16(v & 0xFFFF); w16((v >> 16) & 0xFFFF) }
    out.write('I'); out.write('I'); w16(42); w32(8) // LE header, IFD at 8
    w16(10) // entry count
    def entry(tag: Int, typ: Int, count: Int, value: Int): Unit = {
      w16(tag); w16(typ); w32(count); w32(value)
    }
    val bitsOff = 8 + 2 + 10 * 12 + 4 // after IFD + next-IFD pointer
    val dataOff = bitsOff + 8
    entry(256, 3, 1, 16) // width
    entry(257, 3, 1, 16) // height
    entry(258, 3, 4, bitsOff) // bits/sample [16,16,16,16]
    entry(259, 3, 1, 8) // deflate
    entry(262, 3, 1, 2) // RGB
    entry(277, 3, 1, 4) // 4 samples (RGBA)
    entry(322, 4, 1, 1 << 19) // TileWidth
    entry(323, 4, 1, 64) // TileLength
    entry(324, 4, 1, dataOff) // TileOffsets
    entry(325, 4, 1, 4) // TileByteCounts
    w32(0) // next IFD
    w16(16); w16(16); w16(16); w16(16) // the bits array
    w32(0x12345678) // 4 bytes of junk "deflate" data
    assert(TiffDecode.decode(out.toByteArray) === null)
  }

  test("compressed refusals: truncated LZW/Deflate/tiled streams never crash") {
    for (good <- Seq(
        ImageWriter.tiffImage(30, 20, gray(2), lzw = true),
        ImageWriter.tiffImage(30, 20, gray(2), deflate = true),
        ImageWriter.tiffImage(30, 20, gray(2), lzw = true,
          tileWidth = 16, tileLength = 16))) {
      assert(TiffDecode.decode(good) != null)
      for (cut <- Seq(9, 40, good.length / 2, good.length - 3))
        assert(TiffDecode.decode(good.take(cut)) === null, s"cut=$cut")
      // corrupt the compressed body mid-stream: refuse or decode, never
      // throw; flipped dictionary codes must not yield forward refs
      val c = good.clone()
      c(good.length - 10) = (c(good.length - 10) ^ 0x55).toByte
      TiffDecode.decode(c) // must not throw
    }
    // JPEG-in-TIFF still refuses
    val j = ImageWriter.tiffImage(20, 10, gray(1))
    // forge compression tag 259 (type SHORT at fixed IFD slot) to 7
    var i = 0
    var found = -1
    while (found < 0 && i + 12 <= j.length) {
      if ((j(i) & 0xFF) == 3 && (j(i + 1) & 0xFF) == 1) found = i
      i += 1
    }
    assert(found > 0)
    j(found + 8) = 7
    assert(TiffDecode.decode(j) === null)
  }

  test("lzw kernel: direct round trips incl. width growth and clear codes") {
    for ((tag, raw) <- Seq(
        "runs" -> Array.tabulate[Byte](1073)(i => ((i / 37) % 7).toByte),
        "tiny" -> Array[Byte](1, 2, 3),
        "single" -> Array[Byte](42),
        "empty" -> Array.empty[Byte],
        "noise" -> Array.tabulate[Byte](12000)(i =>
          ((i * 131 + (i * i) % 251) % 256).toByte),
        // long enough to force a mid-stream Clear (table refill)
        "huge" -> Array.tabulate[Byte](300000)(i =>
          ((i * 89 + (i * i) % 509) % 256).toByte))) {
      val enc = ImageWriter.lzwEncode(raw)
      val dec = graft.expressions.TiffDecode.lzw(enc, 0, enc.length, raw.length)
      assert(dec != null, s"$tag: decode refused")
      assert(java.util.Arrays.equals(dec, raw), s"$tag: mismatch")
    }
  }
}
