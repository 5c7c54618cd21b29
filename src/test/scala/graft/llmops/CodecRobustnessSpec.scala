package graft.llmops

import org.scalatest.funsuite.AnyFunSuite

/** A curation pipeline feeds its codecs whatever bytes the crawl
  * delivered. None of the binary parsers may throw — the contract is
  * None/NULL for garbage, never an exception that kills a 100 TB job.
  * Deterministic LCG fuzz (fixed seed) plus structured-prefix corruption.
  */
class CodecRobustnessSpec extends AnyFunSuite {

  // xorshift64 — deterministic, no java.util.Random state surprises
  private def fuzzBytes(seed: Long, len: Int): Array[Byte] = {
    var x = seed | 1
    Array.fill(len) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      (x & 0xFF).toByte
    }
  }

  private val magicPrefixes: Seq[Array[Byte]] = Seq(
    "%PDF-1.4\n".getBytes("ISO-8859-1"),
    "RIFF1234WAVE".getBytes("ISO-8859-1"),
    Array[Byte](0, 0, 0, 24, 'f', 't', 'y', 'p'),
    Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte),
    Array(0xFF, 0xD8, 0xFF, 0xC0).map(_.toByte),
    "GIF89a".getBytes("ISO-8859-1"),
    "BM".getBytes("ISO-8859-1"),
    Array[Byte]('P', 'K', 3, 4), // zip/OOXML
    Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte), // CFB/OLE2
    "{\\rtf1\\ansi ".getBytes("ISO-8859-1"),
    "WARC/1.0\r\n".getBytes("ISO-8859-1"),
    Array(0x1F, 0x8B, 0x08, 0x00).map(_.toByte), // gzip member
    "RIFF1234WEBPVP8L".getBytes("ISO-8859-1"),
    "BZh91AY&SY".getBytes("ISO-8859-1"), // bzip2 block magic
    Array(0xFD, '7', 'z', 'X', 'Z', 0x00).map(_.toByte), // xz
    Array(0x28, 0xB5, 0x2F, 0xFD).map(_.toByte), // zstd
    Array(0x04, 0x22, 0x4D, 0x18).map(_.toByte), // lz4 frame
    Array[Byte](0xFF.toByte, 6, 0, 0, 's', 'N', 'a', 'P', 'p', 'Y'), // snappy
    "P6\n64 48\n255\n".getBytes("ISO-8859-1"), // pnm
    Array[Byte](0, 0, 1, 0, 2, 0), // ico directory
    "From: a@b\r\nSubject: s\r\nDate: d\r\n\r\n".getBytes("ISO-8859-1"),
    "<mediawiki><page><title>t</title>".getBytes("ISO-8859-1"),
    "<rss version=\"2.0\"><channel><item>".getBytes("ISO-8859-1"),
    "com,x)/ 20260101000000 {\"url\": ".getBytes("ISO-8859-1"))

  private def allCodecs(bytes: Array[Byte]): Unit = {
    Pdf.pdfText(bytes)
    Pdf.images(bytes)
    Ooxml.docxText(bytes); Ooxml.xlsxText(bytes); Ooxml.pptxText(bytes)
    LegacyOffice.docText(bytes); LegacyOffice.xlsText(bytes)
    LegacyOffice.pptText(bytes); Rtf.rtfText(bytes)
    graft.expressions.ImageDims.compute(bytes)
    graft.expressions.AvMeta.compute(bytes)
    graft.expressions.PngPixels.compute(bytes)
    graft.expressions.PngDHash.compute(bytes)
    graft.expressions.JpegPixels.compute(bytes)
    graft.expressions.JpegDHash.compute(bytes)
    graft.expressions.ImageHistStats.compute(bytes)
    graft.expressions.JpegExifOrientation.compute(bytes)
    graft.expressions.JpegDHashOriented.compute(bytes)
    graft.expressions.WavSamples.compute(bytes)
    graft.expressions.WavEnvelopeHash.compute(bytes)
    graft.expressions.WavSpectralHash.compute(bytes)
    graft.expressions.AviFrames.compute(bytes)
    graft.expressions.Mp4Frames.compute(bytes)
    graft.expressions.VideoFrames.compute(bytes)
    graft.expressions.GifDHash.compute(bytes)
    graft.expressions.GifFrames.compute(bytes)
    graft.expressions.WebpDHash.compute(bytes)
    graft.expressions.WebpDecode.decodeArgb(bytes)
    graft.expressions.BmpDHash.compute(bytes)
    graft.expressions.TiffDHash.compute(bytes)
    graft.expressions.SitemapUrls.compute(bytes)
    graft.expressions.WarcRecords.compute(bytes)
    // round-11b additions: the compressed-corpus family + new parsers
    Compression.decodeAuto(bytes)
    Bzip2.decode(bytes)
    XzLzma.decode(bytes)
    Zstd.decode(bytes)
    Lz4.decode(bytes)
    Snappy.decodeFramed(bytes)
    Snappy.decodeRaw(bytes, 0, bytes.length)
    graft.expressions.DecompressBytes.compute(bytes)
    graft.expressions.WikiPages.compute(bytes)
    graft.expressions.EmlMessages.compute(bytes)
    graft.expressions.ZipEntries.compute(bytes)
    graft.expressions.FeedEntries.compute(bytes)
    graft.expressions.CdxRecords.compute(bytes)
    graft.expressions.CdcChunks.compute(bytes)
    graft.expressions.PnmDHash.compute(bytes)
    graft.expressions.IcoDHash.compute(bytes)
    Eml.parse(bytes)
    Eml.mboxMessages(bytes)
    WikiDump.pages(bytes)
    Feeds.entries(bytes)
    Cdx.records(bytes)
    DocumentText.extractText(bytes, "application/pdf")
    DocumentText.extractText(bytes, "text/html")
    DocumentText.extractText(bytes, "auto")
    ()
  }

  test("pure garbage of many lengths never throws") {
    for (seed <- 1L to 40L; len <- Seq(0, 1, 3, 7, 16, 64, 257, 1024)) {
      allCodecs(fuzzBytes(seed * 2654435761L, len))
    }
  }

  test("valid magic prefixes followed by garbage never throw") {
    for (p <- magicPrefixes; seed <- 1L to 20L; len <- Seq(4, 32, 200, 800)) {
      allCodecs(p ++ fuzzBytes(seed * 0x9E3779B97F4A7C15L, len))
    }
  }

  test("truncations of genuine documents never throw") {
    val genuine = Seq(
      PdfWriter.pdf(Seq(Seq("alpha", "beta")), compress = true),
      PdfWriter.pdfWithImages(Seq("img doc"),
        Seq(JpegWriter.gray(16, 8, (x, y) => (x + y) % 256)), Seq((16, 8))),
      AviWriter.avi(16, 8,
        Seq(JpegWriter.gray(16, 8, (x, y) => (x * 2 + y) % 256))),
      Mp4Writer.mp4(16, 8,
        Seq(JpegWriter.gray(16, 8, (x, y) => (x * 2 + y) % 256)),
        samplesPerChunk = 1),
      Mp4Writer.mp4(16, 8,
        Seq(JpegWriter.gray(16, 8, (x, y) => (x + y * 3) % 256)),
        useCo64 = true, moovFirst = true, quicktime = true),
      JpegWriter.grayProgressive(24, 16, (x, y) => (x * 3 + y * 7 + 5) % 256),
      JpegWriter.grayProgressive(17, 9, (x, y) => (x + y) % 256, dcAl = 2),
      WarcWriter.write(Seq(("https://e/x", null, 200, "text/html",
        "<html><p>warc fuzz page</p></html>".getBytes("ISO-8859-1")))),
      WarcWriter.write(Seq(("https://e/y", null, 200, "text/plain",
        "plain".getBytes("ISO-8859-1"))), gzipMembers = true),
      OoxmlWriter.docx(Seq("body text")),
      OoxmlWriter.xlsx(Seq("s" -> Seq(Seq("1", "x")))),
      MediaWriter.wav(2, 44100, 16, 1000),
      MediaWriter.wavWithSamples(2, 8000, 200, 17),
      MediaWriter.mp4(1000, 5000),
      ImageWriter.png(20, 30),
      ImageWriter.pngWithPixels(24, 16, 99),
      ImageWriter.pngWithPixels(12, 10, 7, channels = 4),
      ImageWriter.pngGray(16, 12, (x, y) => (x + y) % 16, depth = 4),
      ImageWriter.pngGray(12, 9, (x, y) => (x ^ y) % 2, depth = 1,
        interlaced = true),
      ImageWriter.pngIndexed(14, 11, Array.tabulate(48)(i => (i * 5).toByte),
        (x, y) => (x * 3 + y) % 16, depth = 4,
        trns = Array.fill(16)(200.toByte)),
      ImageWriter.pngGray(10, 10, (x, y) => (x * y * 257) % 65536, depth = 16),
      ImageWriter.pngRgb(15, 12, (x, y) => (x % 256, y % 256, (x + y) % 256),
        interlaced = true),
      JpegWriter.gray(24, 16, (x, y) => (x * 3 + y * 7 + 5) % 256),
      JpegWriter.color(16, 16, (x, y) => (x + y * 2) % 256,
        (x, y) => (x * 5 + 9) % 256, (x, y) => (y * 3 + 77) % 256, sub = 2,
        restartInterval = 2),
      LegacyOfficeWriter.doc(Seq("legacy body")),
      LegacyOfficeWriter.xls(Seq("s" -> Seq(Seq("a", 1)))),
      LegacyOfficeWriter.ppt(Seq(Seq("slide text"))),
      GifWriter.gray(24, 16, (x, y) => (x * 3 + y * 7 + 5) % 256),
      GifWriter.gray(20, 15, (x, y) => (x + y) % 256, interlaced = true),
      GifWriter.animatedGray(16, 12,
        Seq((x, y) => (x * 2 + y) % 256, (x, y) => (x + y * 5) % 256)),
      Rtf.write(Seq("rtf body text")),
      ImageWriter.bmp16(18, 10, (x, y) => (x * 9 % 256, y * 7 % 256, (x + y) % 256)),
      ImageWriter.bmp16(16, 9, (x, y) => (x % 256, y % 256, (x ^ y) % 256),
        rgb565 = true),
      ImageWriter.bmp32Bitfields(14, 8,
        (x, y) => (x * 5 % 256, y * 3 % 256, (x * y) % 256)))
    for (doc <- genuine; cut <- 0 to math.min(doc.length, 120)) {
      allCodecs(java.util.Arrays.copyOfRange(doc, 0, cut))
    }
    // and mid/late truncations at coarser steps
    for (doc <- genuine; frac <- Seq(0.25, 0.5, 0.75, 0.95)) {
      allCodecs(java.util.Arrays.copyOfRange(doc, 0, (doc.length * frac).toInt))
    }
  }

  test("PNG chunk length near Int.MaxValue must refuse, not wrap the bounds check") {
    // sig + IHDR(13, valid 8-bit RGB) + a chunk whose length field wraps
    // `i + 12 + len` negative if the bounds math runs in Int
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    def be32(v: Int): Array[Byte] =
      Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    out.write(be32(13)); out.write("IHDR".getBytes("US-ASCII"))
    out.write(be32(4)); out.write(be32(4)) // 4x4
    out.write(Array[Byte](8, 2, 0, 0, 0)) // depth 8, RGB, no interlace
    out.write(be32(0)) // crc (unchecked)
    for (len <- Seq(Int.MaxValue, Int.MaxValue - 11, 0x7FFFFFF0)) {
      val evil = out.toByteArray ++ be32(len) ++ "IDAT".getBytes("US-ASCII")
      assert(graft.expressions.PngPixels.compute(evil) === null)
      assert(graft.expressions.PngDHash.compute(evil) === null)
    }
  }

  test("co64 offsets are attacker-controlled be64 — negative and huge values refuse") {
    val good = Mp4Writer.mp4(8, 8,
      Seq(JpegWriter.gray(8, 8, (x, y) => (x + y) % 256)), useCo64 = true)
    // locate the co64 box and its first 64-bit offset (payload: version/
    // flags 4 + entry_count 4, offsets follow)
    val tag = "co64".getBytes("US-ASCII")
    val at = good.indices.find(i => i + 4 <= good.length &&
      good(i) == tag(0) && good(i + 1) == tag(1) &&
      good(i + 2) == tag(2) && good(i + 3) == tag(3)).get
    val offAt = at + 4 + 8
    for (evil <- Seq(-1L, Long.MinValue, Long.MaxValue - 2,
        good.length.toLong + 1, (1L << 32) + 4)) {
      val mutated = good.clone()
      var v = evil
      for (k <- 7 to 0 by -1) { mutated(offAt + k) = (v & 0xFF).toByte; v >>>= 8 }
      assert(graft.expressions.Mp4Frames.compute(mutated) === null)
    }
    // sanity: the unmutated file still decodes
    assert(graft.expressions.Mp4Frames.compute(good) !== null)
  }

  test("bit-flipped genuine documents never throw") {
    val base = Seq(
      PdfWriter.pdf(Seq(Seq("gamma delta")), compress = false),
      OoxmlWriter.pptx(Seq(Seq("slide"))),
      MediaWriter.wav(1, 8000, 8, 64),
      MediaWriter.wavWithSamples(1, 8000, 128, 3),
      ImageWriter.pngWithPixels(16, 12, 42),
      Mp4Writer.mp4(8, 8, Seq(JpegWriter.gray(8, 8, (x, y) => (x ^ y) % 256))),
      Mp4Writer.mp4(8, 8, Seq(JpegWriter.gray(8, 8, (x, y) => (x * 3 + y) % 256)),
        useCo64 = true),
      JpegWriter.grayProgressive(16, 8, (x, y) => (x * 5 + y) % 256),
      LegacyOfficeWriter.doc(Seq("epsilon zeta")),
      WarcWriter.write(Seq(("https://e/z", null, 200, "text/html",
        "<html><p>flip target</p></html>".getBytes("ISO-8859-1")))),
      WarcWriter.write(Seq(("https://e/w", null, 200, "text/plain",
        "flip gz".getBytes("ISO-8859-1"))), gzipMembers = true),
      GifWriter.gray(16, 12, (x, y) => (x * 5 + y * 3) % 256),
      GifWriter.animatedGray(12, 10,
        Seq((x, y) => (x ^ y) % 256, (x, y) => (x * 7 + y) % 256)),
      ImageWriter.pngIndexed(12, 9, Array.tabulate(12)(i => (i * 9).toByte),
        (x, y) => (x + y) % 4, depth = 2, interlaced = true),
      ImageWriter.pngGray(11, 8, (x, y) => (x * 31 + y) % 65536, depth = 16),
      WebpWriter.gray(14, 10, (x, y) => (x * 5 + y * 3) % 256, cacheBits = 4),
      WebpWriter.losslessIndexed(12, 9,
        Array.tabulate(7)(i => 0xFF000000 | (i * 36 << 8)),
        (x, y) => (x + y) % 7),
      ImageWriter.bmpFromPixels(13, 9, (x, y) => (x % 256, y % 256, (x * y) % 256)),
      ImageWriter.bmpIndexed(11, 7, Array.tabulate(48)(i => (i * 5).toByte),
        (x, y) => (x + y) % 16, bpp = 4, topDown = true),
      ImageWriter.bmp16(13, 9, (x, y) => (x * 9 % 256, y * 7 % 256, (x + y) % 256)),
      ImageWriter.bmp16(12, 8, (x, y) => (x % 256, y % 256, (x ^ y) % 256),
        rgb565 = true),
      ImageWriter.bmp32Bitfields(11, 7,
        (x, y) => (x * 5 % 256, y * 3 % 256, (x * y) % 256)),
      ImageWriter.tiffImage(14, 9, (x, y) => (x * 7 + y) % 256,
        packBits = true, rowsPerStrip = 3),
      ImageWriter.tiffImage(12, 8, (x, y) => (x + y) % 16, bits = 4,
        littleEndian = false))
    for (doc <- base; i <- doc.indices by 7) {
      val mutated = doc.clone()
      mutated(i) = (mutated(i) ^ 0x5A).toByte
      allCodecs(mutated)
    }
  }
}
