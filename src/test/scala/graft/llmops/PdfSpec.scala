package graft.llmops

import org.scalatest.funsuite.AnyFunSuite

/** Round-trips through PdfWriter → Pdf, plus hand-built content streams
  * covering operators the writer doesn't emit (TJ arrays, ', hex ASCII,
  * octal escapes, lying /Length).
  */
class PdfSpec extends AnyFunSuite {

  private def roundTrip(pages: Seq[Seq[String]], compress: Boolean): Option[String] =
    Pdf.pdfText(PdfWriter.pdf(pages, compress))

  test("single page, raw stream: lines joined with newline") {
    assert(roundTrip(Seq(Seq("first line", "second line")), compress = false)
      === Some("first line\nsecond line"))
  }

  test("multiple pages joined with newline") {
    assert(roundTrip(Seq(Seq("page one"), Seq("page two", "more")), compress = false)
      === Some("page one\npage two\nmore"))
  }

  test("FlateDecode streams inflate (the form real producers emit)") {
    assert(roundTrip(Seq(Seq("compressed body", "line 2")), compress = true)
      === Some("compressed body\nline 2"))
  }

  test("literal-string escapes round-trip: parens and backslashes") {
    val tricky = "a(b)c \\ d(e(f))g"
    assert(roundTrip(Seq(Seq(tricky)), compress = false) === Some(tricky))
    assert(roundTrip(Seq(Seq(tricky)), compress = true) === Some(tricky))
  }

  test("non-ASCII lines travel as UTF-16BE hex strings") {
    val s = "café — naïve €42 日本"
    assert(roundTrip(Seq(Seq(s, "ascii too")), compress = false)
      === Some(s + "\nascii too"))
  }

  test("empty lines survive (shown empty string between moves)") {
    assert(roundTrip(Seq(Seq("a", "", "b")), compress = false) === Some("a\n\nb"))
  }

  test("not a PDF: None; valid header with no text: Some(empty)") {
    assert(Pdf.pdfText("not a pdf at all".getBytes) === None)
    assert(Pdf.pdfText(Array[Byte](1, 2, 3)) === None)
    assert(Pdf.pdfText(null) === None)
    assert(Pdf.pdfText("%PDF-1.4\n%%EOF\n".getBytes) === Some(""))
  }

  test("content-stream tokenizer: TJ arrays concatenate, kerning ignored") {
    val lines = Pdf.contentText(
      "BT /F1 12 Tf 72 720 Td [(Hel) -20 (lo) 5 ( wor) (ld)] TJ ET")
    assert(lines === Seq("Hello world"))
  }

  test("content-stream tokenizer: ' advances a line then shows") {
    val lines = Pdf.contentText(
      "BT 72 720 Td (one) Tj (two) ' (three) ' ET")
    assert(lines === Seq("one", "two", "three"))
  }

  test("content-stream tokenizer: hex ASCII and octal escapes decode") {
    val lines = Pdf.contentText(
      "BT 0 0 Td <48656C6C 6F> Tj (\\110\\151\\41) Tj ET")
    assert(lines === Seq("HelloHi!"))
  }

  test("content-stream tokenizer: leading positioning Td adds no phantom line") {
    val lines = Pdf.contentText(
      "BT /F1 9 Tf 1 0 0 1 50 700 Tm 0 -14 Td (only) Tj ET")
    assert(lines === Seq("only"))
  }

  test("indirect /Length (N 0 R) never yields a digit-prefix direct length") {
    // "/Length 25 0 R": the pre-fix regex backtracked past the R-lookahead
    // to the prefix "2" and — when whitespace+endstream sat at that bogus
    // offset — trusted a 2-byte direct length. The (?!\d) boundary rejects
    // every proper digit prefix, so the cut must come from the endstream
    // scan, which strips EOLs but keeps the space: "AB ", not "AB".
    val pre = "%PDF-1.4\n4 0 obj\n<< /Length 25 0 R >>\nstream\n"
    val data = "AB \nendstream REST"
    val doc = pre + data + "\nendstream\nendobj\n%%EOF\n"
    val dataStart = pre.length
    assert(Pdf.streamEnd(doc, dataStart, "<< /Length 25 0 R >>")
      === dataStart + 3) // scan cut after "AB " (pre-fix: 2, the bogus length)
  }

  test("indirect /Length PDF extracts full multi-line text via the scan") {
    val doc = ("%PDF-1.4\n" +
      "4 0 obj\n<< /Length 12 0 R >>\nstream\n" +
      "BT 0 0 Td (full text) Tj 0 -14 Td (recovered) Tj ET" +
      "\nendstream\nendobj\n" +
      "12 0 obj\n51\nendobj\n%%EOF\n").getBytes("ISO-8859-1")
    assert(Pdf.pdfText(doc) === Some("full text\nrecovered"))
  }

  test("lying /Length falls back to endstream scan") {
    val doc = ("%PDF-1.4\n" +
      "4 0 obj\n<< /Length 9999 >>\nstream\n" +
      "BT 0 0 Td (recovered) Tj ET" +
      "\nendstream\nendobj\n%%EOF\n").getBytes
    assert(Pdf.pdfText(doc) === Some("recovered"))
  }

  test("truncated Flate stream is skipped, later streams still extract") {
    val good = PdfWriter.pdf(Seq(Seq("intact")), compress = false)
    val bad = ("%PDF-1.4\n" +
      "4 0 obj\n<< /Length 4 /Filter /FlateDecode >>\nstream\n" +
      "\nendstream\nendobj\n").getBytes("ISO-8859-1")
    val spliced = bad ++ good.drop("%PDF-1.4\n".length)
    assert(Pdf.pdfText(spliced) === Some("intact"))
  }

  test("preset-dictionary (FDICT) Flate stream refuses; later streams extract") {
    // zlib header 0x78 0x20: CM=8, FDICT bit set, (0x78*256+0x20)%31==0.
    // Inflater stalls on needsDictionary — the stream must be skipped
    // whole, not handed back as a partial prefix.
    val good = PdfWriter.pdf(Seq(Seq("intact")), compress = false)
    val fdict = Array[Byte](0x78, 0x20, 1, 2, 3, 4, 0x42, 0x42)
    val bad = ("%PDF-1.4\n" +
      s"4 0 obj\n<< /Length ${fdict.length} /Filter /FlateDecode >>\nstream\n")
      .getBytes("ISO-8859-1") ++ fdict ++
      "\nendstream\nendobj\n".getBytes("ISO-8859-1")
    val spliced = bad ++ good.drop("%PDF-1.4\n".length)
    assert(Pdf.pdfText(spliced) === Some("intact"))
  }

  test("embedded DCT images come back byte-identical, in document order") {
    val imgs = Seq(3, 99, 7).map(s => JpegWriter.gray(16, 16,
      (x, y) => (x * 3 + y * 5 + s) % 256))
    val pdf = PdfWriter.pdfWithImages(Seq("alpha", "beta"), imgs,
      imgs.map(_ => (16, 16)))
    val got = Pdf.images(pdf).get
    assert(got.length === 3)
    got.zip(imgs).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b))
    }
    // every extracted payload decodes through the JPEG pipeline
    got.foreach(b => assert(graft.expressions.JpegPixels.compute(b) != null))
    // ...and the text beside them still extracts, uncontaminated
    assert(Pdf.pdfText(pdf).get.contains("alpha"))
    assert(Pdf.pdfText(pdf).get.contains("beta"))
    // a text-only PDF has no images but IS a PDF
    assert(Pdf.images(PdfWriter.pdf(Seq(Seq("just text")))) === Some(Seq()))
    // non-PDF bytes refuse
    assert(Pdf.images("not a pdf".getBytes("UTF-8")) === None)
    assert(Pdf.images(null) === None)
  }

  test("writer output is byte-deterministic") {
    val a = PdfWriter.pdf(Seq(Seq("same", "doc")), compress = true)
    val b = PdfWriter.pdf(Seq(Seq("same", "doc")), compress = true)
    assert(java.util.Arrays.equals(a, b))
  }

  test("xref offsets in the trailer point at real objects") {
    val bytes = PdfWriter.pdf(Seq(Seq("x")), compress = false)
    val doc = new String(bytes, "ISO-8859-1")
    val xrefAt = doc.indexOf("xref")
    assert(xrefAt > 0)
    // every in-use entry's offset lands on "<id> 0 obj"
    val entries = doc.substring(doc.indexOf('\n', xrefAt + 6) + 1)
      .linesIterator.dropWhile(_.endsWith(" f ")).takeWhile(_.endsWith(" n ")).toSeq
    entries.zipWithIndex.foreach { case (e, i) =>
      val off = e.substring(0, 10).toInt
      assert(doc.startsWith(s"${i + 1} 0 obj", off), s"object ${i + 1}")
    }
    assert(entries.size === 5) // catalog, pages, page, content, font
  }
}
