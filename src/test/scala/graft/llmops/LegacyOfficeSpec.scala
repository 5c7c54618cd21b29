package graft.llmops

import org.scalatest.funsuite.AnyFunSuite

/** OLE2 family round-trips: [[LegacyOfficeWriter]] fixtures through
  * [[Cfb]] + [[LegacyOffice]], covering both CFB storage paths (mini
  * stream under the 4096-byte cutoff, regular FAT chains above it), both
  * Word piece encodings (CP1252 + UTF-16LE), the three BIFF8 cell record
  * kinds, and PPT slide grouping.
  */
class LegacyOfficeSpec extends AnyFunSuite {

  // ---- CFB container -------------------------------------------------------

  test("cfb round trip: mini, regular, and empty streams") {
    val small = "mini stream payload".getBytes("UTF-8") // < 4096 -> mini
    val big = Array.tabulate[Byte](9000)(i => (i % 251).toByte) // >= 4096 -> FAT
    val bytes = CfbWriter.build(Seq(
      "Small" -> small, "Big" -> big, "Empty" -> Array.emptyByteArray))
    val parts = Cfb.streams(bytes).get
    assert(parts.keySet === Set("Small", "Big", "Empty"))
    assert(parts("Small").toSeq === small.toSeq)
    assert(parts("Big").toSeq === big.toSeq)
    assert(parts("Empty").isEmpty)
  }

  test("cfb: multi-sector mini stream and exact size truncation") {
    // two mini streams whose lengths are not mini-sector multiples
    val a = Array.tabulate[Byte](150)(_.toByte)
    val b = Array.tabulate[Byte](70)(i => (i + 1).toByte)
    val parts = Cfb.streams(CfbWriter.build(Seq("A" -> a, "B" -> b))).get
    assert(parts("A").toSeq === a.toSeq)
    assert(parts("B").toSeq === b.toSeq)
  }

  test("cfb: isCfb sniffs the magic") {
    assert(Cfb.isCfb(CfbWriter.build(Seq("S" -> "x".getBytes))))
    assert(!Cfb.isCfb("PKnope".getBytes("ISO-8859-1")))
    assert(!Cfb.isCfb(null))
  }

  // ---- .doc ----------------------------------------------------------------

  test("doc round trip: paragraph marks become newlines, terminator trimmed") {
    val bytes = LegacyOfficeWriter.doc(Seq("Doc 7", "hello legacy world"))
    assert(LegacyOffice.docText(bytes) === Some("Doc 7\nhello legacy world"))
  }

  test("doc: multi-piece text with mixed CP1252 and UTF-16 pieces") {
    val bytes = LegacyOfficeWriter.docPieces(Seq("ascii head ", "čšž-unicode", " tail\r"))
    assert(LegacyOffice.docText(bytes) === Some("ascii head čšž-unicode tail"))
  }

  test("doc: large text takes the regular-FAT path") {
    val body = ("long paragraph " * 400).trim // WordDocument well over 4096 B
    val bytes = LegacyOfficeWriter.doc(Seq("head", body))
    assert(LegacyOffice.docText(bytes) === Some(s"head\n$body"))
  }

  test("doc: field marks and control chars are scrubbed") {
    // 0x13/0x14/0x15 = field begin/sep/end marks; 0x07 = cell mark
    val raw = "a\u0013 HYPERLINK \u0014shown\u0015\rb\u0007c"
    assert(LegacyOffice.cleanDocText(raw) === "a HYPERLINK shown\nb\nc")
  }

  // ---- .xls ----------------------------------------------------------------

  test("xls round trip: label/number/rk cells in the xlsx line shape") {
    val bytes = LegacyOfficeWriter.xls(Seq(
      "data" -> Seq(Seq("id", 42), Seq("text", "hi there"), Seq("pi", 3.5))))
    assert(LegacyOffice.xlsText(bytes) === Some(
      "Sheet: data\nRow 1: id | 42\nRow 2: text | hi there\nRow 3: pi | 3.5\n"))
  }

  test("xls: multiple sheets, unicode names and strings, sparse cells") {
    val bytes = LegacyOfficeWriter.xls(Seq(
      "première" -> Seq(Seq("naïve", "λ-calc")),
      "second" -> Seq(Seq("a"), Seq(), Seq("b", "c"))))
    assert(LegacyOffice.xlsText(bytes) === Some(
      "Sheet: première\nRow 1: naïve | λ-calc\n\n" +
        "Sheet: second\nRow 1: a | \nRow 2:  | \nRow 3: b | c\n"))
  }

  test("xls: RK decode forms") {
    assert(LegacyOffice.decodeRk((42 << 2) | 0x02) === 42.0)
    assert(LegacyOffice.decodeRk((1234 << 2) | 0x03) === 12.34)
    val bits = java.lang.Double.doubleToLongBits(2.5)
    assert(LegacyOffice.decodeRk(((bits >>> 32) & 0xFFFFFFFCL).toInt) === 2.5)
  }

  test("xls: pre-BIFF8 workbooks are refused, not rendered empty") {
    val biff8 = LegacyOfficeWriter.xls(Seq("s" -> Seq(Seq("v"))))
    // corrupt the BOF version field (first record data, offset +4 in the
    // Workbook stream) from 0x0600 to BIFF5's 0x0500
    val parts = Cfb.streams(biff8).get
    val wb = parts("Workbook").clone()
    assert(wb(4) == 0x00 && wb(5) == 0x06)
    wb(5) = 0x05
    val biff5 = CfbWriter.build(Seq("Workbook" -> wb))
    assert(LegacyOffice.xlsText(biff5).isEmpty)
    assert(LegacyOffice.xlsText(biff8).isDefined)
  }

  // ---- .ppt ----------------------------------------------------------------

  test("ppt round trip: slide grouping and shape joining match the pptx shape") {
    val bytes = LegacyOfficeWriter.ppt(Seq(Seq("Doc 9", "body text"), Seq("End")))
    assert(LegacyOffice.pptText(bytes) ===
      Some("Slide 1: Doc 9 body text\n\nSlide 2: End"))
  }

  test("ppt: unicode shapes ride TextCharsAtom") {
    val bytes = LegacyOfficeWriter.ppt(Seq(Seq("ascii", "ünïcødé—dash")))
    assert(LegacyOffice.pptText(bytes) === Some("Slide 1: ascii ünïcødé—dash"))
  }

  // ---- dispatch ------------------------------------------------------------

  test("DocumentText dispatches the legacy MIME types") {
    val doc = LegacyOfficeWriter.doc(Seq("via dispatch"))
    val xls = LegacyOfficeWriter.xls(Seq("s" -> Seq(Seq("v"))))
    val ppt = LegacyOfficeWriter.ppt(Seq(Seq("p")))
    assert(DocumentText.extractText(doc, "application/msword")
      === Some("via dispatch"))
    assert(DocumentText.extractText(xls, "application/vnd.ms-excel")
      === Some("Sheet: s\nRow 1: v\n"))
    assert(DocumentText.extractText(ppt, "application/vnd.ms-powerpoint")
      === Some("Slide 1: p"))
    // OLE2 bytes under an OOXML mime fail the zip parse -> None, no throw
    assert(DocumentText.extractText(doc,
      "application/vnd.openxmlformats-officedocument.wordprocessingml.document").isEmpty)
  }
}
