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

  test("xls: MulRk packs of consecutive numeric cells decode cell-exact") {
    // Excel writes runs of ≥2 numeric cells as ONE MulRk (0x00BD) record;
    // the reader used to skip it, silently blanking those cells (the
    // default writer emits per-cell RKs, so round-trips never saw it)
    val rows = Seq(Seq(1, 2, 3, "x"), Seq("y", 10, 20), Seq(7))
    val mul = LegacyOfficeWriter.xls(Seq("m" -> rows), mulRk = true)
    val plain = LegacyOfficeWriter.xls(Seq("m" -> rows))
    // the MulRk fixture really does use the packed record
    val wb = Cfb.streams(mul).get("Workbook")
    def hasRecord(b: Array[Byte], typ: Int): Boolean = {
      var p = 0
      while (p + 4 <= b.length) {
        val t = (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8)
        if (t == typ) return true
        p += 4 + ((b(p + 2) & 0xFF) | ((b(p + 3) & 0xFF) << 8))
      }
      false
    }
    assert(hasRecord(wb, 0x00BD), "fixture emits MulRk")
    val expected = "Sheet: m\nRow 1: 1 | 2 | 3 | x\nRow 2: y | 10 | 20 | \n" +
      "Row 3: 7 |  |  | \n"
    assert(LegacyOffice.xlsText(mul) === Some(expected))
    assert(LegacyOffice.xlsText(plain) === Some(expected),
      "packed and per-cell encodings extract identically")
  }

  test("cfb: v4 files (4096-byte sectors) locate sector 0 at 4096, not 512") {
    // [MS-CFB] 2.1: sector #n starts at (n+1)<<sectorShift — the header
    // occupies the whole of "sector -1". CfbWriter only emits v3, so this
    // hand-built v4 file is the only fixture exercising the offset rule.
    def putU16(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v & 0xFF).toByte; b(off + 1) = ((v >> 8) & 0xFF).toByte
    }
    def putI32(b: Array[Byte], off: Int, v: Int): Unit = {
      var k = 0
      while (k < 4) { b(off + k) = ((v >> (8 * k)) & 0xFF).toByte; k += 1 }
    }
    val S = 4096
    val file = new Array[Byte](S * 4) // header block + FAT + dir + data
    // header (512 bytes; rest of the 4096 header sector is zero fill)
    val magic = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
    magic.indices.foreach(i => file(i) = magic(i).toByte)
    putU16(file, 0x1A, 4) // major version 4
    putU16(file, 0x1C, 0xFFFE) // little-endian marker
    putU16(file, 0x1E, 12) // sector shift: 4096
    putU16(file, 0x20, 6) // mini shift: 64
    putI32(file, 0x2C, 1) // one FAT sector
    putI32(file, 0x30, 1) // directory at sector 1
    putI32(file, 0x38, 4096) // mini cutoff
    putI32(file, 0x3C, 0xFFFFFFFE) // no miniFAT
    putI32(file, 0x44, 0xFFFFFFFE) // no DIFAT chain
    putI32(file, 0x4C, 0) // DIFAT[0]: FAT at sector 0
    var d = 1
    while (d < 109) { putI32(file, 0x4C + d * 4, 0xFFFFFFFF); d += 1 }
    // FAT (sector 0, offset 4096): FAT itself, dir chain, data chain
    putI32(file, S, 0xFFFFFFFD) // sector 0 = FATSECT
    putI32(file, S + 4, 0xFFFFFFFE) // sector 1 (directory): end of chain
    putI32(file, S + 8, 0xFFFFFFFE) // sector 2 (data): end of chain
    var f = 3
    while (f < S / 4) { putI32(file, S + f * 4, 0xFFFFFFFF); f += 1 }
    // directory (sector 1, offset 8192): Root Entry + one stream
    val dir = 2 * S
    def dirEntry(idx: Int, name: String, objType: Int, start: Int,
        size: Int): Unit = {
      val off = dir + idx * 128
      val utf16 = name.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
      System.arraycopy(utf16, 0, file, off, utf16.length)
      putU16(file, off + 0x40, utf16.length + 2) // name len incl NUL
      file(off + 0x42) = objType.toByte
      putI32(file, off + 0x74, start)
      putI32(file, off + 0x78, size)
    }
    dirEntry(0, "Root Entry", 5, 0xFFFFFFFE, 0)
    dirEntry(1, "Data", 2, 2, 4096) // = cutoff -> regular chain, 1 sector
    // data (sector 2, offset 12288)
    var k = 0
    while (k < 4096) { file(3 * S + k) = (k % 251).toByte; k += 1 }
    val parts = Cfb.streams(file)
    assert(parts.isDefined, "v4 container parses")
    val data = parts.get("Data")
    assert(data.length === 4096)
    assert(data.zipWithIndex.forall { case (b, i) => b == (i % 251).toByte },
      "sector 0 was read from offset 4096 — v4 offset rule")
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
