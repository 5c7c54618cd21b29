package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DocumentTextSpec extends SparkTestBase {
  import spark.implicits._
  import DocumentText._

  test("plain text: BOM stripped, UTF-8 decoded, whitespace normalized") {
    val bom = Array(0xEF, 0xBB, 0xBF).map(_.toByte) ++
      "hola  \n\tmundo".getBytes("UTF-8")
    assert(extractText(bom, "text/plain") === Some("hola mundo"))
  }

  test("invalid UTF-8 falls back to latin-1 instead of failing") {
    val latin = Array('c'.toByte, 0xE9.toByte, 'd'.toByte) // é in ISO-8859-1
    assert(extractText(latin, "text/plain") === Some("céd"))
  }

  test("UTF-16 BOMs select UTF-16, both endiannesses") {
    // a latin-1 "decode" would interleave NULs between every character
    val le = "hløla le".getBytes("UTF-16LE")
    val be = "hløla be".getBytes("UTF-16BE")
    val leBom = Array(0xFF.toByte, 0xFE.toByte) ++ le
    val beBom = Array(0xFE.toByte, 0xFF.toByte) ++ be
    assert(extractText(leBom, "text/plain") === Some("hløla le"))
    assert(extractText(beBom, "text/plain") === Some("hløla be"))
    // BOM-less bytes keep the old fallback behavior (no sniffing)
    assert(decodeBytes("plain".getBytes("UTF-8")) === "plain")
  }

  test("html: tags stripped, script/style elided, comments dropped, entities decoded") {
    val html =
      """<html><head><title>T</title><style>p { color: red }</style></head>
        |<body><!-- note --><h1>Head</h1>
        |<p>a &amp; b &lt;c&gt; &#65;&#x42; &nbsp;end</p>
        |<script>var x = "<p>not text</p>";</script>
        |tail</body></html>""".stripMargin
    assert(htmlToText(html) === "T Head a & b <c> AB end tail")
  }

  test("markdown: links, images, headings, lists, emphasis stripped") {
    val md =
      """# Title
        |Some *bold* _text_ with [a link](http://x) and ![alt words](img.png).
        |- item one
        |2. item two
        |> quoted
        |```scala
        |code stays as words
        |```
        |""".stripMargin
    assert(markdownToText(md) ===
      "Title Some bold text with a link and alt words. item one item two quoted code stays as words")
  }

  test("unsupported binary formats return None (honest stub)") {
    assert(extractText(Array[Byte](1, 2, 3), "application/pdf") === None)
    assert(extractText(Array[Byte](1, 2, 3), null) === None)
  }

  test("sniffMime labels every writer-twin format from bytes alone") {
    val paras = Seq("Heading", "body text with several words")
    assert(DocumentText.sniffMime(PdfWriter.pdf(Seq(paras)))
      === Some("application/pdf"))
    assert(DocumentText.sniffMime(Rtf.write(paras))
      === Some("application/rtf"))
    assert(DocumentText.sniffMime(LegacyOfficeWriter.doc(paras))
      === Some("application/msword"))
    assert(DocumentText.sniffMime(
      LegacyOfficeWriter.xls(Seq("s" -> Seq(Seq("a", "b")))))
      === Some("application/vnd.ms-excel"))
    assert(DocumentText.sniffMime(LegacyOfficeWriter.ppt(Seq(paras)))
      === Some("application/vnd.ms-powerpoint"))
    assert(DocumentText.sniffMime(OoxmlWriter.docx(paras)).exists(
      _.contains("wordprocessingml")))
    assert(DocumentText.sniffMime(
      OoxmlWriter.xlsx(Seq("s" -> Seq(Seq("a"))))).exists(
      _.contains("spreadsheetml")))
    assert(DocumentText.sniffMime(OoxmlWriter.pptx(Seq(paras))).exists(
      _.contains("presentationml")))
    assert(DocumentText.sniffMime(Html.writePage(paras))
      === Some("text/html"))
    assert(DocumentText.sniffMime("plain words here".getBytes("UTF-8"))
      === Some("text/plain"))
    // binaries with no codec and junk containers sniff honestly
    assert(DocumentText.sniffMime(Array[Byte](0, 1, 2, 3, 4, 5)) === None)
    assert(DocumentText.sniffMime(Array.emptyByteArray) === None)
    assert(DocumentText.sniffMime(null) === None)
    // a plain zip is labeled zip (unsupported downstream), not OOXML
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    z.putNextEntry(new java.util.zip.ZipEntry("data.bin"))
    z.write(Array[Byte](1, 2, 3)); z.closeEntry(); z.close()
    assert(DocumentText.sniffMime(bos.toByteArray) === Some("application/zip"))
  }

  test("extractTextAuto: sniff-then-extract round-trips without a mime label") {
    val paras = Seq("Doc 7", "the body of the document")
    assert(DocumentText.extractTextAuto(Rtf.write(paras))
      === Some("Doc 7\nthe body of the document"))
    assert(DocumentText.extractTextAuto(LegacyOfficeWriter.doc(paras))
      === Some("Doc 7\nthe body of the document"))
    assert(DocumentText.extractTextAuto("loose text".getBytes("UTF-8"))
      === Some("loose text"))
    assert(DocumentText.extractTextAuto(Array[Byte](0, 1, 2, 3)) === None)
    // the "auto" sentinel reaches the same path through the mime dispatch
    assert(DocumentText.extractText(Rtf.write(paras), "auto")
      === Some("Doc 7\nthe body of the document"))
  }

  test("extractDocumentText batches over a DataFrame, null for unsupported") {
    val df = Seq(
      (1L, "hello  world".getBytes("UTF-8"), "text/plain"),
      (2L, "<p>tagged</p>".getBytes("UTF-8"), "text/html"),
      (3L, Array[Byte](0x25, 0x50), "application/pdf")
    ).toDF("id", "content", "mime")
    val got = extractDocumentText(df, "content", "mime")
      .select("id", "extracted_text").orderBy("id")
      .collect().map(r => (r.getLong(0), Option(r.getString(1))))
    assert(got.toSeq === Seq(
      (1L, Some("hello world")), (2L, Some("tagged")), (3L, None)))
  }
}
