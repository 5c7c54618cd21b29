package graft.llmops

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_16BE}
import java.util.zip.Deflater

/** Minimal PDF writer: structurally valid single-font documents (catalog,
  * page tree, per-page content streams, correct xref offsets) from
  * line-structured text. The round-trip partner of [[Pdf]] — gate queries
  * and specs build real PDFs from corpus text instead of shipping binary
  * fixtures, mirroring how [[OoxmlWriter]] backs the OOXML codec.
  *
  * Encoding: pure-ASCII lines become escaped literal strings; anything
  * else is written as a BOM-prefixed UTF-16BE hex string (both are
  * standard PDF text-string forms, and both exercise a distinct [[Pdf]]
  * read path). Output is byte-deterministic for a given input.
  */
object PdfWriter {

  /** A PDF with one page per element; each page shows its lines top-down
    * (`Td` line advances). `compress=true` Flate-encodes every content
    * stream (the form nearly all real-world producers emit).
    */
  def pdf(pages: Seq[Seq[String]], compress: Boolean = false): Array[Byte] = {
    val nPages = pages.size
    // object ids: 1 catalog, 2 pages, 3..2+n page objs, 3+n..2+2n contents, 3+2n font
    val fontId = 3 + 2 * nPages
    val out = new ByteArrayOutputStream(4096)
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    val offsets = new Array[Int](fontId + 1)

    w("%PDF-1.4\n%âãÏÓ\n") // binary-comment marker line

    offsets(1) = out.size()
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")

    offsets(2) = out.size()
    val kids = (0 until nPages).map(i => s"${3 + i} 0 R").mkString(" ")
    w(s"2 0 obj\n<< /Type /Pages /Kids [$kids] /Count $nPages >>\nendobj\n")

    pages.zipWithIndex.foreach { case (_, i) =>
      offsets(3 + i) = out.size()
      w(s"${3 + i} 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Contents ${3 + nPages + i} 0 R /Resources << /Font << /F1 $fontId 0 R >> >> >>\nendobj\n")
    }

    pages.zipWithIndex.foreach { case (lines, i) =>
      val id = 3 + nPages + i
      offsets(id) = out.size()
      val content = contentStream(lines).getBytes(ISO_8859_1)
      val (data, filter) =
        if (compress) (deflate(content), " /Filter /FlateDecode") else (content, "")
      w(s"$id 0 obj\n<< /Length ${data.length}$filter >>\nstream\n")
      out.write(data)
      w("\nendstream\nendobj\n")
    }

    offsets(fontId) = out.size()
    w(s"$fontId 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")

    val xrefAt = out.size()
    w(s"xref\n0 ${fontId + 1}\n")
    w("0000000000 65535 f \n")
    (1 to fontId).foreach(id => w(f"${offsets(id)}%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${fontId + 1} /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  /** A one-page PDF embedding `images` as `/DCTDecode` XObjects (each
    * element a complete baseline JPEG, e.g. from [[JpegWriter]]) drawn
    * across the page, with optional text lines — the writer twin of
    * [[Pdf.images]]. `dims` are the declared /Width × /Height per image
    * (PDF metadata; the JPEG bytes carry their own dimensions).
    */
  def pdfWithImages(lines: Seq[String], images: Seq[Array[Byte]],
      dims: Seq[(Int, Int)], colorSpaces: Seq[String] = Nil): Array[Byte] = {
    require(images.length == dims.length, "one (w, h) per image")
    val n = images.length
    // ids: 1 catalog, 2 pages, 3 page, 4 contents, 5 font, 6.. images
    val fontId = 5
    val out = new ByteArrayOutputStream(4096)
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    val offsets = new Array[Int](fontId + n + 1)
    w("%PDF-1.4\n%âãÏÓ\n")
    offsets(1) = out.size()
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    offsets(2) = out.size()
    w("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    offsets(3) = out.size()
    val xobjs = (0 until n).map(j => s"/Im$j ${fontId + 1 + j} 0 R").mkString(" ")
    w("3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> " +
      s"/XObject << $xobjs >> >> >>\nendobj\n")
    offsets(4) = out.size()
    val draws = (0 until n).map { j =>
      val (iw, ih) = dims(j)
      s"q $iw 0 0 $ih ${40 + 60 * j} 40 cm /Im$j Do Q"
    }
    val content = (contentStream(lines) + "\n" + draws.mkString("\n"))
      .getBytes(ISO_8859_1)
    w(s"4 0 obj\n<< /Length ${content.length} >>\nstream\n")
    out.write(content)
    w("\nendstream\nendobj\n")
    offsets(5) = out.size()
    w("5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    images.zipWithIndex.foreach { case (img, j) =>
      val id = fontId + 1 + j
      offsets(id) = out.size()
      val (iw, ih) = dims(j)
      val cs = colorSpaces.lift(j).getOrElse("/DeviceGray")
      w(s"$id 0 obj\n<< /Type /XObject /Subtype /Image /Width $iw " +
        s"/Height $ih /ColorSpace $cs /BitsPerComponent 8 " +
        s"/Filter /DCTDecode /Length ${img.length} >>\nstream\n")
      out.write(img)
      w("\nendstream\nendobj\n")
    }
    val total = fontId + n
    val xrefAt = out.size()
    w(s"xref\n0 ${total + 1}\n")
    w("0000000000 65535 f \n")
    (1 to total).foreach(id => w(f"${offsets(id)}%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${total + 1} /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  private def contentStream(lines: Seq[String]): String = {
    val sb = new java.lang.StringBuilder
    sb.append("BT\n/F1 12 Tf\n72 720 Td\n")
    lines.zipWithIndex.foreach { case (line, i) =>
      if (i > 0) sb.append("0 -14 Td\n")
      sb.append(textString(line)).append(" Tj\n")
    }
    sb.append("ET\n")
    sb.toString
  }

  /** One PDF text string: escaped-literal for printable ASCII, else
    * BOM-prefixed UTF-16BE hex.
    */
  def textString(s: String): String = {
    val ascii = s.forall(c => c >= 32 && c < 127)
    if (ascii) {
      val sb = new java.lang.StringBuilder(s.length + 8)
      sb.append('(')
      s.foreach {
        case '(' => sb.append("\\(")
        case ')' => sb.append("\\)")
        case '\\' => sb.append("\\\\")
        case c => sb.append(c)
      }
      sb.append(')')
      sb.toString
    } else {
      val b = s.getBytes(UTF_16BE)
      val sb = new java.lang.StringBuilder(b.length * 2 + 8)
      sb.append("<FEFF")
      b.foreach(x => sb.append(f"${x & 0xFF}%02X"))
      sb.append('>')
      sb.toString
    }
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.BEST_SPEED)
    try {
      d.setInput(data)
      d.finish()
      val out = new ByteArrayOutputStream(data.length / 2 + 64)
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }
}
