package graft.llmops

import scala.collection.mutable
import scala.util.control.NonFatal

/** Text extraction for the legacy binary Office family (.doc/.xls/.ppt)
  * on top of the [[Cfb]] container — the formats the reference's document
  * dispatch accepts (aje_libs/documents/helpers/document_processor.py:27-34)
  * but cannot genuinely parse (it routes .doc into python-docx, an
  * OOXML-only library). Parsers are from scratch against the public
  * [MS-DOC] / [MS-XLS] / [MS-PPT] layouts.
  *
  * Output shapes deliberately mirror the OOXML extractors so a corpus
  * mixing .doc and .docx yields uniform text:
  *   - doc: piece-table text with Word's '\r' paragraph marks mapped to
  *     '\n' and control marks dropped (the [[Ooxml.docxText]] newline
  *     contract).
  *   - xls: "Sheet: name" / "Row n: a | b" / trailing blank line per sheet
  *     (the [[Ooxml.xlsxText]] contract).
  *   - ppt: "Slide i: " + texts joined by spaces, slides joined by "\n\n"
  *     (the [[Ooxml.pptxText]] contract).
  *
  * Poison-document posture: any structural violation returns None, never
  * throws.
  */
object LegacyOffice {

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  private def i32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  // ---- .doc (Word 97 binary, [MS-DOC]) -------------------------------------

  /** Word text lives in the WordDocument stream, located by the piece
    * table (CLX) in the table stream — the FIB at offset 0 carries
    * fcClx/lcbClx (FibRgFcLcb97 slot at 0x01A2) and the fWhichTblStm flag
    * (0x0200 at FIB+0x0A) choosing 0Table vs 1Table. Each piece descriptor
    * encodes its file position in bit 30: set = 8-bit CP1252 at fc/2,
    * clear = UTF-16LE at fc ([MS-DOC] PCD.fc).
    */
  def docText(bytes: Array[Byte]): Option[String] =
    try {
      val parts = Cfb.streams(bytes).getOrElse(return None)
      val word = parts.get("WordDocument").getOrElse(return None)
      if (word.length < 0x01AA || u16(word, 0) != 0xA5EC) return None
      val flags = u16(word, 0x0A)
      val tableName = if ((flags & 0x0200) != 0) "1Table" else "0Table"
      val table = parts.get(tableName)
        .orElse(parts.get("1Table")).orElse(parts.get("0Table"))
        .getOrElse(return None)
      val fcClx = i32(word, 0x01A2)
      val lcbClx = i32(word, 0x01A6)
      if (fcClx < 0 || lcbClx <= 0 || fcClx.toLong + lcbClx > table.length)
        return None

      // CLX = zero or more Prc (clxt=1, property mods) then one Pcdt (clxt=2)
      var p = fcClx
      val end = fcClx + lcbClx
      while (p < end && (table(p) & 0xFF) == 1) {
        if (p + 3 > end) return None
        p += 3 + u16(table, p + 1) // clxt + cbGrpprl + grpprl
      }
      if (p + 5 > end || (table(p) & 0xFF) != 2) return None
      val lcbPlcPcd = i32(table, p + 1)
      p += 5
      if (lcbPlcPcd < 4 + 12 || p + lcbPlcPcd > end) return None
      val n = (lcbPlcPcd - 4) / 12 // (n+1) CPs + n 8-byte PCDs
      val cps = (0 to n).map(i => i32(table, p + i * 4))
      val pcdBase = p + (n + 1) * 4

      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < n) {
        val cpLen = cps(i + 1) - cps(i)
        if (cpLen < 0) return None
        val fcRaw = i32(table, pcdBase + i * 8 + 2)
        val compressed = (fcRaw & 0x40000000) != 0
        val off = fcRaw & 0x3FFFFFFF
        if (compressed) {
          val start = off / 2
          if (start < 0 || start.toLong + cpLen > word.length) return None
          sb.append(new String(word, start, cpLen, "windows-1252"))
        } else {
          if (off < 0 || off.toLong + 2L * cpLen > word.length) return None
          sb.append(new String(word, off, 2 * cpLen,
            java.nio.charset.StandardCharsets.UTF_16LE))
        }
        i += 1
      }
      Some(cleanDocText(sb.toString))
    } catch { case NonFatal(_) => None }

  /** Word's in-stream marks -> text: '\r' (paragraph) and 0x0B (line
    * break) become '\n', 0x07 (cell/row mark) becomes '\n', field/other
    * control chars below 0x20 (except '\n'/'\t') and the object-anchor
    * specials 0xFFFA-0xFFFF are dropped; trailing whitespace trimmed.
    */
  private[llmops] def cleanDocText(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '\r' | '\u000B' | '\u0007' => out.append('\n')
        case '\n' | '\t' => out.append(c)
        case c if c < 0x20 => // field begin/sep/end (0x13/0x14/0x15) etc.
        case c if c >= 0xFFFA => // specials
        case c => out.append(c)
      }
      i += 1
    }
    // Word terminates the main document with a final paragraph mark
    var e = out.length
    while (e > 0 && Character.isWhitespace(out.charAt(e - 1))) e -= 1
    out.substring(0, e)
  }

  // ---- .xls (BIFF8, [MS-XLS]) ----------------------------------------------

  /** BIFF8 Workbook stream: the globals substream carries the shared
    * string table (SST, 0x00FC) and per-sheet BoundSheet8 records (0x0085,
    * with each sheet substream's stream offset); sheet substreams carry
    * LabelSst (0x00FD), Number (0x0203), and RK (0x027E) cells. Rendered
    * in the [[Ooxml.xlsxText]] line shape.
    *
    * Known limit: an SST spilling into Continue records (0x003C — needed
    * past ~8 KB of strings) is read only up to its first record; later
    * strings resolve to "". Bounded corpus impact (cells render empty,
    * nothing throws) and no fixture needs it; extend here if real-world
    * sheets do.
    */
  def xlsText(bytes: Array[Byte]): Option[String] =
    try {
      val parts = Cfb.streams(bytes).getOrElse(return None)
      val wb = parts.get("Workbook").orElse(parts.get("Book"))
        .getOrElse(return None)

      // ---- globals: boundsheets + SST
      val sheets = mutable.ArrayBuffer.empty[(String, Int)] // (name, lbPlyPos)
      val sst = mutable.ArrayBuffer.empty[String]
      var p = 0
      var depth = 0
      var done = false
      while (!done && p + 4 <= wb.length) {
        val typ = u16(wb, p)
        val len = u16(wb, p + 2)
        if (p + 4 + len > wb.length) return None
        typ match {
          case 0x0809 => // BOF (globals or substream)
            // BIFF8 only: older BIFF5/BIFF7 books carry LABEL/SST-less
            // records this parser would render as silently empty sheets —
            // refuse them instead (vers field of the first BOF)
            if (depth == 0 && (len < 2 || u16(wb, p + 4) != 0x0600))
              return None
            depth += 1
          case 0x000A => // EOF: end of globals terminates the header walk
            depth -= 1
            if (depth <= 0) done = true
          case 0x0085 if depth == 1 => // BoundSheet8
            val pos = i32(wb, p + 4)
            val cch = wb(p + 10) & 0xFF
            val high = (wb(p + 11) & 0x01) != 0
            val name =
              if (high) new String(wb, p + 12, cch * 2,
                java.nio.charset.StandardCharsets.UTF_16LE)
              else new String(wb, p + 12, cch,
                java.nio.charset.StandardCharsets.ISO_8859_1)
            sheets += ((name, pos))
          case 0x00FC if depth == 1 => // SST
            val cstUnique = i32(wb, p + 8)
            var q = p + 12
            var k = 0
            while (k < cstUnique && q + 3 <= p + 4 + len) {
              val cch = u16(wb, q)
              val fl = wb(q + 2) & 0xFF
              val high = (fl & 0x01) != 0
              val rich = (fl & 0x08) != 0
              val ext = (fl & 0x04) != 0
              var r = q + 3
              val cRun = if (rich) { val v = u16(wb, r); r += 2; v } else 0
              val cbExt = if (ext) { val v = i32(wb, r); r += 4; v } else 0
              val charBytes = if (high) cch * 2 else cch
              if (r + charBytes > p + 4 + len) return None
              sst += (
                if (high) new String(wb, r, charBytes,
                  java.nio.charset.StandardCharsets.UTF_16LE)
                else new String(wb, r, charBytes,
                  java.nio.charset.StandardCharsets.ISO_8859_1))
              q = r + charBytes + cRun * 4 + cbExt
              k += 1
            }
          case _ =>
        }
        p += 4 + len
      }
      if (sheets.isEmpty) return None

      // ---- sheet substreams
      val lines = mutable.ArrayBuffer.empty[String]
      sheets.foreach { case (name, pos) =>
        lines += s"Sheet: $name"
        if (pos >= 0 && pos + 4 <= wb.length) {
          // rowNum(0-based) -> (colNum(0-based) -> rendered)
          val rows = mutable.SortedMap.empty[Int, mutable.Map[Int, String]]
          var maxCol = -1
          var q = pos
          var inSheet = true
          var sawBof = false
          while (inSheet && q + 4 <= wb.length) {
            val typ = u16(wb, q)
            val len = u16(wb, q + 2)
            if (q + 4 + len > wb.length) return None
            typ match {
              case 0x0809 =>
                if (sawBof) inSheet = false else sawBof = true
              case 0x000A => inSheet = false
              case 0x00FD if len >= 10 => // LabelSst
                val rw = u16(wb, q + 4); val col = u16(wb, q + 6)
                val isst = i32(wb, q + 10)
                val v = if (isst >= 0 && isst < sst.length) sst(isst) else ""
                rows.getOrElseUpdate(rw, mutable.Map.empty)(col) = v
                if (col > maxCol) maxCol = col
              case 0x0203 if len >= 14 => // Number (IEEE754 LE)
                val rw = u16(wb, q + 4); val col = u16(wb, q + 6)
                val bits = java.lang.Long.reverseBytes(
                  java.nio.ByteBuffer.wrap(wb, q + 10, 8).getLong)
                rows.getOrElseUpdate(rw, mutable.Map.empty)(col) =
                  renderNum(java.lang.Double.longBitsToDouble(bits))
                if (col > maxCol) maxCol = col
              case 0x027E if len >= 10 => // RK
                val rw = u16(wb, q + 4); val col = u16(wb, q + 6)
                rows.getOrElseUpdate(rw, mutable.Map.empty)(col) =
                  renderNum(decodeRk(i32(wb, q + 10)))
                if (col > maxCol) maxCol = col
              case 0x00BD if len >= 12 => // MulRk: rw, colFirst, n×(ixfe+RK), colLast
                // Excel writes consecutive numeric cells as ONE MulRk —
                // skipping it silently blanked those cells (the writer
                // twin emits plain RK records, so round-trips never saw it)
                val rw = u16(wb, q + 4); val colFirst = u16(wb, q + 6)
                val cells = (len - 6) / 6
                var ci = 0
                while (ci < cells) {
                  val col = colFirst + ci
                  rows.getOrElseUpdate(rw, mutable.Map.empty)(col) =
                    renderNum(decodeRk(i32(wb, q + 8 + ci * 6 + 2)))
                  if (col > maxCol) maxCol = col
                  ci += 1
                }
              case _ =>
            }
            if (inSheet) q += 4 + len
          }
          val maxRow = rows.keys.maxOption.getOrElse(-1)
          var rw = 0
          while (rw <= maxRow) {
            val cells = rows.getOrElse(rw, mutable.Map.empty[Int, String])
            val vals = (0 to maxCol).map(c => cells.getOrElse(c, ""))
            lines += s"Row ${rw + 1}: ${vals.mkString(" | ")}"
            rw += 1
          }
        }
        lines += ""
      }
      Some(lines.mkString("\n"))
    } catch { case NonFatal(_) => None }

  /** RkNumber: bit0 = value was multiplied by 100, bit1 = 30-bit signed
    * int (else the high 30 bits of an IEEE double).
    */
  private[llmops] def decodeRk(rk: Int): Double = {
    val base =
      if ((rk & 0x02) != 0) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk & 0xFFFFFFFCL) << 32)
    if ((rk & 0x01) != 0) base / 100.0 else base
  }

  /** Integral doubles render without a decimal point — the same contract
    * as [[Ooxml]]'s numeric cell rendering (openpyxl int behavior).
    */
  private def renderNum(d: Double): String =
    if (d == math.rint(d) && !d.isInfinite && math.abs(d) < 1e15)
      d.toLong.toString
    else d.toString

  // ---- .ppt (PowerPoint 97 binary, [MS-PPT]) -------------------------------

  /** The PowerPoint Document stream is a tree of 8-byte-headed records
    * (recVerAndInstance, recType, recLen); recVer 0xF marks a container.
    * Text lives in TextCharsAtom (0x0FA0, UTF-16LE) and TextBytesAtom
    * (0x0FA8, 8-bit); SlidePersistAtom (0x03F3) marks slide boundaries
    * inside SlideListWithText. Rendered in the [[Ooxml.pptxText]] shape.
    */
  def pptText(bytes: Array[Byte]): Option[String] =
    try {
      val parts = Cfb.streams(bytes).getOrElse(return None)
      val doc = parts.get("PowerPoint Document").getOrElse(return None)
      val slides = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[String]]

      def walk(start: Int, end: Int, depthLeft: Int): Unit = {
        if (depthLeft <= 0) return
        var p = start
        while (p + 8 <= end) {
          val verInst = u16(doc, p)
          val typ = u16(doc, p + 2)
          val len = i32(doc, p + 4)
          if (len < 0 || (p + 8).toLong + len > end) return
          val body = p + 8
          if ((verInst & 0x0F) == 0x0F) walk(body, body + len, depthLeft - 1)
          else typ match {
            case 0x03F3 => // SlidePersistAtom: new slide
              slides += mutable.ArrayBuffer.empty[String]
            case 0x0FA0 => // TextCharsAtom
              if (slides.isEmpty) slides += mutable.ArrayBuffer.empty[String]
              slides.last += new String(doc, body, len,
                java.nio.charset.StandardCharsets.UTF_16LE)
            case 0x0FA8 => // TextBytesAtom
              if (slides.isEmpty) slides += mutable.ArrayBuffer.empty[String]
              slides.last += new String(doc, body, len, "windows-1252")
            case _ =>
          }
          p = body + len
        }
      }
      walk(0, doc.length, depthLeft = 32)
      if (slides.isEmpty) return Some("")
      Some(slides.zipWithIndex.map { case (texts, i) =>
        s"Slide ${i + 1}: ${texts.map(_.replace('\r', '\n')).mkString(" ")}"
      }.mkString("\n\n"))
    } catch { case NonFatal(_) => None }
}
