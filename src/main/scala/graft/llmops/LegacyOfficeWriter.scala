package graft.llmops

import scala.collection.mutable

/** Fixture builders for the legacy binary Office formats — the twins of
  * [[LegacyOffice]]'s extractors, emitting real [MS-DOC]/[MS-XLS]/[MS-PPT]
  * structures inside [[CfbWriter]] containers. Used by the OLE2 gate query
  * (input construction from corpus text) and the round-trip specs; same
  * role as [[OoxmlWriter]] for the zip+XML family.
  */
object LegacyOfficeWriter {

  private def putU16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xFF).toByte
    b(off + 1) = ((v >> 8) & 0xFF).toByte
  }

  private def putI32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xFF).toByte
    b(off + 1) = ((v >> 8) & 0xFF).toByte
    b(off + 2) = ((v >> 16) & 0xFF).toByte
    b(off + 3) = ((v >> 24) & 0xFF).toByte
  }

  private def isAscii(s: String): Boolean = s.forall(_ < 0x80)

  // ---- .doc ----------------------------------------------------------------

  /** Word 97 document: paragraphs joined by '\r' marks (plus the final
    * paragraph mark Word always stores), one piece per call to [[docPieces]].
    */
  def doc(paragraphs: Seq[String]): Array[Byte] =
    docPieces(Seq(paragraphs.mkString("\r") + "\r"))

  /** Multi-piece Word 97 document — each piece independently stored
    * compressed (CP1252, ASCII-only pieces) or UTF-16LE, exercising both
    * PCD.fc encodings and piece-table reassembly. Text is the
    * concatenation of the pieces.
    */
  def docPieces(pieces: Seq[String]): Array[Byte] = {
    val fibLen = 1536
    val textBuf = new java.io.ByteArrayOutputStream()
    // (cpLen, fcRaw) per piece
    val pcds = pieces.map { piece =>
      val byteOff = fibLen + textBuf.size
      if (isAscii(piece)) {
        textBuf.write(piece.getBytes("windows-1252"))
        (piece.length, (byteOff * 2) | 0x40000000)
      } else {
        textBuf.write(piece.getBytes(java.nio.charset.StandardCharsets.UTF_16LE))
        (piece.length, byteOff)
      }
    }
    val text = textBuf.toByteArray

    val word = new Array[Byte](fibLen + text.length)
    putU16(word, 0x0000, 0xA5EC) // wIdent
    putU16(word, 0x0002, 0x00C1) // nFib (Word 97)
    putU16(word, 0x000A, 0x0200) // fWhichTblStm -> 1Table
    putI32(word, 0x0018, fibLen) // fcMin
    putI32(word, 0x001C, fibLen + text.length) // fcMac
    System.arraycopy(text, 0, word, fibLen, text.length)

    // table stream: Clx = Pcdt only, at offset 0
    val n = pcds.size
    val lcbPlcPcd = 4 * (n + 1) + 8 * n
    val table = new Array[Byte](1 + 4 + lcbPlcPcd)
    table(0) = 0x02 // clxt = Pcdt
    putI32(table, 1, lcbPlcPcd)
    var cp = 0
    pcds.zipWithIndex.foreach { case ((cpLen, _), i) =>
      putI32(table, 5 + i * 4, cp)
      cp += cpLen
    }
    putI32(table, 5 + n * 4, cp)
    val pcdBase = 5 + (n + 1) * 4
    pcds.zipWithIndex.foreach { case ((_, fcRaw), i) =>
      putI32(table, pcdBase + i * 8 + 2, fcRaw) // flags=0, fc, prm=0
    }
    putI32(word, 0x01A2, 0) // fcClx
    putI32(word, 0x01A6, table.length) // lcbClx

    CfbWriter.build(Seq("WordDocument" -> word, "1Table" -> table))
  }

  // ---- .xls ----------------------------------------------------------------

  /** BIFF8 workbook. Cells: String -> LabelSst (through a real shared
    * string table), Double -> Number (IEEE754), Int -> RK (30-bit
    * integer form) — the three cell records [[LegacyOffice.xlsText]]
    * decodes. With `mulRk = true`, runs of two or more consecutive Int
    * cells pack into one MulRk record (0x00BD) — how Excel itself stores
    * them, so the reader's MulRk arm gets a real-layout fixture.
    */
  def xls(sheets: Seq[(String, Seq[Seq[Any]])],
      mulRk: Boolean = false): Array[Byte] = {
    def record(typ: Int, data: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](4 + data.length)
      putU16(out, 0, typ)
      putU16(out, 2, data.length)
      System.arraycopy(data, 0, out, 4, data.length)
      out
    }
    def bof(dt: Int): Array[Byte] = {
      val d = new Array[Byte](16)
      putU16(d, 0, 0x0600) // BIFF8
      putU16(d, 2, dt)
      record(0x0809, d)
    }
    val eof = record(0x000A, Array.emptyByteArray)

    // shared string table over all string cells, in first-use order
    val sstIndex = mutable.LinkedHashMap.empty[String, Int]
    var cstTotal = 0
    sheets.foreach { case (_, rows) =>
      rows.foreach(_.foreach {
        case s: String =>
          cstTotal += 1
          sstIndex.getOrElseUpdate(s, sstIndex.size)
        case _ =>
      })
    }
    val sstRec = {
      val body = new java.io.ByteArrayOutputStream()
      val head = new Array[Byte](8)
      putI32(head, 0, cstTotal)
      putI32(head, 4, sstIndex.size)
      body.write(head)
      sstIndex.keys.foreach { s =>
        val high = !isAscii(s)
        val str = new Array[Byte](3)
        putU16(str, 0, s.length)
        str(2) = if (high) 0x01 else 0x00
        body.write(str)
        body.write(
          if (high) s.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
          else s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      }
      record(0x00FC, body.toByteArray)
    }

    def cellHead(rw: Int, col: Int, extra: Int): Array[Byte] = {
      val d = new Array[Byte](6 + extra)
      putU16(d, 0, rw)
      putU16(d, 2, col)
      // ixfe = 0
      d
    }
    def sheetBytes(rows: Seq[Seq[Any]]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(bof(0x0010))
      rows.zipWithIndex.foreach { case (cells, rw) =>
        var col = 0
        val indexed = cells.toIndexedSeq
        while (col < indexed.length) {
          indexed(col) match {
            case s: String =>
              val d = cellHead(rw, col, 4)
              putI32(d, 6, sstIndex(s))
              out.write(record(0x00FD, d))
              col += 1
            case v: Double =>
              val d = cellHead(rw, col, 8)
              val bits = java.lang.Double.doubleToLongBits(v)
              var k = 0
              while (k < 8) { d(6 + k) = ((bits >> (8 * k)) & 0xFF).toByte; k += 1 }
              out.write(record(0x0203, d))
              col += 1
            case _: Int if mulRk && col + 1 < indexed.length &&
                indexed(col + 1).isInstanceOf[Int] =>
              // MulRk: rw, colFirst, n×(ixfe + RK), colLast
              var end = col
              while (end + 1 < indexed.length && indexed(end + 1).isInstanceOf[Int])
                end += 1
              val nCells = end - col + 1
              val d = new Array[Byte](4 + 6 * nCells + 2)
              putU16(d, 0, rw)
              putU16(d, 2, col)
              var ci = 0
              while (ci < nCells) {
                // ixfe = 0 at 4 + ci*6; RK value follows
                putI32(d, 4 + ci * 6 + 2,
                  (indexed(col + ci).asInstanceOf[Int] << 2) | 0x02)
                ci += 1
              }
              putU16(d, 4 + 6 * nCells, end)
              out.write(record(0x00BD, d))
              col = end + 1
            case v: Int =>
              val d = cellHead(rw, col, 4)
              putI32(d, 6, (v << 2) | 0x02) // RK: 30-bit int form
              out.write(record(0x027E, d))
              col += 1
            case other =>
              throw new IllegalArgumentException(s"unsupported cell: $other")
          }
        }
      }
      out.write(eof)
      out.toByteArray
    }
    val sheetPayloads = sheets.map { case (_, rows) => sheetBytes(rows) }

    // globals with lbPlyPos patched once the globals length is known
    def globals(positions: Seq[Int]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(bof(0x0005))
      sheets.zip(positions).foreach { case ((name, _), pos) =>
        val ascii = isAscii(name)
        val nameBytes =
          if (ascii) name.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
          else name.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
        val d = new Array[Byte](8 + nameBytes.length)
        putI32(d, 0, pos)
        d(6) = name.length.toByte
        d(7) = if (ascii) 0x00 else 0x01
        System.arraycopy(nameBytes, 0, d, 8, nameBytes.length)
        out.write(record(0x0085, d))
      }
      out.write(sstRec)
      out.write(eof)
      out.toByteArray
    }
    val globalsLen = globals(sheets.map(_ => 0)).length // position-independent
    val positions = sheetPayloads.scanLeft(globalsLen)(_ + _.length).init
    val wb = new java.io.ByteArrayOutputStream()
    wb.write(globals(positions))
    sheetPayloads.foreach(wb.write)
    CfbWriter.build(Seq("Workbook" -> wb.toByteArray))
  }

  // ---- .ppt ----------------------------------------------------------------

  /** PowerPoint 97 binary: a Document container holding SlideListWithText,
    * with one SlidePersistAtom per slide followed by its text atoms —
    * TextBytesAtom for ASCII shapes, TextCharsAtom (UTF-16LE) otherwise.
    */
  def ppt(slides: Seq[Seq[String]]): Array[Byte] = {
    def atom(verInst: Int, typ: Int, data: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](8 + data.length)
      putU16(out, 0, verInst)
      putU16(out, 2, typ)
      putI32(out, 4, data.length)
      System.arraycopy(data, 0, out, 8, data.length)
      out
    }
    val slideList = new java.io.ByteArrayOutputStream()
    slides.foreach { texts =>
      slideList.write(atom(0x0000, 0x03F3, new Array[Byte](20))) // SlidePersistAtom
      texts.foreach { t =>
        if (isAscii(t))
          slideList.write(atom(0x0000, 0x0FA8, t.getBytes("windows-1252")))
        else
          slideList.write(atom(0x0000, 0x0FA0,
            t.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)))
      }
    }
    val slw = atom(0x000F, 0x0FF0, slideList.toByteArray)
    val document = atom(0x000F, 0x03E8, slw)
    CfbWriter.build(Seq("PowerPoint Document" -> document))
  }
}
