package graft.llmops

import scala.collection.mutable
import scala.util.control.NonFatal

/** JDK-only MS-CFB (OLE2 compound file) container reader — the on-disk
  * format under the legacy binary Office family (.doc/.xls/.ppt).
  *
  * The reference routes these extensions through its document dispatch
  * (aje_libs/documents/helpers/document_processor.py:27-34) but delegates
  * to python-docx/openpyxl, which only parse the OOXML replacements; this
  * parser closes that gap from scratch against the public [MS-CFB] layout:
  *
  *   - 512-byte header: magic D0CF11E0A1B11AE1, sector shift (v3 = 512 B,
  *     v4 = 4096 B), FAT sector count, directory / miniFAT / DIFAT heads.
  *   - FAT: located via the 109 header DIFAT slots plus chained DIFAT
  *     sectors; FAT[i] is the sector following i in its chain.
  *   - Directory: a chain of 128-byte entries (UTF-16LE names, object
  *     type, start sector, stream size).
  *   - Streams >= the mini cutoff (4096) live in regular sectors; smaller
  *     streams live in the root entry's mini stream, chained through the
  *     miniFAT in 64-byte mini sectors.
  *
  * Documents are untrusted corpus content, so every walk is bounded: chain
  * length caps at the sector count the file can physically hold, malformed
  * sector ids terminate the chain, and any structural violation returns
  * None instead of throwing (the same poison-document posture as [[Ooxml]]
  * and [[Pdf]] — one bad blob must not kill a scan task covering thousands
  * of rows).
  */
object Cfb {

  private val Magic = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
    .map(_.toByte)

  private val EndOfChain = 0xFFFFFFFE
  private val FreeSect = 0xFFFFFFFF

  /** Hard cap on a single reconstructed stream: same anti-zip-bomb posture
    * as [[Ooxml.MaxEntryBytes]] — a 100 MB stream is not a document.
    */
  private val MaxStreamBytes = 100 * 1024 * 1024

  /** True iff the bytes begin with the CFB magic. */
  def isCfb(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 8 &&
      java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(bytes, 0, 8), Magic)

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  private def i32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  private def i64(b: Array[Byte], off: Int): Long =
    (i32(b, off) & 0xFFFFFFFFL) | ((i32(b, off + 4) & 0xFFFFFFFFL) << 32)

  /** All stream entries as name -> bytes, storage hierarchy flattened
    * (first occurrence wins on duplicate names). The legacy Office streams
    * this library consumes — WordDocument, 0Table/1Table, Workbook/Book,
    * "PowerPoint Document" — all live at the root storage, so flattening
    * loses nothing the extractors need while keeping the walk linear
    * (tolerant of the degenerate sibling trees some writers emit).
    */
  def streams(bytes: Array[Byte]): Option[Map[String, Array[Byte]]] =
    try {
      if (!isCfb(bytes) || bytes.length < 512) return None
      val sectorShift = u16(bytes, 0x1E)
      if (sectorShift < 7 || sectorShift > 20) return None
      val sectorSize = 1 << sectorShift
      val miniShift = u16(bytes, 0x20)
      if (miniShift < 2 || miniShift > sectorShift) return None
      val miniSize = 1 << miniShift
      val nFatSectors = i32(bytes, 0x2C)
      val firstDirSector = i32(bytes, 0x30)
      val miniCutoff = i32(bytes, 0x38).toLong
      val firstMiniFat = i32(bytes, 0x3C)
      val firstDifat = i32(bytes, 0x44)
      val nDifatSectors = i32(bytes, 0x48)

      // number of sectors the file can physically hold (bounds every walk)
      val maxSectors = math.max(0, (bytes.length - 512) / sectorSize) + 1
      val entriesPerSector = sectorSize / 4

      // [MS-CFB] 2.1: sector #n starts at (n + 1) << sectorShift — the
      // header occupies all of "sector -1", so in a v4 file (4096-byte
      // sectors) sector 0 begins at 4096, NOT 512; the remaining 3584
      // header-sector bytes are zero fill. The old "512 + n*sectorSize"
      // form silently mis-read every v4 file (garbage directory → None),
      // a writer-twin blind spot: [[CfbWriter]] only emits v3.
      def sectorOffset(sector: Int): Int = (sector + 1) * sectorSize
      def validSector(sector: Int): Boolean =
        sector >= 0 && sectorOffset(sector) + sectorSize <= bytes.length

      // ---- DIFAT -> FAT sector list ---------------------------------------
      val fatSectors = mutable.ArrayBuffer.empty[Int]
      var di = 0
      while (di < 109 && fatSectors.size < nFatSectors) {
        val s = i32(bytes, 0x4C + di * 4)
        if (s != FreeSect && s != EndOfChain) fatSectors += s
        di += 1
      }
      var difat = firstDifat
      var difatHops = 0
      while (difat != EndOfChain && difat != FreeSect &&
          difatHops <= math.min(nDifatSectors, maxSectors) &&
          fatSectors.size < nFatSectors) {
        if (!validSector(difat)) return None
        val base = sectorOffset(difat)
        var j = 0
        while (j < entriesPerSector - 1 && fatSectors.size < nFatSectors) {
          val s = i32(bytes, base + j * 4)
          if (s != FreeSect && s != EndOfChain) fatSectors += s
          j += 1
        }
        difat = i32(bytes, base + (entriesPerSector - 1) * 4)
        difatHops += 1
      }

      // ---- FAT ------------------------------------------------------------
      val fat = new Array[Int](fatSectors.size * entriesPerSector)
      var fi = 0
      fatSectors.foreach { s =>
        if (!validSector(s)) return None
        val base = sectorOffset(s)
        var j = 0
        while (j < entriesPerSector) {
          fat(fi) = i32(bytes, base + j * 4)
          fi += 1; j += 1
        }
      }

      /** Follow a regular-FAT chain, concatenating whole sectors. */
      def readChain(start: Int): Option[Array[Byte]] = {
        val out = new java.io.ByteArrayOutputStream()
        var s = start
        var hops = 0
        while (s != EndOfChain && s != FreeSect) {
          if (!validSector(s) || s >= fat.length || hops > maxSectors) return None
          if (out.size + sectorSize > MaxStreamBytes) return None
          out.write(bytes, sectorOffset(s), sectorSize)
          s = fat(s)
          hops += 1
        }
        Some(out.toByteArray)
      }

      // ---- directory ------------------------------------------------------
      val dirBytes = readChain(firstDirSector).getOrElse(return None)
      val nEntries = dirBytes.length / 128
      // (name, objectType, startSector, size)
      val entries = (0 until nEntries).flatMap { k =>
        val off = k * 128
        val nameLen = u16(dirBytes, off + 0x40) // bytes incl. trailing NUL
        val objType = dirBytes(off + 0x42) & 0xFF
        if (nameLen < 2 || nameLen > 64 || objType == 0) None
        else {
          val name = new String(dirBytes, off, nameLen - 2,
            java.nio.charset.StandardCharsets.UTF_16LE)
          val start = i32(dirBytes, off + 0x74)
          val rawSize = i64(dirBytes, off + 0x78)
          // v3 writers may leave garbage in the high dword
          val size = if (sectorShift == 9) rawSize & 0xFFFFFFFFL else rawSize
          Some((name, objType, start, size))
        }
      }

      // ---- mini stream ----------------------------------------------------
      val root = entries.find(_._2 == 5)
      val miniStream: Array[Byte] = root match {
        case Some((_, _, start, size)) if size > 0 && start != EndOfChain =>
          readChain(start).map { full =>
            if (size < full.length) java.util.Arrays.copyOfRange(full, 0, size.toInt)
            else full
          }.getOrElse(Array.emptyByteArray)
        case _ => Array.emptyByteArray
      }
      val miniFat: Array[Int] =
        if (firstMiniFat == EndOfChain || firstMiniFat == FreeSect) Array.emptyIntArray
        else {
          val raw = readChain(firstMiniFat).getOrElse(return None)
          val out = new Array[Int](raw.length / 4)
          var j = 0
          while (j < out.length) { out(j) = i32(raw, j * 4); j += 1 }
          out
        }

      /** Follow a miniFAT chain through the root's mini stream. */
      def readMiniChain(start: Int, size: Long): Option[Array[Byte]] = {
        val out = new java.io.ByteArrayOutputStream()
        var s = start
        var hops = 0
        val maxMini = miniStream.length / miniSize + 1
        while (s != EndOfChain && s != FreeSect && out.size < size) {
          if (s < 0 || s >= miniFat.length || hops > maxMini) return None
          val off = s * miniSize
          if (off + miniSize > miniStream.length) {
            if (off >= miniStream.length) return None
            out.write(miniStream, off, miniStream.length - off)
          } else out.write(miniStream, off, miniSize)
          s = miniFat(s)
          hops += 1
        }
        Some(out.toByteArray)
      }

      val result = Map.newBuilder[String, Array[Byte]]
      val seen = mutable.Set.empty[String]
      entries.foreach {
        case (name, 2, start, size) if !seen(name) =>
          if (size > MaxStreamBytes) return None
          val data =
            if (size == 0) Some(Array.emptyByteArray)
            else if (size < miniCutoff) readMiniChain(start, size)
            else readChain(start)
          data.foreach { full =>
            seen += name
            result += name -> (
              if (size < full.length)
                java.util.Arrays.copyOfRange(full, 0, size.toInt)
              else full)
          }
        case _ =>
      }
      Some(result.result())
    } catch { case NonFatal(_) => None }
}
