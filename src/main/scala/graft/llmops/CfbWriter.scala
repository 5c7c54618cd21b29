package graft.llmops

import scala.collection.mutable

/** Minimal MS-CFB v3 compound-file writer — the fixture twin of [[Cfb]],
  * used by the OLE2 gate query and specs to build real .doc/.xls/.ppt
  * containers from corpus text (the same input-construction role
  * [[OoxmlWriter]] plays for the zip+XML family).
  *
  * Layout: 512-byte header, then sectors in the order
  * [FAT][directory][miniFAT][mini stream][regular streams]. Streams under
  * the 4096-byte cutoff go to the root entry's mini stream in 64-byte mini
  * sectors; larger streams get regular 512-byte FAT chains — both paths of
  * the reader are exercised by real documents (Word tables are small, text
  * streams are large). Directory siblings form a degenerate right-leaning
  * chain rather than a balanced red-black tree: legal for readers that
  * walk entries linearly (as [[Cfb]] and most robust parsers do) and kept
  * for simplicity — this writer builds test inputs, not archival files.
  *
  * Capacity: header DIFAT only (109 FAT sectors ≈ 6.9 MB of payload),
  * far beyond any fixture.
  */
object CfbWriter {

  private val SectorSize = 512
  private val MiniSize = 64
  private val MiniCutoff = 4096
  private val EndOfChain = 0xFFFFFFFE
  private val FreeSect = 0xFFFFFFFF
  private val FatSect = 0xFFFFFFFD

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

  private def sectorsOf(len: Int, unit: Int): Int =
    if (len == 0) 0 else (len + unit - 1) / unit

  /** Build a compound file holding the given streams (root-level, in
    * order). Stream names cap at 31 chars (the CFB 64-byte UTF-16 field).
    */
  def build(streams: Seq[(String, Array[Byte])]): Array[Byte] = {
    require(streams.forall(_._1.length <= 31), "CFB stream name over 31 chars")
    val n = streams.size

    // ---- mini stream assembly (streams under the cutoff)
    val isMini = streams.map(_._2.length < MiniCutoff)
    val miniStarts = new Array[Int](n)
    val miniData = new java.io.ByteArrayOutputStream()
    val miniFat = mutable.ArrayBuffer.empty[Int]
    streams.zipWithIndex.foreach { case ((_, data), i) =>
      if (isMini(i)) {
        if (data.length == 0) miniStarts(i) = EndOfChain
        else {
          miniStarts(i) = miniFat.size
          val nsec = sectorsOf(data.length, MiniSize)
          var k = 0
          while (k < nsec) {
            miniFat += (if (k == nsec - 1) EndOfChain else miniFat.size + 1)
            k += 1
          }
          miniData.write(data)
          val pad = nsec * MiniSize - data.length
          if (pad > 0) miniData.write(new Array[Byte](pad))
        }
      }
    }
    val miniStreamBytes = miniData.toByteArray
    val miniFatEntries = miniFat.size

    // ---- regular sector budget
    val dirSectors = sectorsOf((n + 1) * 128, SectorSize)
    val miniFatSectors = sectorsOf(miniFatEntries * 4, SectorSize)
    val miniStreamSectors = sectorsOf(miniStreamBytes.length, SectorSize)
    val largeSectors = streams.zipWithIndex.map { case ((_, d), i) =>
      if (isMini(i)) 0 else sectorsOf(d.length, SectorSize)
    }
    val nonFat = dirSectors + miniFatSectors + miniStreamSectors + largeSectors.sum
    var fatSectors = 1
    while (fatSectors * (SectorSize / 4) < fatSectors + nonFat) fatSectors += 1
    require(fatSectors <= 109, "fixture exceeds header-DIFAT capacity")

    // ---- sector numbering in layout order
    val dirStart = fatSectors
    val miniFatStart = dirStart + dirSectors
    val miniStreamStart = miniFatStart + miniFatSectors
    var cursor = miniStreamStart + miniStreamSectors
    val largeStarts = new Array[Int](n)
    streams.zipWithIndex.foreach { case ((_, d), i) =>
      if (!isMini(i)) {
        largeStarts(i) = if (d.length == 0) EndOfChain else cursor
        cursor += largeSectors(i)
      }
    }
    val totalSectors = cursor

    // ---- FAT
    val fat = Array.fill(fatSectors * (SectorSize / 4))(FreeSect)
    var s = 0
    while (s < fatSectors) { fat(s) = FatSect; s += 1 }
    def chain(start: Int, count: Int): Unit = {
      var k = 0
      while (k < count) {
        fat(start + k) = if (k == count - 1) EndOfChain else start + k + 1
        k += 1
      }
    }
    chain(dirStart, dirSectors)
    if (miniFatSectors > 0) chain(miniFatStart, miniFatSectors)
    if (miniStreamSectors > 0) chain(miniStreamStart, miniStreamSectors)
    streams.zipWithIndex.foreach { case (_, i) =>
      if (!isMini(i) && largeSectors(i) > 0) chain(largeStarts(i), largeSectors(i))
    }

    // ---- directory
    val dir = new Array[Byte]((n + 1) * 128)
    def entry(idx: Int, name: String, objType: Int, rightSib: Int,
        child: Int, start: Int, size: Long): Unit = {
      val off = idx * 128
      val utf16 = name.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
      System.arraycopy(utf16, 0, dir, off, utf16.length)
      putU16(dir, off + 0x40, utf16.length + 2) // incl. trailing NUL
      dir(off + 0x42) = objType.toByte
      dir(off + 0x43) = 1 // black
      putI32(dir, off + 0x44, FreeSect) // left sibling
      putI32(dir, off + 0x48, rightSib)
      putI32(dir, off + 0x4C, child)
      putI32(dir, off + 0x74, start)
      putI32(dir, off + 0x78, (size & 0xFFFFFFFFL).toInt)
      putI32(dir, off + 0x7C, (size >>> 32).toInt)
    }
    entry(0, "Root Entry", 5, FreeSect,
      child = if (n > 0) 1 else FreeSect,
      start = if (miniStreamSectors > 0) miniStreamStart else EndOfChain,
      size = miniStreamBytes.length.toLong)
    streams.zipWithIndex.foreach { case ((name, d), i) =>
      entry(i + 1, name, 2,
        rightSib = if (i + 1 < n) i + 2 else FreeSect,
        child = FreeSect,
        start = if (isMini(i)) miniStarts(i) else largeStarts(i),
        size = d.length.toLong)
    }

    // ---- header
    val header = new Array[Byte](512)
    val magic = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
    var m = 0
    while (m < 8) { header(m) = magic(m).toByte; m += 1 }
    putU16(header, 0x18, 0x003E) // minor version
    putU16(header, 0x1A, 0x0003) // major version 3
    putU16(header, 0x1C, 0xFFFE) // little-endian
    putU16(header, 0x1E, 9) // 512-byte sectors
    putU16(header, 0x20, 6) // 64-byte mini sectors
    putI32(header, 0x2C, fatSectors)
    putI32(header, 0x30, dirStart)
    putI32(header, 0x38, MiniCutoff)
    putI32(header, 0x3C, if (miniFatSectors > 0) miniFatStart else EndOfChain)
    putI32(header, 0x40, miniFatSectors)
    putI32(header, 0x44, EndOfChain) // no DIFAT sectors
    putI32(header, 0x48, 0)
    var d = 0
    while (d < 109) {
      putI32(header, 0x4C + d * 4, if (d < fatSectors) d else FreeSect)
      d += 1
    }

    // ---- assemble
    val out = new java.io.ByteArrayOutputStream(512 + totalSectors * SectorSize)
    out.write(header)
    val fatBytes = new Array[Byte](fatSectors * SectorSize)
    var fi = 0
    while (fi < fat.length) { putI32(fatBytes, fi * 4, fat(fi)); fi += 1 }
    out.write(fatBytes)
    def writePadded(data: Array[Byte], sectors: Int): Unit = {
      out.write(data)
      val pad = sectors * SectorSize - data.length
      if (pad > 0) out.write(new Array[Byte](pad))
    }
    writePadded(dir, dirSectors)
    if (miniFatSectors > 0) {
      val mf = new Array[Byte](miniFatSectors * SectorSize)
      java.util.Arrays.fill(mf, 0xFF.toByte) // FREESECT padding
      var k = 0
      while (k < miniFatEntries) { putI32(mf, k * 4, miniFat(k)); k += 1 }
      out.write(mf)
    }
    if (miniStreamSectors > 0) writePadded(miniStreamBytes, miniStreamSectors)
    streams.zipWithIndex.foreach { case ((_, data), i) =>
      if (!isMini(i) && data.length > 0) writePadded(data, largeSectors(i))
    }
    out.toByteArray
  }
}
