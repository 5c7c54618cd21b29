package graft.llmops

/** bzip2 decoder — opens the compressed-corpus ingestion family.
  *
  * Wikipedia dumps (the canonical encyclopedic pretraining source) ship as
  * `.xml.bz2`, and long-tail crawl payloads carry `application/x-bzip2`;
  * the JDK has no codec for it, so until now those blobs dead-ended at the
  * metadata tier. Reference hook: the reference ingests arbitrary binary
  * documents (`aje_libs/documents/helpers/document_processor.py:10-83`)
  * and leaves decoding to managed services; here the decode is a native
  * kernel so the corpus arms stay one dataflow.
  *
  * Implemented (the full format — there are no optional parts left out):
  * stream header `BZh1`–`BZh9`; per-block 48-bit magic, block CRC,
  * origPtr; the two-level symbol usage map; 2–6 Huffman groups with
  * MTF+unary selector coding and delta-coded code lengths; canonical
  * Huffman decode with 50-symbol group switching; RUNA/RUNB run-length
  * (RLE2) + move-to-front decode; inverse Burrows–Wheeler transform via
  * the counting-sort successor vector; final RLE1 (4-byte run + count)
  * expansion; per-block and combined stream CRCs VERIFIED (bzip2's
  * MSB-first CRC-32); multi-stream concatenation (pbzip2 output) walked
  * transparently. Refusals (`null`, never throw): bad magics, the
  * deprecated `randomised` bit, origPtr/selector/length ranges, Huffman
  * over-reads, truncation anywhere, output beyond the 64 MB cap.
  */
object Bzip2 {

  private final val MaxOut = 64 << 20

  /** bzip2's CRC-32: poly 0x04c11db7, MSB-first (unreflected), init
    * 0xffffffff, final complement.
    */
  private[llmops] val crcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i << 24
      var k = 0
      while (k < 8) {
        c = if ((c & 0x80000000) != 0) (c << 1) ^ 0x04c11db7 else c << 1
        k += 1
      }
      t(i) = c
      i += 1
    }
    t
  }

  private[llmops] def crcUpdate(crc: Int, b: Int): Int =
    (crc << 8) ^ crcTable(((crc >>> 24) ^ b) & 0xff)

  /** MSB-first bit reader with sticky overrun. */
  private final class Br(val b: Array[Byte]) {
    var pos = 0
    var bit = 0
    var overrun = false
    def read(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        if (pos >= b.length) { overrun = true; return 0 }
        v = (v << 1) | ((b(pos) >> (7 - bit)) & 1)
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        i += 1
      }
      v
    }
    def readLong(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | read(1); i += 1 }
      v
    }
    def alignByte(): Unit = if (bit != 0) { bit = 0; pos += 1 }
    def atEnd: Boolean = pos >= b.length || (pos == b.length - 1 && bit > 0)
  }

  /** Canonical Huffman decode tables for one group (bzip2 layout: limit /
    * base / perm per code length, lengths 1..23).
    */
  private final class Huff(lengths: Array[Int], alphaSize: Int) {
    val minLen: Int = {
      var m = 32; var i = 0
      while (i < alphaSize) { if (lengths(i) < m) m = lengths(i); i += 1 }
      m
    }
    val maxLen: Int = {
      var m = 0; var i = 0
      while (i < alphaSize) { if (lengths(i) > m) m = lengths(i); i += 1 }
      m
    }
    val limit = new Array[Int](maxLen + 2)
    val base = new Array[Int](maxLen + 2)
    val perm = new Array[Int](alphaSize)
    var ok = true
    locally {
      var pp = 0
      var len = minLen
      while (len <= maxLen) {
        var s = 0
        while (s < alphaSize) {
          if (lengths(s) == len) { perm(pp) = s; pp += 1 }
          s += 1
        }
        len += 1
      }
      if (pp != alphaSize) ok = false
      else {
        var vec = 0
        var cum = 0
        len = minLen
        while (len <= maxLen) {
          var cnt = 0
          var s = 0
          while (s < alphaSize) { if (lengths(s) == len) cnt += 1; s += 1 }
          base(len) = vec - cum
          vec += cnt
          cum += cnt
          limit(len) = vec - 1
          vec <<= 1
          len += 1
        }
        // Kraft over-subscription shows up as limit exceeding the code space
        if (maxLen < 32 && (1 << maxLen) < cum) ok = false
      }
    }
    /** Decode one symbol; -1 on overrun/corruption. */
    def decode(br: Br): Int = {
      var len = minLen
      var v = br.read(minLen)
      while (len <= maxLen && (len > limit.length - 1 || v > limit(len))) {
        v = (v << 1) | br.read(1)
        len += 1
      }
      if (len > maxLen || br.overrun) return -1
      val idx = v - base(len)
      if (idx < 0 || idx >= alphaSize) -1 else perm(idx)
    }
  }

  /** Decompress a complete bzip2 stream (or several concatenated streams);
    * null on any structural or CRC failure.
    */
  def decode(bytes: Array[Byte]): Array[Byte] = {
    if (bytes == null || bytes.length < 10) return null
    val out = new java.io.ByteArrayOutputStream(math.min(bytes.length * 4, 1 << 20))
    var off = 0
    while (off < bytes.length) {
      off = decodeStream(bytes, off, out)
      if (off < 0) return null
      // trailing NUL padding after a stream is tolerated (tar-style pads)
      while (off < bytes.length && bytes(off) == 0) off += 1
    }
    out.toByteArray
  }

  /** Decode one `BZh` stream starting at `off`; returns the byte offset
    * just past it, or -1 on failure.
    */
  private def decodeStream(b: Array[Byte], off: Int,
      out: java.io.ByteArrayOutputStream): Int = {
    if (off + 4 > b.length || b(off) != 'B' || b(off + 1) != 'Z' ||
      b(off + 2) != 'h') return -1
    val level = b(off + 3) - '0'
    if (level < 1 || level > 9) return -1
    val maxBlock = level * 100000
    val br = new Br(b)
    br.pos = off + 4
    var combinedCrc = 0
    while (true) {
      val magic = br.readLong(48)
      if (br.overrun) return -1
      if (magic == 0x177245385090L) {
        // zero-block streams are legal (bzip2 of empty input)
        val streamCrc = br.read(32)
        if (br.overrun) return -1
        if (streamCrc != combinedCrc) return -1
        br.alignByte()
        return br.pos
      }
      if (magic != 0x314159265359L) return -1
      val blockCrc = br.read(32)
      if (br.read(1) != 0) return -1 // deprecated randomised mode
      val origPtr = br.read(24)
      // symbol usage map
      val used = new Array[Boolean](256)
      val groups16 = br.read(16)
      var g = 0
      while (g < 16) {
        if ((groups16 & (0x8000 >>> g)) != 0) {
          val bits = br.read(16)
          var i = 0
          while (i < 16) {
            if ((bits & (0x8000 >>> i)) != 0) used(g * 16 + i) = true
            i += 1
          }
        }
        g += 1
      }
      if (br.overrun) return -1
      val seqToByte = new Array[Int](256)
      var nUsed = 0
      var i = 0
      while (i < 256) {
        if (used(i)) { seqToByte(nUsed) = i; nUsed += 1 }
        i += 1
      }
      if (nUsed == 0) return -1
      val alphaSize = nUsed + 2
      val nGroups = br.read(3)
      if (nGroups < 2 || nGroups > 6) return -1
      val nSelectors = br.read(15)
      if (nSelectors < 1) return -1
      // selectors: unary MTF over the group list
      val selectors = new Array[Int](nSelectors)
      val gMtf = Array.tabulate(nGroups)(identity)
      i = 0
      while (i < nSelectors) {
        var j = 0
        while (br.read(1) == 1) {
          j += 1
          if (j >= nGroups || br.overrun) return -1
        }
        val v = gMtf(j)
        while (j > 0) { gMtf(j) = gMtf(j - 1); j -= 1 }
        gMtf(0) = v
        selectors(i) = v
        i += 1
      }
      // delta-coded lengths per group
      val huffs = new Array[Huff](nGroups)
      g = 0
      while (g < nGroups) {
        val lens = new Array[Int](alphaSize)
        var cur = br.read(5)
        var s = 0
        while (s < alphaSize) {
          var done = false
          while (!done) {
            if (cur < 1 || cur > 23) return -1
            if (br.read(1) == 0) done = true
            else cur += (if (br.read(1) == 0) 1 else -1)
            // no step cap: bzlib accepts arbitrarily long zig-zags while
            // lengths stay in 1..23; each step consumes >= 2 bits so the
            // overrun check bounds the loop
            if (br.overrun) return -1
          }
          lens(s) = cur
          s += 1
        }
        val h = new Huff(lens, alphaSize)
        if (!h.ok) return -1
        huffs(g) = h
        g += 1
      }
      // MTF + RLE2 decode into the BWT string
      val bwt = new Array[Byte](maxBlock)
      var nBwt = 0
      val mtf = new Array[Int](256)
      i = 0
      while (i < nUsed) { mtf(i) = seqToByte(i); i += 1 }
      var groupNo = -1
      var groupPos = 0
      var cur: Huff = null
      val eob = nUsed + 1
      var runLen = 0
      var runBit = 0
      var sym = 0
      var endOfBlock = false
      while (!endOfBlock) {
        if (groupPos == 0) {
          groupNo += 1
          if (groupNo >= nSelectors) return -1
          cur = huffs(selectors(groupNo))
          groupPos = 50
        }
        groupPos -= 1
        sym = cur.decode(br)
        if (sym < 0) return -1
        if (sym <= 1) { // RUNA / RUNB
          runLen += (sym + 1) << runBit
          runBit += 1
          if (runLen > maxBlock) return -1
        } else {
          if (runLen > 0) {
            val byte0 = mtf(0).toByte
            if (nBwt + runLen > maxBlock) return -1
            java.util.Arrays.fill(bwt, nBwt, nBwt + runLen, byte0)
            nBwt += runLen
            runLen = 0
            runBit = 0
          }
          if (sym == eob) endOfBlock = true
          else {
            val idx = sym - 1
            if (idx >= nUsed) return -1
            val v = mtf(idx)
            var j = idx
            while (j > 0) { mtf(j) = mtf(j - 1); j -= 1 }
            mtf(0) = v
            if (nBwt >= maxBlock) return -1
            bwt(nBwt) = v.toByte
            nBwt += 1
          }
        }
      }
      if (origPtr >= nBwt) return -1
      // inverse BWT: successor vector by counting sort
      val counts = new Array[Int](256)
      i = 0
      while (i < nBwt) { counts(bwt(i) & 0xff) += 1; i += 1 }
      val cftab = new Array[Int](257)
      i = 0
      while (i < 256) { cftab(i + 1) = cftab(i) + counts(i); i += 1 }
      val tt = new Array[Int](nBwt)
      i = 0
      while (i < nBwt) {
        val c = bwt(i) & 0xff
        tt(cftab(c)) = i
        cftab(c) += 1
        i += 1
      }
      // walk + RLE1 expansion + CRC in one pass
      var crc = 0xffffffff
      var pos = tt(origPtr)
      var k = 0
      var prev = -1
      var sameRun = 0
      var expectCount = false
      while (k < nBwt) {
        val byte0 = bwt(pos) & 0xff
        pos = tt(pos)
        k += 1
        if (expectCount) {
          // the byte after a 4-run is a repeat count, not data
          var r = 0
          while (r < byte0) {
            out.write(prev)
            crc = crcUpdate(crc, prev)
            r += 1
          }
          if (out.size() > MaxOut) return -1
          expectCount = false
          prev = -1
          sameRun = 0
        } else {
          out.write(byte0)
          crc = crcUpdate(crc, byte0)
          if (out.size() > MaxOut) return -1
          if (byte0 == prev) sameRun += 1 else sameRun = 1
          prev = byte0
          if (sameRun == 4) expectCount = true
        }
      }
      if (expectCount) return -1 // run promised a count byte that never came
      crc = ~crc
      if (crc != blockCrc) return -1
      combinedCrc = ((combinedCrc << 1) | (combinedCrc >>> 31)) ^ crc
    }
    -1 // unreachable
  }
}
