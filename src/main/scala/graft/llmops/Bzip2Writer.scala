package graft.llmops

/** bzip2 encoder — the writer twin of [[Bzip2]], and a REAL compressor
  * (Burrows–Wheeler + MTF + RLE2 + canonical Huffman), not a stored-mode
  * shell: English text lands at roughly a third of its input size. Twin
  * fixtures give the decode gates a second independent arm the same way
  * the FLAC/Vorbis/TIFF writers do.
  *
  * Encoding choices (all inside the format, decodable by any bzip2):
  * RLE1 with runs capped at 4+251; rotation sort via Manber–Myers rank
  * doubling (no pathological O(n^2) corner); two identical Huffman
  * groups (the format's minimum is 2) with all selectors on group 0;
  * code lengths from true symbol frequencies, bzlib's halve-and-rebuild
  * applied until the longest code fits 17 bits. Blocks split on the
  * RLE1-encoded length like bzlib (level * 100000 - 20).
  */
object Bzip2Writer {

  /** MSB-first bit writer. */
  private final class Bw {
    private val out = new java.io.ByteArrayOutputStream(1 << 16)
    private var acc = 0
    private var nBits = 0
    def write(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >>> i) & 1)
        nBits += 1
        if (nBits == 8) { out.write(acc); acc = 0; nBits = 0 }
        i -= 1
      }
    }
    def writeLong(v: Long, n: Int): Unit = {
      write((v >>> 32).toInt, math.max(0, n - 32))
      write(v.toInt, math.min(32, n))
    }
    def bytes: Array[Byte] = {
      if (nBits > 0) { out.write(acc << (8 - nBits)); acc = 0; nBits = 0 }
      out.toByteArray
    }
  }

  /** Compress `data` at the given level (1–9, block size level*100k). */
  def encode(data: Array[Byte], level: Int = 9): Array[Byte] = {
    require(level >= 1 && level <= 9, s"bzip2 level $level")
    val bw = new Bw
    bw.write('B', 8); bw.write('Z', 8); bw.write('h', 8)
    bw.write('0' + level, 8)
    val blockLimit = level * 100000 - 20
    var combinedCrc = 0
    var off = 0
    while (off < data.length || (off == 0 && data.length == 0)) {
      // RLE1-encode greedily until the encoded block is full
      val rle = new java.io.ByteArrayOutputStream(math.min(blockLimit, 1 << 16))
      var crc = 0xffffffff
      val start = off
      while (off < data.length && rle.size() < blockLimit - 6) {
        val b = data(off) & 0xff
        var run = 1
        while (off + run < data.length && (data(off + run) & 0xff) == b &&
          run < 4 + 251) run += 1
        var lit = math.min(run, 4)
        var i = 0
        while (i < lit) { rle.write(b); i += 1 }
        if (run >= 4) rle.write(run - 4)
        i = 0
        while (i < run) { crc = Bzip2.crcUpdate(crc, b); i += 1 }
        off += run
      }
      crc = ~crc
      combinedCrc = ((combinedCrc << 1) | (combinedCrc >>> 31)) ^ crc
      if (off > start || data.length > 0) {
        writeBlock(bw, rle.toByteArray, crc)
      }
      if (data.length == 0) {
        // empty input: zero-block stream, footer only
        combinedCrc = 0
        off = 1 // exit
      }
    }
    bw.writeLong(0x177245385090L, 48)
    bw.write(combinedCrc, 32)
    bw.bytes
  }

  private def writeBlock(bw: Bw, block: Array[Byte], crc: Int): Unit = {
    val n = block.length
    // --- BWT over rotations: rank doubling with COUNTING sorts ---
    // r18: each doubling round sorts by the key pair (rank(i),
    // rank((i+k) mod n)) via two stable counting passes instead of a
    // boxed comparator sort — O(n) per round with zero allocation per
    // element, same lexicographic rotation order (ties among EQUAL
    // rotations are identical strings, so the BWT bytes cannot differ).
    // The by-second-key pass is the classic cyclic trick: the previous
    // round's sa, shifted left by k (mod n), IS the order by second key.
    var sa = Array.tabulate(n)(identity)
    var rank = new Array[Int](n)
    var i = 0
    while (i < n) { rank(i) = block(i) & 0xff; i += 1 }
    val tmp = new Array[Int](n)
    var sa2 = new Array[Int](n)
    val cnt = new Array[Int](math.max(257, n + 1))
    // initial order: counting sort by first byte (stable over index order)
    if (n > 0) {
      java.util.Arrays.fill(cnt, 0, 257, 0)
      i = 0
      while (i < n) { cnt(rank(i) + 1) += 1; i += 1 }
      i = 1
      while (i < 257) { cnt(i) += cnt(i - 1); i += 1 }
      i = 0
      while (i < n) { sa2(cnt(rank(i)) ) = i; cnt(rank(i)) += 1; i += 1 }
      val t = sa; sa = sa2; sa2 = t
      // compress initial ranks to 0..classes-1
      tmp(sa(0)) = 0
      i = 1
      while (i < n) {
        tmp(sa(i)) = tmp(sa(i - 1)) +
          (if ((block(sa(i)) & 0xff) == (block(sa(i - 1)) & 0xff)) 0 else 1)
        i += 1
      }
      System.arraycopy(tmp, 0, rank, 0, n)
    }
    var k = 1
    var distinct = n > 0 && rank(sa(n - 1)) == n - 1
    while (k < n && !distinct) {
      // order by second key: shift previous sa left by k (mod n)
      i = 0
      while (i < n) {
        var s = sa(i) - k
        if (s < 0) s += n
        sa2(i) = s
        i += 1
      }
      // stable counting sort by first key (rank values are 0..n-1)
      java.util.Arrays.fill(cnt, 0, n + 1, 0)
      i = 0
      while (i < n) { cnt(rank(i) + 1) += 1; i += 1 }
      i = 1
      while (i <= n) { cnt(i) += cnt(i - 1); i += 1 }
      i = 0
      while (i < n) {
        val s = sa2(i)
        sa(cnt(rank(s))) = s
        cnt(rank(s)) += 1
        i += 1
      }
      // recompute ranks off the (rank, rank2) classes
      tmp(sa(0)) = 0
      i = 1
      while (i < n) {
        val prev = sa(i - 1); val curr = sa(i)
        val same = rank(prev) == rank(curr) &&
          rank((prev + k) % n) == rank((curr + k) % n)
        tmp(curr) = tmp(prev) + (if (same) 0 else 1)
        i += 1
      }
      System.arraycopy(tmp, 0, rank, 0, n)
      distinct = rank(sa(n - 1)) == n - 1
      k <<= 1
    }
    if (n > 1 && !distinct) {
      // fully periodic input: order already consistent, ranks tie — the
      // doubling comparator above is still a total preorder compatible
      // with rotation order, and equal rotations may appear in any order
    }
    val bwt = new Array[Byte](n)
    var origPtr = 0
    i = 0
    while (i < n) {
      val s = sa(i)
      if (s == 0) origPtr = i
      bwt(i) = block((s + n - 1) % n)
      i += 1
    }
    // --- symbol map + MTF + RLE2 ---
    val used = new Array[Boolean](256)
    i = 0
    while (i < n) { used(bwt(i) & 0xff) = true; i += 1 }
    val byteToSeq = new Array[Int](256)
    val seq = new scala.collection.mutable.ArrayBuffer[Int](256)
    i = 0
    while (i < 256) {
      if (used(i)) { byteToSeq(i) = seq.length; seq += i }
      i += 1
    }
    val nUsed = seq.length
    val alphaSize = nUsed + 2
    val eob = nUsed + 1
    val mtf = seq.toArray
    val syms = new java.io.ByteArrayOutputStream(n + 16) // values < 258 → 2B
    var nSyms = 0
    def emit(sym: Int): Unit = {
      syms.write(sym >>> 8); syms.write(sym & 0xff); nSyms += 1
    }
    var zPend = 0
    def flushZeros(): Unit = {
      var r = zPend
      while (r > 0) {
        val d = if (r % 2 == 0) 2 else 1 // bijective base-2 digits
        emit(d - 1) // RUNA=0, RUNB=1
        r = (r - d) / 2
      }
      zPend = 0
    }
    i = 0
    while (i < n) {
      val b = bwt(i) & 0xff
      var idx = 0
      while (mtf(idx) != b) idx += 1
      if (idx == 0) zPend += 1
      else {
        flushZeros()
        emit(idx + 1)
        var j = idx
        while (j > 0) { mtf(j) = mtf(j - 1); j -= 1 }
        mtf(0) = b
      }
      i += 1
    }
    flushZeros()
    emit(eob)
    val symArr = syms.toByteArray
    // --- Huffman lengths (single table used for both required groups) ---
    val freq = new Array[Long](alphaSize)
    i = 0
    while (i < nSyms) {
      freq(((symArr(2 * i) & 0xff) << 8) | (symArr(2 * i + 1) & 0xff)) += 1
      i += 1
    }
    i = 0
    while (i < alphaSize) { if (freq(i) == 0) freq(i) = 1; i += 1 }
    val lens = huffLengths(freq, 17)
    // --- emit the block ---
    bw.writeLong(0x314159265359L, 48)
    bw.write(crc, 32)
    bw.write(0, 1)
    bw.write(origPtr, 24)
    var g16 = 0
    i = 0
    while (i < 16) {
      var any = false
      var j = 0
      while (j < 16) { if (used(i * 16 + j)) any = true; j += 1 }
      if (any) g16 |= 0x8000 >>> i
      i += 1
    }
    bw.write(g16, 16)
    i = 0
    while (i < 16) {
      var any = false
      var j = 0
      while (j < 16) { if (used(i * 16 + j)) any = true; j += 1 }
      if (any) {
        var bits = 0
        j = 0
        while (j < 16) { if (used(i * 16 + j)) bits |= 0x8000 >>> j; j += 1 }
        bw.write(bits, 16)
      }
      i += 1
    }
    val nGroups = 2
    val nSelectors = math.max(1, (nSyms + 49) / 50)
    bw.write(nGroups, 3)
    bw.write(nSelectors, 15)
    i = 0
    while (i < nSelectors) { bw.write(0, 1); i += 1 } // group 0, MTF pos 0
    var g = 0
    while (g < nGroups) {
      var cur = lens(0)
      bw.write(cur, 5)
      i = 0
      while (i < alphaSize) {
        while (cur < lens(i)) { bw.write(2, 2); cur += 1 } // 10 = increment
        while (cur > lens(i)) { bw.write(3, 2); cur -= 1 } // 11 = decrement
        bw.write(0, 1)
        i += 1
      }
      g += 1
    }
    // canonical codes from lengths (same assignment the decoder rebuilds)
    val code = new Array[Int](alphaSize)
    var minLen = 32; var maxLen = 0
    i = 0
    while (i < alphaSize) {
      if (lens(i) < minLen) minLen = lens(i)
      if (lens(i) > maxLen) maxLen = lens(i)
      i += 1
    }
    var vec = 0
    var len = minLen
    while (len <= maxLen) {
      i = 0
      while (i < alphaSize) {
        if (lens(i) == len) { code(i) = vec; vec += 1 }
        i += 1
      }
      vec <<= 1
      len += 1
    }
    i = 0
    while (i < nSyms) {
      val s = ((symArr(2 * i) & 0xff) << 8) | (symArr(2 * i + 1) & 0xff)
      bw.write(code(s), lens(s))
      i += 1
    }
  }

  /** Huffman code lengths with bzlib's halve-and-rebuild length limiter. */
  private def huffLengths(freqIn: Array[Long], maxLen: Int): Array[Int] = {
    val nSym = freqIn.length
    val freq = freqIn.clone()
    while (true) {
      val lens = buildLengths(freq)
      var over = false
      var i = 0
      while (i < nSym) { if (lens(i) > maxLen) over = true; i += 1 }
      if (!over) return lens
      i = 0
      while (i < nSym) { freq(i) = freq(i) / 2 + 1; i += 1 }
    }
    throw new IllegalStateException("unreachable")
  }

  private def buildLengths(freq: Array[Long]): Array[Int] = {
    val nSym = freq.length
    if (nSym == 1) return Array(1)
    // simple pairing heap over (weight, node); internal nodes chain parents
    val parent = new Array[Int](2 * nSym)
    val weight = new Array[Long](2 * nSym)
    val pq = new java.util.PriorityQueue[Integer](nSym,
      new java.util.Comparator[Integer] {
        def compare(a: Integer, b: Integer): Int =
          java.lang.Long.compare(weight(a.intValue), weight(b.intValue))
      })
    var i = 0
    while (i < nSym) {
      weight(i) = freq(i)
      parent(i) = -1
      pq.add(Integer.valueOf(i))
      i += 1
    }
    var next = nSym
    while (pq.size > 1) {
      val a = pq.poll().intValue
      val b = pq.poll().intValue
      weight(next) = weight(a) + weight(b)
      parent(a) = next
      parent(b) = next
      parent(next) = -1
      pq.add(Integer.valueOf(next))
      next += 1
    }
    val lens = new Array[Int](nSym)
    i = 0
    while (i < nSym) {
      var d = 0
      var p = parent(i)
      while (p != -1) { d += 1; p = parent(p) }
      lens(i) = math.max(1, d)
      i += 1
    }
    lens
  }
}
