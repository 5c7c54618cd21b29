package graft.llmops

/** zstd decoder (RFC 8878) — the modern-corpus member of the compressed
  * ingestion family: today's public LLM corpora (crawl text shards,
  * JSONL exports, columnar side files) predominantly ship zstd-framed.
  * Reference hook: arbitrary-binary document ingestion,
  * `aje_libs/documents/helpers/document_processor.py:10-83`.
  *
  * Implemented — the full frame format INCLUDING external dictionaries
  * (RFC 8878 section 5: trained dictionaries with default entropy
  * tables + initial repeat offsets + content history, raw-content
  * dictionaries, per-frame Dictionary_ID validation): frame
  * header (window descriptor, single-segment sizes, content checksum =
  * low 32 bits of XXH64, VERIFIED); raw/RLE/compressed blocks; literals
  * in all four forms (raw, RLE, Huffman with 1 or 4 streams, treeless
  * repeat); Huffman tree descriptions both direct (4-bit weights) and
  * FSE-compressed (two alternating states); sequences with all three
  * symbol-compression modes per code (predefined RFC distributions,
  * RLE, FSE) plus repeat-table mode; the backward bitstream with exact
  * end-of-stream enforcement; repeat-offset history including the
  * literals-length-0 rotation and the offset-minus-one corner;
  * skippable frames; concatenated frames. Refusals (`null`): dictionary
  * IDs, reserved bits, corrupt tables, over/under-consumed bitstreams,
  * checksum mismatches, output beyond the 64 MB cap.
  */
object Zstd {

  private final val MaxOut = 64 << 20

  // ---------------- backward bit reader ----------------

  /** Backward bitstream: bits were written LSB-first front-to-back; the
    * reader starts after the final padding-1 marker and serves fields in
    * reverse write order. `peek`/`skip` support the Huffman fast path
    * (zero-padded peeks past the start, exact-consumption check at end).
    */
  private final class BackBr(b: Array[Byte], start: Int, end: Int) {
    var bitsLeft = 0
    var overrun = false
    locally {
      if (end <= start) overrun = true
      else {
        val last = b(end - 1) & 0xff
        if (last == 0) overrun = true // missing start-of-stream marker
        else {
          val hb = 31 - Integer.numberOfLeadingZeros(last)
          bitsLeft = (end - 1 - start) * 8 + hb
        }
      }
    }
    private def bitAt(pos: Int): Int = {
      val byteIdx = start + (pos >> 3)
      (b(byteIdx) >> (pos & 7)) & 1
    }
    /** Next `n` bits (consuming); sets overrun if the stream is short. */
    def read(n: Int): Int = {
      if (n == 0) return 0
      if (n > bitsLeft) { overrun = true; return 0 }
      var v = 0
      var i = 0
      while (i < n) {
        v = (v << 1) | bitAt(bitsLeft - 1 - i)
        i += 1
      }
      bitsLeft -= n
      v
    }
    /** Next `n` bits without consuming, zero-padded past the start. */
    def peek(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val p = bitsLeft - 1 - i
        v = (v << 1) | (if (p >= 0) bitAt(p) else 0)
        i += 1
      }
      v
    }
    /** Consume `n` bits already peeked. Over-consumption (a symbol whose
      * code ran past the stream start) must flag overrun — clamping
      * silently would let a truncated stream END at exactly 0 bits and
      * pass the exact-consumption check while having emitted garbage.
      */
    def skip(n: Int): Unit = {
      if (n > bitsLeft) overrun = true
      bitsLeft = math.max(0, bitsLeft - n)
    }
  }

  // ---------------- FSE ----------------

  private[llmops] final class FseTable(val tableLog: Int) {
    val size: Int = 1 << tableLog
    val symbol = new Array[Int](size)
    val nbBits = new Array[Int](size)
    val newState = new Array[Int](size)
  }

  /** Build an FSE decoding table from normalized counts (-1 = less-than-one). */
  private def fseBuild(counts: Array[Int], tableLog: Int): FseTable = {
    if (tableLog > 12) return null
    val t = new FseTable(tableLog)
    val size = t.size
    var highThreshold = size - 1
    var s = 0
    while (s < counts.length) {
      if (counts(s) == -1) {
        if (highThreshold < 0) return null
        t.symbol(highThreshold) = s
        highThreshold -= 1
      }
      s += 1
    }
    val step = (size >> 1) + (size >> 3) + 3
    val mask = size - 1
    var pos = 0
    s = 0
    while (s < counts.length) {
      var c = counts(s)
      while (c > 0) {
        t.symbol(pos) = s
        do { pos = (pos + step) & mask } while (pos > highThreshold)
        c -= 1
      }
      s += 1
    }
    if (pos != 0) return null // table must fill exactly
    // transitions: the n-th cell (position order) of a symbol with
    // normalized count c gets x = c + n, nb = tableLog - highbit(x),
    // newState = (x << nb) - size
    val occ = new Array[Int](counts.length)
    s = 0
    while (s < counts.length) {
      occ(s) = if (counts(s) == -1) 1 else math.max(counts(s), 0)
      s += 1
    }
    var i = 0
    while (i < size) {
      val sym = t.symbol(i)
      val x = occ(sym)
      occ(sym) += 1
      val hb = 31 - Integer.numberOfLeadingZeros(x)
      val nb = tableLog - hb
      if (nb < 0 || nb > tableLog) return null
      t.nbBits(i) = nb
      t.newState(i) = (x << nb) - size
      i += 1
    }
    t
  }

  /** Forward LSB-first bit reader (FSE table descriptions). */
  private final class FwdBr(val b: Array[Byte], var pos: Int, val end: Int) {
    var bitPos = 0
    var overrun = false
    def read(n: Int): Int = {
      var v = 0
      var got = 0
      while (got < n) {
        if (pos >= end) { overrun = true; return 0 }
        val avail = 8 - bitPos
        val take = math.min(avail, n - got)
        val bits = ((b(pos) & 0xff) >> bitPos) & ((1 << take) - 1)
        v |= bits << got
        got += take
        bitPos += take
        if (bitPos == 8) { bitPos = 0; pos += 1 }
      }
      v
    }
    def bytePosAfter: Int = if (bitPos > 0) pos + 1 else pos
  }

  /** FSE normalized-count header (the reference's readNCount, bit-exact);
    * returns (counts, accuracyLog) or null.
    */
  private def fseReadTable(br: FwdBr, maxSymbol: Int,
      maxLog: Int): (Array[Int], Int) = {
    val accuracyLog = br.read(4) + 5
    if (br.overrun || accuracyLog > maxLog) return null
    val tableSize = 1 << accuracyLog
    var remaining = tableSize + 1
    var threshold = tableSize
    var nbBits = accuracyLog + 1
    val counts = new Array[Int](maxSymbol + 1)
    var sym = 0
    var previousZero = false
    while (remaining > 1) {
      if (sym > maxSymbol) return null
      if (previousZero) {
        var rep = br.read(2)
        sym += rep
        while (rep == 3) {
          rep = br.read(2)
          sym += rep
          if (br.overrun || sym > maxSymbol + 1) return null
        }
        previousZero = false
        if (sym > maxSymbol) return null
      } else {
        val max = 2 * threshold - 1 - remaining
        val low = br.read(nbBits - 1)
        var count =
          if (low < max) low
          else {
            val full = low | (br.read(1) << (nbBits - 1))
            if (full >= threshold) full - max else full
          }
        if (br.overrun) return null
        count -= 1 // -1 encodes "less than one"
        remaining -= math.abs(count)
        if (remaining < 1) return null
        counts(sym) = count
        previousZero = count == 0
        sym += 1
        while (remaining > 1 && remaining < threshold) {
          nbBits -= 1
          threshold >>= 1
        }
      }
    }
    if (remaining != 1) return null
    (counts, accuracyLog)
  }

  // ---------------- Huffman ----------------

  private[llmops] final class HuffTable(val maxBits: Int) {
    val size: Int = 1 << maxBits
    val symbol = new Array[Byte](size)
    val length = new Array[Byte](size)
  }

  /** Decode-table from weights; the LAST weight is implied (completes the
    * code space to a power of two).
    */
  private def huffBuild(weightsIn: Array[Int], nSymbols: Int): HuffTable = {
    if (nSymbols < 2 || nSymbols > 256) return null
    var sum = 0L
    var i = 0
    while (i < nSymbols - 1) {
      if (weightsIn(i) < 0 || weightsIn(i) > 11) return null
      if (weightsIn(i) > 0) sum += 1L << (weightsIn(i) - 1)
      i += 1
    }
    if (sum == 0) return null
    val maxBits = (64 - java.lang.Long.numberOfLeadingZeros(sum)).toInt
    if (maxBits > 11) return null
    val target = 1L << maxBits
    val rest = target - sum
    if (rest <= 0 || (rest & (rest - 1)) != 0) return null
    val lastWeight = java.lang.Long.numberOfTrailingZeros(rest).toInt + 1
    val w = java.util.Arrays.copyOf(weightsIn, nSymbols)
    w(nSymbols - 1) = lastWeight
    val t = new HuffTable(maxBits)
    var filled = 0
    var weight = 1
    while (weight <= maxBits) {
      var s = 0
      while (s < nSymbols) {
        if (w(s) == weight) {
          val len = maxBits + 1 - weight
          val span = 1 << (maxBits - len)
          var k = 0
          while (k < span) {
            if (filled >= t.size) return null
            t.symbol(filled) = s.toByte
            t.length(filled) = len.toByte
            filled += 1
            k += 1
          }
        }
        s += 1
      }
      weight += 1
    }
    if (filled != t.size) return null
    t
  }

  /** Huffman tree description at `pos`; (table, bytesRead) or null. */
  private def huffReadTable(b: Array[Byte], pos: Int,
      end: Int): (HuffTable, Int) = {
    if (pos >= end) return null
    val hb = b(pos) & 0xff
    if (hb >= 128) {
      val n = hb - 127 // number of explicit weights
      val nbytes = (n + 1) / 2
      if (pos + 1 + nbytes > end) return null
      val weights = new Array[Int](n + 1)
      var i = 0
      while (i < n) {
        val v = b(pos + 1 + i / 2) & 0xff
        weights(i) = if (i % 2 == 0) v >>> 4 else v & 0xf
        i += 1
      }
      val t = huffBuild(weights, n + 1)
      if (t == null) null else (t, 1 + nbytes)
    } else {
      if (hb == 0 || pos + 1 + hb > end) return null
      val fbr = new FwdBr(b, pos + 1, pos + 1 + hb)
      val hdr = fseReadTable(fbr, 15, 6)
      if (hdr == null) return null
      val table = fseBuild(hdr._1, hdr._2)
      if (table == null) return null
      val bit = new BackBr(b, fbr.bytePosAfter, pos + 1 + hb)
      if (bit.overrun) return null
      val tlog = table.tableLog
      var s1 = bit.read(tlog)
      var s2 = bit.read(tlog)
      if (bit.overrun) return null
      val weights = new Array[Int](256)
      var n = 0
      var done = false
      while (!done) {
        if (n >= 255) return null
        weights(n) = table.symbol(s1); n += 1
        if (table.nbBits(s1) > bit.bitsLeft) {
          if (n >= 255) return null
          weights(n) = table.symbol(s2); n += 1
          done = true
        } else {
          s1 = table.newState(s1) + bit.read(table.nbBits(s1))
          if (n >= 255) return null
          weights(n) = table.symbol(s2); n += 1
          if (table.nbBits(s2) > bit.bitsLeft) {
            if (n >= 255) return null
            weights(n) = table.symbol(s1); n += 1
            done = true
          } else {
            s2 = table.newState(s2) + bit.read(table.nbBits(s2))
          }
        }
      }
      val t = huffBuild(java.util.Arrays.copyOf(weights, n + 1), n + 1)
      if (t == null) null else (t, 1 + hb)
    }
  }

  private def huffDecodeStream(b: Array[Byte], start: Int, end: Int,
      t: HuffTable, out: Array[Byte], outOff: Int, outLen: Int): Boolean = {
    val br = new BackBr(b, start, end)
    if (br.overrun) return false
    var n = 0
    while (n < outLen) {
      val idx = br.peek(t.maxBits)
      out(outOff + n) = t.symbol(idx)
      br.skip(t.length(idx) & 0xff)
      n += 1
    }
    !br.overrun && br.bitsLeft == 0 // exact consumption, reference end-check
  }

  // ------ predefined sequence distributions + code tables (RFC 8878) ------

  private val LlDefault = Array(4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1)
  private val MlDefault = Array(1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1, -1, -1)
  private val OfDefault = Array(1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1)

  private lazy val llDefaultTable = fseBuild(LlDefault, 6)
  private lazy val mlDefaultTable = fseBuild(MlDefault, 6)
  private lazy val ofDefaultTable = fseBuild(OfDefault, 5)

  private val LlBase = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14,
    15, 16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024, 2048,
    4096, 8192, 16384, 32768, 65536)
  private val LlBits = Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)
  private val MlBase = Array(3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
    17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34,
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027, 2051,
    4099, 8195, 16387, 32771, 65539)
  private val MlBits = Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3,
    4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)

  // ---------------- frame walk ----------------

  private def rd32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  /** Decompress a complete zstd stream (concatenated + skippable frames);
    * null on any failure.
    */
  def decode(bytes: Array[Byte]): Array[Byte] = decode(bytes, null: Dict)

  /** Decode with an external dictionary (RFC 8878 section 5): `dict` is
    * either a TRAINED dictionary (magic 0xEC30A437: dictID, default
    * entropy tables, initial repeat offsets, content) or any other
    * bytes, which serve as a RAW CONTENT dictionary (pure match-history
    * prefix, id 0). Each frame re-initializes from the dictionary, its
    * declared Dictionary_ID must match a trained dict's, and frames
    * that declare NO id still decode (the reference tools omit the id
    * under --no-dictID). Null on a malformed dictionary, an id
    * mismatch, or any frame corruption.
    */
  def decode(bytes: Array[Byte], dict: Array[Byte]): Array[Byte] = {
    val d = if (dict == null) null else parseDict(dict)
    if (dict != null && d == null) return null
    decode(bytes, d)
  }

  private def decode(bytes: Array[Byte], dict: Dict): Array[Byte] = {
    if (bytes == null || bytes.length < 4) return null
    val out = new java.io.ByteArrayOutputStream(math.min(bytes.length * 3, 1 << 20))
    var i = 0
    var sawFrame = false
    while (i < bytes.length) {
      if (i + 4 > bytes.length)
        return if (sawFrame && allZero(bytes, i)) out.toByteArray else null
      val magic = rd32(bytes, i)
      if ((magic & 0xFFFFFFF0) == 0x184D2A50) { // skippable frame
        if (i + 8 > bytes.length) return null
        val sz = rd32(bytes, i + 4)
        if (sz < 0 || i + 8 + sz.toLong > bytes.length) return null
        i += 8 + sz
      } else if (magic == 0xFD2FB528) {
        sawFrame = true
        i = decodeFrame(bytes, i + 4, out, dict)
        if (i < 0) return null
      } else if (magic == 0 && sawFrame && allZero(bytes, i)) {
        return out.toByteArray // trailing pad
      } else return null
    }
    if (!sawFrame) null else out.toByteArray
  }

  /** Decode exactly ONE frame whose magic starts at `off`: (content,
    * offset after the frame), or null on malformation/truncation — the
    * member primitive of the splittable `.warc.zst` walker. Skippable
    * frames yield (empty, next).
    */
  private[llmops] def frameAt(b: Array[Byte], off: Int,
      dict: Dict): (Array[Byte], Int) = {
    try {
      if (off + 4 > b.length) return null
      val magic = rd32(b, off)
      if ((magic & 0xFFFFFFF0) == 0x184D2A50) {
        if (off + 8 > b.length) return null
        val sz = rd32(b, off + 4)
        if (sz < 0 || off + 8 + sz.toLong > b.length) return null
        return (Array.emptyByteArray, off + 8 + sz)
      }
      if (magic != 0xFD2FB528) return null
      val out = new java.io.ByteArrayOutputStream(1 << 16)
      val next = decodeFrame(b, off + 4, out, dict)
      if (next < 0) null else (out.toByteArray, next)
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  /** Parsed external dictionary (RFC 8878 section 5). */
  private[llmops] final class Dict(val id: Long, val huff: HuffTable,
      val ofTab: FseTable, val mlTab: FseTable, val llTab: FseTable,
      val reps: Array[Int], val content: Array[Byte])

  private[llmops] def parseDict(d: Array[Byte]): Dict = {
    if (d == null || d.length == 0 || d.length > MaxOut) return null
    if (d.length < 8 || rd32(d, 0) != 0xEC30A437)
      // raw content dictionary: pure history prefix, default everything
      return new Dict(0L, null, null, null, null, Array(1, 4, 8), d)
    val id = rd32(d, 4).toLong & 0xFFFFFFFFL
    var i = 8
    val h = huffReadTable(d, i, d.length)
    if (h == null) return null
    i += h._2
    // reference load order (ZSTD_loadDEntropy): Huffman, OF, ML, LL
    def fse(maxSym: Int, maxLog: Int): FseTable = {
      val fbr = new FwdBr(d, i, d.length)
      val r = fseReadTable(fbr, maxSym, maxLog)
      if (r == null || fbr.overrun) return null
      i = fbr.bytePosAfter
      fseBuild(r._1, r._2)
    }
    val of = fse(31, 8)
    if (of == null) return null
    val ml = fse(52, 9)
    if (ml == null) return null
    val ll = fse(35, 9)
    if (ll == null) return null
    if (i + 12 > d.length) return null
    val contentSize = d.length - (i + 12)
    val reps = new Array[Int](3)
    var k = 0
    while (k < 3) {
      reps(k) = rd32(d, i)
      if (reps(k) <= 0 || reps(k) > contentSize) return null
      i += 4
      k += 1
    }
    new Dict(id, h._1, of, ml, ll, reps,
      java.util.Arrays.copyOfRange(d, i, d.length))
  }

  private def allZero(b: Array[Byte], from: Int): Boolean = {
    var i = from
    while (i < b.length) { if (b(i) != 0) return false; i += 1 }
    true
  }

  /** Per-frame decode state: output window + repeat offsets + repeat
    * tables persist across the frame's blocks.
    */
  private final class FrameCtx {
    var win = new Array[Byte](1 << 17)
    var nWin = 0
    var rep1 = 1; var rep2 = 4; var rep3 = 8
    var huff: HuffTable = null
    var llTab: FseTable = null
    var mlTab: FseTable = null
    var ofTab: FseTable = null
    def ensure(n: Int): Boolean = {
      if (n < 0 || nWin.toLong + n > MaxOut) return false
      if (nWin + n > win.length) {
        var cap = win.length
        while (cap < nWin + n) cap = math.min(MaxOut, cap * 2)
        win = java.util.Arrays.copyOf(win, cap)
      }
      true
    }
  }

  private def decodeFrame(b: Array[Byte], start: Int,
      out: java.io.ByteArrayOutputStream, dict: Dict): Int = {
    var i = start
    if (i >= b.length) return -1
    val fhd = b(i) & 0xff
    i += 1
    val fcsCode = fhd >>> 6
    val singleSegment = (fhd & 0x20) != 0
    if ((fhd & 0x08) != 0) return -1 // reserved bit
    val checksumFlag = (fhd & 0x04) != 0
    val didCode = fhd & 0x03
    if (!singleSegment) {
      if (i >= b.length) return -1
      val wd = b(i) & 0xff
      i += 1
      val windowLog = 10 + (wd >>> 3)
      if (windowLog > 31) return -1
      val windowBase = 1L << windowLog
      val windowAdd = (windowBase / 8) * (wd & 7)
      if (windowBase + windowAdd > MaxOut) return -1
    }
    if (didCode != 0) {
      if (dict == null) return -1 // a dictionary frame needs its dict
      val didLen = didCode match { case 1 => 1; case 2 => 2; case _ => 4 }
      if (i + didLen > b.length) return -1
      var did = 0L
      var k = 0
      while (k < didLen) { did |= (b(i + k) & 0xffL) << (8 * k); k += 1 }
      i += didLen
      if (did != 0 && did != dict.id) return -1 // wrong dictionary
    }
    var contentSize = -1L
    val fcsLen = fcsCode match {
      case 0 => if (singleSegment) 1 else 0
      case 1 => 2
      case 2 => 4
      case _ => 8
    }
    if (fcsLen > 0) {
      if (i + fcsLen > b.length) return -1
      contentSize = 0L
      var k = 0
      while (k < fcsLen) { contentSize |= (b(i + k) & 0xffL) << (8 * k); k += 1 }
      if (fcsLen == 2) contentSize += 256
      if (contentSize < 0 || contentSize > MaxOut) return -1
      i += fcsLen
    }
    val ctx = new FrameCtx
    var base = 0
    if (dict != null) {
      // the dictionary content is virtual history: matches reach into
      // it through the ordinary offset check, and the trained entropy
      // tables serve the first block's "repeat" modes
      base = dict.content.length
      if (!ctx.ensure(base)) return -1
      System.arraycopy(dict.content, 0, ctx.win, 0, base)
      ctx.nWin = base
      ctx.rep1 = dict.reps(0); ctx.rep2 = dict.reps(1)
      ctx.rep3 = dict.reps(2)
      ctx.huff = dict.huff
      ctx.llTab = dict.llTab; ctx.mlTab = dict.mlTab
      ctx.ofTab = dict.ofTab
    }
    var last = false
    while (!last) {
      if (i + 3 > b.length) return -1
      val hdr = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16)
      i += 3
      last = (hdr & 1) != 0
      val btype = (hdr >>> 1) & 3
      val bsize = hdr >>> 3
      btype match {
        case 0 =>
          if (i + bsize > b.length || !ctx.ensure(bsize)) return -1
          System.arraycopy(b, i, ctx.win, ctx.nWin, bsize)
          ctx.nWin += bsize
          i += bsize
        case 1 =>
          if (i >= b.length || !ctx.ensure(bsize)) return -1
          java.util.Arrays.fill(ctx.win, ctx.nWin, ctx.nWin + bsize, b(i))
          ctx.nWin += bsize
          i += 1
        case 2 =>
          if (i + bsize > b.length) return -1
          if (!decodeCompressedBlock(b, i, i + bsize, ctx)) return -1
          i += bsize
        case _ => return -1
      }
    }
    if (contentSize >= 0 && ctx.nWin - base != contentSize) return -1
    out.write(ctx.win, base, ctx.nWin - base)
    if (out.size() > MaxOut) return -1
    if (checksumFlag) {
      if (i + 4 > b.length) return -1
      val expect =
        (XxHash.xxh64(ctx.win, base, ctx.nWin - base, 0L) & 0xFFFFFFFFL).toInt
      if (rd32(b, i) != expect) return -1
      i += 4
    }
    i
  }

  // ---------------- compressed block ----------------

  private def decodeCompressedBlock(b: Array[Byte], start: Int, end: Int,
      ctx: FrameCtx): Boolean = {
    var i = start
    if (i >= end) return false
    val sh = b(i) & 0xff
    val litType = sh & 3
    var lit: Array[Byte] = null
    if (litType <= 1) { // raw | RLE
      var regenSize = 0
      ((sh >>> 2) & 3) match {
        case 0 | 2 =>
          regenSize = sh >>> 3; i += 1
        case 1 =>
          if (i + 2 > end) return false
          regenSize = (sh >>> 4) | ((b(i + 1) & 0xff) << 4); i += 2
        case _ =>
          if (i + 3 > end) return false
          regenSize = (sh >>> 4) | ((b(i + 1) & 0xff) << 4) |
            ((b(i + 2) & 0xff) << 12)
          i += 3
      }
      if (regenSize > MaxOut) return false
      lit = new Array[Byte](regenSize)
      if (litType == 0) {
        if (i + regenSize > end) return false
        System.arraycopy(b, i, lit, 0, regenSize)
        i += regenSize
      } else {
        if (i >= end) return false
        java.util.Arrays.fill(lit, b(i))
        i += 1
      }
    } else { // Huffman-compressed | treeless
      var regenSize = 0
      var compSize = 0
      var fourStreams = true
      ((sh >>> 2) & 3) match {
        case 0 | 1 =>
          if (i + 3 > end) return false
          fourStreams = ((sh >>> 2) & 3) == 1
          val v = (sh >>> 4) | ((b(i + 1) & 0xff) << 4) | ((b(i + 2) & 0xff) << 12)
          regenSize = v & 0x3ff
          compSize = v >>> 10
          i += 3
        case 2 =>
          if (i + 4 > end) return false
          val v = (sh >>> 4) | ((b(i + 1) & 0xff) << 4) |
            ((b(i + 2) & 0xff) << 12) | ((b(i + 3) & 0xff) << 20)
          regenSize = v & 0x3fff
          compSize = v >>> 14
          i += 4
        case _ =>
          if (i + 5 > end) return false
          val lo = (sh >>> 4) | ((b(i + 1) & 0xff) << 4) | ((b(i + 2) & 0xff) << 12)
          regenSize = lo & 0x3ffff
          compSize = (lo >>> 18) | ((b(i + 3) & 0xff) << 2) | ((b(i + 4) & 0xff) << 10)
          i += 5
      }
      if (regenSize > MaxOut || compSize <= 0 || i + compSize > end) return false
      var table = ctx.huff
      var tOff = i
      if (litType == 2) {
        val r = huffReadTable(b, i, i + compSize)
        if (r == null) return false
        table = r._1
        ctx.huff = table
        tOff = i + r._2
      } else if (table == null) return false
      val streamsEnd = i + compSize
      lit = new Array[Byte](regenSize)
      if (!fourStreams) {
        if (!huffDecodeStream(b, tOff, streamsEnd, table, lit, 0, regenSize))
          return false
      } else {
        if (tOff + 6 > streamsEnd) return false
        val s1 = (b(tOff) & 0xff) | ((b(tOff + 1) & 0xff) << 8)
        val s2 = (b(tOff + 2) & 0xff) | ((b(tOff + 3) & 0xff) << 8)
        val s3 = (b(tOff + 4) & 0xff) | ((b(tOff + 5) & 0xff) << 8)
        val dataStart = tOff + 6
        val s4 = (streamsEnd - dataStart) - s1 - s2 - s3
        if (s4 <= 0) return false
        val q = (regenSize + 3) / 4
        if (regenSize - 3 * q < 0) return false
        val offs = Array(dataStart, dataStart + s1, dataStart + s1 + s2,
          dataStart + s1 + s2 + s3)
        val sizes = Array(s1, s2, s3, s4)
        val lens = Array(q, q, q, regenSize - 3 * q)
        var k = 0
        var outOff = 0
        while (k < 4) {
          if (!huffDecodeStream(b, offs(k), offs(k) + sizes(k), table,
            lit, outOff, lens(k))) return false
          outOff += lens(k)
          k += 1
        }
      }
      i = streamsEnd
    }
    decodeSequences(b, i, end, ctx, lit)
  }

  // ---------------- sequences ----------------

  private def decodeSequences(b: Array[Byte], start: Int, end: Int,
      ctx: FrameCtx, lit: Array[Byte]): Boolean = {
    var i = start
    if (i >= end) return false
    var nSeq = b(i) & 0xff
    i += 1
    if (nSeq == 255) {
      if (i + 2 > end) return false
      nSeq = ((b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)) + 0x7f00
      i += 2
    } else if (nSeq >= 128) {
      if (i >= end) return false
      nSeq = ((nSeq - 128) << 8) + (b(i) & 0xff)
      i += 1
    }
    if (nSeq == 0) {
      if (!ctx.ensure(lit.length)) return false
      System.arraycopy(lit, 0, ctx.win, ctx.nWin, lit.length)
      ctx.nWin += lit.length
      return true
    }
    if (i >= end) return false
    val modes = b(i) & 0xff
    i += 1
    if ((modes & 3) != 0) return false
    val llMode = (modes >>> 6) & 3
    val ofMode = (modes >>> 4) & 3
    val mlMode = (modes >>> 2) & 3

    var bad = false
    def loadTable(mode: Int, maxSym: Int, maxLog: Int, defTab: FseTable,
        repTab: FseTable): FseTable = mode match {
      case 0 => defTab
      case 1 =>
        if (i >= end) { bad = true; null }
        else {
          val sym = b(i) & 0xff
          i += 1
          if (sym > maxSym) { bad = true; null }
          else {
            val t = new FseTable(0)
            t.symbol(0) = sym
            t
          }
        }
      case 2 =>
        val fbr = new FwdBr(b, i, end)
        val r = fseReadTable(fbr, maxSym, maxLog)
        if (r == null) { bad = true; null }
        else {
          i = fbr.bytePosAfter
          fseBuild(r._1, r._2)
        }
      case _ => repTab
    }
    val llTab = loadTable(llMode, 35, 9, llDefaultTable, ctx.llTab)
    if (bad || llTab == null) return false
    val ofTab = loadTable(ofMode, 31, 8, ofDefaultTable, ctx.ofTab)
    if (bad || ofTab == null) return false
    val mlTab = loadTable(mlMode, 52, 9, mlDefaultTable, ctx.mlTab)
    if (bad || mlTab == null) return false
    ctx.llTab = llTab; ctx.ofTab = ofTab; ctx.mlTab = mlTab

    val bit = new BackBr(b, i, end)
    if (bit.overrun) return false
    var llState = bit.read(llTab.tableLog)
    var ofState = bit.read(ofTab.tableLog)
    var mlState = bit.read(mlTab.tableLog)
    if (bit.overrun) return false
    var litPos = 0
    var s = 0
    while (s < nSeq) {
      val ofCode = ofTab.symbol(ofState)
      val mlCode = mlTab.symbol(mlState)
      val llCode = llTab.symbol(llState)
      if (llCode >= 36 || mlCode >= 53 || ofCode > 30) return false
      val ofExtra = if (ofCode > 0) bit.read(ofCode) else 0
      val offValue = (1L << ofCode) + (ofExtra & 0xFFFFFFFFL)
      val mlExtra = if (MlBits(mlCode) > 0) bit.read(MlBits(mlCode)) else 0
      val matchLen = MlBase(mlCode) + mlExtra
      val llExtra = if (LlBits(llCode) > 0) bit.read(LlBits(llCode)) else 0
      val litLen = LlBase(llCode) + llExtra
      if (bit.overrun) return false
      var offset = 0
      if (offValue > 3) {
        if (offValue - 3 > Int.MaxValue) return false
        offset = (offValue - 3).toInt
        ctx.rep3 = ctx.rep2; ctx.rep2 = ctx.rep1; ctx.rep1 = offset
      } else {
        val idx = if (litLen == 0) offValue.toInt else offValue.toInt - 1
        offset = idx match {
          case 0 => ctx.rep1
          case 1 =>
            val v = ctx.rep2; ctx.rep2 = ctx.rep1; ctx.rep1 = v; v
          case 2 =>
            val v = ctx.rep3
            ctx.rep3 = ctx.rep2; ctx.rep2 = ctx.rep1; ctx.rep1 = v; v
          case _ =>
            val v = ctx.rep1 - 1
            if (v <= 0) return false
            ctx.rep3 = ctx.rep2; ctx.rep2 = ctx.rep1; ctx.rep1 = v; v
        }
        if (offset <= 0) return false
      }
      if (litPos + litLen > lit.length) return false
      if (!ctx.ensure(litLen + matchLen)) return false
      System.arraycopy(lit, litPos, ctx.win, ctx.nWin, litLen)
      ctx.nWin += litLen
      litPos += litLen
      if (offset > ctx.nWin) return false
      val from = ctx.nWin - offset
      var k = 0
      while (k < matchLen) {
        ctx.win(ctx.nWin + k) = ctx.win(from + k)
        k += 1
      }
      ctx.nWin += matchLen
      s += 1
      if (s < nSeq) {
        llState = llTab.newState(llState) + bit.read(llTab.nbBits(llState))
        mlState = mlTab.newState(mlState) + bit.read(mlTab.nbBits(mlState))
        ofState = ofTab.newState(ofState) + bit.read(ofTab.nbBits(ofState))
        if (bit.overrun) return false
      }
    }
    if (bit.bitsLeft != 0) return false // exact stream consumption
    val rest = lit.length - litPos
    if (rest < 0 || !ctx.ensure(rest)) return false
    System.arraycopy(lit, litPos, ctx.win, ctx.nWin, rest)
    ctx.nWin += rest
    true
  }
}
