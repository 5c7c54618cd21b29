package graft.llmops

/** Brotli (RFC 7932) — the last big HTTP `Content-Encoding` the crawl
  * entity peel was missing (gzip/deflate were JDK-native; zstd, bzip2,
  * xz, lz4, snappy are the round-11b kernels). From-scratch JDK-only
  * decoder of the full format: stream header window bits; uncompressed,
  * metadata and compressed meta-blocks; simple and complex prefix codes
  * (code-length code with 16/17 repeat accumulation); literal /
  * insert&copy / distance block categories with block-switch commands;
  * literal context modes LSB6/MSB6/UTF8/Signed and context maps with
  * RLE + inverse move-to-front; the distance ring buffer with the 16
  * short codes, NDIRECT/NPOSTFIX parameterized long codes; and the
  * static dictionary with all 121 word transforms (omit / ferment /
  * affix). The dictionary bytes, context lookup table and transform
  * list are the NORMATIVE APPENDIX CONTENT of RFC 7932 (Appendix A and
  * B and Section 7.1), carried as data: the 122 784-byte dictionary
  * rides gzipped in `graft/brotli_dictionary.bin.gz` (sha256 of the raw
  * bytes `20e42eb1b511c2…`), the 2 048-byte context table and the
  * transform triples are inlined below.
  *
  * Brotli frames carry NO magic bytes, so `sniffCodec` cannot detect
  * them; callers name the codec (`decode(bytes, "br")`, HTTP
  * `Content-Encoding: br`, a `.br` file suffix).
  *
  * [[encode]] is the spec-shaped writer twin: a valid stream of
  * uncompressed meta-blocks (the STORE mode every conformant decoder
  * accepts), so shard I/O and fixtures round-trip without an external
  * compressor.
  *
  * Refusals (`null`): reserved/invalid window bits, over-subscribed or
  * incomplete prefix codes, bad repeat runs, distances past the window
  * with no dictionary word (length outside 4–24, transform id over
  * 120), MLEN mismatches, truncation, trailing garbage, output past
  * the 64 MB cap. Reference hook for placement: compressed-corpus
  * ingestion, `aje_libs/documents/helpers/document_processor.py:10-83`.
  */
object Brotli {

  private final val MaxOut = 64 << 20

  /** Decode a complete brotli stream; null on any corruption. */
  def decode(bytes: Array[Byte]): Array[Byte] =
    try decode0(bytes)
    catch { case scala.util.control.NonFatal(_) => null }

  // ---------------------------------------------------------------- bits

  private final class Malformed extends RuntimeException(null, null, false, false)
  private def fail(): Nothing = throw new Malformed

  /** LSB-first bit reader (brotli bit order, RFC 7932 section 1.5.1). */
  private final class Br(val b: Array[Byte]) {
    var pos = 0L
    private val endBits = b.length.toLong << 3

    def read(n: Int): Int = { // n <= 24
      if (n == 0) return 0
      if (pos + n > endBits) fail()
      val byteIdx = (pos >>> 3).toInt
      var v = 0L
      var i = 0
      val lim = math.min(5, b.length - byteIdx)
      while (i < lim) { v |= (b(byteIdx + i) & 0xffL) << (8 * i); i += 1 }
      val off = (pos & 7).toInt
      pos += n
      ((v >>> off) & ((1L << n) - 1)).toInt
    }

    /** Non-failing peek (zero padding past the end) for the fixed
      * code-length-code lookup.
      */
    def peek4: Int = {
      val byteIdx = (pos >>> 3).toInt
      var v = 0L
      var i = 0
      val lim = math.min(2, b.length - byteIdx)
      while (i < lim) { v |= (b(byteIdx + i) & 0xffL) << (8 * i); i += 1 }
      ((v >>> (pos & 7).toInt) & 15).toInt
    }

    def skip(n: Int): Unit = { if (pos + n > endBits) fail(); pos += n }

    def alignByte(): Unit = {
      val rem = (pos & 7).toInt
      if (rem != 0) {
        // padding bits must be zero (spec: fillers are zeros)
        if (read(8 - rem) != 0) fail()
      }
    }

    def byteIndex: Int = { require((pos & 7) == 0); (pos >>> 3).toInt }
    def atEnd: Boolean = pos >= endBits
  }

  // ------------------------------------------------------------- huffman

  /** Canonical prefix code over `lengths` (index = symbol): codes are
    * assigned shortest-first, ties by ascending symbol — the scheme the
    * simple- and complex-code readers both normalize to. `trivial >= 0`
    * marks a zero-bit single-symbol code.
    */
  private final class Tree(lengths: Array[Int], val trivial: Int) {
    val count = new Array[Int](16)
    val first = new Array[Int](16)
    val offset = new Array[Int](16)
    var sorted: Array[Int] = null
    if (trivial < 0) {
      var i = 0
      while (i < lengths.length) {
        val l = lengths(i)
        if (l > 0) count(l) += 1
        i += 1
      }
      var sum = 0
      var code = 0
      var l = 1
      while (l <= 15) {
        offset(l) = sum; sum += count(l)
        first(l) = code; code = (code + count(l)) << 1
        l += 1
      }
      sorted = new Array[Int](sum)
      val idx = offset.clone()
      i = 0
      while (i < lengths.length) {
        val ln = lengths(i)
        if (ln > 0) { sorted(idx(ln)) = i; idx(ln) += 1 }
        i += 1
      }
    }
  }

  private def readSymbol(t: Tree, br: Br): Int = {
    if (t.trivial >= 0) return t.trivial
    var code = 0
    var l = 0
    while (l < 15) {
      code = (code << 1) | br.read(1)
      l += 1
      if (code - t.first(l) < t.count(l))
        return t.sorted(t.offset(l) + code - t.first(l))
    }
    fail()
  }

  private def treeFromLengths(lengths: Array[Int]): Tree = {
    // completeness: sum(2^-len) over nonzero lengths must be exactly 1
    var space = 0L
    var nonzero = 0
    var single = -1
    var i = 0
    while (i < lengths.length) {
      if (lengths(i) > 0) {
        space += (1 << 15) >> lengths(i); nonzero += 1; single = i
      }
      i += 1
    }
    if (nonzero == 0) fail()
    if (nonzero == 1) return new Tree(lengths, single)
    if (space != (1 << 15)) fail()
    new Tree(lengths, -1)
  }

  private def log2ceil(n: Int): Int = {
    var bits = 0
    while ((1 << bits) < n) bits += 1
    bits
  }

  /** Fixed code for the code-length code's own lengths (RFC 3.5):
    * 4-bit lookup → (symbol, bits consumed).
    */
  private val ClSym = Array(0, 4, 3, 2, 0, 4, 3, 1, 0, 4, 3, 2, 0, 4, 3, 5)
  private val ClBits = Array(2, 2, 2, 3, 2, 2, 2, 4, 2, 2, 2, 3, 2, 2, 2, 4)
  private val ClOrder =
    Array(1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  private def readHuffmanCode(alphabetSize: Int, br: Br): Tree = {
    val hskip = br.read(2)
    if (hskip == 1) {
      // simple code: 1-4 listed symbols
      val nsym = br.read(2) + 1
      val maxBits = log2ceil(alphabetSize)
      val syms = new Array[Int](nsym)
      var i = 0
      while (i < nsym) {
        syms(i) = br.read(maxBits)
        if (syms(i) >= alphabetSize) fail()
        var j = 0
        while (j < i) { if (syms(j) == syms(i)) fail(); j += 1 }
        i += 1
      }
      val lengths = new Array[Int](alphabetSize)
      nsym match {
        case 1 => return new Tree(lengths, syms(0))
        case 2 => lengths(syms(0)) = 1; lengths(syms(1)) = 1
        case 3 =>
          lengths(syms(0)) = 1; lengths(syms(1)) = 2; lengths(syms(2)) = 2
        case _ =>
          if (br.read(1) == 0) {
            lengths(syms(0)) = 2; lengths(syms(1)) = 2
            lengths(syms(2)) = 2; lengths(syms(3)) = 2
          } else {
            lengths(syms(0)) = 1; lengths(syms(1)) = 2
            lengths(syms(2)) = 3; lengths(syms(3)) = 3
          }
      }
      treeFromLengths(lengths)
    } else {
      // complex code: code-length code, then symbol lengths with repeats
      val clLens = new Array[Int](18)
      var space = 32
      var numCodes = 0
      var i = hskip
      while (i < 18 && space > 0) {
        val v = br.peek4
        val sym = ClSym(v)
        br.skip(ClBits(v))
        clLens(ClOrder(i)) = sym
        if (sym != 0) { space -= 32 >> sym; numCodes += 1 }
        i += 1
      }
      if (space < 0 || (space != 0 && numCodes != 1)) fail()
      val clTree = treeFromLengths(clLens)

      val lengths = new Array[Int](alphabetSize)
      var symbol = 0
      var symSpace = 1 << 15
      var prevLen = 8 // default repeat length
      var repeat = 0
      var repeatLen = 0
      while (symbol < alphabetSize && symSpace > 0) {
        val cl = readSymbol(clTree, br)
        if (cl < 16) {
          lengths(symbol) = cl
          symbol += 1
          if (cl != 0) { prevLen = cl; symSpace -= (1 << 15) >> cl }
          repeat = 0
        } else {
          val extraBits = cl - 14 // 16 → 2, 17 → 3
          val newLen = if (cl == 16) prevLen else 0
          if (repeatLen != newLen) { repeat = 0; repeatLen = newLen }
          val oldRepeat = repeat
          if (repeat > 0) { repeat -= 2; repeat <<= extraBits }
          repeat += br.read(extraBits) + 3
          val delta = repeat - oldRepeat
          if (symbol + delta > alphabetSize) fail()
          var k = 0
          while (k < delta) { lengths(symbol) = repeatLen; symbol += 1; k += 1 }
          if (repeatLen != 0) symSpace -= delta << (15 - repeatLen)
        }
      }
      if (symSpace != 0) fail()
      treeFromLengths(lengths)
    }
  }

  // --------------------------------------------------------- context map

  private def readContextMap(size: Int, ntrees: Int, br: Br): Array[Byte] = {
    val rleMax = if (br.read(1) == 1) br.read(4) + 1 else 0
    val tree = readHuffmanCode(rleMax + ntrees, br)
    val map = new Array[Byte](size)
    var i = 0
    while (i < size) {
      val sym = readSymbol(tree, br)
      if (sym == 0) { map(i) = 0; i += 1 }
      else if (sym <= rleMax) {
        var reps = (1 << sym) + br.read(sym)
        if (i + reps > size) fail()
        while (reps > 0) { map(i) = 0; i += 1; reps -= 1 }
      } else {
        map(i) = (sym - rleMax).toByte
        i += 1
      }
    }
    if (br.read(1) == 1) {
      // inverse move-to-front over the map values
      val mtf = new Array[Byte](256)
      var k = 0
      while (k < 256) { mtf(k) = k.toByte; k += 1 }
      i = 0
      while (i < size) {
        val idx = map(i) & 0xff
        val v = mtf(idx)
        map(i) = v
        var j = idx
        while (j > 0) { mtf(j) = mtf(j - 1); j -= 1 }
        mtf(0) = v
        i += 1
      }
    }
    map
  }

  // ------------------------------------------------------- length tables

  private val InsBase = Array(0, 1, 2, 3, 4, 5, 6, 8, 10, 14, 18, 26, 34,
    50, 66, 98, 130, 194, 322, 578, 1090, 2114, 6210, 22594)
  private val InsExtra = Array(0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4,
    5, 5, 6, 7, 8, 9, 10, 12, 14, 24)
  private val CopyBase = Array(2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 18, 22,
    30, 38, 54, 70, 102, 134, 198, 326, 582, 1094, 2118)
  private val CopyExtra = Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3,
    4, 4, 5, 5, 6, 7, 8, 9, 10, 24)
  private val InsertRangeLut = Array(0, 0, 8, 8, 0, 16, 8, 16, 16)
  private val CopyRangeLut = Array(0, 8, 0, 8, 16, 0, 16, 8, 16)
  private val BlockCountBase = Array(1, 5, 9, 13, 17, 25, 33, 41, 49, 65,
    81, 97, 113, 145, 177, 209, 241, 305, 369, 497, 753, 1265, 2289, 4337,
    8433, 16625)
  private val BlockCountExtra = Array(2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4,
    5, 5, 5, 5, 6, 6, 7, 8, 9, 10, 11, 12, 13, 24)

  /** 1–256 (block-type counts, context-tree counts; RFC 9.2). */
  private def readCount256(br: Br): Int =
    if (br.read(1) == 0) 1
    else {
      val n = br.read(3)
      1 + (1 << n) + br.read(n)
    }

  // ------------------------------------------------------ output buffer

  private final class Out(initial: Int) {
    var a = new Array[Byte](math.max(64, initial))
    var len = 0
    def ensure(extra: Int): Unit = {
      if (extra < 0 || extra > MaxOut - len) fail()
      if (len + extra > a.length) {
        var cap = a.length
        while (cap < len + extra) cap = math.min(MaxOut, cap * 2)
        a = java.util.Arrays.copyOf(a, cap)
      }
    }
    def p1: Int = if (len > 0) a(len - 1) & 0xff else 0
    def p2: Int = if (len > 1) a(len - 2) & 0xff else 0
  }

  // ------------------------------------------------------- block switch

  /** One category's block-switching state (literal / command / distance). */
  private final class Blocks(val n: Int, val typeTree: Tree,
      val lenTree: Tree, var blockLen: Int) {
    var btype = 0
    private var last = 0
    private var secondLast = 1

    def switchIfNeeded(br: Br): Unit = {
      if (n <= 1) return
      if (blockLen == 0) {
        val code = readSymbol(typeTree, br)
        val nt =
          if (code == 0) secondLast
          else if (code == 1) (last + 1) % n
          else code - 2
        secondLast = last
        last = nt
        btype = nt
        blockLen = readBlockCount(lenTree, br)
      }
      blockLen -= 1
    }
  }

  private def readBlockCount(t: Tree, br: Br): Int = {
    val code = readSymbol(t, br)
    BlockCountBase(code) + br.read(BlockCountExtra(code))
  }

  private def readBlocks(br: Br): Blocks = {
    val n = readCount256(br)
    if (n >= 2) {
      val tt = readHuffmanCode(n + 2, br)
      val lt = readHuffmanCode(26, br)
      val first = readBlockCount(lt, br)
      new Blocks(n, tt, lt, first) // check-then-decrement: covers `first`
    } else new Blocks(1, null, null, Int.MaxValue)
  }

  // -------------------------------------------------------------- decode

  private def decode0(bytes: Array[Byte]): Array[Byte] = {
    if (bytes == null || bytes.length == 0) return null
    val br = new Br(bytes)

    // window bits (RFC 9.1)
    val wbits =
      if (br.read(1) == 0) 16
      else {
        val n = br.read(3)
        if (n != 0) 17 + n
        else {
          val m = br.read(3)
          if (m == 0) 17 else if (m == 1) fail() else 8 + m
        }
      }
    val window = (1 << wbits) - 16

    val out = new Out(math.min(MaxOut, math.max(64, bytes.length * 3)))
    val distRb = Array(16, 15, 11, 4)
    var distIdx = 3 // distRb(distIdx & 3) is the LAST distance

    var isLast = false
    while (!isLast) {
      isLast = br.read(1) == 1
      var skipBlock = false
      var mlen = 0
      if (isLast && br.read(1) == 1) skipBlock = true // ISLASTEMPTY
      if (!skipBlock) {
        val mnibbles = br.read(2) + 4
        if (mnibbles == 7) {
          // metadata block: skip bytes
          if (isLast) fail()
          if (br.read(1) != 0) fail() // reserved
          val skipBytes = br.read(2)
          var skipLen = 0
          if (skipBytes > 0) {
            skipLen = br.read(8 * skipBytes)
            if (skipBytes > 1 && (skipLen >>> (8 * (skipBytes - 1))) == 0)
              fail() // last byte must be nonzero
            skipLen += 1
          }
          br.alignByte()
          br.skip(skipLen * 8)
          skipBlock = true
        } else {
          mlen = br.read(4 * mnibbles)
          if (mnibbles > 4 && (mlen >>> (4 * (mnibbles - 1))) == 0) fail()
          mlen += 1
        }
      }
      if (!skipBlock) {
        val uncompressed = if (!isLast) br.read(1) == 1 else false
        if (uncompressed) {
          br.alignByte()
          val start = br.byteIndex
          if (start + mlen > bytes.length) fail()
          out.ensure(mlen)
          System.arraycopy(bytes, start, out.a, out.len, mlen)
          out.len += mlen
          br.skip(mlen * 8)
        } else {
          distIdx = decodeCompressedBlock(br, out, mlen, window,
            distRb, distIdx)
        }
      }
    }
    // trailing padding must be zeros and nothing may follow
    br.alignByte()
    if (!br.atEnd) fail()
    java.util.Arrays.copyOf(out.a, out.len)
  }

  /** Decode one compressed meta-block. The distance ring buffer (and its
    * index) persists ACROSS meta-blocks, hence the array + setter.
    */
  private def decodeCompressedBlock(br: Br, out: Out, mlen0: Int,
      window: Int, distRb: Array[Int], distIdx0: Int): Int = {
    var distIdx = distIdx0

    val litBlocks = readBlocks(br)
    val cmdBlocks = readBlocks(br)
    val dstBlocks = readBlocks(br)

    val npostfix = br.read(2)
    val ndirect = br.read(4) << npostfix

    val ctxModes = new Array[Int](litBlocks.n)
    var i = 0
    while (i < litBlocks.n) { ctxModes(i) = br.read(2); i += 1 }

    val ntreesL = readCount256(br)
    val cmapL =
      if (ntreesL >= 2) readContextMap(64 * litBlocks.n, ntreesL, br)
      else new Array[Byte](64 * litBlocks.n)
    val ntreesD = readCount256(br)
    val cmapD =
      if (ntreesD >= 2) readContextMap(4 * dstBlocks.n, ntreesD, br)
      else new Array[Byte](4 * dstBlocks.n)

    val litTrees = Array.fill(ntreesL)(readHuffmanCode(256, br))
    val cmdTrees = Array.fill(cmdBlocks.n)(readHuffmanCode(704, br))
    val distAlphabet = 16 + ndirect + (48 << npostfix)
    val dstTrees = Array.fill(ntreesD)(readHuffmanCode(distAlphabet, br))

    var mlen = mlen0
    while (mlen > 0) {
      cmdBlocks.switchIfNeeded(br)
      val cmd = readSymbol(cmdTrees(cmdBlocks.btype), br)
      var rangeIdx = cmd >>> 6
      val implicitD0 = rangeIdx < 2
      if (!implicitD0) rangeIdx -= 2
      val insCode = InsertRangeLut(rangeIdx) + ((cmd >>> 3) & 7)
      val copyCode = CopyRangeLut(rangeIdx) + (cmd & 7)
      val insLen = InsBase(insCode) + br.read(InsExtra(insCode))
      var copyLen = CopyBase(copyCode) + br.read(CopyExtra(copyCode))

      if (insLen > mlen) fail()
      var j = 0
      while (j < insLen) {
        litBlocks.switchIfNeeded(br)
        val mode = ctxModes(litBlocks.btype)
        val lutBase = mode << 9
        val ctx = (CtxLut(lutBase + out.p1) | CtxLut(lutBase + 256 + out.p2)) & 0xff
        val tree = litTrees(cmapL(64 * litBlocks.btype + ctx) & 0xff)
        val lit = readSymbol(tree, br)
        out.ensure(1)
        out.a(out.len) = lit.toByte
        out.len += 1
        j += 1
      }
      mlen -= insLen
      if (mlen > 0) {
        var distance = 0
        var pushable = false // ring updates: explicit non-0 codes, and
                             // ONLY for real backrefs (never dictionary)
        if (implicitD0) {
          distance = distRb(distIdx & 3)
        } else {
          dstBlocks.switchIfNeeded(br)
          val distCtx = if (copyLen > 4) 3 else copyLen - 2
          val tree = dstTrees(cmapD(4 * dstBlocks.btype + distCtx) & 0xff)
          val dcode = readSymbol(tree, br)
          if (dcode == 0) distance = distRb(distIdx & 3)
          else if (dcode < 16) {
            // short codes 1-3: ring history; 4-15: last/second ± 1..3
            if (dcode < 4) distance = distRb((distIdx - dcode) & 3)
            else {
              val base =
                if (dcode < 10) distRb(distIdx & 3)
                else distRb((distIdx - 1) & 3)
              val k = if (dcode < 10) dcode - 4 else dcode - 10
              val delta = (k >> 1) + 1
              distance = if ((k & 1) == 0) base - delta else base + delta
            }
            if (distance <= 0) fail()
            pushable = true
          } else if (dcode < 16 + ndirect) {
            distance = dcode - 16 + 1
            pushable = true
          } else {
            val x = dcode - ndirect - 16
            val hcode = x >>> npostfix
            val lcode = x & ((1 << npostfix) - 1)
            val ndistbits = 1 + (hcode >>> 1)
            val extra = br.read(ndistbits)
            val offset = ((2 + (hcode & 1)) << ndistbits) - 4
            distance = ((offset + extra) << npostfix) + lcode + ndirect + 1
            pushable = true
          }
        }
        val maxDist = math.min(window, out.len)
        if (distance <= maxDist) {
          if (pushable) {
            distIdx = (distIdx + 1) & 3
            distRb(distIdx & 3) = distance
          }
          if (copyLen > mlen) fail()
          out.ensure(copyLen)
          val from = out.len - distance
          var k = 0
          while (k < copyLen) {
            out.a(out.len + k) = out.a(from + k)
            k += 1
          }
          out.len += copyLen
          mlen -= copyLen
        } else {
          // static dictionary reference
          if (copyLen < 4 || copyLen > 24) fail()
          val ndbits = DictSizeBits(copyLen)
          val address = distance - maxDist - 1
          val wordIdx = address & ((1 << ndbits) - 1)
          val transformIdx = address >>> ndbits
          if (transformIdx >= Transforms.length) fail()
          val word = new Array[Byte](copyLen)
          System.arraycopy(Dictionary, DictOffsets(copyLen) + wordIdx * copyLen,
            word, 0, copyLen)
          val o = transformWord(word, transformIdx)
          if (o.length > mlen) fail()
          out.ensure(o.length)
          System.arraycopy(o, 0, out.a, out.len, o.length)
          out.len += o.length
          mlen -= o.length
        }
      }
    }
    distIdx
  }

  // ---------------------------------------------------------- dictionary

  /** Words-per-length exponents and offsets (RFC 7932 Appendix A). */
  private val DictSizeBits = Array(0, 0, 0, 0, 10, 10, 11, 11, 10, 10,
    10, 10, 10, 9, 9, 8, 7, 7, 8, 7, 7, 6, 6, 5, 5)
  private val DictOffsets = Array(0, 0, 0, 0, 0, 4096, 9216, 21504,
    35840, 44032, 53248, 63488, 74752, 87040, 93696, 100864, 104704,
    106752, 108928, 113536, 115968, 118528, 119872, 121280, 122016)

  private lazy val Dictionary: Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      getClass.getResourceAsStream("/graft/brotli_dictionary.bin.gz"))
    try in.readAllBytes() finally in.close()
  }

  /** Transform list (RFC 7932 Appendix B): (prefix, type, suffix).
    * Types: 0 identity; 1–9 omit-last-N; 10 ferment-first; 11
    * ferment-all; 12–20 omit-first-N (19, omit-first-8, is unused).
    * Strings are ISO-8859-1-escaped byte sequences (transform 102's
    * prefix is the UTF-8 no-break space).
    */
  private lazy val Transforms: Array[(Array[Byte], Int, Array[Byte])] = {
    def b(s: String) = s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    TransformSpec.map { case (p, t, sf) => (b(p), t, b(sf)) }
  }

  private def transformWord(word: Array[Byte], idx: Int): Array[Byte] = {
    val (prefix, typ, suffix) = Transforms(idx)
    var w = word
    if (typ >= 12) { // omit-first-N
      val n = typ - 11
      w = if (n >= w.length) Array.emptyByteArray
      else java.util.Arrays.copyOfRange(w, n, w.length)
    } else if (typ >= 1 && typ <= 9) { // omit-last-N
      val n = typ
      w = if (n >= w.length) Array.emptyByteArray
      else java.util.Arrays.copyOf(w, w.length - n)
    } else if (typ == 10 || typ == 11) {
      w = w.clone()
      var i = 0
      var done = false
      while (i < w.length && !done) {
        val c = w(i) & 0xff
        if (c < 192) {
          if (c >= 'a' && c <= 'z') w(i) = (c ^ 32).toByte
          i += 1
        } else if (c < 224) {
          if (i + 1 < w.length) w(i + 1) = (w(i + 1) ^ 32).toByte
          i += 2
        } else {
          if (i + 2 < w.length) w(i + 2) = (w(i + 2) ^ 5).toByte
          i += 3
        }
        if (typ == 10) done = true // ferment-first: one step only
      }
    }
    val o = new Array[Byte](prefix.length + w.length + suffix.length)
    System.arraycopy(prefix, 0, o, 0, prefix.length)
    System.arraycopy(w, 0, o, prefix.length, w.length)
    System.arraycopy(suffix, 0, o, prefix.length + w.length, suffix.length)
    o
  }

  // -------------------------------------------------------------- encode

  /** Writer twin: a valid brotli stream of UNCOMPRESSED meta-blocks
    * (window bits 22, ≤4 MB per block, closed by an empty last block) —
    * the store mode of the format; any conformant decoder reproduces
    * `bytes` exactly.
    */
  def encode(bytes: Array[Byte]): Array[Byte] = {
    val bw = new Bw(bytes.length + 64 + bytes.length / (1 << 22) * 8)
    // WBITS 22: '1' then 3-bit n = 5
    bw.write(1, 1)
    bw.write(5, 3)
    var pos = 0
    while (pos < bytes.length) {
      val n = math.min(1 << 22, bytes.length - pos)
      bw.write(0, 1) // ISLAST = 0
      // MNIBBLES: smallest of 4/5/6 that fits n-1
      val nibbles =
        if (n - 1 < (1 << 16)) 4 else if (n - 1 < (1 << 20)) 5 else 6
      bw.write(nibbles - 4, 2)
      bw.write(n - 1, 4 * nibbles)
      bw.write(1, 1) // ISUNCOMPRESSED
      bw.alignByte()
      bw.writeBytes(bytes, pos, n)
      pos += n
    }
    bw.write(1, 1) // ISLAST
    bw.write(1, 1) // ISLASTEMPTY
    bw.alignByte()
    bw.toArray
  }

  private final class Bw(sizeHint: Int) {
    private var a = new Array[Byte](math.max(64, sizeHint))
    private var bitPos = 0L
    private def ensure(nBytes: Int): Unit = {
      val need = (bitPos >>> 3).toInt + nBytes + 1
      if (need > a.length) {
        var cap = a.length
        while (cap < need) cap *= 2
        a = java.util.Arrays.copyOf(a, cap)
      }
    }
    def write(v: Int, n: Int): Unit = {
      ensure(5)
      var i = 0
      while (i < n) {
        if (((v >>> i) & 1) != 0)
          a((bitPos >>> 3).toInt) = (a((bitPos >>> 3).toInt) |
            (1 << (bitPos & 7).toInt)).toByte
        bitPos += 1
        i += 1
      }
    }
    def alignByte(): Unit = bitPos = (bitPos + 7) & ~7L
    def writeBytes(b: Array[Byte], off: Int, n: Int): Unit = {
      require((bitPos & 7) == 0)
      ensure(n)
      System.arraycopy(b, off, a, (bitPos >>> 3).toInt, n)
      bitPos += n.toLong * 8
    }
    def toArray: Array[Byte] =
      java.util.Arrays.copyOf(a, ((bitPos + 7) >>> 3).toInt)
  }

  // ------------------------------------------------- normative tables

  /** Context lookup table (RFC 7932 section 7.1): 4 modes × (256 p1 +
    * 256 p2) = 2048 bytes; `ctx = lut[mode<<9 | p1] | lut[mode<<9 | 256 | p2]`.
    */
  private lazy val CtxLut: Array[Byte] =
    java.util.Base64.getMimeDecoder.decode(CtxLutB64)

  private val CtxLutB64: String =
    "AAECAwQFBgcICQoLDA0ODxAREhMUFRYXGBkaGxwdHh8gISIjJCUmJygpKissLS4vMDEyMzQ1Njc4" +
    "OTo7PD0+PwABAgMEBQYHCAkKCwwNDg8QERITFBUWFxgZGhscHR4fICEiIyQlJicoKSorLC0uLzAx" +
    "MjM0NTY3ODk6Ozw9Pj8AAQIDBAUGBwgJCgsMDQ4PEBESExQVFhcYGRobHB0eHyAhIiMkJSYnKCkq" +
    "KywtLi8wMTIzNDU2Nzg5Ojs8PT4/AAECAwQFBgcICQoLDA0ODxAREhMUFRYXGBkaGxwdHh8gISIj" +
    "JCUmJygpKissLS4vMDEyMzQ1Njc4OTo7PD0+PwAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
    "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
    "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
    "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
    "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
    "AAAAAQEBAQICAgIDAwMDBAQEBAUFBQUGBgYGBwcHBwgICAgJCQkJCgoKCgsLCwsMDAwMDQ0NDQ4O" +
    "Dg4PDw8PEBAQEBERERESEhISExMTExQUFBQVFRUVFhYWFhcXFxcYGBgYGRkZGRoaGhobGxsbHBwc" +
    "HB0dHR0eHh4eHx8fHyAgICAhISEhIiIiIiMjIyMkJCQkJSUlJSYmJiYnJycnKCgoKCkpKSkqKioq" +
    "KysrKywsLCwtLS0tLi4uLi8vLy8wMDAwMTExMTIyMjIzMzMzNDQ0NDU1NTU2NjY2Nzc3Nzg4ODg5" +
    "OTk5Ojo6Ojs7Ozs8PDw8PT09PT4+Pj4/Pz8/AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
    "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
    "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
    "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
    "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
    "AAAAAAAAAAQEAAAEAAAAAAAAAAAAAAAAAAAAAAAACAwQDAwUDBAYHAwMIAwkDCwsLCwsLCwsLCwg" +
    "IBgoHAwMMDQ0NDA0NDQwNDQ0NDQwNDQ0NDQwNDQ0NDQYDBwMDAw4PDw8ODw8PDg8PDw8PDg8PDw8" +
    "PDg8PDw8PBgMHAwAAAEAAQABAAEAAQABAAEAAQABAAEAAQABAAEAAQABAAEAAQABAAEAAQABAAEA" +
    "AQABAAEAAQABAAEAAQABAAEAAQIDAgMCAwIDAgMCAwIDAgMCAwIDAgMCAwIDAgMCAwIDAgMCAwID" +
    "AgMCAwIDAgMCAwIDAgMCAwIDAgMCAwIDAgMAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
    "AAABAQEBAQEBAQEBAQEBAQECAgICAgICAgICAQEBAQEBAQICAgICAgICAgICAgICAgICAgICAgIC" +
    "AgICAQEBAQEBAwMDAwMDAwMDAwMDAwMDAwMDAwMDAwMDAwMBAQEBAAAAAAAAAAAAAAAAAAAAAAAA" +
    "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
    "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAAgI" +
    "CAgICAgICAgICAgICBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQ" +
    "EBAQEBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgY" +
    "GBgYGBgYGBgYGBggICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAg" +
    "ICAgICAgICAgICAgICAgICAgKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgo" +
    "KCgoKCgoKCgoMDAwMDAwMDAwMDAwMDAwOAABAQEBAQEBAQEBAQEBAQECAgICAgICAgICAgICAgIC" +
    "AgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgIDAwMDAwMDAwMDAwMDAwMDAwMDAwMDAwMD" +
    "AwMDAwMDAwMDAwMDAwMDAwMDAwMDAwMDAwMDAwMDAwMDAwMDAwMDBAQEBAQEBAQEBAQEBAQEBAQE" +
    "BAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAUFBQUFBQUFBQUF" +
    "BQUFBQUFBQUFBQUFBQUFBQUFBQUFBQUFBQUFBQUFBQUFBQUFBQYGBgYGBgYGBgYGBgYGBgc="

  private val TransformSpec: Array[(String, Int, String)] = Array(
    ("", 0, ""),
    ("", 0, " "),
    (" ", 0, " "),
    ("", 12, ""),
    ("", 10, " "),
    ("", 0, " the "),
    (" ", 0, ""),
    ("s ", 0, " "),
    ("", 0, " of "),
    ("", 10, ""),
    ("", 0, " and "),
    ("", 13, ""),
    ("", 1, ""),
    (", ", 0, " "),
    ("", 0, ", "),
    (" ", 10, " "),
    ("", 0, " in "),
    ("", 0, " to "),
    ("e ", 0, " "),
    ("", 0, "\""),
    ("", 0, "."),
    ("", 0, "\">"),
    ("", 0, "\n"),
    ("", 3, ""),
    ("", 0, "]"),
    ("", 0, " for "),
    ("", 14, ""),
    ("", 2, ""),
    ("", 0, " a "),
    ("", 0, " that "),
    (" ", 10, ""),
    ("", 0, ". "),
    (".", 0, ""),
    (" ", 0, ", "),
    ("", 15, ""),
    ("", 0, " with "),
    ("", 0, "'"),
    ("", 0, " from "),
    ("", 0, " by "),
    ("", 16, ""),
    ("", 17, ""),
    (" the ", 0, ""),
    ("", 4, ""),
    ("", 0, ". The "),
    ("", 11, ""),
    ("", 0, " on "),
    ("", 0, " as "),
    ("", 0, " is "),
    ("", 7, ""),
    ("", 1, "ing "),
    ("", 0, "\n\u0009"),
    ("", 0, ":"),
    (" ", 0, ". "),
    ("", 0, "ed "),
    ("", 20, ""),
    ("", 18, ""),
    ("", 6, ""),
    ("", 0, "("),
    ("", 10, ", "),
    ("", 8, ""),
    ("", 0, " at "),
    ("", 0, "ly "),
    (" the ", 0, " of "),
    ("", 5, ""),
    ("", 9, ""),
    (" ", 10, ", "),
    ("", 10, "\""),
    (".", 0, "("),
    ("", 11, " "),
    ("", 10, "\">"),
    ("", 0, "=\""),
    (" ", 0, "."),
    (".com/", 0, ""),
    (" the ", 0, " of the "),
    ("", 10, "'"),
    ("", 0, ". This "),
    ("", 0, ","),
    (".", 0, " "),
    ("", 10, "("),
    ("", 10, "."),
    ("", 0, " not "),
    (" ", 0, "=\""),
    ("", 0, "er "),
    (" ", 11, " "),
    ("", 0, "al "),
    (" ", 11, ""),
    ("", 0, "='"),
    ("", 11, "\""),
    ("", 10, ". "),
    (" ", 0, "("),
    ("", 0, "ful "),
    (" ", 10, ". "),
    ("", 0, "ive "),
    ("", 0, "less "),
    ("", 11, "'"),
    ("", 0, "est "),
    (" ", 10, "."),
    ("", 11, "\">"),
    (" ", 0, "='"),
    ("", 10, ","),
    ("", 0, "ize "),
    ("", 11, "."),
    ("\u00c2\u00a0", 0, ""),
    (" ", 0, ","),
    ("", 10, "=\""),
    ("", 11, "=\""),
    ("", 0, "ous "),
    ("", 11, ", "),
    ("", 10, "='"),
    (" ", 10, ","),
    (" ", 11, "=\""),
    (" ", 11, ", "),
    ("", 11, ","),
    ("", 11, "("),
    ("", 11, ". "),
    (" ", 11, "."),
    ("", 11, "='"),
    (" ", 11, ". "),
    (" ", 10, "=\""),
    (" ", 11, "='"),
    (" ", 10, "='"))
}
