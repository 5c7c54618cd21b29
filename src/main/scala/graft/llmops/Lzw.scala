package graft.llmops

/** LZW `.Z` — the `compress(1)` format (magic `0x1F 0x9D`), the original
  * Unix archive codec and HTTP's `Content-Encoding: compress/x-compress`.
  * Old web archives and FTP mirrors still serve it, and its magic makes
  * it the SEVENTH sniffable member of the codec family. From-scratch
  * JDK-only pair implementing the ncompress wire format exactly:
  *
  *  - header: magic, then a flag byte — bits 0–4 max code width
  *    (9–16), bit 7 block mode (code 256 = CLEAR, first dynamic code
  *    257); bits 5–6 must be zero,
  *  - LZW codes packed LSB-first, width growing from 9 as the
  *    dictionary fills; THE PADDING QUIRK: the writer emits codes in
  *    groups of eight (one group = `width` bytes), so on every width
  *    change and every CLEAR the reader must skip to the next multiple
  *    of `width * 8` bits — the bug-compatible rule every decoder
  *    (gzip's unlzw, ncompress) implements,
  *  - at the max width the dictionary freezes until a CLEAR resets it
  *    to the 256 single-byte roots.
  *
  * [[decode]] refuses (`null`) on: bad magic/flag, a code beyond the
  * next free slot (the KwKwK rule admits exactly `next`), CLEAR in
  * non-block streams, truncation mid-code group, or output past the
  * 64 MB cap. [[encode]] is a REAL compressor (greedy longest-match via
  * a chained hash table, block mode, CLEAR on dictionary-full) whose
  * output `uncompress`/`zcat` accept — the interop direction available
  * offline (nothing in this sandbox can CREATE `.Z`, so the decode
  * direction is validated against the twin plus mutation fuzz; the
  * format is frozen since 1985, the twin IS the reference shape).
  */
object Lzw {

  private final val MaxOut = 64 << 20
  private final val Magic0 = 0x1f
  private final val Magic1 = 0x9d
  private final val BlockModeFlag = 0x80
  private final val MaxBitsMask = 0x1f
  private final val Clear = 256

  def isCompressed(b: Array[Byte]): Boolean =
    b != null && b.length >= 3 && (b(0) & 0xff) == Magic0 &&
      (b(1) & 0xff) == Magic1

  /** Decode a complete `.Z` stream; null on any corruption. */
  def decode(b: Array[Byte]): Array[Byte] =
    try decode0(b)
    catch { case scala.util.control.NonFatal(_) => null }

  private def decode0(b: Array[Byte]): Array[Byte] = {
    if (!isCompressed(b)) return null
    val flags = b(2) & 0xff
    val maxBits = flags & MaxBitsMask
    val blockMode = (flags & BlockModeFlag) != 0
    if (maxBits < 9 || maxBits > 16 || (flags & 0x60) != 0) return null
    if (b.length == 3) return Array.emptyByteArray

    val maxCodes = 1 << maxBits
    // dictionary as (prefix code, appended byte); roots are implicit
    val prefix = new Array[Int](maxCodes)
    val suffix = new Array[Byte](maxCodes)
    var next = if (blockMode) Clear + 1 else Clear
    var width = 9
    var posBits = 3L * 8
    var epochStart = posBits // group boundaries restart at every width
                             // change and CLEAR (gzip unlzw resetbuf)

    val endBits = b.length.toLong * 8
    val out = new java.io.ByteArrayOutputStream(math.min(
      MaxOut, math.max(64, b.length * 3)))
    val stack = new Array[Byte](maxCodes + 1)

    def readCode(): Int = {
      if (posBits + width > endBits) return -1
      val byteIdx = (posBits >>> 3).toInt
      var v = 0
      var i = 0
      while (i < 3) {
        if (byteIdx + i < b.length) v |= (b(byteIdx + i) & 0xff) << (8 * i)
        i += 1
      }
      val code = (v >>> (posBits & 7).toInt) & ((1 << width) - 1)
      posBits += width
      code
    }

    /** The ncompress group rule: codes travel in groups of eight (one
      * group = `width` bytes); width changes and CLEARs skip to the
      * next group boundary MEASURED FROM THE CURRENT EPOCH's start —
      * the epoch restarts at every width change and CLEAR (gzip's
      * unlzw resets its bit position there), NOT from the header.
      */
    def skipToGroupBoundary(): Unit = {
      val groupBits = width.toLong * 8
      val rem = (posBits - epochStart) % groupBits
      if (rem != 0) posBits += groupBits - rem
      epochStart = posBits
    }

    var prevCode = -1
    var firstByte = 0: Byte
    var done = false
    while (!done) {
      val code0 = readCode()
      if (code0 < 0) done = true
      else if (blockMode && code0 == Clear) {
        skipToGroupBoundary()
        next = Clear + 1
        width = 9
        prevCode = -1
      } else {
        var code = code0
        if (code > next || (code == next && prevCode < 0)) return null
        var sp = 0
        if (code == next) { // KwKwK: prev + first byte of prev
          stack(sp) = firstByte; sp += 1
          code = prevCode
        }
        while (code >= 256) {
          stack(sp) = suffix(code); sp += 1
          code = prefix(code)
        }
        firstByte = code.toByte
        stack(sp) = firstByte; sp += 1
        if (out.size() + sp > MaxOut) return null
        while (sp > 0) { sp -= 1; out.write(stack(sp)) }
        if (prevCode >= 0 && next < maxCodes) {
          prefix(next) = prevCode
          suffix(next) = firstByte
          next += 1
          // width grows when the NEXT code to assign no longer fits —
          // with the group-boundary skip at the moment of the bump
          if (next == (1 << width) && width < maxBits) {
            skipToGroupBoundary()
            width += 1
          }
        }
        prevCode = code0
      }
    }
    out.toByteArray
  }

  /** REAL compressor twin: greedy longest-match LZW in block mode at
    * max width 16, CLEAR + reset when the dictionary fills (the
    * ncompress policy simplified: always reset rather than monitoring
    * the ratio — both are conformant streams).
    */
  def encode(data: Array[Byte]): Array[Byte] = {
    val maxBits = 16
    val maxCodes = 1 << maxBits
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length / 2))
    out.write(Magic0); out.write(Magic1)
    out.write(BlockModeFlag | maxBits)

    var width = 9
    var bitBuf = 0L
    var nBits = 0
    var epochBits = 0L // bits since the last width change / CLEAR —
                       // group boundaries are epoch-relative

    def putCode(c: Int): Unit = {
      bitBuf |= c.toLong << nBits
      nBits += width
      epochBits += width
      while (nBits >= 8) {
        out.write((bitBuf & 0xff).toInt)
        bitBuf >>>= 8
        nBits -= 8
      }
    }
    def padToGroup(): Unit = {
      val groupBits = width.toLong * 8
      val rem = epochBits % groupBits
      if (rem != 0) {
        var pad = groupBits - rem
        while (pad >= 8) { // zero bits, byte at a time via the buffer
          nBits += 8
          while (nBits >= 8) {
            out.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; nBits -= 8
          }
          pad -= 8
        }
        if (pad > 0) { nBits += pad.toInt }
        while (nBits >= 8) {
          out.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; nBits -= 8
        }
      }
      epochBits = 0
    }

    // dictionary: hash of (prefixCode, byte) -> code, chained
    val hashSize = 1 << 17
    val hashHead = new Array[Int](hashSize)
    val hashNext = new Array[Int](maxCodes)
    val entPrefix = new Array[Int](maxCodes)
    val entByte = new Array[Byte](maxCodes)
    var next = Clear + 1

    def resetDict(): Unit = {
      java.util.Arrays.fill(hashHead, -1)
      next = Clear + 1
    }
    def find(p: Int, c: Byte): Int = {
      val h = ((p * 599479) ^ ((c & 0xff) * 2654435761L).toInt)
        .&(hashSize - 1)
      var e = hashHead(h)
      while (e >= 0) {
        if (entPrefix(e) == p && entByte(e) == c) return e
        e = hashNext(e)
      }
      -1
    }
    def add(p: Int, c: Byte): Unit = {
      val h = ((p * 599479) ^ ((c & 0xff) * 2654435761L).toInt)
        .&(hashSize - 1)
      entPrefix(next) = p; entByte(next) = c
      hashNext(next) = hashHead(h); hashHead(h) = next
      next += 1
    }

    resetDict()
    if (data.isEmpty) return out.toByteArray
    var cur = data(0) & 0xff
    var i = 1
    while (i < data.length) {
      val c = data(i)
      val e = find(cur, c)
      if (e >= 0) cur = e
      else {
        putCode(cur)
        // compress(1) order: the width check sits between emitting the
        // code and adding its entry (output() tests free_ent > maxcode
        // BEFORE the caller's free_ent++) — this is what keeps the
        // encoder and the one-entry-behind decoder bumping at the same
        // stream position (decoder: before reading the following code)
        if (next > (1 << width) - 1 && width < maxBits) {
          padToGroup()
          width += 1
        }
        if (next < maxCodes) add(cur, c)
        else {
          putCode(Clear)
          padToGroup()
          width = 9
          resetDict()
        }
        cur = data(i) & 0xff
      }
      i += 1
    }
    putCode(cur)
    if (nBits > 0) out.write((bitBuf & 0xff).toInt)
    out.toByteArray
  }
}
