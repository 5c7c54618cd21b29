package graft.llmops

/** lz4 frame decoder — the fast member of the compressed-corpus family
  * (WARC payloads, shard caches and columnar side files commonly ship
  * lz4-framed). Reference hook: arbitrary-binary document ingestion,
  * `aje_libs/documents/helpers/document_processor.py:10-83`.
  *
  * Implemented: the full frame format (magic 0x184D2204, FLG/BD
  * descriptor with version check, optional content size, dictionary-id
  * refusal, xxh32 header-checksum byte VERIFIED), compressed and stored
  * blocks, optional per-block xxh32 checksums, EndMark, optional content
  * xxh32 — both checksums verified, not skipped; and the block format
  * (token nibbles, 255-extension lengths, 16-bit offsets, overlapping
  * match copy). Skippable frames (0x184D2A50–5F) are stepped over like
  * the spec asks. Refusals (`null`): bad magic/version/reserved bits,
  * offset 0 or beyond the window, malformed sequences, truncation,
  * checksum mismatches, output beyond the 64 MB cap.
  */
object Lz4 {

  private final val MaxOut = 64 << 20

  /** Decode one lz4 BLOCK (raw sequences) of known decompressed bound;
    * returns the output array or null.
    */
  private[llmops] def decodeBlock(b: Array[Byte], off: Int, len: Int,
      maxOut: Int): Array[Byte] = {
    var buf = new Array[Byte](math.min(maxOut, math.max(64, len * 4)))
    var nOut = 0
    def ensure(n: Int): Boolean = {
      if (n < 0 || nOut + n > maxOut) return false
      if (nOut + n > buf.length) {
        var cap = buf.length
        while (cap < nOut + n) cap = math.min(maxOut, cap * 2)
        buf = java.util.Arrays.copyOf(buf, cap)
      }
      true
    }
    var i = off
    val end = off + len
    while (i < end) {
      val token = b(i) & 0xff
      i += 1
      var litLen = token >>> 4
      if (litLen == 15) {
        var x = 255
        while (x == 255) {
          if (i >= end) return null
          x = b(i) & 0xff
          i += 1
          litLen += x
          if (litLen > maxOut) return null
        }
      }
      if (i + litLen > end || !ensure(litLen)) return null
      System.arraycopy(b, i, buf, nOut, litLen)
      nOut += litLen
      i += litLen
      if (i < end) {
        if (i + 2 > end) return null
        val offset = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
        i += 2
        if (offset == 0 || offset > nOut) return null
        var mLen = (token & 0xf) + 4
        if ((token & 0xf) == 15) {
          var x = 255
          while (x == 255) {
            if (i >= end) return null
            x = b(i) & 0xff
            i += 1
            mLen += x
            if (mLen > maxOut) return null
          }
        }
        if (!ensure(mLen)) return null
        var s = nOut - offset
        var k = 0
        while (k < mLen) { buf(nOut + k) = buf(s + k); k += 1 }
        nOut += mLen
      }
    }
    java.util.Arrays.copyOf(buf, nOut)
  }

  private def rd32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  /** Decompress a complete lz4 frame stream (frames may be concatenated,
    * skippable frames stepped over); null on any failure.
    */
  def decode(bytes: Array[Byte]): Array[Byte] = {
    if (bytes == null || bytes.length < 7) return null
    val out = new java.io.ByteArrayOutputStream(math.min(bytes.length * 3, 1 << 20))
    var i = 0
    var sawFrame = false
    while (i < bytes.length) {
      if (i + 4 > bytes.length) return if (sawFrame && allZero(bytes, i)) out.toByteArray else null
      val magic = rd32(bytes, i)
      if ((magic & 0xFFFFFFF0) == 0x184D2A50) { // skippable frame
        if (i + 8 > bytes.length) return null
        val sz = rd32(bytes, i + 4)
        if (sz < 0 || i + 8 + sz.toLong > bytes.length) return null
        i += 8 + sz
      } else if (magic == 0x184D2204) {
        sawFrame = true
        i = decodeFrame(bytes, i + 4, out)
        if (i < 0) return null
      } else if (magic == 0 && sawFrame && allZero(bytes, i)) {
        return out.toByteArray // trailing pad
      } else return null
    }
    if (!sawFrame) null else out.toByteArray
  }

  private def allZero(b: Array[Byte], from: Int): Boolean = {
    var i = from
    while (i < b.length) { if (b(i) != 0) return false; i += 1 }
    true
  }

  /** Body after the magic; returns offset past the frame or -1. */
  private def decodeFrame(b: Array[Byte], start: Int,
      out: java.io.ByteArrayOutputStream): Int = {
    var i = start
    if (i + 3 > b.length) return -1
    val flg = b(i) & 0xff
    val bd = b(i + 1) & 0xff
    if ((flg >>> 6) != 1) return -1 // version must be 01
    if ((flg & 0x02) != 0) return -1 // reserved bit
    val blockChecksum = (flg & 0x10) != 0
    val contentSizeFlag = (flg & 0x08) != 0
    val contentChecksum = (flg & 0x04) != 0
    val dictId = (flg & 0x01) != 0
    if ((bd & 0x8f) != 0) return -1 // reserved BD bits
    val bmsCode = (bd >>> 4) & 7
    if (bmsCode < 4) return -1
    val headerLen = 2 + (if (contentSizeFlag) 8 else 0) + (if (dictId) 4 else 0)
    if (i + headerLen + 1 > b.length) return -1
    if (dictId) return -1 // external dictionaries unsupported
    var contentSize = -1L
    if (contentSizeFlag) {
      contentSize = 0L
      var k = 0
      while (k < 8) {
        contentSize |= (b(i + 2 + k) & 0xffL) << (8 * k)
        k += 1
      }
      if (contentSize < 0 || contentSize > MaxOut) return -1
    }
    val hc = b(i + headerLen) & 0xff
    val expect = (XxHash.xxh32(b, i, headerLen, 0) >>> 8) & 0xff
    if (hc != expect) return -1
    i += headerLen + 1
    val before = out.size()
    var done = false
    while (!done) {
      if (i + 4 > b.length) return -1
      val word = rd32(b, i)
      i += 4
      if (word == 0) done = true
      else {
        val stored = (word & 0x80000000) != 0
        val sz = word & 0x7fffffff
        if (sz < 0 || sz > (4 << 20) || i + sz > b.length) return -1
        if (stored) {
          if (out.size() + sz > MaxOut) return -1
          out.write(b, i, sz)
        } else {
          val dec = decodeBlock(b, i, sz, MaxOut - out.size())
          if (dec == null) return -1
          out.write(dec, 0, dec.length)
        }
        i += sz
        if (blockChecksum) {
          if (i + 4 > b.length) return -1
          if (rd32(b, i) != XxHash.xxh32(b, i - sz, sz, 0)) return -1
          i += 4
        }
      }
    }
    val content = out.toByteArray // bounded by MaxOut
    val produced = content.length - before
    if (contentSize >= 0 && produced != contentSize) return -1
    if (contentChecksum) {
      if (i + 4 > b.length) return -1
      if (rd32(b, i) != XxHash.xxh32(content, before, produced, 0)) return -1
      i += 4
    }
    i
  }
}
