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
  * match copy). Both block-INDEPENDENT (FLG bit 0x20 set) and
  * block-LINKED frames (bit clear — the LZ4F library default and
  * `lz4 -BD`, where matches reach into prior blocks' output) decode.
  * Skippable frames (0x184D2A50–5F) are stepped over like the spec
  * asks. Refusals (`null`): bad magic/version/reserved bits,
  * offset 0 or beyond the window, malformed sequences, truncation,
  * checksum mismatches, output beyond the 64 MB cap.
  */
object Lz4 {

  private final val MaxOut = 64 << 20

  /** Growable frame-output buffer shared by all blocks of one frame so
    * block-LINKED frames (FLG bit 0x20 clear — the LZ4F library default
    * and `lz4 -BD`) can resolve matches against prior blocks' output.
    */
  private final class FrameBuf(initial: Int) {
    var a: Array[Byte] = new Array[Byte](initial)
    var len: Int = 0
    def ensure(extra: Int, maxOut: Int): Boolean = {
      if (extra < 0 || extra > maxOut - len) return false
      if (len + extra > a.length) {
        var cap = math.max(a.length, 64)
        while (cap < len + extra) cap = math.min(maxOut, cap * 2)
        a = java.util.Arrays.copyOf(a, cap)
      }
      true
    }
  }

  /** Decode one lz4 BLOCK's sequences, appending to `fb`. Matches may
    * reach back to `windowStart`: 0 for block-linked frames (history =
    * all prior frame output), the block's own start offset for
    * block-independent frames. False on any malformed sequence.
    */
  private def decodeBlockInto(b: Array[Byte], off: Int, len: Int,
      fb: FrameBuf, windowStart: Int, maxOut: Int): Boolean = {
    var i = off
    val end = off + len
    while (i < end) {
      val token = b(i) & 0xff
      i += 1
      var litLen = token >>> 4
      if (litLen == 15) {
        var x = 255
        while (x == 255) {
          if (i >= end) return false
          x = b(i) & 0xff
          i += 1
          litLen += x
          if (litLen > maxOut) return false
        }
      }
      if (litLen > end - i || !fb.ensure(litLen, maxOut)) return false
      System.arraycopy(b, i, fb.a, fb.len, litLen)
      fb.len += litLen
      i += litLen
      if (i < end) {
        if (end - i < 2) return false
        val offset = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
        i += 2
        if (offset == 0 || offset > fb.len - windowStart) return false
        var mLen = (token & 0xf) + 4
        if ((token & 0xf) == 15) {
          var x = 255
          while (x == 255) {
            if (i >= end) return false
            x = b(i) & 0xff
            i += 1
            mLen += x
            if (mLen > maxOut) return false
          }
        }
        if (!fb.ensure(mLen, maxOut)) return false
        val s = fb.len - offset
        var k = 0
        while (k < mLen) { fb.a(fb.len + k) = fb.a(s + k); k += 1 }
        fb.len += mLen
      }
    }
    true
  }

  /** One raw lz4 BLOCK (no frame envelope) → bytes, null on malformed —
    * the bare-block form ORC and Hadoop containers embed.
    */
  def decodeRawBlock(b: Array[Byte], off: Int, len: Int,
      maxOut: Int): Array[Byte] = {
    if (b == null || off < 0 || len < 0 || off + len > b.length) return null
    val fb = new FrameBuf(math.min(math.max(len * 3, 64), maxOut))
    if (!decodeBlockInto(b, off, len, fb, 0, maxOut)) null
    else java.util.Arrays.copyOf(fb.a, fb.len)
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
    val blockIndep = (flg & 0x20) != 0
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
    val budget = MaxOut - out.size() // frames concatenate into `out`
    val fb = new FrameBuf(math.min(budget, 64 << 10))
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
          if (!fb.ensure(sz, budget)) return -1
          System.arraycopy(b, i, fb.a, fb.len, sz)
          fb.len += sz
        } else {
          val windowStart = if (blockIndep) fb.len else 0
          if (!decodeBlockInto(b, i, sz, fb, windowStart, budget)) return -1
        }
        i += sz
        if (blockChecksum) {
          if (i + 4 > b.length) return -1
          if (rd32(b, i) != XxHash.xxh32(b, i - sz, sz, 0)) return -1
          i += 4
        }
      }
    }
    if (contentSize >= 0 && fb.len != contentSize) return -1
    if (contentChecksum) {
      if (i + 4 > b.length) return -1
      if (rd32(b, i) != XxHash.xxh32(fb.a, 0, fb.len, 0)) return -1
      i += 4
    }
    out.write(fb.a, 0, fb.len)
    i
  }
}
