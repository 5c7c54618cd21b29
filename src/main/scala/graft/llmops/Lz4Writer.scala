package graft.llmops

/** lz4 frame encoder — writer twin of [[Lz4]] and a REAL compressor: a
  * greedy hash-chain-free match finder over the standard 4-byte probe
  * table, the exact algorithm family of the reference fast compressor
  * (one probe per position, 16-bit offsets). Frames carry content size
  * and content checksum so the decoder's verification paths are
  * exercised by every twin fixture.
  */
object Lz4Writer {

  /** Compress one block (raw sequence format). Spec constraints honored:
    * the last 5 bytes are literals; no match starts within the last 12.
    */
  private[llmops] def encodeBlock(src: Array[Byte]): Array[Byte] = {
    val n = src.length
    val out = new java.io.ByteArrayOutputStream(n + n / 250 + 16)
    val hashLog = 16
    val table = new Array[Int](1 << hashLog) // position + 1; 0 = empty
    def hash(i: Int): Int = {
      val v = (src(i) & 0xff) | ((src(i + 1) & 0xff) << 8) |
        ((src(i + 2) & 0xff) << 16) | ((src(i + 3) & 0xff) << 24)
      (v * 0x9E3779B1) >>> (32 - hashLog)
    }
    def writeLen(extra: Int): Unit = {
      var e = extra
      while (e >= 255) { out.write(255); e -= 255 }
      out.write(e)
    }
    var anchor = 0
    var i = 0
    val matchLimit = n - 12 // last match must not start past here
    while (i < matchLimit && i + 4 <= n) {
      val h = hash(i)
      val cand = table(h) - 1
      table(h) = i + 1
      val ok = cand >= 0 && i - cand <= 0xffff &&
        src(cand) == src(i) && src(cand + 1) == src(i + 1) &&
        src(cand + 2) == src(i + 2) && src(cand + 3) == src(i + 3)
      if (!ok) i += 1
      else {
        var mLen = 4
        val hardEnd = n - 5 // leave the final 5 bytes as literals
        while (i + mLen < hardEnd && src(cand + mLen) == src(i + mLen)) mLen += 1
        val litLen = i - anchor
        val token = (math.min(litLen, 15) << 4) | math.min(mLen - 4, 15)
        out.write(token)
        if (litLen >= 15) writeLen(litLen - 15)
        out.write(src, anchor, litLen)
        val offset = i - cand
        out.write(offset & 0xff)
        out.write((offset >>> 8) & 0xff)
        if (mLen - 4 >= 15) writeLen(mLen - 4 - 15)
        i += mLen
        anchor = i
      }
    }
    // final literal run (token with zero match part)
    val litLen = n - anchor
    out.write(math.min(litLen, 15) << 4)
    if (litLen >= 15) writeLen(litLen - 15)
    out.write(src, anchor, litLen)
    out.toByteArray
  }

  private def wr32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
    out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
  }

  /** Encode a complete lz4 frame (64 KB blocks, content size + content
    * checksum present, block checksums on request).
    */
  def encode(data: Array[Byte], blockChecksums: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    wr32(out, 0x184D2204)
    val flg = 0x40 | 0x20 | 0x08 | 0x04 |
      (if (blockChecksums) 0x10 else 0) // v01, indep, csize, ccheck
    val bd = 4 << 4 // 64 KB max block
    val header = new java.io.ByteArrayOutputStream(16)
    header.write(flg); header.write(bd)
    var k = 0
    while (k < 8) { header.write(((data.length.toLong >>> (8 * k)) & 0xff).toInt); k += 1 }
    val hb = header.toByteArray
    out.write(hb, 0, hb.length)
    out.write((XxHash.xxh32(hb, 0, hb.length, 0) >>> 8) & 0xff)
    var off = 0
    while (off < data.length) {
      val len = math.min(64 * 1024, data.length - off)
      val chunk = java.util.Arrays.copyOfRange(data, off, off + len)
      val enc = encodeBlock(chunk)
      if (enc.length < len) {
        wr32(out, enc.length)
        out.write(enc, 0, enc.length)
        if (blockChecksums) wr32(out, XxHash.xxh32(enc, 0, enc.length, 0))
      } else { // stored block
        wr32(out, len | 0x80000000)
        out.write(chunk, 0, len)
        if (blockChecksums) wr32(out, XxHash.xxh32(chunk, 0, len, 0))
      }
      off += len
    }
    wr32(out, 0) // EndMark
    wr32(out, XxHash.xxh32(data, 0, data.length, 0))
    out.toByteArray
  }
}
