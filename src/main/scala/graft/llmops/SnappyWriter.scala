package graft.llmops

/** Snappy encoder — writer twin of [[Snappy]] and a REAL compressor:
  * the reference algorithm's greedy 4-byte hash-probe match finder over
  * 2-byte-offset copies, literals with extended lengths, emitted into
  * the framing format (64 KB chunks, masked CRC32C). Output decodes
  * with any snappy reader — the specs cross-check both directions
  * against snappy-java, the exact implementation Spark itself bundles.
  */
object SnappyWriter {

  /** Compress one raw block (complete format: varint length + elements). */
  def encodeRaw(src: Array[Byte]): Array[Byte] = {
    val n = src.length
    val out = new java.io.ByteArrayOutputStream(n / 2 + 16)
    // varint length
    var v = n
    while (v >= 0x80) { out.write((v & 0x7f) | 0x80); v >>>= 7 }
    out.write(v)
    def literal(from: Int, until: Int): Unit = {
      var s = from
      while (s < until) {
        val len = math.min(until - s, 1 << 16)
        val l = len - 1
        if (l < 60) out.write(l << 2)
        else if (l < 256) { out.write(60 << 2); out.write(l) }
        else { out.write(61 << 2); out.write(l & 0xff); out.write((l >>> 8) & 0xff) }
        out.write(src, s, len)
        s += len
      }
    }
    val hashLog = 14
    val table = new Array[Int](1 << hashLog) // pos + 1
    def hash(i: Int): Int = {
      val x = (src(i) & 0xff) | ((src(i + 1) & 0xff) << 8) |
        ((src(i + 2) & 0xff) << 16) | ((src(i + 3) & 0xff) << 24)
      (x * 0x9E3779B1) >>> (32 - hashLog)
    }
    var anchor = 0
    var i = 0
    while (i + 4 <= n) {
      val h = hash(i)
      val cand = table(h) - 1
      table(h) = i + 1
      val ok = cand >= 0 && i - cand <= 0xffff &&
        src(cand) == src(i) && src(cand + 1) == src(i + 1) &&
        src(cand + 2) == src(i + 2) && src(cand + 3) == src(i + 3)
      if (!ok) i += 1
      else {
        var mLen = 4
        while (i + mLen < n && src(cand + mLen) == src(i + mLen)) mLen += 1
        literal(anchor, i)
        val offset = i - cand
        // copy-2 elements carry 1..64 bytes; chain for longer matches
        var rest = mLen
        while (rest > 0) {
          val take = math.min(rest, 64)
          // avoid a trailing sub-4-byte copy (invalid for copy elements)
          val emit = if (rest - take != 0 && rest - take < 4) take - 4 else take
          out.write(((emit - 1) << 2) | 2)
          out.write(offset & 0xff)
          out.write((offset >>> 8) & 0xff)
          rest -= emit
        }
        i += mLen
        anchor = i
      }
    }
    literal(anchor, n)
    out.toByteArray
  }

  /** Framed stream: identifier + 64 KB compressed chunks (CRC32C). */
  def encode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    out.write(0xff); out.write(6); out.write(0); out.write(0)
    out.write("sNaPpY".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    var off = 0
    if (data.length == 0) return out.toByteArray
    while (off < data.length) {
      val len = math.min(1 << 16, data.length - off)
      val chunk = java.util.Arrays.copyOfRange(data, off, off + len)
      val crc = Snappy.maskedCrc(chunk, 0, len)
      val enc = encodeRaw(chunk)
      val (tpe, body) = if (enc.length < len) (0x00, enc) else (0x01, chunk)
      val total = body.length + 4
      out.write(tpe)
      out.write(total & 0xff); out.write((total >>> 8) & 0xff)
      out.write((total >>> 16) & 0xff)
      out.write(crc & 0xff); out.write((crc >>> 8) & 0xff)
      out.write((crc >>> 16) & 0xff); out.write((crc >>> 24) & 0xff)
      out.write(body, 0, body.length)
      off += len
    }
    out.toByteArray
  }
}
