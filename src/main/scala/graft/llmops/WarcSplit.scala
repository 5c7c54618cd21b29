package graft.llmops

/** Worker side of [[Warc.splitArchiveMembers]]: range walking over a
  * per-record-gzip archive. Candidates are cheap header matches; a
  * task's first member must fully inflate with a verified CRC-32 +
  * ISIZE trailer, after which members chain sequentially (each trailer
  * names the next member's offset). Eager per-range materialization —
  * the tasks' working set is roughly the decoded size of one range —
  * because the backing FS stream closes when the task's walk returns.
  */
private[llmops] object WarcSplit {

  private final val MaxMember = 64 << 20

  /** Growing window over `[base, fileLen)` backed by positional reads. */
  private final class Window(in: org.apache.hadoop.fs.FSDataInputStream,
      val base: Long, val fileLen: Long) {
    var buf = new Array[Byte](1 << 16)
    var have = 0 // bytes of [base, base+have) present

    def ensure(absUpto: Long): Unit = {
      val upto = math.min(absUpto, fileLen)
      val need = (upto - base).toInt
      if (need <= have) return
      if (need > buf.length) {
        var cap = buf.length
        while (cap < need) cap *= 2
        buf = java.util.Arrays.copyOf(buf, cap)
      }
      in.readFully(base + have, buf, have, need - have)
      have = need
    }

    def get(abs: Long): Int = {
      ensure(abs + 1)
      buf((abs - base).toInt) & 0xff
    }

    def rel(abs: Long): Int = (abs - base).toInt
  }

  def walkRange(in: org.apache.hadoop.fs.FSDataInputStream, start: Long,
      end: Long, fileLen: Long): Iterator[(Long, Array[Byte])] = {
    val win = new Window(in, start, fileLen)
    val members = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Byte])]
    // first member: first candidate in [start, end) that FULLY validates
    var pos = -1L
    var cand = findCandidate(win, start, end)
    while (pos < 0 && cand >= 0) {
      decodeMember(win, cand) match {
        case null => cand = findCandidate(win, cand + 1, end)
        case (bytes, next) =>
          members += ((cand, bytes))
          pos = next
      }
    }
    // then sequential: each trailer names the next member's offset
    var walking = pos >= 0
    while (walking && pos < end && pos < fileLen) {
      decodeMember(win, pos) match {
        case null => walking = false // corrupt tail: stop, never guess
        case (bytes, next) =>
          members += ((pos, bytes))
          pos = next
      }
    }
    members.iterator
  }

  /** Next `1f 8b 08` with zero reserved FLG bits in `[from, end)`. */
  private def findCandidate(win: Window, from: Long, end: Long): Long = {
    var i = math.max(from, win.base)
    val lim = math.min(end, win.fileLen - 3)
    while (i < lim) {
      if (win.get(i) == 0x1f && win.get(i + 1) == 0x8b &&
        win.get(i + 2) == 0x08 && (win.get(i + 3) & 0xE0) == 0) return i
      i += 1
    }
    -1L
  }

  /** Decode ONE gzip member at `off`: (decoded bytes, next offset), or
    * null on any malformation — header structure, deflate error,
    * truncation, CRC-32 or ISIZE mismatch, 64 MB cap.
    */
  private def decodeMember(win: Window, off: Long): (Array[Byte], Long) = {
    try {
      if (off + 10 > win.fileLen) return null
      if (win.get(off) != 0x1f || win.get(off + 1) != 0x8b ||
        win.get(off + 2) != 0x08) return null
      val flg = win.get(off + 3)
      if ((flg & 0xE0) != 0) return null
      var i = off + 10
      if ((flg & 4) != 0) { // FEXTRA
        val xlen = win.get(i) | (win.get(i + 1) << 8)
        i += 2 + xlen
      }
      if ((flg & 8) != 0) { // FNAME
        while (win.get(i) != 0) i += 1
        i += 1
      }
      if ((flg & 16) != 0) { // FCOMMENT
        while (win.get(i) != 0) i += 1
        i += 1
      }
      if ((flg & 2) != 0) i += 2 // FHCRC
      if (i >= win.fileLen) return null

      val inf = new java.util.zip.Inflater(true)
      val out = new java.io.ByteArrayOutputStream(1 << 16)
      val tmp = new Array[Byte](1 << 16)
      var fed = i // absolute offset of the next byte to hand the inflater
      try {
        while (!inf.finished()) {
          if (inf.needsInput()) {
            val chunkEnd = math.min(fed + (1 << 16), win.fileLen)
            if (fed >= chunkEnd) return null // truncated member
            win.ensure(chunkEnd)
            inf.setInput(win.buf, win.rel(fed), (chunkEnd - fed).toInt)
            fed = chunkEnd
          }
          val n = inf.inflate(tmp)
          if (n > 0) {
            out.write(tmp, 0, n)
            if (out.size() > MaxMember) return null
          } else if (n == 0 && !inf.finished() && !inf.needsInput())
            return null // dictionary demand or stall: not a gzip member
        }
        val dataEnd = i + inf.getBytesRead
        if (dataEnd + 8 > win.fileLen) return null
        val body = out.toByteArray
        val crc = new java.util.zip.CRC32
        crc.update(body)
        var tcrc = 0L
        var tisz = 0L
        var k = 0
        while (k < 4) {
          tcrc |= win.get(dataEnd + k).toLong << (8 * k)
          tisz |= win.get(dataEnd + 4 + k).toLong << (8 * k)
          k += 1
        }
        if (tcrc != crc.getValue) return null
        if (tisz != (body.length.toLong & 0xFFFFFFFFL)) return null
        (body, dataEnd + 8)
      } finally inf.end()
    } catch {
      case _: java.util.zip.DataFormatException => null
      case _: java.io.IOException => null
      case _: ArrayIndexOutOfBoundsException => null
    }
  }
}
