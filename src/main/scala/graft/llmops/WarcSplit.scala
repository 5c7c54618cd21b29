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
      // reads past EOF must THROW (callers catch → null), never hand
      // back stale buffer capacity — an FNAME scan on a truncated
      // member would otherwise walk garbage
      if (abs >= fileLen) throw new ArrayIndexOutOfBoundsException
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

  /** Range walk over per-record ZSTD archives (the IIPC `.warc.zst`
    * convention: one frame per record, optionally a leading skippable
    * dictionary frame). Same discipline as the gzip walk: a task's
    * first member is the first data-frame magic in its range that
    * decodes STRUCTURALLY end-to-end (4-byte magic + full block-chain
    * decode — with the checksum verified when present), then frames
    * chain sequentially; skippable frames pass through silently.
    */
  def walkZstRange(in: org.apache.hadoop.fs.FSDataInputStream, start: Long,
      end: Long, fileLen: Long,
      dict: Zstd.Dict): Iterator[(Long, Array[Byte])] = {
    val win = new Window(in, start, fileLen)
    val members = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Byte])]
    // candidates are data-frame OR skippable magics (an archive can open
    // with its dictionary frame, and a dictionary payload may itself be
    // a zstd frame — chaining through the skippable is what keeps that
    // inner magic from being mistaken for a member). A candidate proves
    // itself only when its chain reaches a DATA member that STARTS in
    // this range; one that first reaches a data member beyond the range
    // belongs to the next task.
    var pos = -1L
    var cand = findZstCandidate(win, start, end)
    while (pos < 0 && cand >= 0) {
      var p = cand
      var candEnd = cand + 1 // resume point if this candidate fails:
                             // past its own frame when that decoded (a
                             // skippable's PAYLOAD must not be rescanned
                             // — a wrapped dictionary is a valid frame)
      var dataOff = -1L
      var data: Array[Byte] = null
      var failed = false
      while (dataOff < 0 && !failed) {
        zstFrameAt(win, p, dict) match {
          case null => failed = true
          case (bytes, next) =>
            if (p == cand) candEnd = next
            if (bytes.nonEmpty) { dataOff = p; data = bytes }
            p = next
            if (dataOff < 0 && (p >= win.fileLen || p >= end)) failed = true
        }
      }
      if (dataOff >= 0 && dataOff < end) {
        members += ((dataOff, data))
        pos = p
      } else if (dataOff >= end) {
        cand = -1 // the next task owns that member; nothing earlier left
      } else {
        // A FAILED chain from a MID-FILE skippable magic is almost
        // surely a false 4-byte match in boundary garbage — its random
        // 4-byte "size" would skip a span that may hold the range's
        // true first member (silent record loss). Only the
        // archive-HEAD skippable (the dictionary wrapper at offset 0)
        // earns the skip-past-payload resume that protects a wrapped
        // dictionary's inner frame from rescanning; elsewhere resume
        // from the next byte.
        val resume = if (cand == 0L) candEnd else cand + 1
        cand = findZstCandidate(win, resume, end)
      }
    }
    var walking = pos >= 0
    while (walking && pos < end && pos < fileLen) {
      zstFrameAt(win, pos, dict) match {
        case null => walking = false
        case (bytes, next) =>
          if (bytes.nonEmpty) members += ((pos, bytes))
          pos = next
      }
    }
    members.iterator
  }

  private def findZstCandidate(win: Window, from: Long, end: Long): Long = {
    var i = math.max(from, win.base)
    val lim = math.min(end, win.fileLen - 3)
    while (i < lim) {
      val b0 = win.get(i)
      if ((b0 == 0x28 || (b0 >= 0x50 && b0 <= 0x5F)) &&
        win.get(i + 1) == (if (b0 == 0x28) 0xB5 else 0x2A) &&
        win.get(i + 2) == (if (b0 == 0x28) 0x2F else 0x4D) &&
        win.get(i + 3) == (if (b0 == 0x28) 0xFD else 0x18)) return i
      i += 1
    }
    -1L
  }

  /** [[Zstd.frameAt]] against the window: the frame length is unknown
    * until decoded, so truncation retries with a doubled span until the
    * file end backs the refusal.
    */
  private def zstFrameAt(win: Window, off: Long,
      dict: Zstd.Dict): (Array[Byte], Long) = {
    // span cap: a legitimate member is ≤ 64 MB decoded, so its frame
    // cannot exceed ~64 MB + headers compressed — without the cap a
    // corrupt multi-GB file would retry the copy all the way to EOF
    val maxSpan = (MaxMember.toLong + (1 << 20))
    var span = 1L << 16
    while (span <= maxSpan * 2) {
      val upto = math.min(off + math.min(span, maxSpan), win.fileLen)
      win.ensure(upto)
      val arr = java.util.Arrays.copyOfRange(win.buf, win.rel(off),
        win.rel(upto))
      val r = Zstd.frameAt(arr, 0, dict)
      if (r != null) return (r._1, off + r._2)
      if (upto >= win.fileLen || span >= maxSpan) return null
      span *= 2
    }
    null
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
