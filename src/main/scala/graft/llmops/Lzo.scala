package graft.llmops

/** LZO1X decompression, from scratch (the instruction encoding is
  * public — documented normatively in the Linux kernel's
  * `Documentation/lzo.txt` and implemented by every lzo1x codec):
  * opcode-dispatched literal runs and matches with 2-bit trailing
  * literal state, 255-chain extended lengths, and the distance-16384
  * end marker. This is the raw block stream — no lzop container, which
  * is exactly what ORC's LZO chunks carry (the last refused ORC codec;
  * [[Orc.decompressStream]] dispatches codec id 3 here).
  *
  * Safety posture of the untrusted-container family: every read is
  * bounds-checked, malformed streams return null (never throw, never
  * over-read), output is capped by the caller-provided bound.
  */
object Lzo {

  /** Decode one raw LZO1X stream; null on malformed input or output
    * beyond `maxOut`.
    */
  def decodeRaw(b: Array[Byte], off: Int, end: Int,
      maxOut: Int): Array[Byte] = {
    if (b == null || off < 0 || end > b.length || off >= end) return null
    // a growing window we can copy back-references from
    var window = new Array[Byte](math.min(maxOut, 1 << 16))
    var wlen = 0
    def ensure(n: Int): Boolean = {
      if (wlen + n > maxOut) return false
      if (wlen + n > window.length) {
        var cap = window.length
        while (cap < wlen + n) cap = math.min(maxOut, cap * 2)
        window = java.util.Arrays.copyOf(window, cap)
      }
      true
    }
    var ip = off
    def u8(): Int = { val v = b(ip) & 0xff; ip += 1; v }
    def has(n: Int): Boolean = ip + n <= end

    def copyLiterals(n: Int): Boolean = {
      if (!has(n) || !ensure(n)) return false
      System.arraycopy(b, ip, window, wlen, n)
      ip += n; wlen += n
      true
    }
    def copyMatch(dist: Int, len: Int): Boolean = {
      if (dist <= 0 || dist > wlen || !ensure(len)) return false
      var s = wlen - dist
      var d = wlen
      var k = 0
      while (k < len) { window(d) = window(s); s += 1; d += 1; k += 1 }
      wlen += len
      true
    }
    /** 255-chain: zeros add 255 each, the closing nonzero byte adds. */
    def extended(): Int = {
      var acc = 0
      var c = 0
      do {
        if (!has(1)) return -1
        c = u8()
        if (c == 0) {
          acc += 255
          if (acc > (1 << 26)) return -1 // runaway chain
        }
      } while (c == 0)
      acc + c
    }

    try {
      var state = 0
      // first-byte special: >17 starts with a literal run
      if ((b(ip) & 0xff) > 17) {
        val t = u8() - 17
        if (!copyLiterals(t)) return null
        state = if (t < 4) t else 4
      }
      var done = false
      while (!done) {
        if (!has(1)) return null
        val t = u8()
        if (t >= 64) {
          // 1-byte distance match: len 3..8
          if (!has(1)) return null
          val d = ((t >> 2) & 7) + (u8() << 3) + 1
          val len = (t >> 5) + 1
          if (!copyMatch(d, len)) return null
          state = t & 3
          if (state > 0 && !copyLiterals(state)) return null
        } else if (t >= 32) {
          // M3: distance ≤ 16384
          var len = t & 31
          if (len == 0) { val e = extended(); if (e < 0) return null
            len = 31 + e }
          len += 2
          if (!has(2)) return null
          val dd = u8() | (u8() << 8)
          val d = (dd >> 2) + 1
          if (!copyMatch(d, len)) return null
          state = dd & 3
          if (state > 0 && !copyLiterals(state)) return null
        } else if (t >= 16) {
          // M4: distance 16384..49151; d == 16384 ends the stream
          var len = t & 7
          if (len == 0) { val e = extended(); if (e < 0) return null
            len = 7 + e }
          len += 2
          if (!has(2)) return null
          val dd = u8() | (u8() << 8)
          val d = 16384 + ((t & 8) << 11) + (dd >> 2)
          if (d == 16384) {
            if (len != 3) return null // the end marker is exactly 17,0,0
            done = true
          } else {
            if (!copyMatch(d, len)) return null
            state = dd & 3
            if (state > 0 && !copyLiterals(state)) return null
          }
        } else { // t < 16
          if (state == 0) {
            var len = t
            if (len == 0) { val e = extended(); if (e < 0) return null
              len = 15 + e }
            len += 3
            if (!copyLiterals(len)) return null
            state = 4
          } else if (state < 4) {
            if (!has(1)) return null
            val d = (u8() << 2) + (t >> 2) + 1
            if (!copyMatch(d, 2)) return null
            state = t & 3
            if (state > 0 && !copyLiterals(state)) return null
          } else {
            if (!has(1)) return null
            val d = (u8() << 2) + (t >> 2) + 2049
            if (!copyMatch(d, 3)) return null
            state = t & 3
            if (state > 0 && !copyLiterals(state)) return null
          }
        }
      }
      java.util.Arrays.copyOf(window, wlen)
    } catch { case scala.util.control.NonFatal(_) => null }
  }
}
