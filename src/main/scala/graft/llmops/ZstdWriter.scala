package graft.llmops

/** zstd frame writer — the twin of [[Zstd]]. Emits spec-valid frames from
  * raw and RLE blocks (the format's stored modes — the same honest scope
  * as a stored-deflate writer): single-segment header with exact content
  * size, run detection into RLE blocks, 128 KB block ceiling, XXH64
  * content checksum. Any conformant zstd reader decodes the output; the
  * entropy-coded paths of the decoder are exercised by the reference-tool
  * fixtures rather than this twin.
  */
object ZstdWriter {

  private def wr32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
    out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
  }

  def encode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length + 64)
    wr32(out, 0xFD2FB528)
    // FHD: single-segment, checksum, FCS code by size
    val fcsCode =
      if (data.length < 256) 0
      else if (data.length - 256 < 65536) 1
      else 2
    out.write((fcsCode << 6) | 0x20 | 0x04)
    fcsCode match {
      case 0 => out.write(data.length)
      case 1 =>
        val v = data.length - 256
        out.write(v & 0xff); out.write((v >>> 8) & 0xff)
      case _ =>
        wr32(out, data.length)
    }
    val maxBlock = 128 * 1024
    var i = 0
    if (data.length == 0) {
      out.write(1); out.write(0); out.write(0) // last raw block, size 0
    }
    while (i < data.length) {
      // run detection: an RLE block when ≥32 identical bytes follow
      val b0 = data(i)
      var run = 1
      while (i + run < data.length && data(i + run) == b0 && run < maxBlock)
        run += 1
      val (btype, size) =
        if (run >= 32) (1, run)
        else {
          val end = math.min(data.length, i + maxBlock)
          // stop the raw block where a ≥32 run begins (it becomes RLE)
          var j = i + 1
          var runStart = i
          var cut = end
          while (j < end && cut == end) {
            if (data(j) == data(j - 1)) {
              if (j - runStart + 1 >= 32 && runStart > i) cut = runStart
            } else runStart = j
            j += 1
          }
          (0, math.max(1, cut - i))
        }
      val isLast = i + size >= data.length
      val hdr = (size << 3) | (btype << 1) | (if (isLast) 1 else 0)
      out.write(hdr & 0xff); out.write((hdr >>> 8) & 0xff)
      out.write((hdr >>> 16) & 0xff)
      if (btype == 1) out.write(b0)
      else out.write(data, i, size)
      i += size
    }
    wr32(out, (XxHash.xxh64(data, 0, data.length, 0L) & 0xFFFFFFFFL).toInt)
    out.toByteArray
  }
}
