package graft.llmops

/** Decoded Ogg Vorbis audio: interleaved samples (doubles in 16-bit-PCM
  * scale, the [[Mp3Pcm]] convention) for the audio fingerprint family.
  */
final class VorbisPcm(val channels: Int, val sampleRate: Int,
    val samples: Array[Double]) {
  def nFrames: Long = samples.length.toLong / channels
}

/** Ogg Vorbis decoder — the third compressed-audio arm beside
  * [[Mp3]] and [[Flac]], covering the dominant open web codec. Full
  * Vorbis I walk built on the public specification: Ogg page demux
  * (CRC-verified, packet reassembly across pages), the three headers
  * (identification, comment, setup with canonical-Huffman codebooks
  * and VQ lookups), floor type 1 (integer render_line curve math over
  * the inverse-dB amplitude table), residue types 0/1/2, square-polar
  * channel coupling, window/mode handling for equal AND unequal
  * blocksize pairs, inverse MDCT and spec lapping, with the final
  * granule position trimming the sample grid (what makes
  * encode(x).decode == x sample-aligned for the writer twin and the
  * WAV↔Ogg twin gate meaningful at Hamming 0).
  *
  * ==Honest envelope==
  * Refused with NULL (never half-decoded): non-Vorbis Ogg (Opus,
  * Theora, ...), floor type 0 (LSP synthesis — no in-sandbox stream
  * to validate against), chained/multiplexed physical streams beyond
  * the first logical stream, CRC-corrupt pages, codebook/header
  * structure violations, and outputs past the 64 MB cap. A corrupt
  * AUDIO packet mid-stream decodes as silence for its frame (the
  * stream stays aligned), matching the MP3 arm's recovery discipline.
  *
  * Reference surface: the document processor's binary media hooks
  * (aje_libs/documents/helpers/document_processor.py:10-83); the
  * reference delegates audio decode to external tooling the sandbox
  * does not have, so the engine carries its own.
  */
object Vorbis {

  private val MaxOutBytes = 64L * 1024 * 1024

  // ---------------------------------------------------------------- Ogg

  /** Ogg CRC-32: poly 0x04c11db7, MSB-first, init 0, no final xor. */
  private[llmops] val CrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i << 24
      var j = 0
      while (j < 8) {
        r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1
        j += 1
      }
      t(i) = r
      i += 1
    }
    t
  }

  private[llmops] def crc(b: Array[Byte], from: Int, len: Int,
      init: Int = 0): Int = {
    var c = init
    var i = from
    val end = from + len
    while (i < end) {
      c = (c << 8) ^ CrcTable(((c >>> 24) ^ (b(i) & 0xFF)) & 0xFF)
      i += 1
    }
    c
  }

  private final class Packets(val packets: Array[Array[Byte]],
      val lastGranule: Long)

  /** Demux the first logical stream: CRC-checked pages, lacing-value
    * packet reassembly (continued packets across pages included).
    * Null on structural failure; packets truncated at stream end are
    * dropped (an unterminated final packet never surfaces).
    */
  private def demux(b: Array[Byte]): Packets = {
    var pos = 0
    var serial = 0L
    var haveSerial = false
    var lastGranule = -1L
    val packets = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var pending: java.io.ByteArrayOutputStream = null
    var pageCount = 0
    while (pos + 27 <= b.length && pageCount < (1 << 20)) {
      if (!(b(pos) == 'O' && b(pos + 1) == 'g' && b(pos + 2) == 'g' &&
        b(pos + 3) == 'S')) return if (packets.isEmpty) null
      else new Packets(packets.toArray, lastGranule)
      if (b(pos + 4) != 0) return null // version
      val headerType = b(pos + 5) & 0xFF
      var granule = 0L
      var i = 0
      while (i < 8) {
        granule |= (b(pos + 6 + i) & 0xFFL) << (8 * i)
        i += 1
      }
      var ser = 0L
      i = 0
      while (i < 4) { ser |= (b(pos + 14 + i) & 0xFFL) << (8 * i); i += 1 }
      val nSegs = b(pos + 26) & 0xFF
      val bodyStart = pos + 27 + nSegs
      if (bodyStart > b.length) return null
      var bodyLen = 0
      i = 0
      while (i < nSegs) { bodyLen += b(pos + 27 + i) & 0xFF; i += 1 }
      if (bodyStart.toLong + bodyLen > b.length) return null
      // CRC over the whole page with the CRC field zeroed
      var c = crc(b, pos, 22)
      c = CrcTable((c >>> 24) & 0xFF) ^ (c << 8)
      c = CrcTable((c >>> 24) & 0xFF) ^ (c << 8)
      c = CrcTable((c >>> 24) & 0xFF) ^ (c << 8)
      c = CrcTable((c >>> 24) & 0xFF) ^ (c << 8)
      c = crc(b, pos + 26, 1 + nSegs + bodyLen, c)
      val stored = (b(pos + 22) & 0xFF) | ((b(pos + 23) & 0xFF) << 8) |
        ((b(pos + 24) & 0xFF) << 16) | ((b(pos + 25) & 0xFF) << 24)
      if (c != stored) return null
      if (!haveSerial) {
        if ((headerType & 2) == 0) return null // first page must be BOS
        serial = ser
        haveSerial = true
      }
      if (ser == serial) {
        if (granule >= 0) lastGranule = granule
        if ((headerType & 1) == 0 && pending != null)
          pending = null // continuation promised but flag absent: drop
        var off = bodyStart
        i = 0
        while (i < nSegs) {
          val lace = b(pos + 27 + i) & 0xFF
          if (pending == null) pending = new java.io.ByteArrayOutputStream()
          pending.write(b, off, lace)
          off += lace
          if (lace < 255) { // packet ends here
            packets += pending.toByteArray
            pending = null
          }
          i += 1
        }
      }
      pos = bodyStart + bodyLen
      pageCount += 1
    }
    if (packets.isEmpty) null else new Packets(packets.toArray, lastGranule)
  }

  // --------------------------------------------------- LSb-first reader

  private final class Bits(b: Array[Byte]) {
    private var pos = 0L
    private val end = b.length.toLong * 8
    var eof = false
    def read(n: Int): Int = {
      if (pos + n > end) { eof = true; return -1 }
      var v = 0
      var got = 0
      while (got < n) {
        val bi = (pos >> 3).toInt
        val bo = (pos & 7).toInt
        val take = math.min(8 - bo, n - got)
        v |= (((b(bi) & 0xFF) >> bo) & ((1 << take) - 1)) << got
        got += take
        pos += take
      }
      v
    }
    def read1(): Int = read(1)
    /** 32-bit read for the float32 pack (may set the sign bit). */
    def read32(): Long =
      (read(16).toLong & 0xFFFF) | ((read(16).toLong & 0xFFFF) << 16)
  }

  private def ilog(x0: Int): Int = {
    var x = x0
    var r = 0
    while (x > 0) { r += 1; x >>= 1 }
    r
  }

  private def float32Unpack(x: Long): Double = {
    val mantissa = (x & 0x1fffff).toDouble
    val e = ((x & 0x7fe00000L) >> 21).toInt
    val m = if ((x & 0x80000000L) != 0) -mantissa else mantissa
    m * math.pow(2.0, e - 788)
  }

  // ----------------------------------------------------------- codebook

  /** Canonical codeword assignment (spec 3.2.1): each used entry, in
    * ascending entry order, takes the lowest unused codeword of its
    * length ("first fit"). `marker(l)` tracks the next free codeword
    * of length l; taking one updates shorter markers when a subtree
    * closes and re-roots longer markers that lived under the taken
    * code. Returns MSB-first codes, or null when overpopulated.
    * Underpopulated trees are accepted at build time; the dead branch
    * refuses at decode (single-entry books decode legally).
    */
  private[llmops] def canonicalCodes(lengths: Array[Int]): Array[Long] = {
    val marker = new Array[Long](33)
    val codes = new Array[Long](lengths.length)
    var i = 0
    while (i < lengths.length) {
      val len = lengths(i)
      if (len > 0) {
        var entry = marker(len)
        if (len < 32 && (entry >>> len) != 0) return null // overfull
        codes(i) = entry
        var j = len
        var done = false
        while (j > 0 && !done) {
          if ((marker(j) & 1L) != 0) {
            // this branch just closed: re-root the marker one level up
            if (j == 1) marker(1) += 1
            else marker(j) = marker(j - 1) << 1
            done = true
          } else {
            marker(j) += 1
            j -= 1
          }
        }
        j = len + 1
        var prune = true
        while (j < 33 && prune) {
          if ((marker(j) >>> 1) == entry) {
            entry = marker(j)
            marker(j) = marker(j - 1) << 1
          } else prune = false
          j += 1
        }
      }
      i += 1
    }
    codes
  }

  private final class Codebook(
      val dims: Int,
      val entries: Int,
      val lengths: Array[Int], // 0 = unused entry
      val lookup: Array[Double] // null (lookup 0) or entries*dims values
  ) {
    // decode tree as flat arrays: node -> (left, right);
    // negative child = ~entry, 0 = empty slot. Built by following each
    // entry's canonical codeword bits — O(total codeword length).
    private val maxNodes = {
      var s = 2L
      var i = 0
      while (i < entries) { s += lengths(i); i += 1 }
      math.min(s, 1L << 26).toInt
    }
    private val left = new Array[Int](maxNodes)
    private val right = new Array[Int](maxNodes)
    private var nextNode = 1
    var valid = true
    locally {
      val codes = canonicalCodes(lengths)
      if (codes == null) valid = false
      else {
        var e = 0
        while (e < entries && valid) {
          val len = lengths(e)
          if (len > 0) {
            var node = 0
            var d = len - 1
            while (d >= 0 && valid) {
              val bit = ((codes(e) >>> d) & 1L).toInt
              val child = if (bit == 0) left(node) else right(node)
              if (d == 0) {
                if (child != 0) valid = false // duplicate leaf
                else if (bit == 0) left(node) = ~e else right(node) = ~e
              } else if (child < 0) valid = false // prefix collision
              else if (child == 0) {
                if (nextNode >= maxNodes) valid = false
                else {
                  if (bit == 0) left(node) = nextNode
                  else right(node) = nextNode
                  node = nextNode
                  nextNode += 1
                }
              } else node = child
              d -= 1
            }
          }
          e += 1
        }
      }
    }
    /** Decode one scalar entry number; -1 on underrun/invalid. */
    def decode(br: Bits): Int = {
      var node = 0
      var guard = 0
      while (guard < 64) {
        val bit = br.read1()
        if (bit < 0) return -1
        val child = if (bit == 0) left(node) else right(node)
        if (child < 0) return ~child
        if (child == 0) return -1 // dead branch: invalid stream
        node = child
        guard += 1
      }
      -1
    }
    /** Decode a VQ vector into `out(off + i*stride)` ADDING values. */
    def decodeVqAdd(br: Bits, out: Array[Double], off: Int,
        stride: Int): Boolean = {
      val e = decode(br)
      if (e < 0 || lookup == null) return false
      var d = 0
      while (d < dims) {
        // the final partition of a type-1/2 residue steps in dims-sized
        // chunks; when partitionSize % dims != 0 the last chunk's tail
        // crosses the vector end — excess values are discarded (the
        // bound stb_vorbis/libvorbis apply), never written out of range
        val idx = off + d * stride
        if (idx >= 0 && idx < out.length) out(idx) += lookup(e * dims + d)
        d += 1
      }
      true
    }
  }

  private def readCodebook(br: Bits): Codebook = {
    if (br.read(24) != 0x564342) return null // "BCV"
    val dims = br.read(16)
    val entries = br.read(24)
    if (dims <= 0 || entries <= 0 || entries > (1 << 22)) return null
    val lengths = new Array[Int](entries)
    val ordered = br.read1()
    if (ordered < 0) return null
    if (ordered == 0) {
      val sparse = br.read1()
      var e = 0
      while (e < entries) {
        if (sparse == 1) {
          val used = br.read1()
          if (used < 0) return null
          lengths(e) = if (used == 1) br.read(5) + 1 else 0
        } else lengths(e) = br.read(5) + 1
        e += 1
      }
    } else {
      var current = 0
      var length = br.read(5) + 1
      while (current < entries) {
        val num = br.read(ilog(entries - current))
        if (num < 0 || current + num > entries || length > 32) return null
        var i = 0
        while (i < num) { lengths(current + i) = length; i += 1 }
        current += num
        length += 1
      }
    }
    if (br.eof) return null
    val lookupType = br.read(4)
    val lookup: Array[Double] = lookupType match {
      case 0 => null
      case 1 | 2 =>
        val min = float32Unpack(br.read32())
        val delta = float32Unpack(br.read32())
        val valueBits = br.read(4) + 1
        val sequenceP = br.read1()
        val lookupValues =
          if (lookupType == 1) {
            // largest v with v^dims <= entries
            var v = 0
            while (math.pow(v + 1, dims) <= entries + 0.5) v += 1
            v
          } else entries * dims
        if (lookupValues <= 0 || lookupValues > (1 << 22)) return null
        // the UNPACKED table is entries*dims doubles — a ~50-byte forged
        // header (ordered-length entries=2^22, dims=511) would otherwise
        // demand a 17 GB allocation, or wrap the Int product negative;
        // real codebooks are a few thousand entries x dims <= 8
        if (entries.toLong * dims > (1L << 22)) return null
        val mults = new Array[Int](lookupValues)
        var i = 0
        while (i < lookupValues) { mults(i) = br.read(valueBits); i += 1 }
        if (br.eof) return null
        val out = new Array[Double](entries * dims)
        var e = 0
        while (e < entries) {
          var last = 0.0
          var d = 0
          if (lookupType == 1) {
            var indexDivisor = 1
            while (d < dims) {
              val off = (e / indexDivisor) % lookupValues
              var v = mults(off) * delta + min + last
              if (sequenceP == 1) last = v
              out(e * dims + d) = v
              indexDivisor *= lookupValues
              d += 1
            }
          } else {
            while (d < dims) {
              var v = mults(e * dims + d) * delta + min + last
              if (sequenceP == 1) last = v
              out(e * dims + d) = v
              d += 1
            }
          }
          e += 1
        }
        out
      case _ => return null
    }
    val cb = new Codebook(dims, entries, lengths, lookup)
    if (!cb.valid) return null
    cb
  }

  // ------------------------------------------------------------- floor1

  /** Amplitude table indexed 0..255: exponential ramp hitting the
    * spec's endpoints (1.0649863e-07 at 0, 1.0 at 255).
    */
  private[llmops] val InverseDb: Array[Double] = {
    val c = math.log(1.0649863e-07) / -255.0
    Array.tabulate(256)(i => if (i == 255) 1.0 else math.exp(-(255 - i) * c))
  }

  private final class Floor1(
      val partitionClasses: Array[Int],
      val classDims: Array[Int],
      val classSubclasses: Array[Int],
      val classMasterbooks: Array[Int],
      val subclassBooks: Array[Array[Int]],
      val multiplier: Int,
      val xList: Array[Int],
      val sortIndex: Array[Int] // xList ascending order
  )

  private def readFloor1(br: Bits, nBooks: Int): Floor1 = {
    val partitions = br.read(5)
    if (partitions < 0) return null
    val partitionClasses = new Array[Int](partitions)
    var maxClass = -1
    var i = 0
    while (i < partitions) {
      partitionClasses(i) = br.read(4)
      maxClass = math.max(maxClass, partitionClasses(i))
      i += 1
    }
    val nClasses = maxClass + 1
    val classDims = new Array[Int](nClasses)
    val classSubclasses = new Array[Int](nClasses)
    val classMasterbooks = new Array[Int](nClasses)
    val subclassBooks = new Array[Array[Int]](nClasses)
    i = 0
    while (i < nClasses) {
      classDims(i) = br.read(3) + 1
      classSubclasses(i) = br.read(2)
      if (classSubclasses(i) > 0) {
        classMasterbooks(i) = br.read(8)
        if (classMasterbooks(i) >= nBooks) return null
      } else classMasterbooks(i) = -1
      val n = 1 << classSubclasses(i)
      subclassBooks(i) = new Array[Int](n)
      var j = 0
      while (j < n) {
        subclassBooks(i)(j) = br.read(8) - 1
        if (subclassBooks(i)(j) >= nBooks) return null
        j += 1
      }
      i += 1
    }
    val multiplier = br.read(2) + 1
    val rangeBits = br.read(4)
    val xs = scala.collection.mutable.ArrayBuffer(0, 1 << rangeBits)
    i = 0
    while (i < partitions) {
      val c = partitionClasses(i)
      var j = 0
      while (j < classDims(c)) {
        val x = br.read(rangeBits)
        if (x < 0) return null
        xs += x
        j += 1
      }
      i += 1
    }
    if (br.eof || xs.size > 65) return null
    val xList = xs.toArray
    // spec: X values must be unique
    if (xList.distinct.length != xList.length) return null
    val sortIndex = xList.indices.sortBy(xList(_)).toArray
    new Floor1(partitionClasses, classDims, classSubclasses,
      classMasterbooks, subclassBooks, multiplier, xList, sortIndex)
  }

  private val Floor1Ranges = Array(256, 128, 86, 64)

  /** Decode one channel's floor curve; null when the "unused" bit is
    * 0 (the channel is silent this frame); Floor1.Invalid on stream
    * corruption (caller silences the frame).
    */
  private def decodeFloor1Curve(br: Bits, f: Floor1,
      books: Array[Codebook], n2: Int): Array[Double] = {
    val nonzero = br.read1()
    if (nonzero != 1) return null
    val range = Floor1Ranges(f.multiplier - 1)
    val values = f.xList.length
    val y = new Array[Int](values)
    val yBits = ilog(range - 1)
    y(0) = br.read(yBits)
    y(1) = br.read(yBits)
    var offset = 2
    var p = 0
    while (p < f.partitionClasses.length) {
      val cls = f.partitionClasses(p)
      val cdim = f.classDims(cls)
      val cbits = f.classSubclasses(cls)
      val csub = (1 << cbits) - 1
      var cval = 0
      if (cbits > 0) {
        cval = books(f.classMasterbooks(cls)).decode(br)
        if (cval < 0) return Floor1Invalid
      }
      var j = 0
      while (j < cdim) {
        val bookIdx = f.subclassBooks(cls)(cval & csub)
        cval >>= cbits
        if (bookIdx >= 0) {
          val v = books(bookIdx).decode(br)
          if (v < 0) return Floor1Invalid
          y(offset + j) = v
        } else y(offset + j) = 0
        j += 1
      }
      offset += cdim
      p += 1
    }
    if (br.eof) return Floor1Invalid
    // amplitude synthesis (spec 7.2.4): predict each point from the
    // highest-below / lowest-above decoded neighbors, then render
    val step2 = new Array[Boolean](values)
    val finalY = new Array[Int](values)
    step2(0) = true; step2(1) = true
    finalY(0) = y(0); finalY(1) = y(1)
    var i = 2
    while (i < values) {
      val lo = lowNeighbor(f.xList, i)
      val hi = highNeighbor(f.xList, i)
      val predicted = renderPoint(f.xList(lo), finalY(lo),
        f.xList(hi), finalY(hi), f.xList(i))
      val value = y(i)
      val highroom = range - predicted
      val lowroom = predicted
      val room = math.min(highroom, lowroom) * 2
      if (value != 0) {
        step2(lo) = true; step2(hi) = true; step2(i) = true
        finalY(i) =
          if (value >= room) {
            if (highroom > lowroom) value - lowroom + predicted
            else predicted - (value - highroom) - 1
          } else if ((value & 1) == 1) predicted - ((value + 1) / 2)
          else predicted + value / 2
      } else {
        step2(i) = false
        finalY(i) = predicted
      }
      i += 1
    }
    // render: walk points in X order, draw lines between step2 points
    val out = new Array[Double](n2)
    var hx = 0; var hy = 0
    var lx = 0
    var ly = clampRange(finalY(f.sortIndex(0)), range) * f.multiplier
    i = 1
    while (i < values) {
      val si = f.sortIndex(i)
      if (step2(si)) {
        hy = clampRange(finalY(si), range) * f.multiplier
        hx = f.xList(si)
        renderLine(lx, ly, hx, hy, out, n2)
        lx = hx; ly = hy
      }
      i += 1
    }
    if (hx < n2) { // extend flat to the right
      var x = math.max(hx, 0)
      while (x < n2) { out(x) = InverseDb(math.min(255, ly)); x += 1 }
    }
    out
  }

  private val Floor1Invalid = new Array[Double](0)

  private def clampRange(v: Int, range: Int): Int =
    if (v < 0) 0 else if (v >= range) range - 1 else v

  private def lowNeighbor(x: Array[Int], i: Int): Int = {
    var best = -1
    var j = 0
    while (j < i) {
      if (x(j) < x(i) && (best < 0 || x(j) > x(best))) best = j
      j += 1
    }
    best
  }

  private def highNeighbor(x: Array[Int], i: Int): Int = {
    var best = -1
    var j = 0
    while (j < i) {
      if (x(j) > x(i) && (best < 0 || x(j) < x(best))) best = j
      j += 1
    }
    best
  }

  private def renderPoint(x0: Int, y0: Int, x1: Int, y1: Int, x: Int): Int = {
    val dy = y1 - y0
    val adx = x1 - x0
    val ady = math.abs(dy)
    val err = ady * (x - x0)
    val off = err / adx
    if (dy < 0) y0 - off else y0 + off
  }

  private def renderLine(x0: Int, y0: Int, x1: Int, y1: Int,
      out: Array[Double], n2: Int): Unit = {
    val dy = y1 - y0
    val adx = x1 - x0
    val base = dy / adx
    val ady = math.abs(dy) - math.abs(base) * adx
    val sy = if (dy < 0) base - 1 else base + 1
    var x = x0
    var y = y0
    var err = 0
    if (x0 >= 0 && x0 < n2) out(x0) = InverseDb(math.min(255, y0))
    x = x0 + 1
    while (x < math.min(x1, n2)) {
      err += ady
      if (err >= adx) { err -= adx; y += sy } else y += base
      out(x) = InverseDb(math.min(255, math.max(0, y)))
      x += 1
    }
  }

  // ------------------------------------------------------------ residue

  private final class Residue(
      val rType: Int,
      val begin: Int,
      val end: Int,
      val partitionSize: Int,
      val classifications: Int,
      val classbook: Int,
      val cascade: Array[Int],
      val books: Array[Array[Int]] // [class][pass] -> book or -1
  )

  private def readResidue(br: Bits, nBooks: Int): Residue = {
    val rType = br.read(16)
    if (rType < 0 || rType > 2) return null
    val begin = br.read(24)
    val end = br.read(24)
    val partitionSize = br.read(24) + 1
    val classifications = br.read(6) + 1
    val classbook = br.read(8)
    if (begin < 0 || end < begin || classbook >= nBooks) return null
    val cascade = new Array[Int](classifications)
    var i = 0
    while (i < classifications) {
      val low = br.read(3)
      val flag = br.read1()
      val high = if (flag == 1) br.read(5) else 0
      cascade(i) = (high << 3) | low
      i += 1
    }
    val books = Array.fill(classifications)(Array.fill(8)(-1))
    i = 0
    while (i < classifications) {
      var pass = 0
      while (pass < 8) {
        if ((cascade(i) & (1 << pass)) != 0) {
          books(i)(pass) = br.read(8)
          if (books(i)(pass) >= nBooks) return null
        }
        pass += 1
      }
      i += 1
    }
    if (br.eof) return null
    new Residue(rType, begin, end, partitionSize, classifications,
      classbook, cascade, books)
  }

  /** Decode residue vectors for `ch` channels of length n2 each.
    * `doNotDecode(j)` marks silent channels. Returns false on stream
    * corruption.
    */
  private def decodeResidue(br: Bits, r: Residue, books: Array[Codebook],
      out: Array[Array[Double]], doNotDecode: Array[Boolean],
      n2: Int): Boolean = {
    val ch = out.length
    // type 2: channels interleaved into one vector of ch*n2
    val (vecs, nVec, vecLen) =
      if (r.rType == 2) {
        val all = doNotDecode.forall(identity)
        (Array(new Array[Double](ch * n2)), if (all) 0 else 1, ch * n2)
      } else (out.map(_ => new Array[Double](n2)),
        ch, n2)
    val actualBegin = math.min(r.begin, vecLen)
    val actualEnd = math.min(r.end, vecLen)
    val nToRead = actualEnd - actualBegin
    val classbook = books(r.classbook)
    val partitionsToRead = if (nToRead <= 0) 0 else nToRead / r.partitionSize
    if (nToRead > 0 && nToRead % r.partitionSize != 0) return false
    val classifications =
      Array.fill(nVec)(new Array[Int](partitionsToRead + classbook.dims))
    var pass = 0
    while (pass < 8) {
      var partitionCount = 0
      while (partitionCount < partitionsToRead) {
        if (pass == 0) {
          var j = 0
          while (j < nVec) {
            if (r.rType == 2 || !doNotDecode(j)) {
              var temp = classbook.decode(br)
              if (temp < 0) return false
              var i = classbook.dims - 1
              while (i >= 0) {
                classifications(j)(partitionCount + i) =
                  temp % r.classifications
                temp /= r.classifications
                i -= 1
              }
            }
            j += 1
          }
        }
        var i = 0
        while (i < classbook.dims && partitionCount < partitionsToRead) {
          var j = 0
          while (j < nVec) {
            if (r.rType == 2 || !doNotDecode(j)) {
              val vq = classifications(j)(partitionCount)
              val bookIdx = r.books(vq)(pass)
              if (bookIdx >= 0) {
                val book = books(bookIdx)
                if (book.lookup == null) return false
                val offset = actualBegin + partitionCount * r.partitionSize
                if (r.rType == 0) {
                  // interleaved within the partition
                  val step = r.partitionSize / book.dims
                  var s = 0
                  while (s < step) {
                    val e = book.decode(br)
                    if (e < 0) return false
                    var d = 0
                    while (d < book.dims) {
                      vecs(j)(offset + s + d * step) +=
                        book.lookup(e * book.dims + d)
                      d += 1
                    }
                    s += 1
                  }
                } else {
                  var done = 0
                  while (done < r.partitionSize) {
                    if (!book.decodeVqAdd(br, vecs(j), offset + done, 1))
                      return false
                    done += book.dims
                  }
                }
              }
            }
            j += 1
          }
          partitionCount += 1
          i += 1
        }
      }
      pass += 1
    }
    if (r.rType == 2) { // deinterleave
      var i = 0
      while (i < n2) {
        var j = 0
        while (j < ch) {
          out(j)(i) = vecs(0)(i * ch + j)
          j += 1
        }
        i += 1
      }
    } else {
      var j = 0
      while (j < ch) { out(j) = vecs(j); j += 1 }
    }
    true
  }

  // --------------------------------------------------- mapping and mode

  private final class Mapping(
      val submaps: Int,
      val couplingMag: Array[Int],
      val couplingAng: Array[Int],
      val mux: Array[Int],
      val submapFloor: Array[Int],
      val submapResidue: Array[Int]
  )

  private final class Mode(val blockFlag: Int, val mapping: Int)

  private final class Setup(
      val channels: Int,
      val sampleRate: Int,
      val blocksize0: Int,
      val blocksize1: Int,
      val books: Array[Codebook],
      val floors: Array[Floor1],
      val residues: Array[Residue],
      val mappings: Array[Mapping],
      val modes: Array[Mode]
  )

  // --------------------------------------------------------------- MDCT

  /** Inverse MDCT per the spec's definition:
    * y(i) = sum_k X(k) cos(2pi/n (i + 0.5 + n/4)(k + 0.5)).
    * Small blocks take the direct kernel; real-world long blocks
    * (2048/8192 — what web encoders actually emit) take the
    * O(n log n) [[imdctFft]] path, property-tested equal to the
    * direct form. The crossover keeps per-frame cost flat across the
    * whole legal blocksize range instead of 1000x worse at 8192.
    */
  private[llmops] def imdct(x: Array[Double], n: Int): Array[Double] =
    if (n >= 512) imdctFft(x, n) else imdctDirect(x, n)

  private[llmops] def imdctDirect(x: Array[Double], n: Int): Array[Double] = {
    val n2 = n / 2
    val out = new Array[Double](n)
    val base = math.Pi * 2.0 / n
    var i = 0
    while (i < n) {
      var acc = 0.0
      val a = base * (i + 0.5 + n2 / 2.0)
      var k = 0
      while (k < n2) {
        acc += x(k) * math.cos(a * (k + 0.5))
        k += 1
      }
      out(i) = acc
      i += 1
    }
    out
  }

  /** iMDCT via one n-point complex FFT. With m = n/2 the output is a
    * shifted DCT-IV: y(i) = f(i + 0.5 + m/2) for
    * f(t) = sum_k X(k) cos(pi/m t (k+0.5)), and f obeys
    * f(2m - t) = -f(t), f(t + 2m) = -f(t), so the n outputs unfold
    * from the m DCT-IV values c(j) = f(j + 0.5). The DCT-IV itself is
    * one zero-padded 2m-point DFT with pre/post twiddles:
    * c(j) = Re(e^{-i pi (2j+1)/(4m)} * DFT_{2m}(x(k) e^{-i pi k/(2m)})(j)).
    */
  private[llmops] def imdctFft(x: Array[Double], n: Int): Array[Double] = {
    val m = n / 2
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    var k = 0
    while (k < m) {
      val ang = -math.Pi * k / (2.0 * m)
      re(k) = x(k) * math.cos(ang)
      im(k) = x(k) * math.sin(ang)
      k += 1
    }
    Fft.fft(re, im)
    val c = new Array[Double](m)
    var j = 0
    while (j < m) {
      val ang = -math.Pi * (2 * j + 1) / (4.0 * m)
      c(j) = re(j) * math.cos(ang) - im(j) * math.sin(ang)
      j += 1
    }
    val out = new Array[Double](n)
    val m2 = m / 2
    var i = 0
    while (i < m2) { out(i) = c(m2 + i); i += 1 }
    while (i < m + m2) { out(i) = -c(m + m2 - 1 - i); i += 1 }
    while (i < n) { out(i) = -c(i - m - m2); i += 1 }
    out
  }

  /** Vorbis window slope: sin(pi/2 * sin^2(pi/2 * (i+0.5)/m)). */
  private def slope(i: Int, m: Int): Double = {
    val s = math.sin(math.Pi / 2.0 * (i + 0.5) / m)
    math.sin(math.Pi / 2.0 * s * s)
  }

  // -------------------------------------------------------------- decode

  def decode(b: Array[Byte]): VorbisPcm = {
    if (b == null || b.length < 58) return null
    if (!(b(0) == 'O' && b(1) == 'g' && b(2) == 'g' && b(3) == 'S'))
      return null
    val demuxed = demux(b)
    if (demuxed == null || demuxed.packets.length < 3) return null
    val packets = demuxed.packets
    val setup = readHeaders(packets)
    if (setup == null) return null
    val ch = setup.channels
    if (setup.sampleRate <= 0 || ch <= 0 || ch > 8) return null

    // primitive builder, not ArrayBuffer[Double]: the per-sample append is
    // the decoder's hottest loop and boxing would triple its memory
    val out = new scala.collection.mutable.ArrayBuilder.ofDouble
    out.sizeHint(1 << 16)
    var outLen = 0L
    var prevFrame: Array[Array[Double]] = null
    var prevN = 0
    var p = 3
    while (p < packets.length) {
      val frame = decodeAudioPacket(packets(p), setup)
      if (frame != null) {
        val n = frame(0).length
        if (prevFrame != null) {
          val retLen = prevN / 4 + n / 4
          if ((outLen + retLen.toLong * ch) * 8 > MaxOutBytes)
            return null
          var t = 0
          while (t < retLen) {
            var j = 0
            while (j < ch) {
              val pi = prevN / 2 + t
              val ci = t + n / 4 - prevN / 4
              var v = 0.0
              if (pi < prevN) v += prevFrame(j)(pi)
              if (ci >= 0 && ci < n) v += frame(j)(ci)
              out += v * 32768.0
              j += 1
            }
            t += 1
          }
          outLen += retLen.toLong * ch
        }
        prevFrame = frame
        prevN = n
      } else if (prevFrame != null) {
        // corrupt audio packet: silence one nominal short frame,
        // keep the stream aligned. Same output cap as the good-frame
        // branch — millions of zero-length packets (255 lacing values
        // per Ogg page) must not grow the buffer unbounded
        val n = setup.blocksize0
        val retLen = prevN / 4 + n / 4
        if ((outLen + retLen.toLong * ch) * 8 > MaxOutBytes)
          return null
        val silent = Array.fill(ch)(new Array[Double](n))
        var t = 0
        while (t < retLen) {
          var j = 0
          while (j < ch) {
            val pi = prevN / 2 + t
            out += (if (pi < prevN) prevFrame(j)(pi) * 32768.0 else 0.0)
            j += 1
          }
          t += 1
        }
        outLen += retLen.toLong * ch
        prevFrame = silent
        prevN = n
      }
      p += 1
    }
    var samples = out.result()
    // final granule position trims the sample grid (lapping emits
    // ceil-padding past the true end). Granule is 8 attacker-controlled
    // bytes: bound it BEFORE multiplying by ch or the Long product wraps
    // negative and copyOf throws
    if (demuxed.lastGranule >= 0 &&
      demuxed.lastGranule < samples.length &&
      demuxed.lastGranule * ch < samples.length) {
      samples = java.util.Arrays.copyOf(samples,
        (demuxed.lastGranule * ch).toInt)
    }
    if (samples.isEmpty) return null
    new VorbisPcm(ch, setup.sampleRate, samples)
  }

  private def readHeaders(packets: Array[Array[Byte]]): Setup = {
    // ---- identification
    val id = packets(0)
    if (id.length < 30 || (id(0) & 0xFF) != 1 || !hasVorbis(id)) return null
    val bi = new Bits(java.util.Arrays.copyOfRange(id, 7, id.length))
    if (bi.read32() != 0) return null // vorbis_version
    val channels = bi.read(8)
    val rate = bi.read32().toInt
    bi.read32(); bi.read32(); bi.read32() // bitrate max/nominal/min
    val bs0exp = bi.read(4)
    val bs1exp = bi.read(4)
    val framing = bi.read1()
    if (framing != 1 || bi.eof) return null
    val bs0 = 1 << bs0exp
    val bs1 = 1 << bs1exp
    if (bs0 < 64 || bs1 > 8192 || bs0 > bs1) return null
    // ---- comment header: validate type only
    val cm = packets(1)
    if (cm.length < 7 || (cm(0) & 0xFF) != 3 || !hasVorbis(cm)) return null
    // ---- setup
    val st = packets(2)
    if (st.length < 7 || (st(0) & 0xFF) != 5 || !hasVorbis(st)) return null
    val br = new Bits(java.util.Arrays.copyOfRange(st, 7, st.length))
    val nBooks = br.read(8) + 1
    val books = new Array[Codebook](nBooks)
    var i = 0
    while (i < nBooks) {
      books(i) = readCodebook(br)
      if (books(i) == null) return null
      i += 1
    }
    // time domain transforms: placeholders, must be zero
    val nTimes = br.read(6) + 1
    i = 0
    while (i < nTimes) {
      if (br.read(16) != 0) return null
      i += 1
    }
    val nFloors = br.read(6) + 1
    val floors = new Array[Floor1](nFloors)
    i = 0
    while (i < nFloors) {
      val t = br.read(16)
      if (t != 1) return null // floor 0 (LSP) refused honestly
      floors(i) = readFloor1(br, nBooks)
      if (floors(i) == null) return null
      i += 1
    }
    val nResidues = br.read(6) + 1
    val residues = new Array[Residue](nResidues)
    i = 0
    while (i < nResidues) {
      residues(i) = readResidue(br, nBooks)
      if (residues(i) == null) return null
      i += 1
    }
    val nMappings = br.read(6) + 1
    val mappings = new Array[Mapping](nMappings)
    i = 0
    while (i < nMappings) {
      if (br.read(16) != 0) return null // mapping type 0 only exists
      val hasSubmaps = br.read1()
      val submaps = if (hasSubmaps == 1) br.read(4) + 1 else 1
      var couplingMag: Array[Int] = Array.empty
      var couplingAng: Array[Int] = Array.empty
      if (br.read1() == 1) {
        val steps = br.read(8) + 1
        couplingMag = new Array[Int](steps)
        couplingAng = new Array[Int](steps)
        var s = 0
        val chBits = ilog(channels - 1)
        while (s < steps) {
          couplingMag(s) = br.read(chBits)
          couplingAng(s) = br.read(chBits)
          if (couplingMag(s) == couplingAng(s) ||
            couplingMag(s) >= channels || couplingAng(s) >= channels)
            return null
          s += 1
        }
      }
      if (br.read(2) != 0) return null // reserved
      val mux = new Array[Int](channels)
      if (submaps > 1) {
        var j = 0
        while (j < channels) {
          mux(j) = br.read(4)
          if (mux(j) >= submaps) return null
          j += 1
        }
      }
      val smFloor = new Array[Int](submaps)
      val smResidue = new Array[Int](submaps)
      var s = 0
      while (s < submaps) {
        br.read(8) // time configuration placeholder, discarded
        smFloor(s) = br.read(8)
        smResidue(s) = br.read(8)
        if (smFloor(s) >= nFloors || smResidue(s) >= nResidues) return null
        s += 1
      }
      mappings(i) = new Mapping(submaps, couplingMag, couplingAng, mux,
        smFloor, smResidue)
      i += 1
    }
    val nModes = br.read(6) + 1
    val modes = new Array[Mode](nModes)
    i = 0
    while (i < nModes) {
      val blockFlag = br.read1()
      if (br.read(16) != 0) return null // window type
      if (br.read(16) != 0) return null // transform type
      val mapping = br.read(8)
      if (mapping >= nMappings) return null
      modes(i) = new Mode(blockFlag, mapping)
      i += 1
    }
    if (br.read1() != 1 || br.eof) return null // framing
    new Setup(channels, rate, bs0, bs1, books, floors, residues,
      mappings, modes)
  }

  private def hasVorbis(p: Array[Byte]): Boolean =
    p.length >= 7 && p(1) == 'v' && p(2) == 'o' && p(3) == 'r' &&
      p(4) == 'b' && p(5) == 'i' && p(6) == 's'

  /** One audio packet -> per-channel windowed time samples (length n),
    * ready for lapping; null on a corrupt packet.
    */
  private def decodeAudioPacket(p: Array[Byte], s: Setup): Array[Array[Double]] = {
    if (p.isEmpty) return null
    val br = new Bits(p)
    if (br.read1() != 0) return null // not an audio packet
    val modeIdx = br.read(ilog(s.modes.length - 1))
    if (modeIdx < 0 || modeIdx >= s.modes.length) return null
    val mode = s.modes(modeIdx)
    val n = if (mode.blockFlag == 1) s.blocksize1 else s.blocksize0
    var prevWindowFlag = 1
    var nextWindowFlag = 1
    if (mode.blockFlag == 1) {
      prevWindowFlag = br.read1()
      nextWindowFlag = br.read1()
    }
    if (br.eof) return null
    val mapping = s.mappings(mode.mapping)
    val ch = s.channels
    val n2 = n / 2
    // ---- floors
    val floorOut = new Array[Array[Double]](ch)
    val doNotDecode = new Array[Boolean](ch)
    var j = 0
    while (j < ch) {
      val f = s.floors(mapping.submapFloor(mapping.mux(j)))
      val curve = decodeFloor1Curve(br, f, s.books, n2)
      if (curve != null && curve.length == 0) return null // corrupt
      floorOut(j) = curve
      doNotDecode(j) = curve == null
      j += 1
    }
    // coupling: if either channel of a pair has a nonzero floor, both
    // decode residue
    var step = 0
    while (step < mapping.couplingMag.length) {
      val m = mapping.couplingMag(step)
      val a = mapping.couplingAng(step)
      if (!doNotDecode(m) || !doNotDecode(a)) {
        doNotDecode(m) = false
        doNotDecode(a) = false
      }
      step += 1
    }
    // ---- residues, per submap
    val residueOut = Array.fill(ch)(new Array[Double](n2))
    var sm = 0
    while (sm < mapping.submaps) {
      val chIdx = (0 until ch).filter(mapping.mux(_) == sm).toArray
      val sub = chIdx.map(residueOut)
      val dnd = chIdx.map(doNotDecode)
      val r = s.residues(mapping.submapResidue(sm))
      if (!decodeResidue(br, r, s.books, sub, dnd, n2)) return null
      var k = 0
      while (k < chIdx.length) { residueOut(chIdx(k)) = sub(k); k += 1 }
      sm += 1
    }
    // ---- inverse coupling (square polar)
    step = mapping.couplingMag.length - 1
    while (step >= 0) {
      val mV = residueOut(mapping.couplingMag(step))
      val aV = residueOut(mapping.couplingAng(step))
      var i = 0
      while (i < n2) {
        val m = mV(i)
        val a = aV(i)
        var newM = m
        var newA = a
        if (m > 0) {
          if (a > 0) { newM = m; newA = m - a }
          else { newA = m; newM = m + a }
        } else {
          if (a > 0) { newM = m; newA = m + a }
          else { newA = m; newM = m - a }
        }
        mV(i) = newM
        aV(i) = newA
        i += 1
      }
      step -= 1
    }
    // ---- dot product + iMDCT + window
    val out = new Array[Array[Double]](ch)
    j = 0
    while (j < ch) {
      val spec = new Array[Double](n2)
      if (floorOut(j) != null) {
        var i = 0
        while (i < n2) {
          spec(i) = residueOut(j)(i) * floorOut(j)(i)
          i += 1
        }
      }
      val y = imdct(spec, n)
      // window: slopes sized by the neighboring blocks
      val leftN = if (mode.blockFlag == 1 && prevWindowFlag == 0)
        s.blocksize0 / 2 else n2
      val rightN = if (mode.blockFlag == 1 && nextWindowFlag == 0)
        s.blocksize0 / 2 else n2
      val leftStart = n / 4 - leftN / 2
      val rightStart = n - n / 4 - rightN / 2
      var i = 0
      while (i < n) {
        val w =
          if (i < leftStart) 0.0
          else if (i < leftStart + leftN) slope(i - leftStart, leftN)
          else if (i < rightStart) 1.0
          else if (i < rightStart + rightN)
            slope(rightN - 1 - (i - rightStart), rightN)
          else 0.0
        y(i) *= w
        i += 1
      }
      out(j) = y
      j += 1
    }
    out
  }
}
