package graft.llmops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Apache ORC file ingestion, from scratch (the ORC v1 specification —
  * postscript/footer protobufs, stripe layout, RLEv1/v2 integer coding —
  * is public): STRIPE-PARALLEL reads — the footer lists every stripe's
  * (offset, lengths, rows), so each stripe decodes in its own task from
  * one ranged read. Reference hook: raw-layer ingestion,
  * `aje_libs/common/helpers/utils/dynamodb_helper.py` table-driven
  * loads (ORC is the other Hadoop-era columnar landing format next to
  * Avro/SequenceFile).
  *
  * A READER, deliberately: the canonical writers (Spark's native ORC
  * sink, orc-core) are on the test classpath and serve as the interop
  * twin — the value at 100 TB is ingesting the files that exist.
  *
  * Type support: BOOLEAN, BYTE, SHORT, INT, LONG, FLOAT, DOUBLE,
  * STRING/VARCHAR/CHAR (DIRECT_V2 + DICTIONARY_V2), BINARY, DATE,
  * DECIMAL(p,s) (unbounded zigzag varint + scale stream), TIMESTAMP /
  * TIMESTAMP_INSTANT (2015-epoch seconds in the stripe's writer
  * timezone + trailing-zero nanos), LIST, MAP and nested STRUCT under
  * a STRUCT root, with nullability via PRESENT streams at every level.
  * UNION lands as a tagged sparse struct — `struct(tag INT, m_0, m_1,
  * ...)` with the tag byte in `tag` and each anonymous child in its
  * positional member (the same shape Avro multi-branch unions land
  * as — one contract across the container family).
  * Compression NONE/ZLIB/SNAPPY/LZO/LZ4/ZSTD — all
  * via the repo's own decoders ([[Lzo]] closed the last codec gap).
  *
  * Corruption blast radius: one stripe (structural failure drops that
  * stripe's rows; the footer keeps every other stripe reachable).
  */
object Orc {

  private val MaxStripeBytes = 1L << 30

  // --------------------------------------------------------- protobuf read

  private[llmops] final class Pb(val b: Array[Byte], var i: Int,
      val end: Int) {
    def hasMore: Boolean = i < end
    def varint(): Long = {
      var x = 0L; var sh = 0; var c = 0
      do {
        if (i >= end) throw new IllegalArgumentException("pb eof")
        c = b(i) & 0xff; i += 1
        x |= (c & 0x7fL) << sh; sh += 7
        if (sh > 70) throw new IllegalArgumentException("pb varint")
      } while ((c & 0x80) != 0)
      x
    }
    /** (fieldNumber, wireType) */
    def tag(): (Int, Int) = {
      val t = varint()
      ((t >>> 3).toInt, (t & 7).toInt)
    }
    def lenField(): (Int, Int) = {
      val n = varint().toInt
      if (n < 0 || n > end - i) throw new IllegalArgumentException("pb len")
      val off = i; i += n; (off, n)
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint()
      case 1 => i += 8
      case 2 => val _ = lenField()
      case 5 => i += 4
      case w => throw new IllegalArgumentException(s"pb wire $w")
    }
  }

  // ------------------------------------------------------------- metadata

  final case class Stripe(offset: Long, indexLength: Long,
      dataLength: Long, footerLength: Long, rows: Long)
  final case class TypeNode(kind: Int, subtypes: Vector[Int],
      fieldNames: Vector[String], precision: Int = 0, scale: Int = 0,
      attributes: Map[String, String] = Map.empty)
  final case class Tail(compression: Int, blockSize: Int,
      stripes: Vector[Stripe], types: Vector[TypeNode], rows: Long)

  private def parsePostScript(b: Array[Byte], off: Int, len: Int)
      : (Long, Int, Long, Long) = {
    val p = new Pb(b, off, off + len)
    var footerLen = 0L; var comp = 0; var block = 256L << 10
    var metaLen = 0L
    while (p.hasMore) {
      p.tag() match {
        case (1, 0) => footerLen = p.varint()
        case (2, 0) => comp = p.varint().toInt
        case (3, 0) => block = p.varint()
        case (5, 0) => metaLen = p.varint()
        case (_, w) => p.skip(w)
      }
    }
    (footerLen, comp, block, metaLen)
  }

  private def parseStripe(b: Array[Byte], off: Int, len: Int): Stripe = {
    val p = new Pb(b, off, off + len)
    var o = 0L; var il = 0L; var dl = 0L; var fl = 0L; var r = 0L
    while (p.hasMore) {
      p.tag() match {
        case (1, 0) => o = p.varint()
        case (2, 0) => il = p.varint()
        case (3, 0) => dl = p.varint()
        case (4, 0) => fl = p.varint()
        case (5, 0) => r = p.varint()
        case (_, w) => p.skip(w)
      }
    }
    Stripe(o, il, dl, fl, r)
  }

  private def parseType(b: Array[Byte], off: Int, len: Int): TypeNode = {
    val p = new Pb(b, off, off + len)
    var kind = 0
    var precision = 0
    var scale = 0
    val subs = Vector.newBuilder[Int]
    val names = Vector.newBuilder[String]
    val attrs = Map.newBuilder[String, String]
    while (p.hasMore) {
      p.tag() match {
        case (1, 0) => kind = p.varint().toInt
        case (2, 0) => subs += p.varint().toInt
        case (2, 2) => // packed repeated
          val (o, n) = p.lenField()
          val pp = new Pb(b, o, o + n)
          while (pp.hasMore) subs += pp.varint().toInt
        case (3, 2) =>
          val (o, n) = p.lenField()
          names += new String(b, o, n,
            java.nio.charset.StandardCharsets.UTF_8)
        case (5, 0) => precision = p.varint().toInt
        case (6, 0) => scale = p.varint().toInt
        case (7, 2) => // StringPair attributes (ORC-522)
          val (o, n) = p.lenField()
          val pp = new Pb(b, o, o + n)
          var key: String = null
          var value: String = null
          while (pp.hasMore) {
            pp.tag() match {
              case (1, 2) =>
                val (ko, kn) = pp.lenField()
                key = new String(b, ko, kn,
                  java.nio.charset.StandardCharsets.UTF_8)
              case (2, 2) =>
                val (vo, vn) = pp.lenField()
                value = new String(b, vo, vn,
                  java.nio.charset.StandardCharsets.UTF_8)
              case (_, w) => pp.skip(w)
            }
          }
          if (key != null && value != null) attrs += (key -> value)
        case (_, w) => p.skip(w)
      }
    }
    TypeNode(kind, subs.result(), names.result(), precision, scale,
      attrs.result())
  }

  private def parseFooter(b: Array[Byte], off: Int, len: Int)
      : (Vector[Stripe], Vector[TypeNode], Long) = {
    val p = new Pb(b, off, off + len)
    val stripes = Vector.newBuilder[Stripe]
    val types = Vector.newBuilder[TypeNode]
    var rows = 0L
    while (p.hasMore) {
      p.tag() match {
        case (3, 2) => val (o, n) = p.lenField(); stripes += parseStripe(b, o, n)
        case (4, 2) => val (o, n) = p.lenField(); types += parseType(b, o, n)
        case (6, 0) => rows = p.varint()
        case (_, w) => p.skip(w)
      }
    }
    (stripes.result(), types.result(), rows)
  }

  final case class StreamInfo(kind: Int, column: Int, length: Long)
  final case class ColEnc(kind: Int, dictSize: Int)

  private[llmops] def parseStripeFooter(b: Array[Byte])
      : (Vector[StreamInfo], Vector[ColEnc], String) = {
    val p = new Pb(b, 0, b.length)
    val streams = Vector.newBuilder[StreamInfo]
    val encs = Vector.newBuilder[ColEnc]
    var writerTz = ""
    while (p.hasMore) {
      p.tag() match {
        case (1, 2) =>
          val (o, n) = p.lenField()
          val pp = new Pb(b, o, o + n)
          var k = 0; var c = 0; var l = 0L
          while (pp.hasMore) {
            pp.tag() match {
              case (1, 0) => k = pp.varint().toInt
              case (2, 0) => c = pp.varint().toInt
              case (3, 0) => l = pp.varint()
              case (_, w) => pp.skip(w)
            }
          }
          streams += StreamInfo(k, c, l)
        case (2, 2) =>
          val (o, n) = p.lenField()
          val pp = new Pb(b, o, o + n)
          var k = 0; var d = 0
          while (pp.hasMore) {
            pp.tag() match {
              case (1, 0) => k = pp.varint().toInt
              case (2, 0) => d = pp.varint().toInt
              case (_, w) => pp.skip(w)
            }
          }
          encs += ColEnc(k, d)
        case (3, 2) =>
          val (o, n) = p.lenField()
          writerTz = new String(b, o, n,
            java.nio.charset.StandardCharsets.UTF_8)
        case (_, w) => p.skip(w)
      }
    }
    (streams.result(), encs.result(), writerTz)
  }

  // -------------------------------------------------------- decompression

  /** ORC compressed streams are chunked: 3-byte LE header
    * `(len << 1) | isOriginal`, then len bytes (stored or compressed).
    */
  private[llmops] def decompressStream(comp: Int, b: Array[Byte],
      off: Int, len: Int): Array[Byte] = {
    if (comp == 0) return java.util.Arrays.copyOfRange(b, off, off + len)
    // pre-size hints only — clamp so a >512 MB stream can't wrap the Int
    // multiply negative and crash the ByteArrayOutputStream ctor
    def hint(n: Int, mult: Int): Int =
      math.min(1 << 26, math.max(64, n.toLong * mult).min(Int.MaxValue)).toInt
    val out = new java.io.ByteArrayOutputStream(hint(len, 3))
    var i = off
    val end = off + len
    while (i < end) {
      require(end - i >= 3, "truncated orc chunk header")
      val h = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
        ((b(i + 2) & 0xff) << 16)
      i += 3
      val original = (h & 1) != 0
      val clen = h >>> 1
      require(clen >= 0 && clen <= end - i, "orc chunk overruns stream")
      if (original) out.write(b, i, clen)
      else {
        val plain = comp match {
          case 1 => // ZLIB = raw deflate
            val inf = new java.util.zip.Inflater(true)
            inf.setInput(b, i, clen)
            val o = new java.io.ByteArrayOutputStream(hint(clen, 4))
            val buf = new Array[Byte](64 << 10)
            try {
              while (!inf.finished()) {
                val n = inf.inflate(buf)
                if (n == 0 && inf.needsInput())
                  throw new IllegalArgumentException("orc zlib truncated")
                o.write(buf, 0, n)
              }
            } finally inf.end()
            o.toByteArray
          case 2 =>
            val p = Snappy.decodeRaw(b, i, i + clen)
            require(p != null, "orc snappy chunk")
            p
          case 3 =>
            val p = Lzo.decodeRaw(b, i, i + clen, 1 << 28)
            require(p != null, "orc lzo chunk")
            p
          case 4 =>
            val p = Lz4.decodeRawBlock(b, i, clen, 1 << 28)
            require(p != null, "orc lz4 chunk")
            p
          case 5 =>
            val p = Zstd.decode(java.util.Arrays.copyOfRange(b, i,
              i + clen))
            require(p != null, "orc zstd chunk")
            p
          case c => throw new IllegalArgumentException(s"orc codec $c")
        }
        out.write(plain, 0, plain.length)
      }
      i += clen
    }
    out.toByteArray
  }

  // ----------------------------------------------------------- RLE coders

  /** Hadoop/ORC byte RLE: header 0..127 → (3+h) copies of next byte;
    * -1..-128 → -h literal bytes.
    */
  private[llmops] def byteRle(b: Array[Byte], want: Int): Array[Byte] = {
    val out = new Array[Byte](want)
    var o = 0
    var i = 0
    while (o < want) {
      require(i < b.length, "byte-rle eof")
      val h = b(i); i += 1
      if (h >= 0) {
        val run = h + 3
        require(i < b.length && o + run <= want, "byte-rle run")
        java.util.Arrays.fill(out, o, o + run, b(i))
        i += 1; o += run
      } else {
        val lit = -h
        require(i + lit <= b.length && o + lit <= want, "byte-rle lit")
        System.arraycopy(b, i, out, o, lit)
        i += lit; o += lit
      }
    }
    out
  }

  /** Boolean stream: bit-packed MSB-first over a byte-RLE stream. */
  private[llmops] def boolRle(b: Array[Byte], want: Int): Array[Boolean] = {
    val bytes = byteRle(b, (want + 7) / 8)
    val out = new Array[Boolean](want)
    var i = 0
    while (i < want) {
      out(i) = (bytes(i >> 3) & (0x80 >>> (i & 7))) != 0
      i += 1
    }
    out
  }

  private val WidthTable: Array[Int] = {
    val t = new Array[Int](32)
    var i = 0
    while (i < 24) { t(i) = i + 1; i += 1 }
    t(24) = 26; t(25) = 28; t(26) = 30; t(27) = 32
    t(28) = 40; t(29) = 48; t(30) = 56; t(31) = 64
    t
  }

  private final class BitIn(b: Array[Byte], var i: Int) {
    private var cur = 0
    private var left = 0
    def read(bits: Int): Long = {
      var v = 0L
      var need = bits
      while (need > 0) {
        if (left == 0) {
          require(i < b.length, "bit eof")
          cur = b(i) & 0xff; i += 1; left = 8
        }
        val take = math.min(left, need)
        v = (v << take) | ((cur >>> (left - take)) & ((1 << take) - 1))
        left -= take
        need -= take
      }
      v
    }
    def align(): Unit = { left = 0 }
  }

  private def zigzag(v: Long): Long = (v >>> 1) ^ -(v & 1L)

  /** The writer's width quantization: 1..24 exact, then 26/28/30/32/
    * 40/48/56/64.
    */
  private[llmops] def closestFixedBits(n: Int): Int =
    if (n <= 1) 1
    else if (n <= 24) n
    else if (n <= 26) 26
    else if (n <= 28) 28
    else if (n <= 30) 30
    else if (n <= 32) 32
    else if (n <= 40) 40
    else if (n <= 48) 48
    else if (n <= 56) 56
    else 64

  /** ORC RLEv1 integer run decoder — the Hive 0.11/0.12 DIRECT /
    * DICTIONARY column encodings (kinds 0/1). A run is
    * [control h >= 0: length h+3, one SIGNED delta byte, base varint]
    * producing base, base+delta, …; a literal group is
    * [control h < 0: -h varints]. Varints zigzag per stream signedness,
    * like v2. Decoding these with the v2 decoder parses garbage as
    * valid runs — silent corruption, hence the per-encoding dispatch in
    * decodeStripe.
    */
  private[llmops] def rleV1(b: Array[Byte], want: Int,
      signed: Boolean): Array[Long] = {
    val out = new Array[Long](want)
    var o = 0
    var i = 0
    def varint(): Long = {
      var x = 0L; var sh = 0; var c = 0
      do {
        require(i < b.length, "rle1 varint eof")
        c = b(i) & 0xff; i += 1
        x |= (c & 0x7fL) << sh; sh += 7
      } while ((c & 0x80) != 0)
      x
    }
    def value(): Long = { val v = varint(); if (signed) zigzag(v) else v }
    while (o < want) {
      require(i < b.length, "rle1 eof")
      val h = b(i).toInt; i += 1 // SIGNED control byte
      if (h >= 0) {
        val run = h + 3
        require(i < b.length, "rle1 delta eof")
        val delta = b(i).toInt; i += 1 // signed byte
        var v = value()
        require(o + run <= want, "rle1 run overrun")
        var k = 0
        while (k < run) { out(o + k) = v; v += delta; k += 1 }
        o += run
      } else {
        val n = -h
        require(o + n <= want, "rle1 literal overrun")
        var k = 0
        while (k < n) { out(o + k) = value(); k += 1 }
        o += n
      }
    }
    out
  }

  /** ORC RLEv2 integer run decoder (all four sub-encodings). */
  private[llmops] def rleV2(b: Array[Byte], want: Int,
      signed: Boolean): Array[Long] = {
    val out = new Array[Long](want)
    var o = 0
    var i = 0
    def varint(): Long = {
      var x = 0L; var sh = 0; var c = 0
      do {
        require(i < b.length, "rle varint eof")
        c = b(i) & 0xff; i += 1
        x |= (c & 0x7fL) << sh; sh += 7
      } while ((c & 0x80) != 0)
      x
    }
    while (o < want) {
      require(i < b.length, "rle eof")
      val h = b(i) & 0xff; i += 1
      (h >>> 6) match {
        case 0 => // SHORT_REPEAT
          val w = ((h >>> 3) & 7) + 1
          val run = (h & 7) + 3
          var v = 0L
          var k = 0
          while (k < w) { v = (v << 8) | (b(i + k) & 0xffL); k += 1 }
          i += w
          val value = if (signed) zigzag(v) else v
          require(o + run <= want, "short-repeat overrun")
          k = 0
          while (k < run) { out(o + k) = value; k += 1 }
          o += run
        case 1 => // DIRECT
          val w = WidthTable((h >>> 1) & 0x1f)
          val n = (((h & 1) << 8) | (b(i) & 0xff)) + 1
          i += 1
          val bin = new BitIn(b, i)
          require(o + n <= want, "direct overrun")
          var k = 0
          while (k < n) {
            val v = bin.read(w)
            out(o + k) = if (signed) zigzag(v) else v
            k += 1
          }
          i = bin.i
          o += n
        case 2 => // PATCHED_BASE
          val w = WidthTable((h >>> 1) & 0x1f)
          val n = (((h & 1) << 8) | (b(i) & 0xff)) + 1
          val b3 = b(i + 1) & 0xff
          val bw = ((b3 >>> 5) & 7) + 1
          val pw = WidthTable(b3 & 0x1f)
          val b4 = b(i + 2) & 0xff
          val pgw = ((b4 >>> 5) & 7) + 1
          val pll = b4 & 0x1f
          i += 3
          var base = 0L
          var k = 0
          while (k < bw) { base = (base << 8) | (b(i + k) & 0xffL); k += 1 }
          i += bw
          val signBit = 1L << (bw * 8 - 1)
          if ((base & signBit) != 0) base = -(base & (signBit - 1))
          val bin = new BitIn(b, i)
          require(o + n <= want, "patched overrun")
          k = 0
          while (k < n) { out(o + k) = bin.read(w); k += 1 }
          bin.align()
          // patch entries pack at closestFixedBits(pgw + pw), not the
          // raw sum (the writer re-encodes the combined width)
          val cw = closestFixedBits(pgw + pw)
          var gap = 0
          var p = 0
          while (p < pll) {
            val entry = bin.read(cw)
            gap += (entry >>> pw).toInt
            val patch = entry & ((1L << pw) - 1)
            if (patch != 0) out(o + gap) |= patch << w
            p += 1
          }
          i = bin.i
          k = 0
          while (k < n) { out(o + k) += base; k += 1 }
          o += n
        case _ => // DELTA
          val code = (h >>> 1) & 0x1f
          val w = if (code == 0) 0 else WidthTable(code)
          val n = (((h & 1) << 8) | (b(i) & 0xff)) + 1
          i += 1
          val raw = varint()
          val first = if (signed) zigzag(raw) else raw
          require(o + n <= want, "delta overrun")
          out(o) = first
          if (n > 1) {
            val deltaBase = zigzag(varint()) // always signed varint
            out(o + 1) = first + deltaBase
            if (w == 0) {
              var k = 2
              while (k < n) {
                out(o + k) = out(o + k - 1) + deltaBase; k += 1
              }
            } else {
              val bin = new BitIn(b, i)
              val sign = if (deltaBase < 0) -1L else 1L
              var k = 2
              while (k < n) {
                out(o + k) = out(o + k - 1) + sign * bin.read(w)
                k += 1
              }
              i = bin.i
            }
          }
          o += n
      }
    }
    out
  }

  /** Decimal DATA stream: one unbounded little-endian base-128 zigzag
    * varint per value (the unscaled integer; ORC caps decimals at 38
    * digits ≈ 127 bits, past any fixed-width fast path). Values whose
    * encoding stays under 63 bits decode on a plain long.
    */
  private[llmops] def varBigInts(b: Array[Byte], want: Int)
      : Array[java.math.BigInteger] = {
    val out = new Array[java.math.BigInteger](want)
    var i = 0
    var k = 0
    while (k < want) {
      var fast = 0L
      var acc: java.math.BigInteger = null
      var sh = 0
      var c = 0
      do {
        require(i < b.length, "decimal varint eof")
        c = b(i) & 0xff; i += 1
        if (sh < 56) fast |= (c & 0x7fL) << sh
        else {
          if (acc == null) acc = java.math.BigInteger.valueOf(fast)
          if ((c & 0x7f) != 0)
            acc = acc.or(java.math.BigInteger.valueOf((c & 0x7fL))
              .shiftLeft(sh))
        }
        sh += 7
        require(sh <= 140, "decimal varint overruns 128 bits")
      } while ((c & 0x80) != 0)
      out(k) =
        if (acc == null) java.math.BigInteger.valueOf((fast >>> 1) ^ -(fast & 1L))
        else {
          val mag = acc.shiftRight(1)
          if (acc.testBit(0)) mag.add(java.math.BigInteger.ONE).negate()
          else mag
        }
      k += 1
    }
    out
  }

  /** Timestamp SECONDARY stream value → nanoseconds: the three low bits
    * count removed trailing zeros minus one (0 = none removed).
    */
  private[llmops] def parseNanos(v: Long): Int = {
    val zeros = (v & 7L).toInt
    var r = v >>> 3
    if (zeros != 0) {
      var i = 0
      while (i <= zeros) { r *= 10; i += 1 }
    }
    require(r >= 0 && r < 1000000000L, s"timestamp nanos out of range: $r")
    r.toInt
  }

  // ------------------------------------------------------------ column read

  private val K_BOOLEAN = 0
  private val K_BYTE = 1
  private val K_SHORT = 2
  private val K_INT = 3
  private val K_LONG = 4
  private val K_FLOAT = 5
  private val K_DOUBLE = 6
  private val K_STRING = 7
  private val K_BINARY = 8
  private val K_TIMESTAMP = 9
  private val K_LIST = 10
  private val K_MAP = 11
  private val K_STRUCT = 12
  private val K_UNION = 13
  private val K_DECIMAL = 14
  private val K_DATE = 15
  private val K_VARCHAR = 16
  private val K_CHAR = 17
  private val K_TIMESTAMP_INSTANT = 18

  /** The Spark type node `id` lands as (recursive — lists, maps and
    * nested structs resolve through their subtypes; UNION as the
    * tagged sparse struct `struct(tag, m_0, ...)`).
    */
  def sparkTypeOf(types: Vector[TypeNode], id: Int): DataType = {
    val t = types(id)
    t.kind match {
      case K_BOOLEAN => BooleanType
      case K_BYTE => ByteType
      case K_SHORT => ShortType
      case K_INT => IntegerType
      case K_LONG =>
        // Spark's NTZ convention: ORC lacked a zone-less timestamp, so
        // Spark lands TimestampNTZType as a LONG of epoch micros with
        // a type attribute — honor it so Spark-written lakes read back
        // with the schema spark.read.orc reports
        if (isSparkNtz(t)) TimestampNTZType else LongType
      case K_FLOAT => FloatType
      case K_DOUBLE => DoubleType
      case K_STRING | K_VARCHAR | K_CHAR => StringType
      case K_BINARY => BinaryType
      case K_TIMESTAMP | K_TIMESTAMP_INSTANT => TimestampType
      case K_DECIMAL =>
        val p = if (t.precision > 0) t.precision else 38
        DecimalType(p, t.scale)
      case K_DATE => DateType
      case K_LIST => ArrayType(sparkTypeOf(types, t.subtypes(0)))
      case K_MAP => MapType(sparkTypeOf(types, t.subtypes(0)),
        sparkTypeOf(types, t.subtypes(1)))
      case K_STRUCT => StructType(t.subtypes.zipWithIndex.map {
        case (sub, k) => StructField(t.fieldNames(k),
          sparkTypeOf(types, sub))
      })
      case K_UNION =>
        // tagged sparse struct — the same shape Avro multi-branch
        // unions land as (ORC union children are anonymous, so members
        // are positional: m_0, m_1, ...)
        StructType(StructField("tag", IntegerType) +:
          t.subtypes.zipWithIndex.map { case (sub, k) =>
            StructField(s"m_$k", sparkTypeOf(types, sub))
          })
      case k => throw new IllegalArgumentException(
        s"orc type kind $k unsupported")
    }
  }

  private def isSparkNtz(t: TypeNode): Boolean =
    t.kind == K_LONG &&
      t.attributes.get("spark.sql.catalyst.type").contains("timestamp_ntz")

  def rootStruct(types: Vector[TypeNode]): StructType = {
    require(types.nonEmpty && types(0).kind == K_STRUCT,
      "orc root must be a struct")
    sparkTypeOf(types, 0).asInstanceOf[StructType]
  }

  // ------------------------------------------------------ stripe statistics

  /** Per-stripe, per-column (intMin, intMax) / (strMin, strMax) from the
    * file's Metadata section; None when that column carries no stats of
    * that kind.
    */
  final case class StripeStats(
      ints: Vector[Option[(Long, Long)]],
      strs: Vector[Option[(String, String)]])

  private def parseColStats(b: Array[Byte], off: Int, len: Int)
      : (Option[(Long, Long)], Option[(String, String)]) = {
    val p = new Pb(b, off, off + len)
    var ints: Option[(Long, Long)] = None
    var strs: Option[(String, String)] = None
    while (p.hasMore) {
      p.tag() match {
        case (2, 2) => // IntegerStatistics: sint64 min=1, max=2
          val (o, n) = p.lenField()
          val pp = new Pb(b, o, o + n)
          var mn: Option[Long] = None
          var mx: Option[Long] = None
          while (pp.hasMore) {
            pp.tag() match {
              case (1, 0) => mn = Some(zigzag(pp.varint()))
              case (2, 0) => mx = Some(zigzag(pp.varint()))
              case (_, w) => pp.skip(w)
            }
          }
          for (a <- mn; z <- mx) ints = Some((a, z))
        case (4, 2) => // StringStatistics: min=1, max=2
          val (o, n) = p.lenField()
          val pp = new Pb(b, o, o + n)
          var mn: Option[String] = None
          var mx: Option[String] = None
          while (pp.hasMore) {
            pp.tag() match {
              case (1, 2) =>
                val (so, sn) = pp.lenField()
                mn = Some(new String(b, so, sn,
                  java.nio.charset.StandardCharsets.UTF_8))
              case (2, 2) =>
                val (so, sn) = pp.lenField()
                mx = Some(new String(b, so, sn,
                  java.nio.charset.StandardCharsets.UTF_8))
              case (_, w) => pp.skip(w)
            }
          }
          for (a <- mn; z <- mx) strs = Some((a, z))
        case (_, w) => p.skip(w)
      }
    }
    (ints, strs)
  }

  /** Driver-side Metadata-section read: per-stripe column statistics,
    * or None when the writer emitted none (pruning then keeps every
    * stripe — stats are an optimization, never a correctness input).
    */
  def readStripeStats(conf: org.apache.hadoop.conf.Configuration,
      path: String): Option[Vector[StripeStats]] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen
    val tailLen = math.min(len, 1L << 20).toInt
    val tail = new Array[Byte](tailLen)
    val in = fs.open(p)
    try in.readFully(len - tailLen, tail) finally in.close()
    val psLen = tail(tailLen - 1) & 0xff
    val (footerLen, comp, _, metaLen) =
      parsePostScript(tail, tailLen - 1 - psLen, psLen)
    if (metaLen <= 0) return None
    val metaOff = tailLen - 1 - psLen - footerLen - metaLen
    if (metaOff < 0) return None // metadata exceeds the tail read
    val meta = decompressStream(comp, tail, metaOff.toInt, metaLen.toInt)
    val out = Vector.newBuilder[StripeStats]
    val mp = new Pb(meta, 0, meta.length)
    while (mp.hasMore) {
      mp.tag() match {
        case (1, 2) => // StripeStatistics
          val (o, n) = mp.lenField()
          val sp = new Pb(meta, o, o + n)
          val ints = Vector.newBuilder[Option[(Long, Long)]]
          val strs = Vector.newBuilder[Option[(String, String)]]
          while (sp.hasMore) {
            sp.tag() match {
              case (1, 2) =>
                val (co, cn) = sp.lenField()
                val (i, s2) = parseColStats(meta, co, cn)
                ints += i
                strs += s2
              case (_, w) => sp.skip(w)
            }
          }
          out += StripeStats(ints.result(), strs.result())
        case (_, w) => mp.skip(w)
      }
    }
    val r = out.result()
    if (r.isEmpty) None else Some(r)
  }

  /** Stripe positions surviving a `lo <= col <= hi` long-range predicate
    * under the file's stripe statistics (all positions when stats are
    * absent or the column carries none — pruning is only ever a
    * shortcut). `colId` is the TYPE id (root.subtypes(k)); statistics
    * index by type id directly.
    */
  private[llmops] def pruneByIntRange(stripes: Int,
      stats: Option[Vector[StripeStats]], colId: Int, lo: Long,
      hi: Long): Vector[Int] = stats match {
    case Some(ss) if ss.length == stripes =>
      (0 until stripes).toVector.filter { k =>
        ss(k).ints.lift(colId).flatten match {
          case Some((mn, mx)) => mx >= lo && mn <= hi
          case None => true
        }
      }
    case _ => (0 until stripes).toVector
  }

  // ---------------------------------------------------------- file reading

  final case class OrcMeta(compression: Int, blockSize: Int,
      stripes: Vector[Stripe], types: Vector[TypeNode], rows: Long)

  /** Ceiling on the driver-side tail re-read (postscript + footer). A real
    * footer is KBs–MBs even at 160k stripes; 256 MB is far past any sane
    * file and comfortably below Int.MaxValue, so the Long→Int narrowing
    * below can never wrap.
    */
  private val MaxTailBytes = 256L << 20

  /** Driver-side tail read: postscript + footer only. */
  def readTail(conf: org.apache.hadoop.conf.Configuration,
      path: String): OrcMeta = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen
    require(len > 4, s"too short for orc: $path")
    val tailLen = math.min(len, 256L << 10).toInt
    var tail = new Array[Byte](tailLen)
    val in = fs.open(p)
    try in.readFully(len - tailLen, tail) finally in.close()
    var effLen = tailLen
    val psLen = tail(effLen - 1) & 0xff
    require(psLen > 0 && psLen < effLen - 1, "bad orc postscript length")
    val (footerLen, comp, block, _) =
      parsePostScript(tail, effLen - 1 - psLen, psLen)
    // a many-stripe file's footer can dwarf the first guess (160k stripes
    // ≈ several MB) — re-read with the now-known size instead of refusing
    // a valid file
    if (footerLen > effLen - 1 - psLen) {
      val need = footerLen + psLen + 1
      require(need <= len, "orc footer exceeds the file itself")
      // footerLen is attacker-controlled: on a >2 GB file "need + 1024"
      // can pass the length check yet overflow .toInt (negative array
      // size) or demand a multi-GB driver buffer — clamp in Long math to
      // a named ceiling and refuse loudly past it
      require(need + 1024 <= MaxTailBytes,
        s"orc footer of $footerLen bytes exceeds the " +
          s"$MaxTailBytes-byte tail cap: $path")
      effLen = math.min(len, need + 1024).toInt
      tail = new Array[Byte](effLen)
      val in2 = fs.open(p)
      try in2.readFully(len - effLen, tail) finally in2.close()
    }
    require(footerLen > 0 && footerLen <= effLen - 1 - psLen,
      "orc footer exceeds tail read")
    val footerComp = decompressStream(comp, tail,
      (effLen - 1 - psLen - footerLen).toInt, footerLen.toInt)
    val (stripes, types, rows) = parseFooter(footerComp, 0,
      footerComp.length)
    require(types.nonEmpty, "orc footer has no types")
    rootStruct(types) // throws on unsupported type kinds, recursively
    OrcMeta(comp, block.toInt, stripes, types, rows)
  }

  /** Root-subtype positions for the requested column names (Nil = all,
    * file order). Unknown names refuse — silent pruning would read as
    * missing data.
    */
  private def wantedPositions(types: Vector[TypeNode],
      columns: Seq[String]): Vector[Int] = {
    val root = types(0)
    if (columns.isEmpty) root.subtypes.indices.toVector
    else columns.toVector.map { c =>
      val k = root.fieldNames.indexOf(c)
      require(k >= 0, s"orc column $c not in ${root.fieldNames}")
      k
    }
  }

  /** Decode one stripe's bytes to rows (root-struct columns only).
    * `wanted` = root-subtype positions to materialize — columns outside
    * it never decompress their streams (column pruning reaches the
    * stripe read).
    */
  private[llmops] def decodeStripe(meta: OrcMeta,
      stripe: Stripe, bytes: Array[Byte],
      wanted: Vector[Int]): Seq[Row] = {
    try {
      val footOff = (stripe.indexLength + stripe.dataLength).toInt
      val sf = decompressStream(meta.compression, bytes, footOff,
        stripe.footerLength.toInt)
      val (streams, encs, writerTz) = parseStripeFooter(sf)
      // stream byte positions accumulate in list order
      var pos = 0L
      val located = streams.map { s =>
        val r = (s, pos); pos += s.length; r
      }
      val rows = stripe.rows.toInt
      def streamBytes(column: Int, kind: Int): Array[Byte] =
        located.find { case (s, _) => s.column == column && s.kind == kind }
          .map { case (s, off) =>
            decompressStream(meta.compression, bytes, off.toInt,
              s.length.toInt)
          }.orNull
      // TIMESTAMP values count seconds from 2015-01-01 00:00:00 in the
      // WRITER's timezone (recorded in the stripe footer);
      // TIMESTAMP_INSTANT is always UTC-based
      lazy val writerBase: Long = {
        val zone =
          try java.time.ZoneId.of(if (writerTz.isEmpty) "UTC" else writerTz)
          catch { case _: java.time.DateTimeException =>
            java.time.ZoneOffset.UTC }
        java.time.ZonedDateTime.of(2015, 1, 1, 0, 0, 0, 0, zone)
          .toEpochSecond
      }
      val utcBase = 1420070400L // 2015-01-01T00:00:00Z

      /** Decode column `colId` over `count` value slots at this nesting
        * level (root children: stripe rows; struct children: the
        * parent's non-null count; list/map children: the sum of
        * lengths). Nulls scatter through the column's PRESENT stream.
        */
      def readColumn(colId: Int, count: Int): Array[Any] = {
        val t = meta.types(colId)
        // integer-RLE version follows the COLUMN's encoding: kinds 0/1
        // (Hive 0.11/0.12 DIRECT/DICTIONARY) are RLEv1 — decoding them as
        // v2 would return garbage that often parses, silent corruption
        def intRle(b: Array[Byte], want: Int, signed: Boolean): Array[Long] = {
          val enc0 = encs(colId)
          if (enc0.kind == 0 || enc0.kind == 1) rleV1(b, want, signed)
          else rleV2(b, want, signed)
        }
        val present = streamBytes(colId, 0) match {
          case null => null
          case pb => boolRle(pb, count)
        }
        val nPresent = if (present == null) count else present.count(x => x)
        val enc = encs(colId)
        val out = new Array[Any](count)
        def scatter(vals: Int => Any): Unit = {
          var vi = 0
          var ri = 0
          while (ri < count) {
            if (present == null || present(ri)) {
              out(ri) = vals(vi); vi += 1
            }
            ri += 1
          }
        }
        /** LENGTH stream prefix offsets for list/map nesting. */
        def lengthOffsets(): Array[Int] = {
          val lens = intRle(streamBytes(colId, 2), nPresent, signed = false)
          val offs = new Array[Int](nPresent + 1)
          var k = 0
          while (k < nPresent) {
            offs(k + 1) = offs(k) + lens(k).toInt; k += 1
          }
          offs
        }
        t.kind match {
          case K_BOOLEAN =>
            val data = boolRle(streamBytes(colId, 1), nPresent)
            scatter(i => data(i))
          case K_BYTE =>
            val data = byteRle(streamBytes(colId, 1), nPresent)
            scatter(i => data(i))
          case K_SHORT | K_INT | K_LONG | K_DATE =>
            val data = intRle(streamBytes(colId, 1), nPresent,
              signed = true)
            t.kind match {
              case K_SHORT => scatter(i => data(i).toShort)
              case K_INT => scatter(i => data(i).toInt)
              case K_DATE => scatter(i => java.sql.Date.valueOf(
                java.time.LocalDate.ofEpochDay(data(i))))
              case _ if isSparkNtz(t) => scatter { i =>
                val us = data(i)
                java.time.LocalDateTime.ofInstant(
                  java.time.Instant.ofEpochSecond(
                    Math.floorDiv(us, 1000000L),
                    Math.floorMod(us, 1000000L) * 1000L),
                  java.time.ZoneOffset.UTC)
              }
              case _ => scatter(i => data(i))
            }
          case K_FLOAT =>
            val data = streamBytes(colId, 1)
            scatter { i =>
              val p = i * 4
              java.lang.Float.intBitsToFloat((data(p) & 0xff) |
                ((data(p + 1) & 0xff) << 8) | ((data(p + 2) & 0xff) << 16) |
                ((data(p + 3) & 0xff) << 24))
            }
          case K_DOUBLE =>
            val data = streamBytes(colId, 1)
            scatter { i =>
              var v = 0L
              var k = 0
              while (k < 8) { v |= (data(i * 8 + k) & 0xffL) << (8 * k); k += 1 }
              java.lang.Double.longBitsToDouble(v)
            }
          case K_DECIMAL =>
            // DATA: unbounded zigzag varints (unscaled); SECONDARY: the
            // per-value scale as signed RLE. Values rescale to the
            // declared type scale (modern writers emit it directly).
            val unscaled = varBigInts(streamBytes(colId, 1), nPresent)
            val scales = intRle(streamBytes(colId, 5), nPresent,
              signed = true)
            val declared = t.scale
            scatter { i =>
              val bd = new java.math.BigDecimal(unscaled(i),
                scales(i).toInt)
              if (scales(i).toInt == declared) bd
              else bd.setScale(declared, java.math.RoundingMode.HALF_UP)
            }
          case K_TIMESTAMP | K_TIMESTAMP_INSTANT =>
            // DATA: signed seconds from the 2015 base; SECONDARY: nanos
            // with the trailing-zero scheme. The writer truncates a
            // MILLISECOND value toward zero, so negative-epoch values
            // shift down one second on decode only when the nanos carry
            // a full millisecond (orc-core's reader rule: sub-ms nanos
            // never moved the seconds on write)
            val secs = intRle(streamBytes(colId, 1), nPresent,
              signed = true)
            val nanosRaw = intRle(streamBytes(colId, 5), nPresent,
              signed = false)
            val base =
              if (t.kind == K_TIMESTAMP_INSTANT) utcBase else writerBase
            scatter { i =>
              var s = secs(i) + base
              val n = parseNanos(nanosRaw(i))
              if (s < 0 && n > 999999) s -= 1
              java.sql.Timestamp.from(
                java.time.Instant.ofEpochSecond(s, n.toLong))
            }
          case K_LIST =>
            val offs = lengthOffsets()
            val kids = readColumn(t.subtypes(0), offs(nPresent))
            scatter { i =>
              val s = offs(i); val e = offs(i + 1)
              val b = Vector.newBuilder[Any]
              var j = s
              while (j < e) { b += kids(j); j += 1 }
              b.result()
            }
          case K_MAP =>
            val offs = lengthOffsets()
            val keys = readColumn(t.subtypes(0), offs(nPresent))
            val vals = readColumn(t.subtypes(1), offs(nPresent))
            scatter { i =>
              val s = offs(i); val e = offs(i + 1)
              val b = Map.newBuilder[Any, Any]
              var j = s
              while (j < e) { b += keys(j) -> vals(j); j += 1 }
              b.result()
            }
          case K_STRUCT =>
            val cols = t.subtypes.map(readColumn(_, nPresent))
            scatter(i => Row.fromSeq(cols.map(_(i))))
          case K_UNION =>
            // DATA: one tag byte per non-null value; child column j
            // holds only the values whose tag == j, packed in order.
            // Lands as the tagged sparse struct sparkTypeOf declares.
            val tags = byteRle(streamBytes(colId, 1), nPresent)
            val nk = t.subtypes.length
            val counts = new Array[Int](nk)
            var k = 0
            while (k < nPresent) {
              val tg = tags(k) & 0xff
              require(tg < nk, s"union tag $tg out of range")
              counts(tg) += 1; k += 1
            }
            val kids = Array.tabulate(nk)(j =>
              readColumn(t.subtypes(j), counts(j)))
            val cursor = new Array[Int](nk)
            // scatter feeds dense indices in order, so per-branch
            // cursors walk each packed child exactly once
            scatter { i =>
              val tg = tags(i) & 0xff
              val cells = new Array[Any](1 + nk)
              cells(0) = tg
              cells(1 + tg) = kids(tg)(cursor(tg))
              cursor(tg) += 1
              Row.fromSeq(scala.collection.immutable.ArraySeq
                .unsafeWrapArray(cells))
            }
          case K_STRING | K_VARCHAR | K_CHAR | K_BINARY =>
            val isDict = enc.kind == 1 || enc.kind == 3
            if (!isDict) {
              val lens = intRle(streamBytes(colId, 2), nPresent,
                signed = false)
              val data = streamBytes(colId, 1)
              val offs = new Array[Int](nPresent + 1)
              var k = 0
              while (k < nPresent) {
                offs(k + 1) = offs(k) + lens(k).toInt; k += 1
              }
              if (t.kind == K_BINARY)
                scatter(i => java.util.Arrays.copyOfRange(data, offs(i),
                  offs(i + 1)))
              else
                scatter(i => new String(data, offs(i),
                  offs(i + 1) - offs(i),
                  java.nio.charset.StandardCharsets.UTF_8))
            } else {
              val dictLens = intRle(streamBytes(colId, 2), enc.dictSize,
                signed = false)
              val dictData = streamBytes(colId, 3) match {
                case null => Array.emptyByteArray
                case d => d
              }
              val dict = new Array[String](enc.dictSize)
              var off = 0
              var k = 0
              while (k < enc.dictSize) {
                dict(k) = new String(dictData, off, dictLens(k).toInt,
                  java.nio.charset.StandardCharsets.UTF_8)
                off += dictLens(k).toInt
                k += 1
              }
              val ids = intRle(streamBytes(colId, 1), nPresent,
                signed = false)
              if (t.kind == K_BINARY)
                scatter(i => dict(ids(i).toInt).getBytes(
                  java.nio.charset.StandardCharsets.UTF_8))
              else scatter(i => dict(ids(i).toInt))
            }
          case k => throw new IllegalArgumentException(s"kind $k")
        }
        out
      }
      val root = meta.types(0)
      val cols: Vector[Array[Any]] =
        wanted.map(root.subtypes).map(readColumn(_, rows))
      (0 until rows).map(r => Row.fromSeq(cols.map(_(r))))
    } catch { case scala.util.control.NonFatal(_) => Seq.empty }
  }

  /** Read an ORC file as a typed DataFrame — one task per stripe, one
    * ranged read each, file bytes never shuffle.
    *
    * `pruneBy = Some((col, lo, hi))` applies STRIPE PRUNING through the
    * file's Metadata statistics: stripes whose [min,max] for `col`
    * cannot intersect [lo,hi] never schedule a task or read a byte —
    * the partition-pruning analog for a point/range lookup at scale.
    * Pruning is a shortcut, not a filter: rows outside the range from
    * surviving stripes still return, so compose with `.filter` for
    * exact semantics (the plan the caller wanted anyway).
    */
  def readOrc(spark: SparkSession, path: String,
      columns: Seq[String] = Nil,
      pruneBy: Option[(String, Long, Long)] = None): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val meta = readTail(conf, path)
    val wanted = wantedPositions(meta.types, columns)
    val full = rootStruct(meta.types)
    val struct = StructType(wanted.map(full.fields))
    val confB = new org.apache.spark.util.SerializableConfiguration(conf)
    val metaB = meta
    val kept = pruneBy match {
      case None => meta.stripes
      case Some((colName, lo, hi)) =>
        val root = meta.types(0)
        val k = root.fieldNames.indexOf(colName)
        require(k >= 0, s"orc prune column $colName not in ${root.fieldNames}")
        val stats = readStripeStats(conf, path)
        pruneByIntRange(meta.stripes.length, stats, root.subtypes(k),
          lo, hi).map(meta.stripes)
    }
    val stripes = kept.map(s => (s.offset, s.indexLength,
      s.dataLength, s.footerLength, s.rows))
    stripes.toDF("offset", "indexLen", "dataLen", "footerLen", "rows")
      .repartition(DriverPar.planPartitions(spark, stripes.size,
        stripes.map(s => s._2 + s._3 + s._4).sum, 32L << 20))
      .as[(Long, Long, Long, Long, Long)]
      .flatMap { case (offset, il, dl, fl, rows) =>
        val total = il + dl + fl
        // a healthy stripe past the envelope must refuse LOUDLY — an
        // Iterator.empty here would silently vanish its rows from a
        // well-formed file (orc.stripe.size is writer-configurable)
        require(total <= MaxStripeBytes,
          s"orc stripe at offset $offset is $total bytes — past the " +
            s"$MaxStripeBytes single-task envelope; split the file or " +
            "rewrite with a smaller orc.stripe.size")
        if (total <= 0) Iterator.empty
        else {
          val p = new org.apache.hadoop.fs.Path(path)
          val fs = p.getFileSystem(confB.value)
          val in = fs.open(p)
          val buf = new Array[Byte](total.toInt)
          try { in.readFully(offset, buf) } finally in.close()
          decodeStripe(metaB, Stripe(offset, il, dl, fl, rows), buf,
            wanted).iterator
        }
      }(org.apache.spark.sql.Encoders.row(struct))
  }

  /** Multi-file [[readOrc]]: file, glob, or directory → ONE DataFrame
    * with a leading `path` provenance column; schemas must agree; every
    * (file, stripe) pair is one task.
    */
  def readOrcFiles(spark: SparkSession, pathOrGlob: String,
      columns: Seq[String] = Nil,
      pruneBy: Option[(String, Long, Long)] = None,
      mergeSchemas: Boolean = false): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val files = Avro.resolveFiles(conf, pathOrGlob)
    val metas =
      DriverPar.parMap(files) { case (p, _) => p -> readTail(conf, p) }
    val structs = metas.map(m => rootStruct(m._2.types)).distinct
    require(mergeSchemas || structs.size == 1,
      s"orc shard schemas disagree: ${structs.size} distinct — pass " +
        "mergeSchemas = true to union fields by name (schema evolution)")
    // schema evolution: union fields by name in first-appearance order;
    // absent fields fill NULL per shard; same name must land same type
    val structByPath = metas.map { case (p, m) =>
      p -> rootStruct(m.types)
    }.toMap
    val mergedAll = {
      val order = scala.collection.mutable.LinkedHashMap
        .empty[String, StructField]
      metas.foreach { case (p, _) =>
        structByPath(p).fields.foreach { f =>
          order.get(f.name) match {
            case None => order(f.name) = f
            case Some(prev) => require(prev.dataType == f.dataType,
              s"field ${f.name} lands ${prev.dataType} in one shard " +
                s"and ${f.dataType} in another — evolution merges " +
                "names, never types")
          }
        }
      }
      order.values.toVector
    }
    val selected: Vector[StructField] =
      if (columns.isEmpty) mergedAll
      else columns.toVector.map { c =>
        mergedAll.find(_.name == c).getOrElse(
          throw new IllegalArgumentException(
            s"orc column $c not in ${mergedAll.map(_.name)}"))
      }
    val struct = StructType(StructField("path", StringType) +: selected)
    // per path: positions of the selected fields that exist there, and
    // the scatter from merged slot → index in the decoded row (-1=NULL)
    val wantedByPath: Map[String, Vector[Int]] = structByPath.map {
      case (p, st) => p -> selected.flatMap(f =>
        Some(st.fieldNames.indexOf(f.name)).filter(_ >= 0))
    }
    val slotsByPath: Map[String, Array[Int]] = structByPath.map {
      case (p, st) =>
        var next = 0
        p -> selected.map { f =>
          if (st.fieldNames.contains(f.name)) { val k = next; next += 1; k }
          else -1
        }.toArray
    }
    val confB = new org.apache.spark.util.SerializableConfiguration(conf)
    val metaByPath = metas.toMap
    val stripes = metas.flatMap { case (p, m) =>
      val kept = pruneBy match {
        case None => m.stripes
        case Some((colName, lo, hi)) =>
          val root = m.types(0)
          val k = root.fieldNames.indexOf(colName)
          require(k >= 0 || mergeSchemas,
            s"orc prune column $colName not in ${root.fieldNames}")
          if (k < 0) m.stripes // absent column: stats prove nothing
          else pruneByIntRange(m.stripes.length, readStripeStats(conf, p),
            root.subtypes(k), lo, hi).map(m.stripes)
      }
      kept.map(s => (p, s.offset, s.indexLength, s.dataLength,
        s.footerLength, s.rows))
    }
    stripes.toDF("path", "offset", "indexLen", "dataLen", "footerLen",
        "rows")
      .repartition(DriverPar.planPartitions(spark, stripes.size,
        stripes.map(s => s._3 + s._4 + s._5).sum, 32L << 20))
      .as[(String, Long, Long, Long, Long, Long)]
      .flatMap { case (path, offset, il, dl, fl, rows) =>
        val total = il + dl + fl
        require(total <= MaxStripeBytes, // loud, same contract as readOrc
          s"orc stripe at $path offset $offset is $total bytes — past " +
            s"the $MaxStripeBytes single-task envelope")
        if (total <= 0) Iterator.empty
        else {
          val p = new org.apache.hadoop.fs.Path(path)
          val fs = p.getFileSystem(confB.value)
          val in = fs.open(p)
          val buf = new Array[Byte](total.toInt)
          try { in.readFully(offset, buf) } finally in.close()
          val slots = slotsByPath(path)
          decodeStripe(metaByPath(path),
            Stripe(offset, il, dl, fl, rows), buf, wantedByPath(path))
            .iterator.map { r =>
              val cells = new Array[Any](1 + slots.length)
              cells(0) = path
              var i = 0
              while (i < slots.length) {
                cells(1 + i) = if (slots(i) < 0) null else r.get(slots(i))
                i += 1
              }
              Row.fromSeq(scala.collection.immutable.ArraySeq
                .unsafeWrapArray(cells))
            }
        }
      }(org.apache.spark.sql.Encoders.row(struct))
  }
}
