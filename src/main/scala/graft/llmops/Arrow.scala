package graft.llmops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Apache Arrow IPC *file* ingestion, from scratch (the Arrow columnar
  * format and its flatbuffers schemas are public): footer-driven
  * SPLITTABLE reads — the footer lists every record batch's (offset,
  * metaLength, bodyLength), so each batch decodes in its own task from
  * one ranged read, no sync scanning needed. Reference hook: raw-layer
  * ingestion, `aje_libs/common/helpers/utils/dynamodb_helper.py`
  * table-driven loads (Arrow files are the interchange format modern
  * feature stores and dataframe tools land).
  *
  * Includes a minimal generic flatbuffers READER (vtable walk — ~60
  * lines; Arrow metadata is flatbuffers, and none of the public jars
  * may be linked from engine code) and a from-scratch columnar decoder:
  * validity bitmaps, offset+data buffers, nested lists and structs.
  *
  * Type support: Bool; signed Int 8/16/32/64; FloatingPoint single /
  * double; Utf8/Binary (+ Large variants); Date32/64 → DateType;
  * Timestamp (all four units) → TimestampType when zone-annotated,
  * TimestampNTZType when wall-clock; Time32/64 and Duration as their
  * int passthroughs (Spark has no time-of-day type);
  * List/LargeList; Struct; dictionary-encoded columns over any scalar
  * value type (dictionary batches materialize once on the driver,
  * size-capped — delta batches append; replacement refuses, as the
  * file format requires). Sparse AND dense unions land as tagged
  * sparse structs — `struct(tag INT, m_<child> ...)` with the type-id
  * byte in `tag` (the same shape Avro multi-branch unions and ORC
  * UNION columns land as); note Arrow union slots are never NULL at
  * the top (nulls live in the selected child — the format has no
  * union validity buffer). Run-end encoded columns decode
  * TRANSPARENTLY to their value type (runs expand during the batch
  * task's columnar walk). Utf8View/BinaryView (polars' and
  * pyarrow 16+'s native string layout) decode inline-or-variadic view
  * structs, honoring the RecordBatch's variadicBufferCounts even for
  * pruned columns. ListView/LargeListView decode to the same ArrayType
  * as List (offsets + sizes honored, out-of-order and overlapping
  * ranges included). Map → MapType (List-of-entries layout);
  * FixedSizeBinary → BinaryType; the Null type decodes to all-NULL
  * slots (no buffers). Interval columns land typed: YEAR_MONTH →
  * year-month interval, DAY_TIME → day-time interval (exact — millis
  * are micro-representable), MONTH_DAY_NANO → CalendarIntervalType
  * (three-part; a sub-microsecond nano remainder refuses to NULL
  * rather than silently truncate). Body compression:
  * LZ4-frame and zstd via the repo's own decoders.
  *
  * Corruption blast radius: one record batch (a batch that fails
  * structural validation is dropped; the footer keeps every other batch
  * reachable — unlike stream-framed formats there is no chain to walk).
  */
object Arrow {

  private val MaxBatchBytes = 1L << 30

  // ------------------------------------------------------- flatbuffers read

  /** Minimal flatbuffers table reader: little-endian scalars, vtable
    * field lookup, strings, vectors, structs.
    */
  private[llmops] final class Fb(val b: Array[Byte]) {
    def i16(p: Int): Int =
      ((b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)).toShort.toInt
    def u8(p: Int): Int = b(p) & 0xff
    def i32(p: Int): Int =
      (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
      ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
    def i64(p: Int): Long = {
      var v = 0L; var k = 0
      while (k < 8) { v |= (b(p + k) & 0xffL) << (8 * k); k += 1 }
      v
    }
    /** root table position. */
    def root(off: Int = 0): Int = off + i32(off)
    /** absolute position of field `id`'s slot in table `t`, or -1. */
    def slot(t: Int, id: Int): Int = {
      val vt = t - i32(t)
      val vsize = i16(vt)
      val fo = 4 + 2 * id
      if (fo >= vsize) return -1
      val o = i16(vt + fo)
      if (o == 0) -1 else t + o
    }
    def fieldI16(t: Int, id: Int, dflt: Int): Int = {
      val s = slot(t, id); if (s < 0) dflt else i16(s)
    }
    def fieldI32(t: Int, id: Int, dflt: Int): Int = {
      val s = slot(t, id); if (s < 0) dflt else i32(s)
    }
    def fieldI64(t: Int, id: Int, dflt: Long): Long = {
      val s = slot(t, id); if (s < 0) dflt else i64(s)
    }
    def fieldU8(t: Int, id: Int, dflt: Int): Int = {
      val s = slot(t, id); if (s < 0) dflt else u8(s)
    }
    def fieldBool(t: Int, id: Int, dflt: Boolean): Boolean = {
      val s = slot(t, id); if (s < 0) dflt else b(s) != 0
    }
    /** table/string/vector-typed field: absolute target position. */
    def fieldOff(t: Int, id: Int): Int = {
      val s = slot(t, id); if (s < 0) -1 else s + i32(s)
    }
    def string(p: Int): String = {
      val n = i32(p)
      new String(b, p + 4, n, java.nio.charset.StandardCharsets.UTF_8)
    }
    def vecLen(p: Int): Int = i32(p)
    /** absolute position of vector element `k` (elements of `width`
      * bytes; for offset vectors pass 4 and resolve separately).
      */
    def vecElem(p: Int, k: Int, width: Int): Int = p + 4 + k * width
    /** table-offset vector element: absolute table position. */
    def vecTable(p: Int, k: Int): Int = {
      val ep = vecElem(p, k, 4); ep + i32(ep)
    }
  }

  // ------------------------------------------------------------- the schema

  sealed trait AType
  case object ABool extends AType
  final case class AInt(bits: Int) extends AType
  case object AFloat extends AType
  case object ADouble extends AType
  final case class AString(large: Boolean) extends AType
  final case class ABinary(large: Boolean) extends AType
  /** int32/int64 passthrough (Duration — no Spark-native target). */
  final case class APassthrough(bits: Int) extends AType
  /** Date32 (epoch days). */
  case object ADate32 extends AType
  /** Date64 (epoch millis at day granularity). */
  case object ADate64 extends AType
  /** Timestamp: `unit` is the TimeUnit ordinal (0=s 1=ms 2=us 3=ns);
    * `tz` marks an instant (zone-annotated) vs a wall-clock (NTZ).
    */
  final case class ATimestamp(unit: Int, tz: Boolean) extends AType
  /** Interval: unit 0 = YEAR_MONTH (i32 months → Spark year-month
    * interval), 1 = DAY_TIME (i32 days + i32 millis → Spark day-time
    * interval, exact in microseconds), 2 = MONTH_DAY_NANO (i32 + i32 +
    * i64 nanos → CalendarIntervalType; a sub-microsecond nano
    * remainder refuses to NULL rather than silently truncate —
    * CalendarInterval holds microseconds).
    */
  final case class AInterval(unit: Int) extends AType
  /** Decimal128/256 (little-endian two's-complement unscaled). */
  final case class ADecimal(precision: Int, scale: Int,
      bits: Int) extends AType
  final case class AList(child: AField, large: Boolean) extends AType
  /** FixedSizeList: `n` values per slot, no offsets buffer — the layout
    * embedding columns ship in.
    */
  final case class AFixedList(child: AField, n: Int) extends AType
  final case class AStruct(children: Vector[AField]) extends AType
  /** Sparse or dense union — lands as a tagged sparse struct
    * `struct(tag INT, m_<child> ...)` with the type-id byte in `tag`
    * (ids from the schema's typeIds vector, child index when absent).
    * Arrow unions carry NO top-level validity: a null lives in the
    * selected child, so the struct itself is never NULL (unlike the
    * Avro/ORC tagged structs, where the container has a null branch).
    */
  final case class AUnion(children: Vector[AField], typeIds: Vector[Int],
      dense: Boolean) extends AType
  /** Run-end encoded column — decodes TRANSPARENTLY to its value type
    * (the logical column the runs compress). Children: run_ends
    * (int16/32/64, never null, strictly increasing logical end
    * positions) and values; the REE node itself owns NO buffers.
    */
  final case class ARunEnd(runEnds: AField, values: AField) extends AType
  /** Utf8View / BinaryView (polars' and pyarrow 16+'s native string
    * layout): validity + a 16-byte view struct per slot (length; ≤12
    * bytes inline, else 4-byte prefix + variadic-buffer index +
    * offset) + N variadic data buffers, N per batch from the
    * RecordBatch message's variadicBufferCounts.
    */
  final case class AView(binary: Boolean) extends AType
  /** ListView / LargeListView: validity + offsets + sizes buffers over
    * a child that entries may index out of order or overlapping.
    */
  final case class AListView(child: AField, large: Boolean) extends AType
  /** Map: a List of struct<key, value> entries with map semantics. */
  final case class AMap(entries: AField) extends AType
  /** FixedSizeBinary: `n` bytes per slot, no offsets buffer. */
  final case class AFixedBinary(n: Int) extends AType
  /** Null type: no buffers at all, every slot NULL. */
  case object ANull extends AType

  /** `dict` marks a dictionary-encoded field: (dictionary id, index
    * bit width). `tpe` is then the VALUE type (what the column means);
    * record batches carry only the index vector.
    */
  final case class AField(name: String, nullable: Boolean, tpe: AType,
      dict: Option[(Long, Int)] = None)

  def sparkType(t: AType): DataType = t match {
    case ABool => BooleanType
    case AInt(8) => ByteType
    case AInt(16) => ShortType
    case AInt(32) => IntegerType
    case AInt(64) => LongType
    case AInt(b) => throw new IllegalArgumentException(s"int$b")
    case AFloat => FloatType
    case ADouble => DoubleType
    case AString(_) => StringType
    case ABinary(_) => BinaryType
    case ADate32 | ADate64 => DateType
    case ATimestamp(_, true) => TimestampType
    case ATimestamp(_, false) => TimestampNTZType
    case AInterval(0) => YearMonthIntervalType()
    case AInterval(1) => DayTimeIntervalType()
    case AInterval(_) => CalendarIntervalType
    case ADecimal(p, s, _) => DecimalType(p, s)
    case APassthrough(32) => IntegerType
    case APassthrough(_) => LongType
    case AList(c, _) => ArrayType(sparkType(c.tpe))
    case AFixedList(c, _) => ArrayType(sparkType(c.tpe))
    case AStruct(cs) => StructType(cs.map(c =>
      StructField(c.name, sparkType(c.tpe), c.nullable)))
    case AUnion(cs, _, _) =>
      val seen = scala.collection.mutable.Map.empty[String, Int]
      val members = cs.map { c =>
        val base = if (c.name.isEmpty) "c" else c.name
        val k = seen.getOrElse(base, 0); seen(base) = k + 1
        StructField("m_" + (if (k == 0) base else s"${base}_$k"),
          sparkType(c.tpe))
      }
      StructType(StructField("tag", IntegerType) +: members)
    case ARunEnd(_, values) => sparkType(values.tpe)
    case AView(binary) => if (binary) BinaryType else StringType
    case AListView(c, _) => ArrayType(sparkType(c.tpe))
    case AMap(entries) =>
      val st = sparkType(entries.tpe).asInstanceOf[StructType]
      MapType(st(0).dataType, st(1).dataType)
    case AFixedBinary(_) => BinaryType
    case ANull => NullType
  }

  def rootStruct(fields: Vector[AField]): StructType =
    StructType(fields.map(f =>
      StructField(f.name, sparkType(f.tpe), f.nullable)))

  private def parseField(fb: Fb, t: Int): AField = {
    val name = {
      val p = fb.fieldOff(t, 0); if (p < 0) "" else fb.string(p)
    }
    val nullable = fb.fieldBool(t, 1, dflt = false)
    // DictionaryEncoding table: id (i64), indexType (Int table —
    // bitWidth + is_signed; absent = signed int32 per the format doc)
    val dict = fb.fieldOff(t, 4) match {
      case d if d < 0 => None
      case d =>
        val id = fb.fieldI64(d, 0, 0L)
        val it = fb.fieldOff(d, 1)
        val bits = if (it < 0) 32 else fb.fieldI32(it, 0, 32)
        require(bits == 8 || bits == 16 || bits == 32 || bits == 64,
          s"dictionary index width $bits unsupported (field $name)")
        // same stance as the plain-Int path: unsigned indices would
        // sign-extend (uint8 200 → -56) and silently drop the batch
        require(it < 0 || fb.fieldBool(it, 1, dflt = false),
          s"unsigned dictionary index int$bits unsupported (field $name)")
        Some((id, bits))
    }
    val tt = fb.fieldU8(t, 2, 0)
    val tp = fb.fieldOff(t, 3)
    def children: Vector[AField] = {
      val cv = fb.fieldOff(t, 5)
      if (cv < 0) Vector.empty
      else (0 until fb.vecLen(cv)).map(k =>
        parseField(fb, fb.vecTable(cv, k))).toVector
    }
    val tpe: AType = tt match {
      case 7 => // Decimal: precision, scale, bitWidth (default 128)
        val p = fb.fieldI32(tp, 0, 0)
        val sc = fb.fieldI32(tp, 1, 0)
        val bits = fb.fieldI32(tp, 2, 128)
        require(bits == 128 || bits == 256,
          s"decimal bit width $bits unsupported (field $name)")
        require(p >= 1 && p <= 38,
          s"decimal precision $p outside Spark's 38-digit cap (field $name)")
        ADecimal(p, sc, bits)
      case 2 => // Int
        val bits = fb.fieldI32(tp, 0, 0)
        require(fb.fieldBool(tp, 1, dflt = false),
          s"unsigned int$bits unsupported (field $name)")
        AInt(bits)
      case 3 => // FloatingPoint
        fb.fieldI16(tp, 0, 0) match {
          case 1 => AFloat
          case 2 => ADouble
          case p => throw new IllegalArgumentException(s"fp precision $p")
        }
      case 4 => ABinary(large = false)
      case 5 => AString(large = false)
      case 6 => ABool
      case 8 => // Date: DAY=int32, MILLISECOND=int64 (fbs default MILLISECOND)
        if (fb.fieldI16(tp, 0, 1) == 0) ADate32 else ADate64
      case 9 => // Time32/64: passthrough ints (Spark has no time type)
        if (fb.fieldI32(tp, 1, 32) == 32) APassthrough(32)
        else APassthrough(64)
      case 10 => // Timestamp (fbs default unit SECOND, tz optional)
        val unit = fb.fieldI16(tp, 0, 0)
        val tzOff = fb.fieldOff(tp, 1)
        ATimestamp(unit, tzOff >= 0 && fb.string(tzOff).nonEmpty)
      case 18 => APassthrough(64) // Duration
      case 12 => AList(children.head, large = false)
      case 13 => AStruct(children)
      case 16 => // FixedSizeList: listSize (i32)
        val sz = fb.fieldI32(tp, 0, 0)
        require(sz > 0, s"fixed-size list of $sz (field $name)")
        AFixedList(children.head, sz)
      case 14 => // Union: mode (0=Sparse 1=Dense), typeIds (i32 vector;
        // absent = child indices per the format doc)
        val mode = fb.fieldI16(tp, 0, 0)
        val cs = children
        val tiv = fb.fieldOff(tp, 1)
        val ids =
          if (tiv < 0) cs.indices.toVector
          else (0 until fb.vecLen(tiv)).map(k =>
            fb.i32(fb.vecElem(tiv, k, 4))).toVector
        require(ids.length == cs.length,
          s"union typeIds/children mismatch (field $name)")
        AUnion(cs, ids, dense = mode == 1)
      case 19 => ABinary(large = true)
      case 20 => AString(large = true)
      case 21 => AList(children.head, large = true)
      case 22 => // RunEndEncoded: children [run_ends, values]
        val cs = children
        require(cs.length == 2,
          s"run-end encoding needs 2 children (field $name)")
        cs.head.tpe match {
          case AInt(16) | AInt(32) | AInt(64) =>
          case other => throw new IllegalArgumentException(
            s"run_ends type $other unsupported (field $name)")
        }
        ARunEnd(cs.head, cs(1))
      case 23 => AView(binary = true)
      case 24 => AView(binary = false)
      case 25 => AListView(children.head, large = false)
      case 26 => AListView(children.head, large = true)
      case 1 => ANull
      case 15 => // FixedSizeBinary: byteWidth (i32)
        val w = fb.fieldI32(tp, 0, 0)
        require(w > 0, s"fixed-size binary of $w (field $name)")
        AFixedBinary(w)
      case 17 => // Map: one struct<key,value> entries child
        val cs = children
        require(cs.length == 1, s"map needs 1 entries child (field $name)")
        cs.head.tpe match {
          case AStruct(kv) if kv.length == 2 =>
          case other => throw new IllegalArgumentException(
            s"map entries must be struct<key,value>, got $other " +
              s"(field $name)")
        }
        AMap(cs.head)
      case 11 => // Interval: unit (i16, fbs default YEAR_MONTH=0)
        val unit = fb.fieldI16(tp, 0, 0)
        require(unit >= 0 && unit <= 2,
          s"arrow interval unit $unit unknown (field $name)")
        AInterval(unit)
      case other => throw new IllegalArgumentException(
        s"arrow type id $other unsupported (field $name)")
    }
    dict.foreach { _ =>
      require(!tpe.isInstanceOf[AList] && !tpe.isInstanceOf[AStruct] &&
        !tpe.isInstanceOf[AFixedList] && !tpe.isInstanceOf[AUnion] &&
        !tpe.isInstanceOf[ARunEnd] && !tpe.isInstanceOf[AListView],
        s"dictionary-encoded nested value type unsupported (field $name)")
    }
    // a run-end column is null wherever its VALUES child is null (the
    // REE node has no validity of its own), so nullability lifts
    val effNullable = tpe match {
      case ARunEnd(_, v) => nullable || v.nullable
      case _ => nullable
    }
    AField(name, effNullable, tpe, dict)
  }

  private[llmops] def parseSchemaTable(fb: Fb, t: Int): Vector[AField] = {
    val fv = fb.fieldOff(t, 1)
    require(fv >= 0, "schema has no fields vector")
    (0 until fb.vecLen(fv)).map(k =>
      parseField(fb, fb.vecTable(fv, k))).toVector
  }

  // ------------------------------------------------------------- the footer

  final case class Batch(offset: Long, metaLen: Int, bodyLen: Long)
  final case class Footer(fields: Vector[AField], batches: Vector[Batch],
      dictionaries: Vector[Batch] = Vector.empty)

  private def parseBlocks(fb: Fb, bv: Int): Vector[Batch] =
    if (bv < 0) Vector.empty
    else (0 until fb.vecLen(bv)).map { k =>
      val p = fb.vecElem(bv, k, 24) // Block struct: i64, i32, pad, i64
      Batch(fb.i64(p), fb.i32(p + 8), fb.i64(p + 16))
    }.toVector

  private[llmops] def parseFooter(tail: Array[Byte]): Footer = {
    val fb = new Fb(tail)
    val t = fb.root()
    val schemaT = fb.fieldOff(t, 1)
    require(schemaT >= 0, "footer missing schema")
    val fields = parseSchemaTable(fb, schemaT)
    val dictionaries = parseBlocks(fb, fb.fieldOff(t, 2))
    val batches = parseBlocks(fb, fb.fieldOff(t, 3))
    Footer(fields, batches, dictionaries)
  }

  /** Driver-side footer read: the trailing magic, footer length and
    * footer flatbuffer only — batch bytes never touch the driver.
    */
  def readFooter(conf: org.apache.hadoop.conf.Configuration,
      path: String): Footer = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen
    require(len >= 8 + 10, s"too short for an arrow file: $path")
    val in = fs.open(p)
    try {
      val head = new Array[Byte](6)
      in.readFully(0, head)
      require(new String(head, "US-ASCII") == "ARROW1",
        s"not an arrow file: $path")
      val tail10 = new Array[Byte](10)
      in.readFully(len - 10, tail10)
      require(new String(tail10, 4, 6, "US-ASCII") == "ARROW1",
        s"missing trailing arrow magic: $path")
      val fLen = (tail10(0) & 0xff) | ((tail10(1) & 0xff) << 8) |
        ((tail10(2) & 0xff) << 16) | ((tail10(3) & 0xff) << 24)
      require(fLen > 0 && fLen <= (64 << 20) && fLen <= len - 10,
        s"bad footer length $fLen")
      val fbuf = new Array[Byte](fLen)
      in.readFully(len - 10 - fLen, fbuf)
      parseFooter(fbuf)
    } finally in.close()
  }

  // -------------------------------------------------------- batch decoding

  private final class Cursor(var node: Int, var buf: Int,
      var vari: Int = 0)

  private final class BatchData(val fb: Fb, val body: Array[Byte],
      val nodesVec: Int, val buffersVec: Int, val codec: Int,
      val variadic: Vector[Long] = Vector.empty) {
    /** variadic-buffer count k (one entry per view column, pre-order). */
    def variadicCount(k: Int): Int = {
      require(k < variadic.length,
        "view column missing variadicBufferCounts entry")
      val n = variadic(k)
      require(n >= 0 && n <= Int.MaxValue, s"variadic count $n")
      n.toInt
    }
    def node(k: Int): (Long, Long) = {
      val p = fb.vecElem(nodesVec, k, 16)
      (fb.i64(p), fb.i64(p + 8))
    }
    private val cache = new java.util.HashMap[Int, Array[Byte]]
    /** buffer k, decompressed when the batch carries a compression. */
    def buffer(k: Int): Array[Byte] = {
      val got = cache.get(k)
      if (got != null) return got
      val p = fb.vecElem(buffersVec, k, 16)
      val off = fb.i64(p)
      val len = fb.i64(p + 8)
      require(off >= 0 && len >= 0 && off + len <= body.length,
        "buffer out of body")
      val raw = java.util.Arrays.copyOfRange(body, off.toInt,
        (off + len).toInt)
      val out =
        if (codec < 0 || raw.length == 0) raw
        else {
          var n = 0L; var k2 = 0
          while (k2 < 8) { n |= (raw(k2) & 0xffL) << (8 * k2); k2 += 1 }
          val payload = java.util.Arrays.copyOfRange(raw, 8, raw.length)
          if (n == -1L) payload
          else {
            val plain = codec match {
              case 0 => Lz4.decode(payload)
              case 1 => Zstd.decode(payload)
              case c => throw new IllegalArgumentException(
                s"arrow body codec $c")
            }
            require(plain != null && plain.length == n,
              "arrow buffer decompression mismatch")
            plain
          }
        }
      cache.put(k, out)
      out
    }
  }

  private def bitSet(validity: Array[Byte], i: Int): Boolean =
    validity.length == 0 || (validity(i >> 3) & (1 << (i & 7))) != 0

  /** Decode one field's column (recursively for nests) into external
    * values; advances the node/buffer cursor exactly like the writer
    * laid them out (pre-order).
    */
  private def readColumn(bd: BatchData, f: AField, cur: Cursor,
      rows: Int, dicts: Map[Long, Array[Any]]): Array[Any] = {
    val (nLen, nullCount) = bd.node(cur.node)
    require(nLen >= rows, "node shorter than parent")
    cur.node += 1
    f.tpe match {
      case AUnion(children, typeIds, dense) =>
        // unions carry NO validity buffer — types (int8) then, for
        // dense mode, per-slot offsets (int32) into packed children
        val types = bd.buffer(cur.buf); cur.buf += 1
        val ofb =
          if (dense) { val o = bd.buffer(cur.buf); cur.buf += 1; new Fb(o) }
          else null
        val kids = children.map { c =>
          // dense children have their own lengths (declared in their
          // FieldNode); sparse children span the union's full length
          val childLen =
            if (dense) bd.node(cur.node)._1.toInt else rows
          readColumn(bd, c, cur, childLen, dicts)
        }
        val slot = typeIds.zipWithIndex.toMap
        val uout = new Array[Any](rows)
        val nk = children.length
        var i = 0
        while (i < rows) {
          val tid = types(i).toInt
          val j = slot.getOrElse(tid, throw new IllegalArgumentException(
            s"union type id $tid not in $typeIds"))
          val v =
            if (dense) {
              val o = ofb.i32(i * 4)
              require(o >= 0 && o < kids(j).length,
                s"union offset $o out of child $j")
              kids(j)(o)
            } else kids(j)(i)
          val cells = new Array[Any](1 + nk)
          cells(0) = tid
          cells(1 + j) = v
          uout(i) = Row.fromSeq(scala.collection.immutable.ArraySeq
            .unsafeWrapArray(cells))
          i += 1
        }
        return uout
      case ARunEnd(runEnds, values) =>
        // the REE node owns no buffers; children carry their own
        // lengths (the run count) in their FieldNodes
        val nRuns = bd.node(cur.node)._1.toInt
        val ends = readColumn(bd, runEnds, cur, nRuns, dicts)
        val nVals = bd.node(cur.node)._1.toInt
        require(nVals >= nRuns, "run-end values shorter than run_ends")
        val vals = readColumn(bd, values, cur, nRuns, dicts)
        def endAt(r: Int): Long = ends(r) match {
          case s: Short => s.toLong
          case i: Int => i.toLong
          case l: Long => l
          case _ => throw new IllegalArgumentException("null run end")
        }
        val rout = new Array[Any](rows)
        var r = 0
        var i = 0
        while (i < rows) {
          while (r < nRuns && endAt(r) <= i) r += 1
          require(r < nRuns, s"run ends exhausted at logical slot $i")
          rout(i) = vals(r)
          i += 1
        }
        return rout
      case ANull =>
        return new Array[Any](rows) // no buffers; every slot NULL
      case _ =>
    }
    val validity = bd.buffer(cur.buf); cur.buf += 1
    def valid(i: Int): Boolean = nullCount == 0L || bitSet(validity, i)
    val out = new Array[Any](rows)
    f.dict match {
      case Some((id, bits)) =>
        // the record batch carries only the index vector; values come
        // from the file's dictionary batches
        val values = dicts.getOrElse(id,
          throw new IllegalArgumentException(
            s"dictionary $id referenced by field ${f.name} not in file"))
        val data = bd.buffer(cur.buf); cur.buf += 1
        val dfb = new Fb(data)
        var i = 0
        while (i < rows) {
          if (valid(i)) {
            val k64: Long = bits match {
              case 8 => data(i).toLong
              case 16 => dfb.i16(i * 2).toLong
              case 32 => dfb.i32(i * 4).toLong
              case _ => dfb.i64(i * 8) // bounds-check BEFORE narrowing:
              // a 2^32 index would .toInt-truncate to 0 and silently
              // read the wrong entry
            }
            require(k64 >= 0 && k64 < values.length,
              s"dictionary index $k64 out of ${values.length}")
            val k = k64.toInt
            out(i) = values(k)
          }
          i += 1
        }
        return out
      case None =>
    }
    f.tpe match {
      case ABool =>
        val data = bd.buffer(cur.buf); cur.buf += 1
        var i = 0
        while (i < rows) {
          if (valid(i)) out(i) = (data(i >> 3) & (1 << (i & 7))) != 0
          i += 1
        }
      case AInt(bits) =>
        val data = bd.buffer(cur.buf); cur.buf += 1
        val dfb = new Fb(data)
        var i = 0
        while (i < rows) {
          if (valid(i)) out(i) = bits match {
            case 8 => data(i)
            case 16 => dfb.i16(i * 2).toShort
            case 32 => dfb.i32(i * 4)
            case _ => dfb.i64(i * 8)
          }
          i += 1
        }
      case APassthrough(bits) =>
        val data = bd.buffer(cur.buf); cur.buf += 1
        val dfb = new Fb(data)
        var i = 0
        while (i < rows) {
          if (valid(i))
            out(i) = if (bits == 32) dfb.i32(i * 4) else dfb.i64(i * 8)
          i += 1
        }
      case ADecimal(_, scale, bits) =>
        val w = bits / 8
        val data = bd.buffer(cur.buf); cur.buf += 1
        var i = 0
        while (i < rows) {
          if (valid(i)) {
            // little-endian two's complement → big-endian for BigInteger
            val be = new Array[Byte](w)
            var k = 0
            while (k < w) { be(k) = data(i * w + (w - 1 - k)); k += 1 }
            out(i) = new java.math.BigDecimal(
              new java.math.BigInteger(be), scale)
          }
          i += 1
        }
      case ADate32 =>
        val data = bd.buffer(cur.buf); cur.buf += 1
        val dfb = new Fb(data)
        var i = 0
        while (i < rows) {
          if (valid(i)) out(i) = java.sql.Date.valueOf(
            java.time.LocalDate.ofEpochDay(dfb.i32(i * 4).toLong))
          i += 1
        }
      case ADate64 =>
        val data = bd.buffer(cur.buf); cur.buf += 1
        val dfb = new Fb(data)
        var i = 0
        while (i < rows) {
          if (valid(i)) out(i) = java.sql.Date.valueOf(
            java.time.LocalDate.ofEpochDay(
              Math.floorDiv(dfb.i64(i * 8), 86400000L)))
          i += 1
        }
      case ATimestamp(unit, hasTz) =>
        val data = bd.buffer(cur.buf); cur.buf += 1
        val dfb = new Fb(data)
        def inst(v: Long): java.time.Instant = unit match {
          case 0 => java.time.Instant.ofEpochSecond(v)
          case 1 => java.time.Instant.ofEpochMilli(v)
          case 2 => java.time.Instant.ofEpochSecond(
            Math.floorDiv(v, 1000000L),
            Math.floorMod(v, 1000000L) * 1000L)
          case _ => java.time.Instant.ofEpochSecond(
            Math.floorDiv(v, 1000000000L),
            Math.floorMod(v, 1000000000L))
        }
        var i = 0
        while (i < rows) {
          if (valid(i)) {
            val t = inst(dfb.i64(i * 8))
            out(i) =
              if (hasTz) java.sql.Timestamp.from(t)
              else java.time.LocalDateTime.ofInstant(t,
                java.time.ZoneOffset.UTC)
          }
          i += 1
        }
      case AInterval(0) => // YEAR_MONTH: i32 months
        val data = bd.buffer(cur.buf); cur.buf += 1
        val dfb = new Fb(data)
        var i = 0
        while (i < rows) {
          if (valid(i)) out(i) = java.time.Period.ofMonths(dfb.i32(i * 4))
          i += 1
        }
      case AInterval(1) => // DAY_TIME: i32 days + i32 millis
        val data = bd.buffer(cur.buf); cur.buf += 1
        val dfb = new Fb(data)
        var i = 0
        while (i < rows) {
          if (valid(i))
            out(i) = java.time.Duration
              .ofDays(dfb.i32(i * 8).toLong)
              .plusMillis(dfb.i32(i * 8 + 4).toLong)
          i += 1
        }
      case AInterval(_) => // MONTH_DAY_NANO: i32 + i32 + i64 nanos
        val data = bd.buffer(cur.buf); cur.buf += 1
        val dfb = new Fb(data)
        var i = 0
        while (i < rows) {
          if (valid(i)) {
            val ns = dfb.i64(i * 16 + 8)
            // CalendarInterval is microsecond-granular: a sub-micro
            // remainder refuses to NULL rather than silently truncate
            if (ns % 1000L == 0)
              out(i) = new org.apache.spark.unsafe.types.CalendarInterval(
                dfb.i32(i * 16), dfb.i32(i * 16 + 4), ns / 1000L)
          }
          i += 1
        }
      case AFloat =>
        val data = bd.buffer(cur.buf); cur.buf += 1
        val dfb = new Fb(data)
        var i = 0
        while (i < rows) {
          if (valid(i))
            out(i) = java.lang.Float.intBitsToFloat(dfb.i32(i * 4))
          i += 1
        }
      case ADouble =>
        val data = bd.buffer(cur.buf); cur.buf += 1
        val dfb = new Fb(data)
        var i = 0
        while (i < rows) {
          if (valid(i))
            out(i) = java.lang.Double.longBitsToDouble(dfb.i64(i * 8))
          i += 1
        }
      case AString(large) =>
        val offs = bd.buffer(cur.buf); cur.buf += 1
        val data = bd.buffer(cur.buf); cur.buf += 1
        val ofb = new Fb(offs)
        def off(i: Int): Long =
          if (large) ofb.i64(i * 8) else ofb.i32(i * 4).toLong
        var i = 0
        while (i < rows) {
          if (valid(i)) out(i) = new String(data, off(i).toInt,
            (off(i + 1) - off(i)).toInt,
            java.nio.charset.StandardCharsets.UTF_8)
          i += 1
        }
      case ABinary(large) =>
        val offs = bd.buffer(cur.buf); cur.buf += 1
        val data = bd.buffer(cur.buf); cur.buf += 1
        val ofb = new Fb(offs)
        def off(i: Int): Long =
          if (large) ofb.i64(i * 8) else ofb.i32(i * 4).toLong
        var i = 0
        while (i < rows) {
          if (valid(i)) out(i) = java.util.Arrays.copyOfRange(data,
            off(i).toInt, off(i + 1).toInt)
          i += 1
        }
      case AList(child, large) =>
        val offs = bd.buffer(cur.buf); cur.buf += 1
        val ofb = new Fb(offs)
        def off(i: Int): Long =
          if (large) ofb.i64(i * 8) else ofb.i32(i * 4).toLong
        val childLen = off(rows).toInt
        val (declaredChild, _) = bd.node(cur.node)
        require(declaredChild >= childLen, "list child node too short")
        val kids = readColumn(bd, child, cur, childLen, dicts)
        var i = 0
        while (i < rows) {
          if (valid(i))
            out(i) = kids.slice(off(i).toInt, off(i + 1).toInt).toSeq
          i += 1
        }
      case AFixedList(child, sz) =>
        // no offsets buffer: child slot i·sz .. (i+1)·sz
        val kids = readColumn(bd, child, cur, rows * sz, dicts)
        var i = 0
        while (i < rows) {
          if (valid(i)) {
            val b = Vector.newBuilder[Any]
            var j = i * sz
            val e = j + sz
            while (j < e) { b += kids(j); j += 1 }
            out(i) = b.result()
          }
          i += 1
        }
      case AStruct(children) =>
        val cols = children.map(c => readColumn(bd, c, cur, rows, dicts))
        var i = 0
        while (i < rows) {
          if (valid(i)) out(i) = Row.fromSeq(cols.map(_(i)))
          i += 1
        }
      case AView(binary) =>
        // 16-byte view structs; long values live in variadic data
        // buffers, counted per batch by variadicBufferCounts
        val views = bd.buffer(cur.buf); cur.buf += 1
        val nVar = bd.variadicCount(cur.vari); cur.vari += 1
        val dataBufs = Array.tabulate(nVar)(k => bd.buffer(cur.buf + k))
        cur.buf += nVar
        val vfb = new Fb(views)
        var i = 0
        while (i < rows) {
          if (valid(i)) {
            val p = i * 16
            val len = vfb.i32(p)
            require(len >= 0, s"view length $len")
            val bytes =
              if (len <= 12)
                java.util.Arrays.copyOfRange(views, p + 4, p + 4 + len)
              else {
                val bufIdx = vfb.i32(p + 8)
                val off = vfb.i32(p + 12)
                require(bufIdx >= 0 && bufIdx < nVar,
                  s"view buffer index $bufIdx of $nVar")
                val data = dataBufs(bufIdx)
                require(off >= 0 && off.toLong + len <= data.length,
                  "view slice out of buffer")
                java.util.Arrays.copyOfRange(data, off, off + len)
              }
            out(i) =
              if (binary) bytes
              else new String(bytes,
                java.nio.charset.StandardCharsets.UTF_8)
          }
          i += 1
        }
      case AListView(child, large) =>
        // offsets and sizes are independent (entries may share or
        // reorder child ranges); the child's length comes from its own
        // FieldNode, not from any offset arithmetic
        val offs = bd.buffer(cur.buf); cur.buf += 1
        val sizes = bd.buffer(cur.buf); cur.buf += 1
        val ofb = new Fb(offs)
        val sfb = new Fb(sizes)
        val childLen = bd.node(cur.node)._1.toInt
        val kids = readColumn(bd, child, cur, childLen, dicts)
        var i = 0
        while (i < rows) {
          if (valid(i)) {
            val o = if (large) ofb.i64(i * 8) else ofb.i32(i * 4).toLong
            val n = if (large) sfb.i64(i * 8) else sfb.i32(i * 4).toLong
            require(o >= 0 && n >= 0 && o + n <= childLen,
              s"list-view range [$o,+$n) out of child $childLen")
            val bld = Vector.newBuilder[Any]
            var j = o.toInt
            val e = (o + n).toInt
            while (j < e) { bld += kids(j); j += 1 }
            out(i) = bld.result()
          }
          i += 1
        }
      case AMap(entries) =>
        // the List layout over a struct<key,value> entries child
        val offs = bd.buffer(cur.buf); cur.buf += 1
        val ofb = new Fb(offs)
        val entryLen = ofb.i32(rows * 4)
        val (declaredChild, _) = bd.node(cur.node)
        require(declaredChild >= entryLen, "map entries node too short")
        val kids = readColumn(bd, entries, cur, entryLen, dicts)
        var i = 0
        while (i < rows) {
          if (valid(i)) {
            val sOff = ofb.i32(i * 4)
            val e = ofb.i32((i + 1) * 4)
            val bld = Map.newBuilder[Any, Any]
            var j = sOff
            while (j < e) {
              val kv = kids(j).asInstanceOf[Row]
              bld += kv.get(0) -> kv.get(1)
              j += 1
            }
            out(i) = bld.result()
          }
          i += 1
        }
      case AFixedBinary(w) =>
        val data = bd.buffer(cur.buf); cur.buf += 1
        var i = 0
        while (i < rows) {
          if (valid(i))
            out(i) = java.util.Arrays.copyOfRange(data, i * w, (i + 1) * w)
          i += 1
        }
      case ANull | AUnion(_, _, _) | ARunEnd(_, _) =>
        () // handled in the pre-validity match; here for exhaustiveness
    }
    out
  }

  /** Pre-order node count of a field (one per field incl. nested).
    * Dictionary-encoded fields contribute exactly one node — the batch
    * holds their index vector, never the value type's layout.
    */
  private def nodeCount(f: AField): Int =
    if (f.dict.isDefined) 1
    else f.tpe match {
      case AList(c, _) => 1 + nodeCount(c)
      case AFixedList(c, _) => 1 + nodeCount(c)
      case AStruct(cs) => 1 + cs.map(nodeCount).sum
      case AUnion(cs, _, _) => 1 + cs.map(nodeCount).sum
      case ARunEnd(re, v) => 1 + nodeCount(re) + nodeCount(v)
      case AListView(c, _) => 1 + nodeCount(c)
      case AMap(entries) => 1 + nodeCount(entries)
      case _ => 1
    }

  /** Buffer count of a field (validity + per-kind buffers + children);
    * dictionary-encoded fields carry validity + indices.
    */
  private def bufCount(f: AField): Int =
    if (f.dict.isDefined) 2
    else f.tpe match {
      case AString(_) | ABinary(_) => 3
      case AList(c, _) => 2 + bufCount(c)
      case AFixedList(c, _) => 1 + bufCount(c) // validity only, no offsets
      case AStruct(cs) => 1 + cs.map(bufCount).sum
      case AUnion(cs, _, dense) => // NO validity: types [+ offsets]
        (if (dense) 2 else 1) + cs.map(bufCount).sum
      case ARunEnd(re, v) => bufCount(re) + bufCount(v) // none of its own
      case AView(_) => 2 // validity + views; variadic counted per batch
      case AListView(c, _) => 3 + bufCount(c) // validity+offsets+sizes
      case AMap(entries) => 2 + bufCount(entries) // list layout
      case ANull => 0 // the null layout has NO buffers at all
      case _ => 2
    }

  /** View-typed columns inside a field, pre-order — each consumes one
    * variadicBufferCounts entry (and that many extra buffers) per
    * batch, so skipping a field must pop the same entries.
    */
  private def viewCols(f: AField): Int =
    if (f.dict.isDefined) 0
    else f.tpe match {
      case AView(_) => 1
      case AMap(entries) => viewCols(entries)
      case AListView(c, _) => viewCols(c)
      case AList(c, _) => viewCols(c)
      case AFixedList(c, _) => viewCols(c)
      case AStruct(cs) => cs.map(viewCols).sum
      case AUnion(cs, _, _) => cs.map(viewCols).sum
      case ARunEnd(re, v) => viewCols(re) + viewCols(v)
      case _ => 0
    }

  /** Field positions for the requested column names (Nil = all, file
    * order). Unknown names refuse.
    */
  private def wantedPositions(fields: Vector[AField],
      columns: Seq[String]): Vector[Int] =
    if (columns.isEmpty) fields.indices.toVector
    else columns.toVector.map { c =>
      val k = fields.indexWhere(_.name == c)
      require(k >= 0, s"arrow column $c not in ${fields.map(_.name)}")
      k
    }

  /** Decode one record batch (its encapsulated message bytes + body) to
    * rows, materializing only `wanted` field positions — skipped fields
    * advance the node/buffer cursor without touching their buffers, so
    * pruned columns never decompress (column pruning reaches the batch
    * read). Structural failure → empty (the batch is the blast radius).
    */
  /** Message root + header type from encapsulated message bytes:
    * continuation 0xFFFFFFFF, int32 len, flatbuffer (pre-1.0 framing
    * without continuation accepted).
    */
  private[llmops] def messageRoot(fb: Fb, meta: Array[Byte]): (Int, Int) = {
    val start =
      if (meta.length >= 8 && fb.i32(0) == -1) 8
      else 4
    val t = fb.root(start)
    (t, fb.fieldU8(t, 1, 0))
  }

  /** Decode a RecordBatch TABLE (already located) into per-field
    * columns for `wanted` positions. Shared by record and dictionary
    * batch paths.
    */
  private[llmops] def decodeRbColumns(fb: Fb, rb: Int, body: Array[Byte],
      fields: Vector[AField], wanted: Vector[Int],
      dicts: Map[Long, Array[Any]]): (Int, Vector[Array[Any]]) = {
    val rows = fb.fieldI64(rb, 0, 0L).toInt
    val nodesVec = fb.fieldOff(rb, 1)
    val buffersVec = fb.fieldOff(rb, 2)
    require(rows >= 0 && nodesVec >= 0 && buffersVec >= 0,
      "record batch missing vectors")
    val compT = fb.fieldOff(rb, 3)
    val codec = if (compT < 0) -1 else fb.fieldU8(compT, 0, 0)
    // variadicBufferCounts (id 4): one int64 per view column, pre-order
    val variadic = fb.fieldOff(rb, 4) match {
      case v if v < 0 => Vector.empty[Long]
      case v => (0 until fb.vecLen(v)).map(k =>
        fb.i64(fb.vecElem(v, k, 8))).toVector
    }
    val bd = new BatchData(fb, body, nodesVec, buffersVec, codec,
      variadic)
    val cur = new Cursor(0, 0)
    val want = wanted.toSet
    val byPos = new java.util.HashMap[Int, Array[Any]]
    fields.zipWithIndex.foreach { case (f, k) =>
      if (want(k)) byPos.put(k, readColumn(bd, f, cur, rows, dicts))
      else {
        cur.node += nodeCount(f)
        cur.buf += bufCount(f)
        // skipped view columns still consume their per-batch variadic
        // entries (and buffer slots) so later cursors stay aligned
        var vk = 0
        val nv = viewCols(f)
        while (vk < nv) {
          cur.buf += bd.variadicCount(cur.vari); cur.vari += 1; vk += 1
        }
      }
    }
    (rows, wanted.map(byPos.get))
  }

  private[llmops] def decodeBatch(fields: Vector[AField],
      meta: Array[Byte], body: Array[Byte], wanted: Vector[Int],
      dicts: Map[Long, Array[Any]] = Map.empty): Seq[Row] =
    try {
      val fb = new Fb(meta)
      val (t, htype) = messageRoot(fb, meta)
      require(htype == 3, "not a RecordBatch message")
      val rb = fb.fieldOff(t, 2)
      require(rb >= 0, "empty message header")
      val (rows, cols) = decodeRbColumns(fb, rb, body, fields, wanted,
        dicts)
      (0 until rows).map(i => Row.fromSeq(cols.map(_(i))))
    } catch { case scala.util.control.NonFatal(_) => Seq.empty }

  /** Byte ceiling on a file's dictionary batches: dictionaries
    * materialize on the driver and ride every task closure — by nature
    * they are small-cardinality side tables; a corpus-sized one must
    * be stored as plain columns instead.
    */
  val MaxDictionaryBytes: Long = 256L << 20

  /** Ship a driver value to tasks: small values ride the closure (no
    * lingering broadcast blocks), big ones broadcast (per-task closure
    * re-serialization would trip spark.rpc.message.maxSize). Returns a
    * serializable accessor valid on executors either way.
    */
  private def maybeBroadcast[T <: AnyRef : scala.reflect.ClassTag](
      spark: SparkSession, v: T): () => T = {
    val est = org.apache.spark.util.SizeEstimator.estimate(v)
    if (est <= (8L << 20)) { () => v }
    else {
      val bc = spark.sparkContext.broadcast(v)
      () => bc.value
    }
  }

  /** Dictionary-id → value-field discovery over the FULL type tree —
    * dictionaries may hang off children of maps, unions, fixed-size
    * lists, list views and run-end values, not just lists/structs
    * (the value field is the FIRST field using the id).
    */
  private[llmops] def dictFieldsById(fields: Vector[AField])
      : scala.collection.mutable.LinkedHashMap[Long, AField] = {
    val byId = scala.collection.mutable.LinkedHashMap.empty[Long, AField]
    def walk(f: AField): Unit = {
      f.dict.foreach { case (id, _) =>
        if (!byId.contains(id))
          byId(id) = AField(f.name, nullable = true, f.tpe, None)
      }
      f.tpe match {
        case AList(c, _) => walk(c)
        case AFixedList(c, _) => walk(c)
        case AListView(c, _) => walk(c)
        case AStruct(cs) => cs.foreach(walk)
        case AUnion(cs, _, _) => cs.foreach(walk)
        case ARunEnd(re, v) => walk(re); walk(v)
        case AMap(entries) => walk(entries)
        case _ =>
      }
    }
    fields.foreach(walk)
    byId
  }

  /** Driver-side dictionary materialization: decode every dictionary
    * batch listed in the footer into id → values. Delta batches append
    * to their id; a second non-delta batch for an id refuses (the FILE
    * format forbids replacement — honoring it beats guessing order).
    */
  private[llmops] def readDictionaries(
      conf: org.apache.hadoop.conf.Configuration, path: String,
      footer: Footer,
      /** Column-pruned field set: dictionary batches whose id only
        * serves pruned columns are SKIPPED — their bodies are never
        * read, honoring the "pruned columns never decompress" contract.
        * None = all fields.
        */
      wantedFields: Option[Vector[AField]] = None): Map[Long, Array[Any]] = {
    if (footer.dictionaries.isEmpty) return Map.empty
    val fullById = dictFieldsById(footer.fields)
    val byId = wantedFields.map(dictFieldsById).getOrElse(fullById)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    val out = scala.collection.mutable.HashMap.empty[Long, Array[Any]]
    var decodedBytes = 0L
    try {
      footer.dictionaries.foreach { b =>
        val meta = new Array[Byte](b.metaLen)
        in.readFully(b.offset, meta)
        val fb = new Fb(meta)
        val (t, htype) = messageRoot(fb, meta)
        require(htype == 2, "footer dictionary block is not a " +
          "DictionaryBatch message")
        val db = fb.fieldOff(t, 2)
        require(db >= 0, "empty dictionary message header")
        val id = fb.fieldI64(db, 0, 0L)
        val rb = fb.fieldOff(db, 1)
        val isDelta = fb.fieldBool(db, 2, dflt = false)
        require(rb >= 0, "dictionary batch missing data")
        require(fullById.contains(id),
          s"dictionary batch id $id matches no schema field")
        if (byId.contains(id)) {
          // the cap applies to what actually decodes — pruned ids cost
          // one meta read, never a body
          decodedBytes += b.metaLen.toLong + b.bodyLen
          require(decodedBytes <= MaxDictionaryBytes,
            s"dictionary batches total $decodedBytes bytes (cap " +
              s"$MaxDictionaryBytes) — store corpus-scale values as " +
              "plain columns, dictionaries are for small-cardinality " +
              "categoricals")
          val body = new Array[Byte](b.bodyLen.toInt)
          in.readFully(b.offset + b.metaLen, body)
          val vf = byId(id)
          val (_, cols) = decodeRbColumns(fb, rb, body, Vector(vf),
            Vector(0), Map.empty)
          val values = cols(0)
          if (!out.contains(id)) out(id) = values
          else if (isDelta) out(id) = out(id) ++ values
          else throw new IllegalArgumentException(
            s"dictionary $id replaced mid-file — the arrow FILE format " +
              "forbids replacement; re-export the file")
        }
      }
    } finally in.close()
    out.toMap
  }

  /** Read an Arrow IPC file as a typed DataFrame — the footer-driven
    * splittable path: one task per record batch, one ranged read each,
    * file bytes never shuffle.
    */
  def readArrow(spark: SparkSession, path: String,
      columns: Seq[String] = Nil): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val footer = readFooter(conf, path)
    val wanted = wantedPositions(footer.fields, columns)
    val full = rootStruct(footer.fields)
    val struct = StructType(wanted.map(full.fields))
    val confB = new org.apache.spark.util.SerializableConfiguration(conf)
    val fieldsB = footer.fields
    // dictionaries materialize once on the driver (size-capped). BIG
    // dictionaries BROADCAST — riding the task closure would re-serialize
    // them per task and trip spark.rpc.message.maxSize (default 128 MiB)
    // below the 256 MB cap; SMALL ones ride the closure (a broadcast per
    // read call lingers in the block manager until GC — pressure that
    // accumulates across a long session)
    val dicts0 = readDictionaries(conf, path, footer,
      wantedFields = Some(wanted.map(footer.fields)))
    val dictsBc = maybeBroadcast(spark, dicts0)
    val batches = footer.batches.map(b => (b.offset, b.metaLen.toLong,
      b.bodyLen))
    batches.toDF("offset", "metaLen", "bodyLen")
      .repartition(DriverPar.planPartitions(spark, batches.size,
        batches.map(b => b._2 + b._3).sum, 32L << 20))
      .as[(Long, Long, Long)]
      .flatMap { case (offset, metaLen, bodyLen) =>
        // a healthy batch past the envelope must refuse LOUDLY — an
        // Iterator.empty would silently vanish its rows from a valid file
        require(metaLen + bodyLen <= MaxBatchBytes,
          s"arrow batch at offset $offset is ${metaLen + bodyLen} bytes " +
            s"— past the $MaxBatchBytes single-task envelope; re-export " +
            "with smaller record batches")
        if (metaLen <= 0 || bodyLen < 0) Iterator.empty
        else {
          val p = new org.apache.hadoop.fs.Path(path)
          val fs = p.getFileSystem(confB.value)
          val in = fs.open(p)
          val meta = new Array[Byte](metaLen.toInt)
          val body = new Array[Byte](bodyLen.toInt)
          try {
            in.readFully(offset, meta)
            in.readFully(offset + metaLen, body)
          } finally in.close()
          decodeBatch(fieldsB, meta, body, wanted, dictsBc()).iterator
        }
      }(org.apache.spark.sql.Encoders.row(struct))
  }

  /** Arrow IPC STREAM format (.arrows — Flight dumps, pipes): schema
    * message, then dictionary/record-batch messages in stream order,
    * optionally closed by the end-of-stream marker. No footer, so a
    * stream file is NOT splittable — parallelism is per FILE (each
    * task walks its own file's messages; dictionaries apply in stream
    * order, where REPLACEMENT is legal, unlike the file format).
    * Reads a file, glob, or directory as one DataFrame with a leading
    * `path` provenance column; `mergeSchemas` unions evolved shard
    * schemas by name exactly like [[readArrowFiles]]. Files are
    * materialized per task (capped at 1 GB) — the format trades
    * splittability for pipe-ability, and ingest mirrors that.
    */
  def readArrowStream(spark: SparkSession, pathOrGlob: String,
      columns: Seq[String] = Nil,
      mergeSchemas: Boolean = false): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val files = Avro.resolveFiles(conf, pathOrGlob)
    // driver: schema message only (grow-read until it parses)
    def schemaOf(path: String): Vector[AField] = {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(conf)
      val in = fs.open(p)
      try {
        var cap = 64 << 10
        var fields: Vector[AField] = null
        while (fields == null) {
          val buf = new Array[Byte](cap)
          var got = 0
          var n = 0
          while (got < cap && n >= 0) {
            n = in.read(buf, got, cap - got); if (n > 0) got += n
          }
          val head = if (got == cap) buf else buf.take(got)
          try {
            val fb = new Fb(head)
            val (t, htype) = messageRoot(fb, head)
            require(htype == 1, s"stream does not open with a Schema " +
              s"message (header type $htype): $path")
            val sch = fb.fieldOff(t, 2)
            require(sch >= 0, "empty schema message")
            fields = parseSchemaTable(fb, sch)
          } catch {
            case e: Exception if got == cap && cap < (8 << 20) =>
              cap *= 4; in.seek(0L)
            case e: Exception => throw e
          }
        }
        fields
      } finally in.close()
    }
    val fieldsByPath =
      DriverPar.parMap(files) { case (p, _) => p -> schemaOf(p) }.toMap
    val structs = files.map { case (p, _) =>
      rootStruct(fieldsByPath(p))
    }.distinct
    require(mergeSchemas || structs.size == 1,
      s"arrow stream shard schemas disagree: ${structs.size} distinct " +
        "— pass mergeSchemas = true to union fields by name")
    val mergedAll = {
      val order = scala.collection.mutable.LinkedHashMap
        .empty[String, StructField]
      files.foreach { case (p, _) =>
        rootStruct(fieldsByPath(p)).fields.foreach { f =>
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
            s"arrow column $c not in ${mergedAll.map(_.name)}"))
      }
    val struct = StructType(StructField("path", StringType) +: selected)
    val wantedByPath: Map[String, Vector[Int]] = files.map {
      case (p, _) =>
        val fs0 = fieldsByPath(p)
        p -> selected.flatMap(sf =>
          Some(fs0.indexWhere(_.name == sf.name)).filter(_ >= 0))
    }.toMap
    val slotsByPath: Map[String, Array[Int]] = files.map {
      case (p, _) =>
        val fs0 = fieldsByPath(p)
        var next = 0
        p -> selected.map { sf =>
          if (fs0.exists(_.name == sf.name)) { val k = next; next += 1; k }
          else -1
        }.toArray
    }.toMap
    val confB = new org.apache.spark.util.SerializableConfiguration(conf)
    files.toDF("path", "len")
      .repartition(DriverPar.planPartitions(spark, files.size,
        files.map(_._2).sum, 32L << 20))
      .as[(String, Long)]
      .flatMap { case (path, len) =>
        Arrow.decodeStreamFile(confB, path, len, fieldsByPath(path),
          wantedByPath(path), slotsByPath(path))
      }(org.apache.spark.sql.Encoders.row(struct))
  }



  /** One stream file's full message walk (schema echoes ignored,
    * dictionaries in stream order where replacement is legal, record
    * batches decoded against `wanted`). Rows decoded before a corrupt
    * message survive; the rest of the file drops — streams have no
    * footer to skip ahead with.
    */
  private[llmops] def decodeStreamFile(
      confB: org.apache.spark.util.SerializableConfiguration,
      path: String, len: Long, fields: Vector[AField],
      wanted: Vector[Int], slots: Array[Int]): Iterator[Row] = {
    if (len <= 0 || len > MaxBatchBytes) return Iterator.empty
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(confB.value)
    val in = fs.open(p)
    val bytes = new Array[Byte](len.toInt)
    try { in.readFully(0L, bytes) } finally in.close()
    val fb = new Fb(bytes)
    val byId = dictFieldsById(fields)
    val dicts = scala.collection.mutable.HashMap.empty[Long, Array[Any]]
    var dictBytes = 0L
    val out = Vector.newBuilder[Row]
    var pos = 0L
    var done = false
    def align8(v: Long): Long = (v + 7L) & ~7L
    // no footer → no way to skip past damage: a corrupt message ends
    // THIS file's decode (rows before it survive)
    try while (!done && pos + 4 <= len) {
      val w0 = fb.i32(pos.toInt)
      val (metaLen, metaStart) =
        if (w0 == -1) {
          if (pos + 8 > len) (0, len) // truncated: stop
          else (fb.i32(pos.toInt + 4), pos + 8)
        } else (w0, pos + 4)
      if (metaLen <= 0 || metaStart + metaLen > len) done = true
      else {
        val t = fb.root(metaStart.toInt)
        val htype = fb.fieldU8(t, 1, 0)
        val bodyLen = fb.fieldI64(t, 3, 0L)
        val bodyStart = metaStart + metaLen
        require(bodyLen >= 0 && bodyStart + bodyLen <= len,
          "stream message body out of file")
        val body = java.util.Arrays.copyOfRange(bytes,
          bodyStart.toInt, (bodyStart + bodyLen).toInt)
        htype match {
          case 1 => // repeated schema message: ignore
          case 2 =>
            val db = fb.fieldOff(t, 2)
            require(db >= 0, "empty dictionary message")
            val id = fb.fieldI64(db, 0, 0L)
            val rb = fb.fieldOff(db, 1)
            val isDelta = fb.fieldBool(db, 2, dflt = false)
            require(rb >= 0, "dictionary batch missing data")
            dictBytes += metaLen.toLong + bodyLen
            require(dictBytes <= MaxDictionaryBytes,
              s"stream dictionary batches exceed $MaxDictionaryBytes bytes")
            val vf = byId.getOrElse(id,
              throw new IllegalArgumentException(
                s"dictionary batch id $id matches no field"))
            val (_, cols) = decodeRbColumns(fb, rb, body,
              Vector(vf), Vector(0), Map.empty)
            // stream order: replacement IS legal here
            if (isDelta && dicts.contains(id))
              dicts(id) = dicts(id) ++ cols(0)
            else dicts(id) = cols(0)
          case 3 =>
            val rb = fb.fieldOff(t, 2)
            require(rb >= 0, "empty record batch message")
            val (n, cols) = decodeRbColumns(fb, rb, body, fields,
              wanted, dicts.toMap)
            var i = 0
            while (i < n) {
              val cells = new Array[Any](1 + slots.length)
              cells(0) = path
              var k = 0
              while (k < slots.length) {
                cells(1 + k) =
                  if (slots(k) < 0) null else cols(slots(k))(i)
                k += 1
              }
              out += Row.fromSeq(scala.collection.immutable
                .ArraySeq.unsafeWrapArray(cells))
              i += 1
            }
          case other => throw new IllegalArgumentException(
            s"stream message header type $other")
        }
        pos = align8(bodyStart + bodyLen)
      }
    } catch { case scala.util.control.NonFatal(_) => () }
    out.result().iterator
  }

  /** Multi-file [[readArrow]]: a file, glob, or directory reads as ONE
    * DataFrame with a leading `path` provenance column. Footers are
    * read on the driver (bytes proportional to FILE COUNT, not data)
    * through [[DriverPar.parMap]]'s bounded pool — planning latency is
    * O(files / poolWidth) round-trips, not O(files); all shard schemas
    * must agree; every (file, batch) pair becomes one task.
    */
  def readArrowFiles(spark: SparkSession,
      pathOrGlob: String, columns: Seq[String] = Nil,
      mergeSchemas: Boolean = false): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val files = Avro.resolveFiles(conf, pathOrGlob)
    val footers =
      DriverPar.parMap(files) { case (p, _) => p -> readFooter(conf, p) }
    val structs = footers.map(f => rootStruct(f._2.fields)).distinct
    require(mergeSchemas || structs.size == 1,
      s"arrow shard schemas disagree: ${structs.size} distinct — pass " +
        "mergeSchemas = true to union fields by name (schema evolution)")
    // schema evolution: union fields by name in first-appearance order;
    // absent fields fill NULL per shard; same name must land same type
    val structByPath = footers.map { case (p, f) =>
      p -> rootStruct(f.fields)
    }.toMap
    val mergedAll = {
      val order = scala.collection.mutable.LinkedHashMap
        .empty[String, StructField]
      footers.foreach { case (p, _) =>
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
            s"arrow column $c not in ${mergedAll.map(_.name)}"))
      }
    val struct = StructType(StructField("path", StringType) +: selected)
    val fieldsByPath = footers.map { case (p, f) => p -> f.fields }.toMap
    val wantedByPath: Map[String, Vector[Int]] = footers.map {
      case (p, f) =>
        p -> selected.flatMap(sf =>
          Some(f.fields.indexWhere(_.name == sf.name)).filter(_ >= 0))
    }.toMap
    val slotsByPath: Map[String, Array[Int]] = footers.map {
      case (p, f) =>
        var next = 0
        p -> selected.map { sf =>
          if (f.fields.exists(_.name == sf.name)) {
            val k = next; next += 1; k
          } else -1
        }.toArray
    }.toMap
    val confB = new org.apache.spark.util.SerializableConfiguration(conf)
    // per-file dictionaries (ids are file-scoped), driver-bounded;
    // broadcast only past the size threshold (see readArrow)
    val dictsByPathBc = maybeBroadcast(spark,
      footers.map { case (p, f) =>
        p -> readDictionaries(conf, p, f,
          wantedFields = Some(wantedByPath(p).map(f.fields)))
      }.toMap)
    val batches = footers.flatMap { case (p, f) =>
      f.batches.map(b => (p, b.offset, b.metaLen.toLong, b.bodyLen))
    }
    batches.toDF("path", "offset", "metaLen", "bodyLen")
      .repartition(DriverPar.planPartitions(spark, batches.size,
        batches.map(b => b._3 + b._4).sum, 32L << 20))
      .as[(String, Long, Long, Long)]
      .flatMap { case (path, offset, metaLen, bodyLen) =>
        require(metaLen + bodyLen <= MaxBatchBytes, // loud, same as readArrow
          s"arrow batch at $path offset $offset is ${metaLen + bodyLen} " +
            s"bytes — past the $MaxBatchBytes single-task envelope")
        if (metaLen <= 0 || bodyLen < 0) Iterator.empty
        else {
          val p = new org.apache.hadoop.fs.Path(path)
          val fs = p.getFileSystem(confB.value)
          val in = fs.open(p)
          val meta = new Array[Byte](metaLen.toInt)
          val body = new Array[Byte](bodyLen.toInt)
          try {
            in.readFully(offset, meta)
            in.readFully(offset + metaLen, body)
          } finally in.close()
          val slots = slotsByPath(path)
          decodeBatch(fieldsByPath(path), meta, body,
              wantedByPath(path), dictsByPathBc()(path))
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
