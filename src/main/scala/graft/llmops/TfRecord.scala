package graft.llmops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** TFRecord shard export/ingest — the TensorFlow training-shard wire
  * format, the other half of the trainer-facing last mile next to the
  * JSONL/tar shard family ([[TrainExport]]/[[TarShards]]). Reference
  * hook: curated-corpus export for downstream consumers,
  * `aje_libs/documents/helpers/document_processor.py:10-83` (arbitrary
  * binary ingestion) — re-expressed as the format every TF/JAX input
  * pipeline reads natively.
  *
  * Record framing (public TFRecord spec): `uint64 LE length`, `uint32 LE
  * masked CRC32C of the length bytes`, `length` payload bytes, `uint32 LE
  * masked CRC32C of the payload`. The mask is the snappy-framing mask
  * (`((crc >>> 15) | (crc << 17)) + 0xa282ead8`) — shared with
  * [[Snappy.maskedCrc]]. Both CRCs are VERIFIED on read; a corrupt
  * record ends the file there (framing has no resync marker — records
  * before the corruption survive, the tail is dropped and counted).
  *
  * Payloads are `tf.train.Example` protobuf messages encoded/decoded by
  * a from-scratch wire codec (varint / length-delimited / fixed32 only —
  * exactly what Example needs):
  * {{{
  *   Example  { Features features = 1; }
  *   Features { map<string, Feature> feature = 1; }
  *   Feature  { oneof { BytesList bytes_list = 1; FloatList float_list = 2;
  *                      Int64List int64_list = 3; } }
  *   BytesList { repeated bytes value = 1; }
  *   FloatList { repeated float value = 1 [packed]; }   // unpacked accepted
  *   Int64List { repeated int64 value = 1 [packed]; }   // unpacked accepted
  * }}}
  * Unknown fields are skipped by wire type on decode (forward-compatible
  * with real producers that attach extra metadata); malformed messages
  * refuse to `null` like every other untrusted-bytes decoder here.
  */
object TfRecord {

  private final val MaxRecord = 64 << 20

  // ---------------------------------------------------------------- framing

  private def crcOk(b: Array[Byte], off: Int, len: Int, expect: Int): Boolean =
    Snappy.maskedCrc(b, off, len) == expect

  private def readIntLE(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  private def readLongLE(b: Array[Byte], i: Int): Long = {
    var v = 0L; var k = 0
    while (k < 8) { v |= (b(i + k) & 0xffL) << (8 * k); k += 1 }
    v
  }

  private def writeIntLE(out: java.io.OutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
    out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
  }

  /** Frame one record (length + masked length-CRC + payload + masked
    * payload-CRC) onto `out`.
    */
  def writeRecord(out: java.io.OutputStream, payload: Array[Byte]): Unit = {
    val lenBytes = new Array[Byte](8)
    var v = payload.length.toLong
    var k = 0
    while (k < 8) { lenBytes(k) = (v & 0xff).toByte; v >>>= 8; k += 1 }
    out.write(lenBytes)
    writeIntLE(out, Snappy.maskedCrc(lenBytes, 0, 8))
    out.write(payload)
    writeIntLE(out, Snappy.maskedCrc(payload, 0, payload.length))
  }

  /** Walk the record frames of one TFRecord file image. Stops at the
    * first corrupt frame (bad CRC, truncation, oversize length) — the
    * spec has no resync point, so the tail after a corruption is
    * unreachable; everything before it is returned.
    */
  def readRecords(bytes: Array[Byte]): Vector[Array[Byte]] = {
    if (bytes == null) return Vector.empty
    val out = Vector.newBuilder[Array[Byte]]
    var i = 0
    var ok = true
    while (ok && i + 12 <= bytes.length) {
      val len = readLongLE(bytes, i)
      if (len < 0 || len > MaxRecord ||
          !crcOk(bytes, i, 8, readIntLE(bytes, i + 8)) ||
          i + 12 + len + 4 > bytes.length) ok = false
      else {
        val n = len.toInt
        val dataOff = i + 12
        if (!crcOk(bytes, dataOff, n, readIntLE(bytes, dataOff + n))) ok = false
        else {
          out += java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + n)
          i = dataOff + n + 4
        }
      }
    }
    out.result()
  }

  // --------------------------------------------------- protobuf wire codec

  /** One Example feature value — the three list kinds of the oneof. */
  sealed trait Feature
  final case class BytesFeature(values: Vector[Array[Byte]]) extends Feature
  final case class FloatFeature(values: Vector[Float]) extends Feature
  final case class Int64Feature(values: Vector[Long]) extends Feature

  private def writeVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def writeTag(out: java.io.ByteArrayOutputStream, field: Int,
      wire: Int): Unit = writeVarint(out, ((field << 3) | wire).toLong)

  private def writeDelimited(out: java.io.ByteArrayOutputStream, field: Int,
      body: Array[Byte]): Unit = {
    writeTag(out, field, 2)
    writeVarint(out, body.length.toLong)
    out.write(body, 0, body.length)
  }

  private def encodeFeature(f: Feature): Array[Byte] = {
    val list = new java.io.ByteArrayOutputStream()
    val kindField = f match {
      case BytesFeature(vs) =>
        vs.foreach(v => writeDelimited(list, 1, v)); 1
      case FloatFeature(vs) =>
        // packed fixed32 LE
        val packed = new java.io.ByteArrayOutputStream(vs.length * 4)
        vs.foreach { x => writeIntLE(packed, java.lang.Float.floatToIntBits(x)) }
        writeDelimited(list, 1, packed.toByteArray); 2
      case Int64Feature(vs) =>
        val packed = new java.io.ByteArrayOutputStream()
        vs.foreach(writeVarint(packed, _))
        writeDelimited(list, 1, packed.toByteArray); 3
    }
    val feat = new java.io.ByteArrayOutputStream()
    writeDelimited(feat, kindField, list.toByteArray)
    feat.toByteArray
  }

  /** Encode `(name, feature)` pairs as one `tf.train.Example` message. */
  def encodeExample(features: Seq[(String, Feature)]): Array[Byte] = {
    val feats = new java.io.ByteArrayOutputStream()
    features.foreach { case (name, f) =>
      val entry = new java.io.ByteArrayOutputStream()
      writeDelimited(entry, 1,
        name.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      writeDelimited(entry, 2, encodeFeature(f))
      writeDelimited(feats, 1, entry.toByteArray)
    }
    val ex = new java.io.ByteArrayOutputStream()
    writeDelimited(ex, 1, feats.toByteArray)
    ex.toByteArray
  }

  /** Cursor-based reader over one message body `[off, end)`. */
  private final class PbReader(b: Array[Byte], var i: Int, val end: Int) {
    def hasMore: Boolean = i < end
    def varint(): Long = {
      var v = 0L; var shift = 0
      var cont = true
      while (cont) {
        if (i >= end || shift > 63) throw Malformed
        val x = b(i) & 0xff; i += 1
        v |= (x & 0x7fL) << shift; shift += 7
        cont = (x & 0x80) != 0
      }
      v
    }
    def delimited(): (Int, Int) = {
      val len = varint()
      if (len < 0 || len > end - i) throw Malformed
      val r = (i, i + len.toInt); i += len.toInt; r
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint(); ()
      case 1 => if (end - i < 8) throw Malformed else i += 8
      case 2 => delimited(); ()
      case 5 => if (end - i < 4) throw Malformed else i += 4
      case _ => throw Malformed
    }
  }

  private object Malformed extends RuntimeException with
    scala.util.control.NoStackTrace

  private def decodeFeature(b: Array[Byte], off: Int, end: Int): Feature = {
    val r = new PbReader(b, off, end)
    var out: Feature = null
    while (r.hasMore) {
      val tag = r.varint()
      val field = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      if (field >= 1 && field <= 3 && wire == 2) {
        val (ls, le) = r.delimited()
        out = decodeList(field, b, ls, le)
      } else r.skip(wire)
    }
    if (out == null) throw Malformed
    out
  }

  private def decodeList(kind: Int, b: Array[Byte], off: Int, end: Int): Feature = {
    val r = new PbReader(b, off, end)
    val bytesV = Vector.newBuilder[Array[Byte]]
    val floatV = Vector.newBuilder[Float]
    val longV = Vector.newBuilder[Long]
    while (r.hasMore) {
      val tag = r.varint()
      val field = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      if (field != 1) r.skip(wire)
      else kind match {
        case 1 =>
          if (wire != 2) throw Malformed
          val (s, e) = r.delimited()
          bytesV += java.util.Arrays.copyOfRange(b, s, e)
        case 2 => wire match {
          case 2 => // packed fixed32
            val (s, e) = r.delimited()
            if ((e - s) % 4 != 0) throw Malformed
            var j = s
            while (j < e) {
              floatV += java.lang.Float.intBitsToFloat(readIntLE(b, j)); j += 4
            }
          case 5 =>
            if (r.end - r.i < 4) throw Malformed
            floatV += java.lang.Float.intBitsToFloat(readIntLE(b, r.i))
            r.i += 4
          case _ => throw Malformed
        }
        case 3 => wire match {
          case 2 => // packed varints
            val (s, e) = r.delimited()
            val rr = new PbReader(b, s, e)
            while (rr.hasMore) longV += rr.varint()
          case 0 => longV += r.varint()
          case _ => throw Malformed
        }
      }
    }
    kind match {
      case 1 => BytesFeature(bytesV.result())
      case 2 => FloatFeature(floatV.result())
      case 3 => Int64Feature(longV.result())
    }
  }

  /** Decode one `tf.train.Example`; `null` on malformed bytes. Later
    * duplicate feature names win (proto3 map semantics).
    */
  def decodeExample(bytes: Array[Byte]): Vector[(String, Feature)] =
    try {
      var out = Vector.empty[(String, Feature)]
      val top = new PbReader(bytes, 0, bytes.length)
      while (top.hasMore) {
        val tag = top.varint()
        if ((tag >>> 3).toInt == 1 && (tag & 7).toInt == 2) {
          val (fs, fe) = top.delimited()
          val feats = new PbReader(bytes, fs, fe)
          while (feats.hasMore) {
            val ftag = feats.varint()
            if ((ftag >>> 3).toInt == 1 && (ftag & 7).toInt == 2) {
              val (es, ee) = feats.delimited()
              val entry = new PbReader(bytes, es, ee)
              var name: String = null
              var feat: Feature = null
              while (entry.hasMore) {
                val etag = entry.varint()
                ((etag >>> 3).toInt, (etag & 7).toInt) match {
                  case (1, 2) =>
                    val (s, e) = entry.delimited()
                    name = new String(bytes, s, e - s,
                      java.nio.charset.StandardCharsets.UTF_8)
                  case (2, 2) =>
                    val (s, e) = entry.delimited()
                    feat = decodeFeature(bytes, s, e)
                  case (_, w) => entry.skip(w)
                }
              }
              if (name != null && feat != null)
                out = out.filterNot(_._1 == name) :+ (name -> feat)
            } else feats.skip((ftag & 7).toInt)
          }
        } else top.skip((tag & 7).toInt)
      }
      out
    } catch { case scala.util.control.NonFatal(_) => null }

  // ------------------------------------------------------- Spark surface

  /** Column → Feature mapping used by [[writeShards]]: string → UTF-8
    * BytesList, binary → BytesList, integral/boolean → Int64List,
    * float/double → FloatList, arrays of those map element-wise. NULL
    * values become an EMPTY list of the column's kind (the TF convention
    * — Example has no null, presence is list length).
    */
  private def rowFeature(dt: DataType, v: Any): Feature = dt match {
    case StringType => BytesFeature(
      if (v == null) Vector.empty
      else Vector(v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    case BinaryType => BytesFeature(
      if (v == null) Vector.empty else Vector(v.asInstanceOf[Array[Byte]]))
    case LongType | IntegerType | ShortType | ByteType => Int64Feature(
      if (v == null) Vector.empty
      else Vector(v.asInstanceOf[Number].longValue()))
    case BooleanType => Int64Feature(
      if (v == null) Vector.empty
      else Vector(if (v.asInstanceOf[Boolean]) 1L else 0L))
    case DoubleType | FloatType => FloatFeature(
      if (v == null) Vector.empty
      else Vector(v.asInstanceOf[Number].floatValue()))
    case ArrayType(et, _) =>
      val xs0 = if (v == null) Vector.empty
        else v.asInstanceOf[scala.collection.Seq[Any]].toVector
      // tf.train features cannot represent a null ELEMENT — refuse with
      // the policy named instead of a bare NPE deep in the task
      xs0.foreach(x => require(x != null,
        "null element inside an array column — TFRecord features have " +
          "no null slot; filter or coalesce array elements before export"))
      val xs = xs0
      et match {
        case LongType | IntegerType | ShortType =>
          Int64Feature(xs.map(_.asInstanceOf[Number].longValue()))
        case DoubleType | FloatType =>
          FloatFeature(xs.map(_.asInstanceOf[Number].floatValue()))
        case StringType => BytesFeature(xs.map(
          _.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        case BinaryType => BytesFeature(xs.map(_.asInstanceOf[Array[Byte]]))
        case other => throw new IllegalArgumentException(
          s"unsupported TFRecord array element type $other")
      }
    case other => throw new IllegalArgumentException(
      s"unsupported TFRecord column type $other")
  }

  private def supported(dt: DataType): Boolean =
    try { rowFeature(dt, null); true }
    catch { case _: IllegalArgumentException => false }

  /** Export `df` as deterministic-shuffle TFRecord shards: the same
    * hash-shard/hash-order layout as [[TrainExport.writeShardsJsonlCodec]]
    * (shard = portable hash mod n — engine-portable, stable under corpus
    * growth), one `shard-NNNNN.tfrecord[.gz]` file per shard id, one
    * `tf.train.Example` per row with every user column as a feature.
    * Parallelism is per shard; size `nShards` so a file stays in the
    * trainer's 16–64 MB sweet spot (and under the 64 MB read cap).
    */
  def writeShards(df: DataFrame, keyCol: String, nShards: Int, path: String,
      gzip: Boolean = false): Unit = {
    val cols = df.schema.fields
    cols.foreach(f => require(supported(f.dataType),
      s"column ${f.name}: ${f.dataType} has no TFRecord feature mapping"))
    val names = cols.map(_.name)
    val types = cols.map(_.dataType)
    val sharded = TrainExport.shuffleShards(df, keyCol, nShards)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
    val pathB = path
    val gzipB = gzip
    val confB = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    // the TarShards protocol: roll to a new file as the sorted shard id
    // changes, records STREAM to the filesystem (gzip through a
    // streaming encoder) — a shard never materializes in task memory
    sharded.foreachPartition { rows: Iterator[Row] =>
      var out: java.io.OutputStream = null
      var curShard = -1
      var curPath: org.apache.hadoop.fs.Path = null
      def closeCurrent(): Unit = if (out != null) {
        out.close(); out = null
      }
      // a failed shard must not survive as a valid-looking file missing
      // rows (GZIPOutputStream.close writes a clean trailer even over a
      // truncated record set): delete it, rethrow the original error
      def abortCurrent(): Unit = if (out != null) {
        ShardFiles.abort(out, curPath, confB.value); out = null
      }
      try {
        rows.foreach { r =>
          val shard = r.getAs[Int]("shard")
          if (shard != curShard) {
            closeCurrent()
            curShard = shard
            val ext = if (gzipB) ".tfrecord.gz" else ".tfrecord"
            curPath = new org.apache.hadoop.fs.Path(
              f"$pathB/shard-$curShard%05d$ext")
            val fs = curPath.getFileSystem(confB.value)
            val raw = fs.create(curPath, true)
            out =
              if (gzipB) new java.util.zip.GZIPOutputStream(raw, 64 << 10)
              else raw
          }
          val feats = names.indices.iterator
            .map(i => names(i) -> rowFeature(types(i), r.get(r.fieldIndex(names(i)))))
            .toSeq
          writeRecord(out, encodeExample(feats))
        }
        closeCurrent()
      } catch { case e: Throwable => abortCurrent(); throw e }
    }
  }

  /** Read a directory (or glob) of `.tfrecord[.gz]` shards back as one
    * row per Example: `(file, pos, int64_feats map<string,array<long>>,
    * float_feats map<string,array<double>>, bytes_feats
    * map<string,array<binary>>)` — the three oneof kinds as three typed
    * maps (a consumer picks features with `element_at`). One task per
    * file (file-level parallelism, the shard-size envelope is the scale
    * unit); gzip is sniffed, not suffix-trusted. Records after an
    * in-file corruption are dropped (no resync point), malformed
    * Examples are skipped individually.
    */
  def readExamples(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // honor the documented "directory (or glob / single file)" contract:
    // only a plain directory gets the /* suffix — a glob or file path
    // appended with /* would match nothing and refuse a valid input
    val p = new org.apache.hadoop.fs.Path(dir)
    val isPlainDir = !dir.exists("*?[{".contains(_)) &&
      (try p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getFileStatus(p).isDirectory
      catch { case scala.util.control.NonFatal(_) => false })
    val pattern = if (isPlainDir) s"$dir/*" else dir
    spark.read.format("binaryFile").load(pattern)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val plain = Compression.sniffCodec(bytes) match {
          case Some(c) => Compression.decode(bytes, c)
          case None => bytes
        }
        if (plain == null) Iterator.empty
        else readRecords(plain).iterator.zipWithIndex.flatMap {
          case (rec, idx) =>
            val feats = decodeExample(rec)
            if (feats == null) Iterator.empty
            else {
              val longs = scala.collection.mutable.LinkedHashMap
                .empty[String, Seq[Long]]
              val floats = scala.collection.mutable.LinkedHashMap
                .empty[String, Seq[Double]]
              val byteses = scala.collection.mutable.LinkedHashMap
                .empty[String, Seq[Array[Byte]]]
              feats.foreach {
                case (n, Int64Feature(vs)) => longs(n) = vs
                case (n, FloatFeature(vs)) => floats(n) = vs.map(_.toDouble)
                case (n, BytesFeature(vs)) => byteses(n) = vs
              }
              Iterator((path, idx.toLong, longs.toMap, floats.toMap,
                byteses.toMap))
            }
        }
      }
      .toDF("file", "pos", "int64_feats", "float_feats", "bytes_feats")
  }
}
