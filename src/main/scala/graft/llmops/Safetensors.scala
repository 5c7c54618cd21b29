package graft.llmops

import org.apache.spark.sql.{DataFrame, Row}

/** Safetensors ingestion — the HuggingFace-era tensor container
  * (checkpoints, adapters, precomputed embeddings): an 8-byte LE header
  * length, a JSON header mapping tensor name → {dtype, shape,
  * data_offsets}, then one flat byte buffer. The format spec is public
  * and deliberately minimal. Reference hook: vector ingestion,
  * `aje_libs/bd/helpers/utils/s3_vector_helper.py`.
  *
  * Header parses with the in-repo [[Json]] parser; payload dtypes
  * F32/F64/I64/I32/I16/I8/U8/BOOL and the half-precision pair
  * F16/BF16 (the dtypes real checkpoints actually ship — exact
  * bit-math decode, every half value is double-representable),
  * little-endian, rank ≤ 8 flattens to (leading-axes rows × last-axis
  * vectors) like [[Npy]]. Writer twin
  * emits canonical files (offsets packed in insertion order, sizes
  * validated). Per-row flatMap distribution, same as the npy family.
  */
object Safetensors {

  final case class TensorInfo(name: String, dtype: String,
      shape: Vector[Int], begin: Long, end: Long)

  private def widthOf(dtype: String): Int = dtype match {
    case "F64" | "I64" | "U64" => 8
    case "F32" | "I32" | "U32" => 4
    case "F16" | "BF16" | "I16" | "U16" => 2
    case "I8" | "U8" | "BOOL" => 1
    case d => throw new IllegalArgumentException(s"safetensors dtype $d")
  }

  /** Header parse: (tensor list in header order, data section offset). */
  private[llmops] def parseHeader(b: Array[Byte])
      : (Vector[TensorInfo], Long) = {
    require(b != null && b.length >= 8, "safetensors too short")
    var hlen = 0L
    var k = 0
    while (k < 8) { hlen |= (b(k) & 0xffL) << (8 * k); k += 1 }
    require(hlen > 0 && hlen <= b.length - 8 && hlen <= (64 << 20),
      s"bad safetensors header length $hlen")
    val json = new String(b, 8, hlen.toInt,
      java.nio.charset.StandardCharsets.UTF_8)
    val obj = Json.parseObject(json)
    require(obj != null, "unparseable safetensors header")
    val dataOff = 8 + hlen
    val tensors = obj.toVector.collect {
      case (name, m: Map[_, _]) if name != "__metadata__" =>
        val t = m.asInstanceOf[Map[String, Any]]
        val dtype = t.getOrElse("dtype",
          throw new IllegalArgumentException(s"$name missing dtype"))
          .toString
        val shape = t.getOrElse("shape", Vector.empty)
          .asInstanceOf[Vector[Any]]
          .map { case l: java.lang.Long => l.toInt }
        val offs = t.getOrElse("data_offsets",
          throw new IllegalArgumentException(s"$name missing offsets"))
          .asInstanceOf[Vector[Any]]
          .map { case l: java.lang.Long => l.longValue }
        require(offs.length == 2 && offs(0) >= 0 && offs(1) >= offs(0),
          s"$name bad data_offsets")
        val n = shape.map(_.toLong).product
        require(offs(1) - offs(0) == n * widthOf(dtype),
          s"$name size mismatch")
        require(dataOff + offs(1) <= b.length, s"$name data overrun")
        TensorInfo(name, dtype, shape, offs(0), offs(1))
    }
    (tensors, dataOff)
  }

  /** Flatten one tensor to rows of doubles: the last axis is the
    * vector, leading axes multiply into rows (rank 0 → one scalar row;
    * rank 1 → one row; a (a,b,c,d) conv kernel → a·b·c rows of d) —
    * the layout row-major storage already has.
    */
  private[llmops] def tensorRows(b: Array[Byte], dataOff: Long,
      t: TensorInfo): Seq[Array[Double]] = {
    require(t.shape.length <= 8, s"${t.name} rank ${t.shape.length}")
    val w = widthOf(t.dtype)
    val (n, d) = t.shape match {
      case Vector() => (1, 1)
      case Vector(x) => (1, x)
      case sh =>
        val rows = sh.init.map(_.toLong).product
        require(rows <= Int.MaxValue, s"${t.name} too many rows")
        (rows.toInt, sh.last)
    }
    val base = (dataOff + t.begin).toInt
    def at(p: Int): Double = t.dtype match {
      case "F32" =>
        java.lang.Float.intBitsToFloat((b(p) & 0xff) |
          ((b(p + 1) & 0xff) << 8) | ((b(p + 2) & 0xff) << 16) |
          ((b(p + 3) & 0xff) << 24)).toDouble
      case "F64" | "I64" =>
        var v = 0L
        var k = 0
        while (k < 8) { v |= (b(p + k) & 0xffL) << (8 * k); k += 1 }
        if (t.dtype == "F64") java.lang.Double.longBitsToDouble(v)
        else v.toDouble
      case "I32" =>
        ((b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
          ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)).toDouble
      case "I16" =>
        (((b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)).toShort).toDouble
      case "F16" =>
        Npy.halfToDouble((b(p) & 0xff) | ((b(p + 1) & 0xff) << 8))
      case "BF16" =>
        Npy.bf16ToDouble((b(p) & 0xff) | ((b(p + 1) & 0xff) << 8))
      case "I8" => b(p).toDouble
      case "U8" | "BOOL" => (b(p) & 0xff).toDouble
      case "U16" =>
        ((b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)).toDouble
      case "U32" =>
        (((b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
          ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24))).toDouble
      case "U64" =>
        // unsigned 64 → double loses precision past 2^53, exactly as
        // numpy's float64 cast does
        var v = 0L
        var k = 0
        while (k < 8) { v |= (b(p + k) & 0xffL) << (8 * k); k += 1 }
        if (v >= 0) v.toDouble
        else (v >>> 1).toDouble * 2.0 + (v & 1L).toDouble
      case d => throw new IllegalArgumentException(s"dtype $d")
    }
    (0 until n).map { r =>
      val out = new Array[Double](d)
      var c = 0
      while (c < d) { out(c) = at(base + (r * d + c) * w); c += 1 }
      out
    }
  }

  /** Explode (key, safetensors bytes) into
    * (key, tensor, row_idx, vec array<double>); malformed files or
    * tensors vanish (refusal = absence, the ingestion convention).
    */
  def tensors(df: DataFrame, keyCol: String,
      contentCol: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      df.schema(keyCol),
      org.apache.spark.sql.types.StructField("tensor",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("row_idx",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("vec",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType))))
    val ki = df.schema.fieldIndex(keyCol)
    val ci = df.schema.fieldIndex(contentCol)
    df.flatMap { row =>
      val b = row.getAs[Array[Byte]](ci)
      (try {
        val (ts, dataOff) = parseHeader(b)
        ts.flatMap { t =>
          try tensorRows(b, dataOff, t).zipWithIndex.map { case (v, i) =>
            (t.name, i.toLong, v)
          } catch { case scala.util.control.NonFatal(_) => Seq.empty }
        }
      } catch { case scala.util.control.NonFatal(_) =>
        Seq.empty[(String, Long, Array[Double])]
      }).map { case (name, i, v) =>
        Row(row.get(ki), name, i, v.toSeq)
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  // ------------------------------------------------------------ writer twin

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** Canonical bytes for (name, dtype, shape, raw LE payload) tensors
    * packed in order.
    */
  def write(members: Seq[(String, String, Seq[Int], Array[Byte])])
      : Array[Byte] = {
    var off = 0L
    val entries = members.map { case (name, dtype, shape, raw) =>
      val n = shape.map(_.toLong).product
      require(raw.length == n * widthOf(dtype),
        s"$name payload size mismatch")
      val e = s""""${jsonEscape(name)}":{"dtype":"$dtype",""" +
        s""""shape":${shape.mkString("[", ",", "]")},""" +
        s""""data_offsets":[$off,${off + raw.length}]}"""
      off += raw.length
      e
    }
    val header = entries.mkString("{", ",", "}")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val o = new java.io.ByteArrayOutputStream(8 + header.length + off.toInt)
    var k = 0
    while (k < 8) {
      o.write(((header.length.toLong >> (8 * k)) & 0xff).toInt); k += 1
    }
    o.write(header, 0, header.length)
    members.foreach { case (_, _, _, raw) => o.write(raw, 0, raw.length) }
    o.toByteArray
  }

  def writeI64(name: String, values: Array[Long]): (String, String,
      Seq[Int], Array[Byte]) = {
    val data = new Array[Byte](values.length * 8)
    var i = 0
    while (i < values.length) {
      var k = 0
      while (k < 8) {
        data(i * 8 + k) = ((values(i) >> (8 * k)) & 0xff).toByte; k += 1
      }
      i += 1
    }
    (name, "I64", Seq(values.length), data)
  }

  def writeF32(name: String, rows: Seq[Array[Float]]): (String, String,
      Seq[Int], Array[Byte]) = {
    val d = if (rows.isEmpty) 0 else rows.head.length
    val data = new Array[Byte](rows.length * d * 4)
    var i = 0
    rows.foreach { r =>
      require(r.length == d, "ragged rows")
      r.foreach { f =>
        val bits = java.lang.Float.floatToIntBits(f)
        var k = 0
        while (k < 4) {
          data(i * 4 + k) = ((bits >> (8 * k)) & 0xff).toByte; k += 1
        }
        i += 1
      }
    }
    (name, "F32", Seq(rows.length, d), data)
  }
}
