package graft.llmops

import org.apache.spark.sql.{DataFrame, Row}

/** NumPy `.npy` / `.npz` ingestion — the format embeddings, logits and
  * precomputed features actually arrive in (every Python pipeline's
  * `np.save`). Reference hook: vector ingestion into the store,
  * `aje_libs/bd/helpers/utils/s3_vector_helper.py`.
  *
  * From-scratch v1/v2 header parse (magic, version, python-literal dict
  * header) and raw little-endian payload decode for the dtypes data
  * pipelines use: `<f4 <f8 <i4 <i8` (+ `|i1`), C-order, 1-D/2-D.
  * Fortran order, big-endian and object dtypes refuse — documented
  * boundary. `.npz` is the zip convention (stored or deflated members,
  * JDK inflater). Writer twin emits canonical v1 files numpy loads
  * verbatim (spec-asserted through the driver's own numpy).
  *
  * Distribution shape: per-row flatMap over (key, bytes) — an archive
  * of arrays scales on archive count; one npz never splits (its members
  * do, one row per matrix row).
  */
object Npy {

  final case class Header(descr: String, fortran: Boolean,
      shape: Vector[Int], dataOff: Int)

  private val Magic = Array[Byte](0x93.toByte, 'N', 'U', 'M', 'P', 'Y')

  private[llmops] def parseHeader(b: Array[Byte]): Header = {
    require(b != null && b.length >= 10, "npy too short")
    var k = 0
    while (k < 6) {
      require(b(k) == Magic(k), "not an npy file"); k += 1
    }
    val major = b(6) & 0xff
    require(major == 1 || major == 2, s"npy version $major")
    val (hlen, hoff) =
      if (major == 1) ((b(8) & 0xff) | ((b(9) & 0xff) << 8), 10)
      else ((b(8) & 0xff) | ((b(9) & 0xff) << 8) |
        ((b(10) & 0xff) << 16) | ((b(11) & 0xff) << 24), 12)
    require(hlen > 0 && hoff + hlen <= b.length, "npy header overrun")
    val h = new String(b, hoff, hlen,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val descr = "'descr'\\s*:\\s*'([^']+)'".r.findFirstMatchIn(h)
      .map(_.group(1)).getOrElse(
        throw new IllegalArgumentException("npy header missing descr"))
    val fortran = "'fortran_order'\\s*:\\s*(True|False)".r
      .findFirstMatchIn(h).exists(_.group(1) == "True")
    val shapeStr = "'shape'\\s*:\\s*\\(([0-9,\\s]*)\\)".r
      .findFirstMatchIn(h).map(_.group(1)).getOrElse(
        throw new IllegalArgumentException("npy header missing shape"))
    val shape = shapeStr.split(",").map(_.trim).filter(_.nonEmpty)
      .map(_.toInt).toVector
    Header(descr, fortran, shape, hoff + hlen)
  }

  private def elemSize(descr: String): Int = descr match {
    case "<f2" => 2
    case "<f4" => 4
    case "<f8" => 8
    case "<i4" => 4
    case "<i8" => 8
    case "|i1" | "<i1" => 1
    case d => throw new IllegalArgumentException(s"npy dtype $d")
  }

  /** IEEE 754 binary16 → double, exact (every half value is double-
    * representable): subnormals scale by 2⁻²⁴, infinities and NaN map
    * to their double forms.
    */
  private[llmops] def halfToDouble(bits: Int): Double = {
    val sign = if ((bits & 0x8000) != 0) -1.0 else 1.0
    val exp = (bits >> 10) & 0x1f
    val mant = bits & 0x3ff
    val mag =
      if (exp == 0) mant * 5.9604644775390625e-8 // 2^-24
      else if (exp == 0x1f) {
        if (mant == 0) Double.PositiveInfinity else Double.NaN
      } else (1.0 + mant / 1024.0) * math.pow(2.0, (exp - 15).toDouble)
    sign * mag
  }

  /** bfloat16 → double: the top 16 bits of an IEEE binary32. */
  private[llmops] def bf16ToDouble(bits: Int): Double =
    java.lang.Float.intBitsToFloat(bits << 16).toDouble

  /** Decode an npy to rows of doubles (floats/ints widen): 1-D arrays
    * yield one row; (n, d) matrices yield n rows of d. Refuses fortran
    * order and unsupported dtypes.
    */
  private[llmops] def rows(b: Array[Byte]): Seq[Array[Double]] = {
    val h = parseHeader(b)
    require(!h.fortran, "fortran-order npy unsupported")
    require(h.shape.length <= 8, s"npy rank ${h.shape.length}")
    val w = elemSize(h.descr)
    val (n, d) = h.shape match {
      case Vector() => (1, 1)
      case Vector(x) => (1, x)
      case sh =>
        // last axis is the vector; leading axes multiply into rows
        // (row-major storage makes this a pure reindex)
        val rows = sh.init.map(_.toLong).product
        require(rows <= Int.MaxValue, "npy too many rows")
        (rows.toInt, sh.last)
    }
    require(h.dataOff + n.toLong * d * w <= b.length, "npy data overrun")
    def at(p: Int): Double = h.descr match {
      case "<f2" =>
        halfToDouble((b(p) & 0xff) | ((b(p + 1) & 0xff) << 8))
      case "<f4" =>
        java.lang.Float.intBitsToFloat((b(p) & 0xff) |
          ((b(p + 1) & 0xff) << 8) | ((b(p + 2) & 0xff) << 16) |
          ((b(p + 3) & 0xff) << 24)).toDouble
      case "<f8" | "<i8" =>
        var v = 0L
        var k = 0
        while (k < 8) { v |= (b(p + k) & 0xffL) << (8 * k); k += 1 }
        if (h.descr == "<f8") java.lang.Double.longBitsToDouble(v)
        else v.toDouble
      case "<i4" =>
        ((b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
          ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)).toDouble
      case _ => b(p).toDouble // |i1
    }
    (0 until n).map { r =>
      val out = new Array[Double](d)
      var c = 0
      while (c < d) { out(c) = at(h.dataOff + (r * d + c) * w); c += 1 }
      out
    }
  }

  /** (name, bytes) members of an npz (zip of npy files); stored and
    * deflated entries both read. Null/malformed → empty.
    */
  private[llmops] def npzMembers(b: Array[Byte]): Seq[(String, Array[Byte])] = {
    if (b == null || b.length < 4 || b(0) != 'P' || b(1) != 'K')
      return Seq.empty
    try {
      val zin = new java.util.zip.ZipInputStream(
        new java.io.ByteArrayInputStream(b))
      val out = Vector.newBuilder[(String, Array[Byte])]
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory) {
          val bo = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](16 << 10)
          var n = zin.read(buf)
          while (n > 0) { bo.write(buf, 0, n); n = zin.read(buf) }
          out += ((e.getName, bo.toByteArray))
        }
        e = zin.getNextEntry
      }
      out.result()
    } catch { case scala.util.control.NonFatal(_) => Seq.empty }
  }

  /** Explode (key, npy-or-npz bytes) into
    * (key, member, row_idx, vec array<double>): a bare npy is the
    * member "" ; malformed members vanish (refusal = absence).
    */
  def arrays(df: DataFrame, keyCol: String, contentCol: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      df.schema(keyCol),
      org.apache.spark.sql.types.StructField("member",
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
      val members: Seq[(String, Array[Byte])] =
        if (b != null && b.length >= 2 && b(0) == 'P' && b(1) == 'K')
          npzMembers(b)
        else Seq(("", b))
      members.flatMap { case (name, mb) =>
        (try rows(mb)
         catch { case scala.util.control.NonFatal(_) => Seq.empty })
          .zipWithIndex.map { case (v, i) =>
            Row(row.get(ki), name, i.toLong, v.toSeq)
          }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  // ------------------------------------------------------------ writer twin

  /** Canonical v1 npy bytes for a little-endian payload. */
  private[llmops] def writeNpy(descr: String, shape: Seq[Int],
      data: Array[Byte]): Array[Byte] = {
    val shapeStr = shape.length match {
      case 1 => s"(${shape.head},)"
      case _ => shape.mkString("(", ", ", ")")
    }
    val dict =
      s"{'descr': '$descr', 'fortran_order': False, 'shape': $shapeStr, }"
    // header (incl. the 10-byte prefix) pads to a multiple of 64
    val base = 10 + dict.length + 1
    val pad = (64 - (base % 64)) % 64
    val header = dict + (" " * pad) + "\n"
    val o = new java.io.ByteArrayOutputStream(10 + header.length +
      data.length)
    o.write(Magic, 0, 6); o.write(1); o.write(0)
    o.write(header.length & 0xff); o.write((header.length >> 8) & 0xff)
    o.write(header.getBytes(
      java.nio.charset.StandardCharsets.ISO_8859_1))
    o.write(data, 0, data.length)
    o.toByteArray
  }

  def writeNpyLongs(values: Array[Long]): Array[Byte] = {
    val data = new Array[Byte](values.length * 8)
    var i = 0
    while (i < values.length) {
      var k = 0
      while (k < 8) {
        data(i * 8 + k) = ((values(i) >> (8 * k)) & 0xff).toByte; k += 1
      }
      i += 1
    }
    writeNpy("<i8", Seq(values.length), data)
  }

  def writeNpyFloats(rows: Seq[Array[Float]]): Array[Byte] = {
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
    writeNpy("<f4", Seq(rows.length, d), data)
  }

  /** npz bytes (STORED members — numpy reads both). */
  def writeNpz(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bo)
    members.foreach { case (name, b) =>
      val e = new java.util.zip.ZipEntry(name)
      z.putNextEntry(e)
      z.write(b, 0, b.length)
      z.closeEntry()
    }
    z.close()
    bo.toByteArray
  }
}
