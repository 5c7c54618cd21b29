package graft.llmops

import graft.llmops.Arrow._
import org.apache.spark.sql.Row

/** Writer twin for [[Arrow]]: canonical Arrow IPC file bytes from rows of
  * Spark-external values, including a minimal flatbuffers BUILDER (the
  * classic end-growing algorithm — vtables, forward uoffsets, aligned
  * scalars). Fixtures and both-direction interop (Arrow's own Java
  * reader consumes these files — asserted in the spec).
  */
object ArrowWriter {

  // -------------------------------------------------- flatbuffers builder

  private[llmops] final class FbBuilder(cap: Int = 1 << 20) {
    private var buf = new Array[Byte](cap)
    private var head = cap // grows downward; data lives in [head, cap)
    private var minalign = 1
    private val vtable = new Array[Int](64) // field id -> offset()
    private var vtableSize = 0
    private var objStart = 0

    def offset(): Int = buf.length - head
    private def grow(): Unit = {
      val n = new Array[Byte](buf.length * 2)
      System.arraycopy(buf, head, n, buf.length + head, offset())
      head += buf.length
      buf = n
    }
    private def pad(n: Int): Unit = {
      var k = 0
      while (k < n) { head -= 1; buf(head) = 0; k += 1 }
    }
    def prep(align: Int, size: Int): Unit = {
      if (align > minalign) minalign = align
      while (head - size < align) grow()
      val alignSize = ((~(offset() + size)) + 1) & (align - 1)
      pad(alignSize)
      if (head - size < 0) grow()
    }
    def putI8(v: Int): Unit = { head -= 1; buf(head) = v.toByte }
    def putI16(v: Int): Unit = {
      head -= 2
      buf(head) = (v & 0xff).toByte
      buf(head + 1) = ((v >> 8) & 0xff).toByte
    }
    def putI32(v: Int): Unit = {
      head -= 4
      var k = 0
      while (k < 4) { buf(head + k) = ((v >> (8 * k)) & 0xff).toByte; k += 1 }
    }
    def putI64(v: Long): Unit = {
      head -= 8
      var k = 0
      while (k < 8) { buf(head + k) = ((v >> (8 * k)) & 0xff).toByte; k += 1 }
    }
    def addI8(v: Int): Unit = { prep(1, 1); putI8(v) }
    def addI16(v: Int): Unit = { prep(2, 2); putI16(v) }
    def addI32(v: Int): Unit = { prep(4, 4); putI32(v) }
    def addI64(v: Long): Unit = { prep(8, 8); putI64(v) }
    def addOffset(off: Int): Unit = {
      prep(4, 4)
      putI32(offset() + 4 - off)
    }
    def createString(s: String): Int = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      addI8(0) // null terminator
      startVector(1, b.length, 1)
      head -= b.length
      System.arraycopy(b, 0, buf, head, b.length)
      endVector(b.length)
    }
    def startVector(elemSize: Int, count: Int, align: Int): Unit = {
      prep(4, elemSize * count)
      prep(math.max(align, 4), elemSize * count)
    }
    def endVector(count: Int): Int = { putI32(count); offset() }
    def startTable(): Unit = {
      java.util.Arrays.fill(vtable, 0)
      vtableSize = 0
      objStart = offset()
    }
    private def trackField(id: Int): Unit = {
      vtable(id) = offset()
      if (id + 1 > vtableSize) vtableSize = id + 1
    }
    def slotI16(id: Int, v: Int, dflt: Int): Unit =
      if (v != dflt) { addI16(v); trackField(id) }
    def slotI32(id: Int, v: Int, dflt: Int): Unit =
      if (v != dflt) { addI32(v); trackField(id) }
    def slotI64(id: Int, v: Long, dflt: Long): Unit =
      if (v != dflt) { addI64(v); trackField(id) }
    def slotBool(id: Int, v: Boolean, dflt: Boolean): Unit =
      if (v != dflt) { addI8(if (v) 1 else 0); trackField(id) }
    def slotU8(id: Int, v: Int, dflt: Int): Unit =
      if (v != dflt) { addI8(v); trackField(id) }
    def slotOffset(id: Int, off: Int): Unit =
      if (off != 0) { addOffset(off); trackField(id) }
    /** struct fields are written inline immediately before endTable —
      * call after writing the struct bytes.
      */
    def slotStruct(id: Int): Unit = trackField(id)
    def endTable(): Int = {
      // soffset placeholder
      addI32(0)
      val tablePos = offset()
      // vtable: vsize, tsize, then per-field offsets FROM table pos
      var id = vtableSize - 1
      val slots = new Array[Int](vtableSize)
      while (id >= 0) {
        slots(id) = if (vtable(id) == 0) 0 else tablePos - vtable(id)
        id -= 1
      }
      var k = vtableSize - 1
      while (k >= 0) { addI16(slots(k)); k -= 1 }
      addI16(tablePos - objStart) // table size
      addI16((vtableSize + 2) * 2) // vtable size in bytes
      val vtPos = offset()
      // patch the soffset at tablePos: table_pos - vtable_pos, stored at
      // buffer index (buf.length - tablePos)
      val p = buf.length - tablePos
      val so = vtPos - tablePos
      var k2 = 0
      while (k2 < 4) {
        buf(p + k2) = ((so >> (8 * k2)) & 0xff).toByte; k2 += 1
      }
      tablePos
    }
    def finish(root: Int): Array[Byte] = {
      prep(minalign, 4)
      addOffset(root)
      java.util.Arrays.copyOfRange(buf, head, buf.length)
    }
  }

  // --------------------------------------------------------- schema tables

  private def buildField(b: FbBuilder, f: AField): Int = {
    val childOffs = f.tpe match {
      case AList(c, _) => Vector(buildField(b, c))
      case AStruct(cs) => cs.map(buildField(b, _))
      case AUnion(cs, _, _) => cs.map(buildField(b, _))
      case ARunEnd(re, v) => Vector(buildField(b, re), buildField(b, v))
      case AMap(entries) => Vector(buildField(b, entries))
      case _ => Vector.empty
    }
    val childVec = if (childOffs.isEmpty) 0 else {
      b.startVector(4, childOffs.length, 4)
      childOffs.reverse.foreach(b.addOffset)
      b.endVector(childOffs.length)
    }
    val nameOff = b.createString(f.name)
    // strings referenced by type tables must exist before startTable
    val tzOff = f.tpe match {
      case ATimestamp(_, true) => b.createString("UTC")
      case _ => 0
    }
    val unionIdsOff = f.tpe match {
      case AUnion(_, ids, _) =>
        b.startVector(4, ids.length, 4)
        ids.reverse.foreach(b.putI32)
        b.endVector(ids.length)
      case _ => 0
    }
    // type table
    val (typeType, typeOff) = f.tpe match {
      case AInt(bits) =>
        b.startTable()
        b.slotI32(0, bits, 0)
        b.slotBool(1, v = true, dflt = false)
        (2, b.endTable())
      case AFloat =>
        b.startTable(); b.slotI16(0, 1, 0); (3, b.endTable())
      case ADouble =>
        b.startTable(); b.slotI16(0, 2, 0); (3, b.endTable())
      case ABinary(false) => b.startTable(); (4, b.endTable())
      case AString(false) => b.startTable(); (5, b.endTable())
      case ABool => b.startTable(); (6, b.endTable())
      case ABinary(true) => b.startTable(); (19, b.endTable())
      case AString(true) => b.startTable(); (20, b.endTable())
      case AList(_, false) => b.startTable(); (12, b.endTable())
      case AList(_, true) => b.startTable(); (21, b.endTable())
      case AStruct(_) => b.startTable(); (13, b.endTable())
      case ADecimal(p, sc, bits) =>
        require(bits == 128, "writer emits Decimal128 only")
        b.startTable()
        b.slotI32(0, p, 0)
        b.slotI32(1, sc, 0)
        b.slotI32(2, 128, 128)
        (7, b.endTable())
      case ADate32 =>
        // Date.unit fbs default is MILLISECOND — DAY must be explicit
        b.startTable(); b.slotI16(0, 0, 1); (8, b.endTable())
      case ADate64 =>
        b.startTable(); b.slotI16(0, 1, 1); (8, b.endTable())
      case ATimestamp(unit, tz) =>
        b.startTable()
        b.slotI16(0, unit, 0)
        if (tz) b.slotOffset(1, tzOff)
        (10, b.endTable())
      case AInterval(u) =>
        b.startTable(); b.slotI16(0, u, 0); (11, b.endTable())
      case AUnion(_, _, dense) =>
        b.startTable()
        b.slotI16(0, if (dense) 1 else 0, 0)
        if (unionIdsOff != 0) b.slotOffset(1, unionIdsOff)
        (14, b.endTable())
      case ARunEnd(_, _) => b.startTable(); (22, b.endTable())
      case AView(true) => b.startTable(); (23, b.endTable())
      case AView(false) => b.startTable(); (24, b.endTable())
      case AMap(_) => b.startTable(); (17, b.endTable())
      case AFixedBinary(w) =>
        b.startTable(); b.slotI32(0, w, 0); (15, b.endTable())
      case ANull => b.startTable(); (1, b.endTable())
      case APassthrough(_) | AFixedList(_, _) | AListView(_, _) =>
        throw new IllegalArgumentException(
          "writer does not emit passthrough, fixed-size-list or " +
            "list-view types")
    }
    b.startTable()
    b.slotOffset(0, nameOff)
    b.slotBool(1, f.nullable, dflt = false)
    b.slotU8(2, typeType, 0)
    b.slotOffset(3, typeOff)
    b.slotOffset(5, childVec)
    b.endTable()
  }

  private def buildSchema(b: FbBuilder, fields: Vector[AField]): Int = {
    val fieldOffs = fields.map(buildField(b, _))
    b.startVector(4, fieldOffs.length, 4)
    fieldOffs.reverse.foreach(b.addOffset)
    val vec = b.endVector(fieldOffs.length)
    b.startTable()
    b.slotOffset(1, vec)
    b.endTable()
  }

  private def schemaMessage(fields: Vector[AField]): Array[Byte] = {
    val b = new FbBuilder()
    val schema = buildSchema(b, fields)
    b.startTable()
    b.slotI16(0, 4, 0) // MetadataVersion V5
    b.slotU8(1, 1, 0) // header type Schema
    b.slotOffset(2, schema)
    b.slotI64(3, 0L, 0L)
    val msg = b.endTable()
    encapsulate(b.finish(msg))
  }

  // ---------------------------------------------------------- batch bodies

  private final class Body {
    val out = new java.io.ByteArrayOutputStream()
    val buffers = Vector.newBuilder[(Long, Long)]
    def add(b: Array[Byte]): Unit = {
      val off = out.size().toLong
      out.write(b, 0, b.length)
      val padTo = (8 - (out.size() & 7)) & 7
      var k = 0
      while (k < padTo) { out.write(0); k += 1 }
      buffers += ((off, b.length.toLong))
    }
  }

  private def validityOf(vs: Seq[Any]): (Array[Byte], Long) = {
    val nulls = vs.count(_ == null)
    if (nulls == 0) (Array.emptyByteArray, 0L)
    else {
      val bm = new Array[Byte]((vs.length + 7) / 8)
      var i = 0
      vs.foreach { v =>
        if (v != null) bm(i >> 3) = (bm(i >> 3) | (1 << (i & 7))).toByte
        i += 1
      }
      (bm, nulls.toLong)
    }
  }

  private def writeColumn(f: AField, vs: Seq[Any], body: Body,
      nodes: scala.collection.mutable.ArrayBuffer[(Long, Long)],
      vari: scala.collection.mutable.ArrayBuffer[Long]): Unit = {
    f.tpe match {
      case AUnion(children, typeIds, dense) =>
        // sparse union: types buffer + full-length children, NO
        // validity (values are the reader's tagged sparse structs)
        require(!dense, "writer emits sparse unions only")
        nodes += ((vs.length.toLong, 0L))
        val types = new Array[Byte](vs.length)
        var i = 0
        vs.foreach { v =>
          require(v != null, "arrow union slots cannot be null at the " +
            "top — encode a null in the tagged child instead")
          types(i) = v.asInstanceOf[Row].getInt(0).toByte
          i += 1
        }
        body.add(types)
        children.zipWithIndex.foreach { case (c, j) =>
          val tid = typeIds(j)
          val kid = vs.map { v =>
            val r = v.asInstanceOf[Row]
            if (r.getInt(0) == tid) r.get(1 + j) else null
          }
          writeColumn(c, kid, body, nodes, vari)
        }
        return
      case ANull =>
        vs.foreach(v => require(v == null, "non-null in a Null column"))
        nodes += ((vs.length.toLong, vs.length.toLong))
        return
      case ARunEnd(re, values) =>
        // re-run-length the LOGICAL values (scalar equality)
        nodes += ((vs.length.toLong, 0L))
        val ends = Vector.newBuilder[Any]
        val rvs = Vector.newBuilder[Any]
        var nRuns = 0
        var k = 0
        while (k < vs.length) {
          var e = k + 1
          while (e < vs.length && vs(e) == vs(k)) e += 1
          ends += e
          rvs += vs(k)
          nRuns += 1
          k = e
        }
        // the computed run ends must FIT the declared run_ends width —
        // a 16-bit re column with >32767 rows would wrap negative in the
        // generic int pack below and corrupt the file structurally
        re.tpe match {
          case AInt(bits) if bits < 64 =>
            require(vs.length.toLong < (1L << (bits - 1)),
              s"run-end width int$bits cannot index ${vs.length} rows — " +
                "declare a wider run_ends type")
          case _ => ()
        }
        writeColumn(re, ends.result(), body, nodes, vari)
        writeColumn(values, rvs.result(), body, nodes, vari)
        return
      case _ =>
    }
    val (bm, nulls) = validityOf(vs)
    nodes += ((vs.length.toLong, nulls))
    body.add(bm)
    f.tpe match {
      case ABool =>
        val data = new Array[Byte]((vs.length + 7) / 8)
        var i = 0
        vs.foreach { v =>
          if (v != null && v.asInstanceOf[Boolean])
            data(i >> 3) = (data(i >> 3) | (1 << (i & 7))).toByte
          i += 1
        }
        body.add(data)
      case AInt(bits) =>
        val w = bits / 8
        val data = new Array[Byte](vs.length * w)
        var i = 0
        vs.foreach { v =>
          if (v != null) {
            val x = v match {
              case b: Byte => b.toLong
              case s: Short => s.toLong
              case n: Int => n.toLong
              case l: Long => l
            }
            var k = 0
            while (k < w) {
              data(i * w + k) = ((x >> (8 * k)) & 0xff).toByte; k += 1
            }
          }
          i += 1
        }
        body.add(data)
      case AFloat =>
        val data = new Array[Byte](vs.length * 4)
        var i = 0
        vs.foreach { v =>
          if (v != null) {
            val bits = java.lang.Float.floatToIntBits(v.asInstanceOf[Float])
            var k = 0
            while (k < 4) {
              data(i * 4 + k) = ((bits >> (8 * k)) & 0xff).toByte; k += 1
            }
          }
          i += 1
        }
        body.add(data)
      case ADouble =>
        val data = new Array[Byte](vs.length * 8)
        var i = 0
        vs.foreach { v =>
          if (v != null) {
            val bits = java.lang.Double.doubleToLongBits(
              v.asInstanceOf[Double])
            var k = 0
            while (k < 8) {
              data(i * 8 + k) = ((bits >> (8 * k)) & 0xff).toByte; k += 1
            }
          }
          i += 1
        }
        body.add(data)
      case ADecimal(_, sc, _) =>
        val data = new Array[Byte](vs.length * 16)
        var i = 0
        vs.foreach { v =>
          if (v != null) {
            val be = v.asInstanceOf[java.math.BigDecimal]
              .setScale(sc, java.math.RoundingMode.UNNECESSARY)
              .unscaledValue().toByteArray
            val pad: Byte =
              if (be.length > 0 && be(0) < 0) -1 else 0
            var k = 0
            while (k < 16) {
              // little-endian with sign extension past the BE bytes
              data(i * 16 + k) =
                if (k < be.length) be(be.length - 1 - k) else pad
              k += 1
            }
          }
          i += 1
        }
        body.add(data)
      case ADate32 =>
        val data = new Array[Byte](vs.length * 4)
        var i = 0
        vs.foreach { v =>
          if (v != null) {
            val d = v.asInstanceOf[java.sql.Date].toLocalDate
              .toEpochDay.toInt
            var k = 0
            while (k < 4) {
              data(i * 4 + k) = ((d >> (8 * k)) & 0xff).toByte; k += 1
            }
          }
          i += 1
        }
        body.add(data)
      case ADate64 =>
        val data = new Array[Byte](vs.length * 8)
        var i = 0
        vs.foreach { v =>
          if (v != null) {
            val m = v.asInstanceOf[java.sql.Date].toLocalDate
              .toEpochDay * 86400000L
            var k = 0
            while (k < 8) {
              data(i * 8 + k) = ((m >> (8 * k)) & 0xff).toByte; k += 1
            }
          }
          i += 1
        }
        body.add(data)
      case ATimestamp(unit, tz) =>
        require(unit == 2, "writer emits MICROSECOND timestamps only")
        val data = new Array[Byte](vs.length * 8)
        var i = 0
        vs.foreach { v =>
          if (v != null) {
            val inst =
              if (tz) v.asInstanceOf[java.sql.Timestamp].toInstant
              else v.asInstanceOf[java.time.LocalDateTime]
                .toInstant(java.time.ZoneOffset.UTC)
            val us = inst.getEpochSecond * 1000000L + inst.getNano / 1000L
            var k = 0
            while (k < 8) {
              data(i * 8 + k) = ((us >> (8 * k)) & 0xff).toByte; k += 1
            }
          }
          i += 1
        }
        body.add(data)
      case AInterval(0) => // i32 months (java.time.Period externally)
        val data = new Array[Byte](vs.length * 4)
        var i = 0
        vs.foreach { v =>
          if (v != null) {
            val p = v.asInstanceOf[java.time.Period]
            require(p.getDays == 0,
              "year-month interval with a day part cannot round-trip")
            val m = p.toTotalMonths
            require(m >= Int.MinValue && m <= Int.MaxValue,
              s"interval of $m months overflows arrow's i32")
            var k = 0
            while (k < 4) {
              data(i * 4 + k) = ((m >> (8 * k)) & 0xff).toByte; k += 1
            }
          }
          i += 1
        }
        body.add(data)
      case AInterval(1) => // i32 days + i32 millis (java.time.Duration)
        val data = new Array[Byte](vs.length * 8)
        var i = 0
        vs.foreach { v =>
          if (v != null) {
            val d = v.asInstanceOf[java.time.Duration]
            require(d.getNano % 1000000 == 0,
              "arrow DAY_TIME holds milliseconds — sub-milli duration " +
                "cannot round-trip; use MONTH_DAY_NANO")
            val total = d.toMillis
            val days = Math.floorDiv(total, 86400000L)
            val ms = Math.floorMod(total, 86400000L).toInt
            require(days >= Int.MinValue && days <= Int.MaxValue,
              s"interval of $days days overflows arrow's i32")
            val dd = days.toInt
            var k = 0
            while (k < 4) {
              data(i * 8 + k) = ((dd >> (8 * k)) & 0xff).toByte
              data(i * 8 + 4 + k) = ((ms >> (8 * k)) & 0xff).toByte
              k += 1
            }
          }
          i += 1
        }
        body.add(data)
      case AInterval(_) => // i32 months + i32 days + i64 nanos
        val data = new Array[Byte](vs.length * 16)
        var i = 0
        vs.foreach { v =>
          if (v != null) {
            val ci = v.asInstanceOf[
              org.apache.spark.unsafe.types.CalendarInterval]
            // refuse, never wrap: |micros| past Long.MaxValue/1000
            // cannot land in i64 nanos (the sibling arms refuse their
            // i32 overflows the same way)
            val ns =
              try Math.multiplyExact(ci.microseconds, 1000L)
              catch {
                case _: ArithmeticException =>
                  throw new IllegalArgumentException(
                    s"interval of ${ci.microseconds} microseconds " +
                      "overflows arrow's i64 nanoseconds")
              }
            var k = 0
            while (k < 4) {
              data(i * 16 + k) = ((ci.months >> (8 * k)) & 0xff).toByte
              data(i * 16 + 4 + k) = ((ci.days >> (8 * k)) & 0xff).toByte
              k += 1
            }
            k = 0
            while (k < 8) {
              data(i * 16 + 8 + k) = ((ns >> (8 * k)) & 0xff).toByte
              k += 1
            }
          }
          i += 1
        }
        body.add(data)
      case AString(large) =>
        val bytes = vs.map {
          case null => Array.emptyByteArray
          case s: String =>
            s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        }
        writeVarWidth(bytes, large, body)
      case ABinary(large) =>
        val bytes = vs.map {
          case null => Array.emptyByteArray
          case b: Array[Byte] => b
        }
        writeVarWidth(bytes, large, body)
      case AList(child, large) =>
        val w = if (large) 8 else 4
        val offs = new Array[Byte]((vs.length + 1) * w)
        var acc = 0L
        var i = 0
        def put(pos: Int, x: Long): Unit = {
          var k = 0
          while (k < w) {
            offs(pos * w + k) = ((x >> (8 * k)) & 0xff).toByte; k += 1
          }
        }
        put(0, 0L)
        vs.foreach { v =>
          if (v != null) acc += v.asInstanceOf[Seq[Any]].length
          i += 1
          put(i, acc)
        }
        body.add(offs)
        val kids = vs.flatMap {
          case null => Seq.empty[Any]
          case s: Seq[_] => s
        }
        writeColumn(child, kids, body, nodes, vari)
      case AStruct(children) =>
        children.zipWithIndex.foreach { case (c, k) =>
          val kid = vs.map {
            case null => null
            case r: Row => r.get(k)
          }
          writeColumn(c, kid, body, nodes, vari)
        }
      case AView(binary) =>
        // views + ONE variadic data buffer (index 0 for every
        // out-of-line value — spec-legal for any batch size)
        vari += 1L
        val views = new Array[Byte](vs.length * 16)
        val data = new java.io.ByteArrayOutputStream()
        var i = 0
        vs.foreach { v =>
          if (v != null) {
            val bytes =
              if (binary) v.asInstanceOf[Array[Byte]]
              else v.asInstanceOf[String]
                .getBytes(java.nio.charset.StandardCharsets.UTF_8)
            val p = i * 16
            var k = 0
            while (k < 4) {
              views(p + k) = ((bytes.length >> (8 * k)) & 0xff).toByte
              k += 1
            }
            if (bytes.length <= 12) {
              System.arraycopy(bytes, 0, views, p + 4, bytes.length)
            } else {
              System.arraycopy(bytes, 0, views, p + 4, 4) // prefix
              val off = data.size()
              // buffer index stays 0; offset at p+12
              k = 0
              while (k < 4) {
                views(p + 12 + k) = ((off >> (8 * k)) & 0xff).toByte
                k += 1
              }
              data.write(bytes, 0, bytes.length)
            }
          }
          i += 1
        }
        body.add(views)
        body.add(data.toByteArray)
      case AMap(entries) =>
        // List layout over struct<key,value> entries
        val offs = new Array[Byte]((vs.length + 1) * 4)
        var acc = 0
        var i = 0
        def put(pos: Int, x: Int): Unit = {
          var k = 0
          while (k < 4) {
            offs(pos * 4 + k) = ((x >> (8 * k)) & 0xff).toByte; k += 1
          }
        }
        put(0, 0)
        vs.foreach { v =>
          if (v != null) acc += v.asInstanceOf[Map[_, _]].size
          i += 1
          put(i, acc)
        }
        body.add(offs)
        val kids = vs.flatMap {
          case null => Seq.empty[Any]
          case m: Map[_, _] => m.toSeq.map { case (k, v) => Row(k, v) }
        }
        writeColumn(entries, kids, body, nodes, vari)
      case AFixedBinary(w) =>
        val data = new Array[Byte](vs.length * w)
        var i = 0
        vs.foreach { v =>
          if (v != null) {
            val bb = v.asInstanceOf[Array[Byte]]
            require(bb.length == w, s"fixed($w) got ${bb.length}")
            System.arraycopy(bb, 0, data, i * w, w)
          }
          i += 1
        }
        body.add(data)
      case APassthrough(_) | AFixedList(_, _) | AListView(_, _) |
           AUnion(_, _, _) | ARunEnd(_, _) | ANull =>
        throw new IllegalArgumentException(
          "writer does not emit passthrough, fixed-size-list or " +
            "list-view types")
    }
  }

  private def writeVarWidth(bytes: Seq[Array[Byte]], large: Boolean,
      body: Body): Unit = {
    val w = if (large) 8 else 4
    val offs = new Array[Byte]((bytes.length + 1) * w)
    var acc = 0L
    var i = 0
    def put(pos: Int, x: Long): Unit = {
      var k = 0
      while (k < w) {
        offs(pos * w + k) = ((x >> (8 * k)) & 0xff).toByte; k += 1
      }
    }
    put(0, 0L)
    val data = new java.io.ByteArrayOutputStream()
    bytes.foreach { b =>
      data.write(b, 0, b.length)
      acc += b.length
      i += 1
      put(i, acc)
    }
    body.add(offs)
    body.add(data.toByteArray)
  }

  private def batchMessage(fields: Vector[AField], rows: Seq[Row])
      : (Array[Byte], Array[Byte]) = {
    val body = new Body
    val nodes = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val vari = scala.collection.mutable.ArrayBuffer.empty[Long]
    fields.zipWithIndex.foreach { case (f, k) =>
      writeColumn(f, rows.map(_.get(k)), body, nodes, vari)
    }
    val bufs = body.buffers.result()
    val b = new FbBuilder()
    // buffers vector (structs inline, reversed build order)
    b.startVector(16, bufs.length, 8)
    bufs.reverse.foreach { case (off, len) =>
      b.putI64(len); b.putI64(off)
    }
    val bufVec = b.endVector(bufs.length)
    b.startVector(16, nodes.length, 8)
    nodes.reverse.foreach { case (len, nulls) =>
      b.putI64(nulls); b.putI64(len)
    }
    val nodeVec = b.endVector(nodes.length)
    val variVec = if (vari.isEmpty) 0 else {
      b.startVector(8, vari.length, 8)
      vari.reverse.foreach(b.putI64)
      b.endVector(vari.length)
    }
    b.startTable()
    b.slotI64(0, rows.length.toLong, 0L)
    b.slotOffset(1, nodeVec)
    b.slotOffset(2, bufVec)
    if (variVec != 0) b.slotOffset(4, variVec)
    val rb = b.endTable()
    val bodyBytes = body.out.toByteArray
    b.startTable()
    b.slotI16(0, 4, 0) // V5
    b.slotU8(1, 3, 0) // RecordBatch
    b.slotOffset(2, rb)
    b.slotI64(3, bodyBytes.length.toLong, 0L)
    val msg = b.endTable()
    (encapsulate(b.finish(msg)), bodyBytes)
  }

  /** continuation marker + length + flatbuffer, padded to 8. */
  private def encapsulate(fb: Array[Byte]): Array[Byte] = {
    val padded = (fb.length + 7) & ~7
    val out = new Array[Byte](8 + padded)
    out(0) = -1; out(1) = -1; out(2) = -1; out(3) = -1
    var k = 0
    while (k < 4) { out(4 + k) = ((padded >> (8 * k)) & 0xff).toByte; k += 1 }
    System.arraycopy(fb, 0, out, 8, fb.length)
    out
  }

  private def buildFooter(fields: Vector[AField],
      blocks: Seq[(Long, Int, Long)]): Array[Byte] = {
    val b = new FbBuilder()
    val schema = buildSchema(b, fields)
    b.startVector(24, blocks.length, 8)
    blocks.reverse.foreach { case (off, metaLen, bodyLen) =>
      b.putI64(bodyLen); b.putI32(0); b.putI32(metaLen); b.putI64(off)
    }
    val rbVec = b.endVector(blocks.length)
    b.startVector(24, 0, 8)
    val dictVec = b.endVector(0)
    b.startTable()
    b.slotI16(0, 4, 0) // V5
    b.slotOffset(1, schema)
    b.slotOffset(2, dictVec)
    b.slotOffset(3, rbVec)
    b.endTable() match { case f => b.finish(f) }
  }

  /** Incremental file writer: magic + schema message up front, one
    * record batch per [[append]], footer on [[finish]]. Batches stream
    * to `out` — the file never materializes in memory.
    */
  private[llmops] final class Streamer(fields: Vector[AField],
      out: java.io.OutputStream) {
    private var pos = 0L
    private val blocks = Vector.newBuilder[(Long, Int, Long)]
    private def emit(b: Array[Byte]): Unit = {
      out.write(b, 0, b.length); pos += b.length
    }
    emit("ARROW1".getBytes("US-ASCII")); emit(Array[Byte](0, 0))
    emit(schemaMessage(fields))
    private def pad8(): Unit = {
      val padTo = ((8 - (pos & 7)) & 7).toInt
      if (padTo > 0) emit(new Array[Byte](padTo))
    }
    def append(rows: Seq[Row]): Unit = if (rows.nonEmpty) {
      val (meta, body) = batchMessage(fields, rows)
      blocks += ((pos, meta.length, body.length.toLong))
      emit(meta); emit(body); pad8()
    }
    def finish(): Unit = {
      emit(Array[Byte](-1, -1, -1, -1, 0, 0, 0, 0)) // end-of-stream
      val footer = buildFooter(fields, blocks.result())
      emit(footer)
      val fl = footer.length
      val tail = new Array[Byte](4)
      var k = 0
      while (k < 4) { tail(k) = ((fl >> (8 * k)) & 0xff).toByte; k += 1 }
      emit(tail)
      emit("ARROW1".getBytes("US-ASCII"))
    }
  }

  /** Arrow IPC STREAM bytes (.arrows): schema message, one record
    * batch per `rowsPerBatch` rows, end-of-stream marker — no magic,
    * no footer (the pipe-able little sibling of [[write]]).
    */
  def writeStream(fields: Vector[AField], rows: Seq[Row],
      rowsPerBatch: Int = 1000): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var pos = 0L
    def emit(b: Array[Byte]): Unit = { out.write(b, 0, b.length); pos += b.length }
    emit(schemaMessage(fields))
    rows.grouped(math.max(1, rowsPerBatch)).foreach { g =>
      val (meta, body) = batchMessage(fields, g)
      emit(meta); emit(body)
      val padTo = ((8 - (pos & 7)) & 7).toInt
      if (padTo > 0) emit(new Array[Byte](padTo))
    }
    emit(Array[Byte](-1, -1, -1, -1, 0, 0, 0, 0))
    out.toByteArray
  }

  /** Arrow IPC file bytes: magic, schema message, one record batch per
    * `rowsPerBatch` rows, footer, trailing magic.
    */
  def write(fields: Vector[AField], rows: Seq[Row],
      rowsPerBatch: Int = 1000): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    val s = new Streamer(fields, o)
    rows.grouped(math.max(rowsPerBatch, 1)).foreach(s.append)
    s.finish()
    o.toByteArray
  }

  /** Arrow fields for a Spark StructType (the writer's supported
    * subset).
    */
  def fieldsFor(schema: org.apache.spark.sql.types.StructType)
      : Vector[AField] = {
    import org.apache.spark.sql.types._
    def tpe(dt: DataType): AType = dt match {
      case BooleanType => ABool
      case ByteType => AInt(8)
      case ShortType => AInt(16)
      case IntegerType => AInt(32)
      case LongType => AInt(64)
      case FloatType => AFloat
      case DoubleType => ADouble
      case StringType => AString(large = false)
      case BinaryType => ABinary(large = false)
      case DateType => ADate32
      case TimestampType => ATimestamp(2, tz = true)
      case TimestampNTZType => ATimestamp(2, tz = false)
      case _: YearMonthIntervalType => AInterval(0)
      case _: DayTimeIntervalType => AInterval(1)
      case CalendarIntervalType => AInterval(2)
      case d: DecimalType => ADecimal(d.precision, d.scale, 128)
      case ArrayType(e, containsNull) =>
        AList(AField("item", containsNull, tpe(e)), large = false)
      case MapType(k, v, valueContainsNull) =>
        // AMap write/build support existed; this wires the Spark type so
        // an Arrow-read map column can be re-exported
        AMap(AField("entries", nullable = false, AStruct(Vector(
          AField("key", nullable = false, tpe(k)),
          AField("value", valueContainsNull, tpe(v))))))
      case st: StructType => AStruct(fieldsFor(st))
      case other => throw new IllegalArgumentException(
        s"unsupported spark type for arrow export: $other")
    }
    schema.fields.toVector.map(f => AField(f.name, f.nullable,
      tpe(f.dataType)))
  }

  /** Distributed shard export: one `shard-NNNNN.arrow` per shard under
    * `dir`, written by exactly one task each (the TarShards protocol),
    * batches streamed to the filesystem.
    */
  def writeShards(df: org.apache.spark.sql.DataFrame, keyCol: String,
      dir: String, nShards: Int, rowsPerBatch: Int = 1000): Unit = {
    import org.apache.spark.sql.functions._
    val fields = fieldsFor(df.schema)
    val sharded = df
      .withColumn("__shard",
        // null keys hash to null → coalesce to shard 0, never an NPE
        coalesce(pmod(Similarity.portable60(col(keyCol).cast("string")),
          lit(nShards.toLong)).cast("int"), lit(0)))
      .repartition(nShards, col("__shard"))
      .sortWithinPartitions(col("__shard"), col(keyCol))
    val dirB = dir
    val rpb = rowsPerBatch
    val nFields = df.schema.fields.length
    val confB = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    sharded.foreachPartition { rows: Iterator[Row] =>
      var out: java.io.OutputStream = null
      var streamer: Streamer = null
      var curShard = -1
      val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
      def flushBatch(): Unit = if (buf.nonEmpty) {
        streamer.append(buf.toSeq); buf.clear()
      }
      var curPath: org.apache.hadoop.fs.Path = null
      def closeCurrent(): Unit = if (out != null) {
        flushBatch(); streamer.finish(); out.close()
        out = null; streamer = null
      }
      // a failed shard must not survive as a valid-looking container
      // missing rows: delete the partial file, rethrow the original
      def abortCurrent(): Unit = if (out != null) {
        ShardFiles.abort(out, curPath, confB.value)
        out = null; streamer = null
      }
      try {
        rows.foreach { r =>
          val shard = r.getInt(nFields)
          if (shard != curShard) {
            closeCurrent()
            curShard = shard
            curPath = new org.apache.hadoop.fs.Path(
              f"$dirB/shard-$shard%05d.arrow")
            val fs = curPath.getFileSystem(confB.value)
            out = fs.create(curPath, true)
            streamer = new Streamer(fields, out)
          }
          buf += Row.fromSeq(r.toSeq.dropRight(1))
          if (buf.size >= rpb) flushBatch()
        }
        closeCurrent()
      } catch { case e: Throwable => abortCurrent(); throw e }
    }
  }
}
