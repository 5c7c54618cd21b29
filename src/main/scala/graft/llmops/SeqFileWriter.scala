package graft.llmops

/** SequenceFile writer twin of [[SeqFile]] — version-6 images in all
  * three layouts (uncompressed, record-compressed, block-compressed
  * over zlib `DefaultCodec`), sync escapes at the standard ~2000-byte
  * interval so the splittable reader has real split points. Interop
  * contract: Hadoop's own `SequenceFile.Reader` must read every image
  * byte-for-byte (spec-enforced both directions).
  */
object SeqFileWriter {

  private final val SyncInterval = 2000

  private def wr32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
    out.write((v >>> 8) & 0xff); out.write(v & 0xff)
  }

  /** WritableUtils.writeVLong. */
  private[llmops] def vlong(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    if (v >= -112 && v <= 127) { out.write(v.toInt & 0xff); return }
    var len = -112
    if (v < 0) { v = ~v; len = -120 }
    var tmp = v
    while (tmp != 0) { tmp >>>= 8; len -= 1 }
    out.write(len & 0xff)
    val k = if (len < -120) -(len + 120) else -(len + 112)
    var idx = k
    while (idx > 0) {
      out.write(((v >>> (8 * (idx - 1))) & 0xff).toInt)
      idx -= 1
    }
  }

  private def vstr(out: java.io.ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    vlong(out, b.length.toLong)
    out.write(b, 0, b.length)
  }

  private def zlibDeflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 32)
    val buf = new Array[Byte](1 << 16)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Serialize a payload into its writable on-disk form. */
  private def writable(className: String, payload: Array[Byte]): Array[Byte] =
    className match {
      case "org.apache.hadoop.io.Text" =>
        val out = new java.io.ByteArrayOutputStream(payload.length + 5)
        vlong(out, payload.length.toLong)
        out.write(payload, 0, payload.length)
        out.toByteArray
      case "org.apache.hadoop.io.BytesWritable" =>
        val out = new java.io.ByteArrayOutputStream(payload.length + 4)
        wr32(out, payload.length)
        out.write(payload, 0, payload.length)
        out.toByteArray
      case _ => payload // fixed-width writables are their raw form
    }

  /** Build one SequenceFile image from `(key payload, value payload)`
    * pairs. `compression`: `none` | `record` | `block` (block pairs
    * with `blockSize` — records per block is whatever fits).
    */
  def write(records: Seq[(Array[Byte], Array[Byte])],
      keyClass: String = "org.apache.hadoop.io.Text",
      valueClass: String = "org.apache.hadoop.io.Text",
      compression: String = "none",
      sync: Array[Byte] =
        Array.tabulate(16)(i => ((i * 37 + 11) & 0xff).toByte),
      blockSize: Int = 4096): Array[Byte] = {
    require(Seq("none", "record", "block").contains(compression),
      s"compression must be none/record/block, got $compression")
    require(sync.length == 16, "sync must be 16 bytes")
    val out = new java.io.ByteArrayOutputStream()
    out.write('S'); out.write('E'); out.write('Q'); out.write(6)
    vstr(out, keyClass)
    vstr(out, valueClass)
    // Hadoop semantics: the first boolean is isCompressed() — TRUE for
    // block compression too — and the codec follows whenever it is set
    out.write(if (compression != "none") 1 else 0)
    out.write(if (compression == "block") 1 else 0)
    if (compression != "none")
      vstr(out, "org.apache.hadoop.io.compress.DefaultCodec")
    wr32(out, 0) // metadata count
    out.write(sync, 0, 16)
    def writeSync(): Unit = { wr32(out, -1); out.write(sync, 0, 16) }

    if (compression == "block") {
      var group = Vector.empty[(Array[Byte], Array[Byte])]
      var groupBytes = 0
      def flush(): Unit = if (group.nonEmpty) {
        writeSync()
        val keyLens = new java.io.ByteArrayOutputStream()
        val keys = new java.io.ByteArrayOutputStream()
        val valLens = new java.io.ByteArrayOutputStream()
        val vals = new java.io.ByteArrayOutputStream()
        group.foreach { case (kp, vp) =>
          val k = writable(keyClass, kp); val v = writable(valueClass, vp)
          vlong(keyLens, k.length.toLong); keys.write(k, 0, k.length)
          vlong(valLens, v.length.toLong); vals.write(v, 0, v.length)
        }
        vlong(out, group.length.toLong)
        Seq(keyLens, keys, valLens, vals).foreach { b =>
          val comp = zlibDeflate(b.toByteArray)
          vlong(out, comp.length.toLong)
          out.write(comp, 0, comp.length)
        }
        group = Vector.empty; groupBytes = 0
      }
      records.foreach { case (kp, vp) =>
        group :+= ((kp, vp)); groupBytes += kp.length + vp.length
        if (groupBytes >= blockSize) flush()
      }
      flush()
    } else {
      var sinceSync = 0
      records.foreach { case (kp, vp) =>
        if (sinceSync >= SyncInterval) { writeSync(); sinceSync = 0 }
        val k = writable(keyClass, kp)
        val v0 = writable(valueClass, vp)
        val v = if (compression == "record") zlibDeflate(v0) else v0
        wr32(out, k.length + v.length)
        wr32(out, k.length)
        out.write(k, 0, k.length)
        out.write(v, 0, v.length)
        sinceSync += 8 + k.length + v.length
      }
    }
    out.toByteArray
  }
}
