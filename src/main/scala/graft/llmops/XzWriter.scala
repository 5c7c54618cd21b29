package graft.llmops

/** xz writer — the twin of [[XzLzma]]. Emits a fully valid xz container
  * whose block payload uses LZMA2 uncompressed chunks (the format's
  * stored mode, same honest scope as the zstd twin): stream header,
  * single block with CRC32-checked header, 64 KB chunking with the
  * first-chunk dict reset, block padding, CRC32 content check, index and
  * footer — every structure the decoder verifies. Any conformant xz
  * reader decodes the output; the entropy-coded LZMA paths are exercised
  * by the reference-tool fixtures.
  */
object XzWriter {

  private def crc32(b: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32
    c.update(b, off, len)
    c.getValue.toInt
  }

  private def wr32(out: java.io.OutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
    out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
  }

  private def vli(out: java.io.OutputStream, v0: Long): Unit = {
    var v = v0
    while (v >= 0x80) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  /** Multi-block xz: one block per chunk, so a block-index-aware
    * reader ([[XzLzma.readXzBlocks]]) decodes chunks in parallel while
    * any conformant xz reader still decodes the concatenation.
    */
  def encodeBlocks(chunks: Seq[Array[Byte]]): Array[Byte] = {
    require(chunks.nonEmpty, "encodeBlocks needs non-empty chunks")
    val out = new java.io.ByteArrayOutputStream()
    val st = new BlockStream(out)
    chunks.foreach(st.append)
    st.finish()
    out.toByteArray
  }

  /** Streaming multi-block xz encoder: the constructor writes the
    * stream header, [[append]] one chunk as one block, [[finish]] the
    * index + footer. Byte-identical to [[encodeBlocks]] over the same
    * chunk sequence; live memory is one block plus two VLIs of index
    * record per block — the shape that lets the shard writer stream
    * corpus-sized shards without holding one in memory.
    */
  final class BlockStream(out: java.io.OutputStream) {
    private val records =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    private val flags = Array[Byte](0, 1)
    out.write(Array[Byte](0xFD.toByte, '7', 'z', 'X', 'Z', 0), 0, 6)
    out.write(flags, 0, 2)
    wr32(out, crc32(flags, 0, 2))

    def append(data: Array[Byte]): Unit = {
      // empty chunks are legal blocks (terminator-only LZMA2 stream,
      // uncompressed size 0), so xz shards round-trip empty documents —
      // the one container of the trilogy that can: BGZF reads empty
      // members as EOF padding and seekable zstd reads zero-size frames
      // as skippable padding, so their shard writers refuse empties
      // loudly rather than lose rows silently
      val hdr = new java.io.ByteArrayOutputStream(16)
      hdr.write(0); hdr.write(0)
      vli(hdr, 0x21); vli(hdr, 1); hdr.write(16)
      var hb = hdr.toByteArray
      val hdrSize = ((hb.length + 4 + 3) / 4) * 4
      hb = java.util.Arrays.copyOf(hb, hdrSize - 4)
      hb(0) = ((hdrSize / 4) - 1).toByte
      out.write(hb, 0, hb.length)
      wr32(out, crc32(hb, 0, hb.length))
      var payloadLen = 0L
      var off = 0
      var first = true
      while (off < data.length) {
        val n = math.min(1 << 16, data.length - off)
        out.write(if (first) 1 else 2)
        out.write((n - 1) >>> 8)
        out.write((n - 1) & 0xff)
        out.write(data, off, n)
        payloadLen += 3 + n
        off += n
        first = false
      }
      out.write(0)
      payloadLen += 1
      var pad = (4 - ((hdrSize + payloadLen) & 3)).toInt & 3
      while (pad > 0) { out.write(0); pad -= 1 }
      wr32(out, crc32(data, 0, data.length))
      records += ((hdrSize + payloadLen + 4L, data.length.toLong))
    }

    def finish(): Unit = {
      require(records.nonEmpty, "encodeBlocks needs non-empty chunks")
      val idx = new java.io.ByteArrayOutputStream(32)
      idx.write(0)
      vli(idx, records.length)
      records.foreach { case (unpadded, unc) =>
        vli(idx, unpadded); vli(idx, unc)
      }
      while ((idx.size() & 3) != 0) idx.write(0)
      val ib = idx.toByteArray
      out.write(ib, 0, ib.length)
      wr32(out, crc32(ib, 0, ib.length))
      val indexSize = ib.length + 4
      val tail = new java.io.ByteArrayOutputStream(8)
      wr32(tail, indexSize / 4 - 1)
      tail.write(flags, 0, 2)
      val tb = tail.toByteArray
      wr32(out, crc32(tb, 0, tb.length))
      out.write(tb, 0, tb.length)
      out.write('Y'); out.write('Z')
    }
  }

  def encode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length + 128)
    // stream header: magic + flags(0, CRC32) + CRC32(flags)
    out.write(Array[Byte](0xFD.toByte, '7', 'z', 'X', 'Z', 0), 0, 6)
    val flags = Array[Byte](0, 1)
    out.write(flags, 0, 2)
    wr32(out, crc32(flags, 0, 2))
    var unpaddedTotal = 0L
    var blockCount = 0
    if (data.length > 0) {
      // --- block header ---
      val hdr = new java.io.ByteArrayOutputStream(16)
      hdr.write(0) // size placeholder
      hdr.write(0) // flags: 1 filter, no size fields
      vli(hdr, 0x21) // LZMA2
      vli(hdr, 1) // props length
      hdr.write(16) // dict size prop: (2|0)<<19 = 1 MiB
      var hb = hdr.toByteArray
      val padded = ((hb.length + 4 + 3) / 4) * 4 // + CRC, round to 4
      val hdrSize = padded
      hb = java.util.Arrays.copyOf(hb, hdrSize - 4)
      hb(0) = ((hdrSize / 4) - 1).toByte
      out.write(hb, 0, hb.length)
      wr32(out, crc32(hb, 0, hb.length))
      // --- LZMA2 uncompressed chunks ---
      val payload = new java.io.ByteArrayOutputStream(data.length + 64)
      var off = 0
      var first = true
      while (off < data.length) {
        val n = math.min(1 << 16, data.length - off)
        payload.write(if (first) 1 else 2)
        payload.write((n - 1) >>> 8)
        payload.write((n - 1) & 0xff)
        payload.write(data, off, n)
        off += n
        first = false
      }
      payload.write(0) // terminator
      val pb = payload.toByteArray
      out.write(pb, 0, pb.length)
      var pad = (4 - ((hdrSize + pb.length) & 3)) & 3
      while (pad > 0) { out.write(0); pad -= 1 }
      wr32(out, crc32(data, 0, data.length)) // check value
      unpaddedTotal = hdrSize + pb.length + 4L
      blockCount = 1
    }
    // --- index ---
    val idx = new java.io.ByteArrayOutputStream(32)
    idx.write(0)
    vli(idx, blockCount)
    if (blockCount == 1) {
      vli(idx, unpaddedTotal)
      vli(idx, data.length)
    }
    while ((idx.size() & 3) != 0) idx.write(0)
    val ib = idx.toByteArray
    out.write(ib, 0, ib.length)
    wr32(out, crc32(ib, 0, ib.length))
    val indexSize = ib.length + 4
    // --- footer ---
    val tail = new java.io.ByteArrayOutputStream(8)
    wr32(tail, indexSize / 4 - 1)
    tail.write(flags, 0, 2)
    val tb = tail.toByteArray
    wr32(out, crc32(tb, 0, tb.length))
    out.write(tb, 0, tb.length)
    out.write('Y'); out.write('Z')
    out.toByteArray
  }

  /** Distributed block-indexed xz export under the shared shard
    * protocol (the BGZF/seekable-zstd contract): rows hash to
    * `nShards` files by key, each partition streams its shards in
    * sorted order, and files ROLL on the shard-id boundary — several
    * shard ids can hash into one partition, and one-file-per-partition
    * would silently drop colliders. One document per xz BLOCK, so
    * [[XzLzma.readXzFiles]] decodes the shard directory
    * block-parallel while `xz -dc` still accepts every file whole.
    */
  def writeShards(df: org.apache.spark.sql.DataFrame, keyCol: String,
      contentCol: String, dir: String, nShards: Int): Unit = {
    import org.apache.spark.sql.functions._
    val sharded = df
      .withColumn("__shard",
        pmod(Similarity.portable60(col(keyCol).cast("string")),
          lit(nShards.toLong)).cast("int"))
      .select(col("__shard"), col(keyCol).cast("string").as("__key"),
        col(contentCol).cast("binary").as("__content"))
      .repartition(nShards, col("__shard"))
      .sortWithinPartitions(col("__shard"), col("__key"))
    val confB = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val dirB = dir
    sharded.foreachPartition {
      rows: Iterator[org.apache.spark.sql.Row] =>
        // blocks stream row by row through BlockStream: task memory is
        // one block + the (bounded) index records, never a whole
        // corpus-sized shard
        var out: java.io.OutputStream = null
        var st: BlockStream = null
        var shard = -1
        var curPath: org.apache.hadoop.fs.Path = null
        def closeCurrent(): Unit = if (out != null) {
          st.finish(); out.close(); out = null; st = null
        }
        // a failed shard must not survive as a structurally VALID file
        // missing rows: drop the index/footer and delete the partial
        // file, then rethrow the ORIGINAL failure (secondary close or
        // delete errors never mask it)
        def abortCurrent(): Unit = if (out != null) {
          ShardFiles.abort(out, curPath, confB.value)
          out = null; st = null
        }
        try {
          rows.foreach { r =>
            val s = r.getInt(0)
            if (s != shard) {
              closeCurrent(); shard = s
              curPath = new org.apache.hadoop.fs.Path(
                f"$dirB/shard-$shard%05d.xz")
              val fs = curPath.getFileSystem(confB.value)
              out = new java.io.BufferedOutputStream(
                fs.create(curPath, true), 64 << 10)
              st = new BlockStream(out)
            }
            st.append(r.getAs[Array[Byte]](2))
          }
          closeCurrent()
        } catch { case e: Throwable => abortCurrent(); throw e }
    }
  }
}
