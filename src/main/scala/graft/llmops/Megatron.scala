package graft.llmops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Megatron-style indexed token datasets (`.bin` + `.idx`) — the
  * memory-mapped layout Megatron/NeMo-lineage trainers read tokenized
  * corpora from, and the terminal format of the tokenize→shuffle→pack
  * pipeline here ([[Bpe]] → [[TrainExport.shuffleShards]] → this).
  * Reference hook: curated-corpus export,
  * `aje_libs/documents/helpers/document_processor.py:10-83`.
  *
  * Public `MMapIndexedDataset` layout (Megatron-LM `indexed_dataset.py`):
  * {{{
  *   .idx: "MMIDIDX\x00\x00" | uint64 LE version=1 | uint8 dtype code
  *         | int64 LE nSeqs | int64 LE nDocIdx
  *         | int32[nSeqs] LE sizes (tokens per sequence)
  *         | int64[nSeqs] LE pointers (byte offset of each seq in .bin)
  *         | int64[nDocIdx] LE doc_idx (doc start seq indices, 0..nSeqs)
  *   .bin: token values back to back, dtype LE
  * }}}
  * Dtype codes: 1=uint8 2=int8 3=int16 4=int32 5=int64 6=float32
  * 7=float64 8=uint16. Integer token dtypes are supported here (a vocab
  * fits uint16 below 65 536 entries — the common case — and int32
  * above); float dtypes are refused, they encode scalar datasets, not
  * token streams.
  *
  * The reader validates magic, version, dtype, counts against the file
  * length, pointer arithmetic (pointers must equal the running
  * `sizes × width` sum — the mmap invariant) and doc_idx monotonicity;
  * any violation refuses the shard wholesale (`null`-free: the shard
  * simply yields no rows, like the other untrusted-container readers).
  * The writer range-checks every token against the dtype as it
  * streams (a refused token aborts and deletes the CURRENT shard
  * pair; shards already closed by other tasks survive — re-run the
  * export after fixing the input), and refuses a shard whose .bin
  * would exceed the reader's [[MaxBin]] envelope instead of writing
  * a file the reader would reject.
  */
object Megatron {

  private final val Magic = "MMIDIDX".getBytes("ISO-8859-1") ++ Array[Byte](0, 0)
  private final val MaxBin = 256 << 20

  /** dtype name → (code, byte width, min, max). */
  private val Dtypes: Map[String, (Int, Int, Long, Long)] = Map(
    "uint8" -> (1, 1, 0L, 255L),
    "int8" -> (2, 1, -128L, 127L),
    "int16" -> (3, 2, -32768L, 32767L),
    "int32" -> (4, 4, Int.MinValue.toLong, Int.MaxValue.toLong),
    "int64" -> (5, 8, Long.MinValue, Long.MaxValue),
    "uint16" -> (8, 2, 0L, 65535L))

  private def writeLongLE(out: java.io.OutputStream, v: Long): Unit = {
    var k = 0
    while (k < 8) { out.write(((v >>> (8 * k)) & 0xff).toInt); k += 1 }
  }

  private def writeIntLE(out: java.io.OutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
    out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
  }

  private def writeToken(out: java.io.OutputStream, v: Long, width: Int): Unit = {
    var k = 0
    while (k < width) { out.write(((v >>> (8 * k)) & 0xff).toInt); k += 1 }
  }

  /** Build one `.idx` image for `sizes` (tokens per sequence, in order)
    * with one document per sequence (doc_idx = 0..n — the layout the
    * per-document corpus export produces; trainers re-chunk at load).
    */
  private[llmops] def idxBytes(sizes: Seq[Int], dtype: String): Array[Byte] = {
    val (code, width, _, _) = Dtypes(dtype)
    val out = new java.io.ByteArrayOutputStream(64 + sizes.length * 20)
    out.write(Magic)
    writeLongLE(out, 1L)
    out.write(code)
    writeLongLE(out, sizes.length.toLong)
    writeLongLE(out, sizes.length.toLong + 1)
    sizes.foreach(writeIntLE(out, _))
    var ptr = 0L
    sizes.foreach { s => writeLongLE(out, ptr); ptr += s.toLong * width }
    (0 to sizes.length).foreach(i => writeLongLE(out, i.toLong))
    out.toByteArray
  }

  private def readLongLE(b: Array[Byte], i: Int): Long = {
    var v = 0L; var k = 0
    while (k < 8) { v |= (b(i + k) & 0xffL) << (8 * k); k += 1 }
    v
  }

  private def readIntLE(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  private def readToken(b: Array[Byte], i: Int, width: Int, signed: Boolean): Long = {
    var v = 0L; var k = 0
    while (k < width) { v |= (b(i + k) & 0xffL) << (8 * k); k += 1 }
    if (signed && width < 8) {
      val shift = 64 - 8 * width
      (v << shift) >> shift
    } else v
  }

  /** Parse one idx+bin pair into per-sequence token arrays; `null` on
    * any structural violation.
    */
  private[llmops] def parsePair(idx: Array[Byte],
      bin: Array[Byte]): Array[Array[Long]] =
    try {
      if (idx == null || bin == null || idx.length < 34) return null
      var k = 0
      while (k < Magic.length) {
        if (idx(k) != Magic(k)) return null; k += 1 }
      if (readLongLE(idx, 9) != 1L) return null
      val code = idx(17) & 0xff
      val entry = Dtypes.find(_._2._1 == code).map(_._2).orNull
      if (entry == null || code == 6 || code == 7) return null
      val (_, width, _, _) = entry
      val signed = code == 2 || code == 3 || code == 4 || code == 5
      val nSeqs = readLongLE(idx, 18)
      val nDocIdx = readLongLE(idx, 26)
      if (nSeqs < 0 || nSeqs > Int.MaxValue / 24 ||
          nDocIdx < 0 || nDocIdx > nSeqs + 1) return null
      val n = nSeqs.toInt
      val need = 34L + 4L * n + 8L * n + 8L * nDocIdx
      if (idx.length != need) return null
      val sizes = new Array[Int](n)
      var i = 0
      var off = 34
      while (i < n) { sizes(i) = readIntLE(idx, off); off += 4; i += 1 }
      // pointers must equal the running sizes×width sum (mmap invariant)
      var ptr = 0L
      i = 0
      while (i < n) {
        if (sizes(i) < 0 || readLongLE(idx, off) != ptr) return null
        ptr += sizes(i).toLong * width
        off += 8
        i += 1
      }
      if (ptr != bin.length.toLong) return null
      // doc_idx must be monotone within [0, nSeqs]
      var prev = -1L
      i = 0
      while (i < nDocIdx.toInt) {
        val d = readLongLE(idx, off)
        if (d < prev || d > nSeqs) return null
        prev = d; off += 8; i += 1
      }
      val out = new Array[Array[Long]](n)
      var binOff = 0
      i = 0
      while (i < n) {
        val toks = new Array[Long](sizes(i))
        var j = 0
        while (j < toks.length) {
          toks(j) = readToken(bin, binOff, width, signed)
          binOff += width; j += 1
        }
        out(i) = toks
        i += 1
      }
      out
    } catch { case scala.util.control.NonFatal(_) => null }

  /** Export `(key, tokens array<int|long>)` rows as indexed-dataset
    * shards: the deterministic hash-shard layout of
    * [[TrainExport.shuffleShards]], one `shard-NNNNN.bin` +
    * `shard-NNNNN.idx` pair per shard id, sequences inside a shard in
    * hash order (a trainer maps each pair independently — parallelism
    * and the scale unit are per shard). Every token is range-checked
    * against `dtype` up front; an out-of-range token fails the job
    * rather than writing a silently-wrapped corpus.
    */
  def writeIndexed(df: DataFrame, keyCol: String, tokensCol: String,
      nShards: Int, path: String, dtype: String = "uint16"): Unit = {
    val (_, width, lo, hi) = Dtypes.getOrElse(dtype,
      throw new IllegalArgumentException(
        s"unknown Megatron dtype $dtype (integer dtypes: ${Dtypes.keys.mkString(", ")})"))
    df.schema(tokensCol).dataType match {
      case ArrayType(LongType | IntegerType | ShortType, _) => ()
      case other => throw new IllegalArgumentException(
        s"$tokensCol must be array<int>/array<long>, found $other")
    }
    val sharded = TrainExport.shuffleShards(df, keyCol, nShards)
      .select(col("shard"), col("pos"), col(tokensCol).as("__toks"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
    val pathB = path
    val confB = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val loB = lo; val hiB = hi; val widthB = width; val dtypeB = dtype
    // the TarShards protocol: `.bin` token bytes STREAM to the
    // filesystem as rows arrive (only the per-sequence size list — 4
    // bytes a sequence, the idx twin's own content — stays in memory);
    // the `.idx` twin is written when its shard closes
    sharded.foreachPartition { rows: Iterator[Row] =>
      var bin: java.io.OutputStream = null
      var sizes: scala.collection.mutable.ArrayBuffer[Int] = null
      var binBytes = 0L
      var curShard = -1
      var curBinPath: org.apache.hadoop.fs.Path = null
      var curIdxPath: org.apache.hadoop.fs.Path = null
      def closeCurrent(): Unit = if (bin != null) {
        bin.close()
        curIdxPath = new org.apache.hadoop.fs.Path(
          f"$pathB/shard-$curShard%05d.idx")
        val idxOut = curIdxPath.getFileSystem(confB.value)
          .create(curIdxPath, true)
        try idxOut.write(idxBytes(sizes.toSeq, dtypeB)) finally idxOut.close()
        bin = null; sizes = null; curIdxPath = null
      }
      try {
        rows.foreach { r =>
          val shard = r.getAs[Int]("shard")
          if (shard != curShard) {
            closeCurrent()
            curShard = shard
            curBinPath = new org.apache.hadoop.fs.Path(
              f"$pathB/shard-$curShard%05d.bin")
            bin = new java.io.BufferedOutputStream(
              curBinPath.getFileSystem(confB.value).create(curBinPath, true),
              64 << 10)
            sizes = scala.collection.mutable.ArrayBuffer.empty[Int]
            binBytes = 0L
          }
          val toks = r.getAs[scala.collection.Seq[Any]]("__toks")
          val vals = if (toks == null) Seq.empty[Long]
            else toks.map { t =>
              require(t != null,
                "null element inside a tokens array — filter or " +
                  "coalesce token arrays before export")
              t.asInstanceOf[Number].longValue()
            }
          vals.foreach { v =>
            require(v >= loB && v <= hiB,
              s"token $v out of $dtypeB range [$loB, $hiB]")
            writeToken(bin, v, widthB)
          }
          binBytes += vals.length.toLong * widthB
          require(binBytes <= MaxBin,
            s"shard $curShard .bin exceeds the $MaxBin-byte reader " +
              "envelope — raise nShards so shards stay readable")
          sizes += vals.length
        }
        closeCurrent()
      } catch {
        // delete BOTH halves of the failing pair: the .bin (an orphan
        // is invisible to readIndexed, which lists *.idx — but dead
        // disk), and any PARTIAL .idx a failure inside closeCurrent's
        // idx write left behind (a ghost half-pair would parse as a
        // truncated corpus). Rethrow the original, nothing masks it
        case e: Throwable =>
          if (bin != null) ShardFiles.abort(bin, curBinPath, confB.value)
          if (curIdxPath != null)
            ShardFiles.abort(null, curIdxPath, confB.value)
          throw e
      }
    }
  }

  /** Read an indexed-dataset directory back as `(file, seq, tokens
    * array<long>)` — one row per sequence, `seq` the index inside its
    * shard. One task per shard pair; a structurally-invalid pair yields
    * no rows (wholesale refusal — mmap formats have no partial trust).
    * `.bin` files above 256 MB are refused (the in-memory reader's
    * envelope; real trainers mmap, this reader materializes).
    */
  def readIndexed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // session Hadoop settings (credentials, endpoints) must reach the
    // side-read of the .bin twin — a fresh Configuration() drops them
    val confB = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    spark.read.format("binaryFile").load(s"$dir/*.idx")
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (idxPath, idx) =>
        val binPath = new org.apache.hadoop.fs.Path(
          idxPath.stripSuffix(".idx") + ".bin")
        val fs = binPath.getFileSystem(confB.value)
        val binLen =
          try Some(fs.getFileStatus(binPath).getLen)
          catch { case scala.util.control.NonFatal(_) => None }
        // an oversized but HEALTHY .bin must refuse loudly — a null here
        // silently returned zero rows for the whole shard. A MISSING or
        // unreadable twin stays the documented one-shard blast radius.
        binLen.foreach { n =>
          require(n <= MaxBin,
            s"$binPath is $n bytes — past the $MaxBin single-task " +
              "envelope; re-export with more shards")
        }
        val bin =
          try binLen.map { n =>
            val in = fs.open(binPath)
            try {
              val b = new Array[Byte](n.toInt)
              in.readFully(0, b); b
            } finally in.close()
          }.orNull
          catch { case scala.util.control.NonFatal(_) => null }
        val seqs = parsePair(idx, bin)
        if (seqs == null) Iterator.empty
        else seqs.iterator.zipWithIndex.map { case (toks, i) =>
          (idxPath, i.toLong, toks.toSeq)
        }
      }
      .toDF("file", "seq", "tokens")
  }

  /** Dense vocabulary `(token, id)` over a string-token array column
    * (e.g. [[Bpe.encode]] output): id = the token's rank in sorted
    * order — deterministic, engine-portable, no hash collisions. The
    * distinct shuffles token-sized rows (corpus-scale, fine); the
    * ranking window runs on the DISTINCT set only (vocab-scale —
    * single-partition by design, a vocab is ~10⁴–10⁵ rows).
    */
  def buildVocab(tokens: DataFrame, tokenCol: String): DataFrame =
    tokens.select(explode(col(tokenCol)).as("token")).distinct()
      .select(col("token"),
        (row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy("token")) - 1).as("id"))

  /** Replace string tokens with integer vocab ids — the bridge from
    * [[Bpe.encode]] to [[writeIndexed]]'s token streams, shaped for
    * scale: posexplode → BROADCAST join on the vocab dimension →
    * regroup by key in position order. The corpus shuffles once on the
    * key; the vocab never shuffles. Unknown tokens map to `max(id)+1`
    * (the single OOV id — a corpus encoded with its own vocab never
    * produces it); empty/NULL token arrays become empty id arrays.
    */
  def encodeIds(df: DataFrame, keyCol: String, tokensCol: String,
      vocab: DataFrame, outCol: String = "token_ids"): DataFrame = {
    val maxId = vocab.agg(max(col("id"))).head
    require(!maxId.isNullAt(0), "encodeIds: empty vocab")
    val oov = maxId.getInt(0) + 1
    // the key must uniquely identify rows: duplicate keys would
    // interleave their token positions into ONE merged id array and
    // attach it to every duplicate — silent corruption. Refuse loudly
    // (two metadata-scale aggregates, cheap next to the encode itself).
    val total = df.count()
    val distinctKeys = df.select(keyCol).distinct().count()
    require(distinctKeys == total,
      s"encodeIds: $keyCol is not unique (${total - distinctKeys} " +
        "duplicate rows) — duplicate keys would merge their token " +
        "streams; dedupe or add a unique key first")
    val ids = df
      .select(col(keyCol), posexplode(col(tokensCol)).as(Seq("__p", "token")))
      .join(broadcast(vocab), Seq("token"), "left")
      .groupBy(keyCol)
      .agg(transform(
        array_sort(collect_list(struct(col("__p"),
          coalesce(col("id"), lit(oov)).cast("int").as("__id")))),
        s => s.getField("__id")).as(outCol))
    df.join(ids, Seq(keyCol), "left")
      .withColumn(outCol, coalesce(col(outCol), array().cast("array<int>")))
  }
}
