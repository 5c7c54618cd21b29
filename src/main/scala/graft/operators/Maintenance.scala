package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Table maintenance — the parquet equivalent of the reference's Delta
  * OPTIMIZE / VACUUM / manifest step (light_transform.py:1394-1409) and its
  * file-metadata reporting (orchestrator.py:452-462, 914-948 — A4).
  */
object Maintenance {

  /** K6 OPTIMIZE-equivalent: rewrite a parquet table into ~targetFileMB
    * files. Small-file compaction is what keeps 100 TB scans at full
    * vectorized-reader throughput — thousands of KB-sized incremental
    * merge outputs would otherwise dominate task-scheduling overhead.
    */
  def compact(spark: SparkSession, path: String, targetFileMB: Int = 128,
      /** Keep the replaced files as on-disk tombstones (see
        * [[MergeUpsert.upsertParquet]] `retain`) — `VERSION AS OF` serves
        * the pre-OPTIMIZE layout until [[vacuum]]'s retention passes.
        * Only meaningful on delta-logged tables read through the log.
        */
      retain: Boolean = false): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return
    // a retained table's dir holds tombstoned files — compaction input is
    // the listing minus log tombstones (NEVER a raw directory read once
    // tombstones exist, or replaced rows would resurrect into the
    // compacted output), and the output file count sizes from the LIVE
    // bytes, not a directory total inflated by tombstones. One replay
    // serves both (safe under the table lease).
    val logState = graft.sources.DeltaLog.replay(spark, path)
    val hasTombstones = logState.exists(_.tombstones.nonEmpty)
    // probe retention mode while the files are still in the live tree —
    // after the swap they sit in __old and the existence fallback would
    // miss them
    val effRetain = retain || MergeUpsert.retentionActive(fs, path, logState)
    val bytes =
      if (hasTombstones) logState.get.files.values.map(_.size).sum
      else fs.getContentSummary(p).getLength
    val df =
      if (!hasTombstones) spark.read.parquet(path)
      else graft.sources.DeltaLog.listedMinusTombstones(spark, path,
          state = logState) match {
        case Some(live) if live.nonEmpty =>
          spark.read.option("basePath", path)
            .parquet(live.map(rel => s"$path/$rel"): _*)
        case _ =>
          // all listed files tombstoned: the log is authoritative —
          // serve its (possibly empty) committed view
          graft.sources.DeltaLog.read(spark, path)
      }
    val files = math.max(1, (bytes / (targetFileMB.toLong * 1024 * 1024)).toInt)
    // Hive-partitioned layouts must survive compaction: detect the FULL
    // `k=v` directory chain (all levels — a first-level-only detection
    // flattened a=/b= tables, destroying the b level and corrupting the
    // layout for later pruned merges) and rewrite with the same
    // partitionBy; repartition on the partition columns first so each
    // partition dir lands in few tasks (a flat repartition(n) +
    // partitionBy would write up to n files per partition — small files
    // again, the thing compaction exists to fix)
    val partitionCols = {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var cur = p
      var descending = true
      while (descending) {
        val kv = fs.listStatus(cur).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.contains("="))
        kv.headOption match {
          case Some(c) =>
            out += org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
              .unescapePathName(c.getPath.getName.split("=", 2)(0))
            cur = c.getPath
          case None => descending = false
        }
      }
      out.toSeq
    }
    val tmp = path + "__compact"
    val writer =
      (if (partitionCols.nonEmpty)
        df.repartition(files, partitionCols.map(col): _*)
          .write.partitionBy(partitionCols: _*)
      else df.repartition(files).write)
        .mode(SaveMode.Overwrite).option("compression", "snappy")
    writer.parquet(tmp)
    val bak = new Path(path + "__old")
    if (fs.exists(bak)) fs.delete(bak, true)
    fs.rename(p, bak)
    fs.rename(new Path(tmp), p)
    MergeUpsert.restoreDeltaLog(fs, path) // the swap carried the log into __old
    // OPTIMIZE on a delta table: same rows, new files — remove+add with
    // dataChange=false, committed BEFORE retention returns the replaced
    // files to the tree. Plain parquet tables don't sprout a log here.
    if (graft.sources.DeltaLog.exists(fs, path)) {
      graft.sources.DeltaLog.reconcile(spark, path, df.schema,
        partitionCols, dataChange = false, operation = "OPTIMIZE")
      refreshSymlinkManifest(spark, path)
      // effective retention derives from table STATE, not just the call
      // arg: a retention-mode table (property pinned, or tombstoned files
      // still on disk) stays retained, so one routine OPTIMIZE with
      // default args cannot silently delete every travelable version's
      // files — only VACUUM's retention pass does that (ADVICE r17).
      // Probed BEFORE the swap moved the tree into __old (effRetain).
      if (effRetain) {
        MergeUpsert.retainReplaced(fs, path)
        MergeUpsert.pinRetain(spark, path)
      }
    }
    fs.delete(bak, true)
    ()
  }

  /** Morton (Z-order) interleave of two bucketed dimensions — the value
    * behind Delta/Iceberg `OPTIMIZE ZORDER BY (a, b)`: sorting by the
    * interleaved bits clusters rows so that PARQUET FILE min/max ranges
    * stay narrow on BOTH columns at once, and a point/box predicate on
    * either column prunes most files (a linear sort only prunes its own
    * leading column). Inputs must already be bucket ids in
    * `[0, 2^bits)`; see [[zorderBucket]]. Disjoint bit positions make
    * the sum a bitwise-or, and everything is integer expression math an
    * external SQL engine replays exactly.
    */
  def zvalue2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
      bits: Int = 16): org.apache.spark.sql.Column =
    zvalueN(Seq(a, b), bits)

  /** n-dimensional Morton interleave — `OPTIMIZE ZORDER BY (c1 … cn)`
    * takes any column count, so the bucket interleave must too: bit `i`
    * of column `j` lands at position `i·n + j` (column order = low-bit
    * order; n = 2 reproduces [[zvalue2]] exactly, which delegates here).
    * The total `n·bits` must stay in a signed 64-bit value; callers
    * splitting a fixed bit budget across more columns lower `bits`, the
    * same trade Delta's multi-column ZORDER makes. Disjoint positions,
    * integer expression math, externally replayable — same contract as
    * the 2-D form.
    */
  def zvalueN(cols: Seq[org.apache.spark.sql.Column],
      bits: Int = 16): org.apache.spark.sql.Column = {
    val n = cols.length
    require(n >= 1, "zvalueN needs at least one column")
    require(bits >= 1 && n.toLong * bits <= 63,
      s"$n columns x $bits bits exceeds a signed 64-bit z-value")
    (for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)),
      i * n + j)).reduce(_ + _)
  }

  /** Scale a column into `[0, 2^bits)` bucket ids given its min/max —
    * integer-exact (`(v − min) · 2^bits div (max − min + 1)`), so the
    * same expression replays in SQL.
    */
  def zorderBucket(c: org.apache.spark.sql.Column, minV: Long, maxV: Long,
      bits: Int = 16): org.apache.spark.sql.Column = {
    val span = maxV - minV + 1
    // the scaled dividend is at most span·2^bits — past 2^63 it wraps in
    // ANY 64-bit engine, so refuse loudly instead of bucketing garbage
    require(span >= 1 && span <= (1L << (63 - bits)),
      s"column span $span with $bits bucket bits overflows 64-bit math")
    val scaled = (c.cast("long") - lit(minV)) * lit(1L << bits)
    // true 64-bit integer division (Catalyst IntegralDivide = SQL `div`):
    // exact at any span, unlike a double division whose exactness ends at
    // 2^53 dividends — an external engine writes `scaled // span`; the
    // pmod subtraction keeps floor (not truncation) semantics should a
    // value ever fall below the advertised min
    val floored = scaled - pmod(scaled, lit(span))
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        ColumnBridge.expression(floored),
        ColumnBridge.expression(lit(span))))
  }

  /** OPTIMIZE ZORDER BY equivalent: rewrite a parquet table clustered by
    * the Morton interleave of two columns. One pass computes the column
    * ranges (a bounded driver artifact), a second buckets + interleaves
    * and range-repartitions on the z-value so each output file owns a
    * compact z-range — i.e. a small rectangle of (a, b) space. File
    * count derives from the same targetFileMB contract as [[compact]].
    */
  def zorderWrite(spark: SparkSession, df: DataFrame, path: String,
      colA: String, colB: String, bits: Int = 16,
      numFiles: Int = 0): Unit =
    zorderWriteN(spark, df, path, Seq(colA, colB), bits, numFiles)

  /** [[zorderWrite]] for any column count: one range pass (a bounded
    * driver artifact — n mins and n maxes), then bucket + n-way
    * interleave + range-repartition on the z-value, so each output file
    * owns a compact n-dimensional box. Callers keep `n·bits ≤ 63` per
    * [[zvalueN]]; 16 bits suit two columns, 8 suit three to seven.
    */
  def zorderWriteN(spark: SparkSession, df: DataFrame, path: String,
      zcols: Seq[String], bits: Int = 16, numFiles: Int = 0): Unit = {
    require(zcols.nonEmpty, "zorderWriteN needs at least one column")
    // Overwrite destroys `_delta_log` with the rest of the dir — capture
    // the state first so reconcile can restart the log (checkpoint at the
    // prior version) with continuity. ZORDER is a rewrite of the same
    // rows when pointed at the table's own content (the OPTIMIZE ZORDER
    // contract) — logged with dataChange=false.
    val priorLog = graft.sources.DeltaLog.replay(spark, path)
    val hadManifest = manifestPresent(new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration), path)
    def relog(): Unit = priorLog.foreach { st =>
      graft.sources.DeltaLog.reconcile(spark, path, df.schema, Nil,
        dataChange = false, operation = "OPTIMIZE", prior = Some(st))
      // the Overwrite destroyed the manifest with the table dir
      if (hadManifest) generateSymlinkManifest(spark, path)
      ()
    }
    val aggs = zcols.flatMap(c =>
      Seq(min(col(c)).cast("long"), max(col(c)).cast("long")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    if (r.isNullAt(0)) { // empty input: an empty table, not a crash
      df.limit(0).write.mode(SaveMode.Overwrite).parquet(path)
      relog()
      return
    }
    val files =
      if (numFiles > 0) numFiles
      else math.max(1, df.sparkSession.sparkContext.defaultParallelism)
    val z = zvalueN(
      zcols.zipWithIndex.map { case (c, j) =>
        zorderBucket(col(c), r.getLong(2 * j), r.getLong(2 * j + 1), bits)
      }, bits)
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
    relog()
  }

  /** Point-lookup-optimized rewrite: parquet BLOOM FILTERS on the given
    * key columns (split-block bloom, parquet-format §BloomFilter), the
    * pruning layer min/max stats cannot provide for high-cardinality
    * keys. At 100 TB a key MERGE or id probe still decodes every row
    * group of the files partition pruning leaves; a bloom filter lets
    * the vectorized reader drop row groups that provably lack the key —
    * for a needle-in-haystack lookup that is most of them. `ndv` sizes
    * the filter (expected distinct keys PER ROW GROUP — overstating only
    * costs bytes, understating costs false positives).
    *
    * Sorting by the first key column before writing keeps each file's
    * key range narrow, so min/max and bloom pruning compose.
    */
  def bloomWrite(df: DataFrame, path: String, bloomCols: Seq[String],
      ndv: Long = 1000000, numFiles: Int = 0): Unit = {
    require(bloomCols.nonEmpty, "bloomWrite needs at least one key column")
    // same log-continuity dance as zorderWriteN: capture before Overwrite
    val priorLog = graft.sources.DeltaLog.replay(df.sparkSession, path)
    val hadManifest = manifestPresent(new Path(path)
      .getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration), path)
    val files =
      if (numFiles > 0) numFiles
      else math.max(1, df.sparkSession.sparkContext.defaultParallelism)
    var w = df
      .repartitionByRange(files, col(bloomCols.head))
      .sortWithinPartitions(col(bloomCols.head))
      .write.mode(SaveMode.Overwrite)
    bloomCols.foreach { c =>
      w = w.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", ndv.toString)
    }
    w.parquet(path)
    priorLog.foreach { st =>
      graft.sources.DeltaLog.reconcile(df.sparkSession, path, df.schema, Nil,
        dataChange = false, operation = "OPTIMIZE", prior = Some(st))
      if (hadManifest) generateSymlinkManifest(df.sparkSession, path)
      ()
    }
  }

  val SymlinkManifestDir = "_symlink_format_manifest"

  /** Where [[generateSymlinkManifest]] parks the PREVIOUS manifest tree
    * during its swap. A fixed (dot-hidden) name so crash recovery and the
    * presence checks can see a half-finished swap: a table with only the
    * aside left is still "a table that maintains a manifest".
    */
  val SymlinkManifestAside = "._symlink_format_manifest.old"

  /** Does the table maintain a symlink manifest? True when the manifest
    * root OR the swap-aside copy exists — a crash between the two swap
    * renames must not silently end manifest maintenance.
    */
  private[operators] def manifestPresent(
      fs: org.apache.hadoop.fs.FileSystem, path: String): Boolean =
    fs.exists(new Path(path, SymlinkManifestDir)) ||
      fs.exists(new Path(path, SymlinkManifestAside))

  /** Generate `_symlink_format_manifest` from the Delta log's committed
    * file list — the K6 step's third action (light_transform.py:1394-1409,
    * `GENERATE symlink_format_manifest`): engines that cannot replay a
    * delta log (Athena/Presto/Trino external tables) read the manifest's
    * file list instead of listing the directory. That also makes
    * tombstone retention safe for them — the manifest lists LIVE files
    * only, never tombstones.
    *
    * Layout (delta-io's): `<table>/_symlink_format_manifest/<partition
    * dirs>/manifest`, one fully-qualified data-file URI per line;
    * unpartitioned tables write a single top-level `manifest`. The tree
    * is staged and swapped whole, so dropped partitions leave no stale
    * manifest and readers never see a half-written one. Underscore
    * prefix keeps it invisible to Spark scans and the log's listing.
    *
    * O(files) driver work — same bound as the log replay it derives from.
    */
  def generateSymlinkManifest(spark: SparkSession, path: String): Unit = {
    val st = graft.sources.DeltaLog.replay(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"no _delta_log at $path — symlink manifests derive from the log"))
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rootQ = fs.makeQualified(new Path(path))
    val mroot = new Path(rootQ, SymlinkManifestDir)
    val tmp = new Path(rootQ,
      s".$SymlinkManifestDir.tmp-${java.util.UUID.randomUUID()}")
    val byDir = st.files.keys.toSeq.groupBy { rel =>
      val i = rel.lastIndexOf('/')
      if (i < 0) "" else rel.substring(0, i)
    }
    fs.mkdirs(tmp)
    byDir.foreach { case (dirRel, files) =>
      val d = if (dirRel.isEmpty) tmp else new Path(tmp, dirRel)
      fs.mkdirs(d)
      val out = fs.create(new Path(d, "manifest"), true)
      try out.write(files.sorted
        .map(rel => new Path(rootQ, rel).toUri.toString)
        .mkString("", "\n", "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    // Swap via aside-rename, never delete-then-rename (ADVICE r17): the
    // no-manifest window shrinks to the instant between two renames, and
    // — the real fix — a crash inside it no longer ends manifest
    // maintenance: the aside copy marks the table as manifest-maintaining
    // ([[manifestPresent]]), so the next write-path refresh or
    // [[recover]] regenerates from the log instead of leaving the table
    // manifest-less until a human notices.
    val aside = new Path(rootQ, SymlinkManifestAside)
    if (fs.exists(aside)) fs.delete(aside, true) // prior crash's leftover
    if (fs.exists(mroot)) { fs.rename(mroot, aside); () }
    fs.rename(tmp, mroot)
    fs.delete(aside, true)
    ()
  }

  /** Refresh the symlink manifest IF the table maintains one (presence-
    * based auto-update, the engine's analogue of Delta's
    * `delta.compatibility.symlinkFormatManifest.enabled`). Called by the
    * write paths after their log commit.
    */
  private[operators] def refreshSymlinkManifest(spark: SparkSession,
      path: String): Unit = {
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (manifestPresent(fs, path))
      generateSymlinkManifest(spark, path)
  }

  /** Real Delta VACUUM (the reference's `VACUUM delta_table RETAIN 168
    * HOURS`, light_transform.py:1394-1409): delete the data files the log
    * tombstoned more than `retentionHours` ago, then sweep staging
    * residue. Live files and younger tombstones are never touched —
    * `VERSION AS OF` keeps serving every version whose files are still
    * inside the window. Writes a commitInfo-only `VACUUM` commit when
    * files were deleted (the history marker modern Delta emits); the
    * expired tombstone entries leave the state at the next checkpoint
    * (age past retention + file gone).
    *
    * Like Delta, a short retention is dangerous with concurrent
    * time-travel readers — the reference runs 168 h; tests pass 0.
    * Runs under the table writer lease (throws ConcurrentWriteException
    * while a live writer holds it) and finishes any interrupted prior
    * commit before sweeping, so it can never delete a live writer's
    * staging or `__old` mid-swap. Returns the number of files deleted.
    */
  /** `VACUUM ... DRY RUN`: the relative paths the retention pass WOULD
    * delete, without touching anything — no lease, no sweep, no commit
    * (a dry run must be safe to point at a live table). The real
    * vacuum's deletion set can only shrink between the dry run and the
    * run itself (tombstones never un-expire; a concurrent write adds
    * only FRESH tombstones).
    */
  def vacuumDryRun(spark: SparkSession, path: String,
      retentionHours: Double): Seq[String] = {
    require(retentionHours >= 0, s"negative retention: $retentionHours")
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(path))) return Nil
    graft.sources.DeltaLog.replay(spark, path) match {
      case None => Nil
      case Some(st) =>
        val cutoff = System.currentTimeMillis() -
          (retentionHours * 3600 * 1000).toLong
        st.tombstones.toSeq.sortBy(_._1).collect {
          case (rel, ts) if ts <= cutoff &&
            fs.exists(new Path(s"$path/$rel")) => rel
        }
    }
  }

  def vacuum(spark: SparkSession, path: String,
      retentionHours: Double): Long = {
    require(retentionHours >= 0, s"negative retention: $retentionHours")
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(path))) return 0L
    // The sweep and the tombstone deletion are destructive to a LIVE
    // writer's staging/backup mid-protocol — a concurrent retained MERGE
    // in another JVM parks its replaced files in `__old` and its batch in
    // `__staging.<token>`. Serialize through the same table lease the
    // writers hold (ADVICE r17); a live writer makes this throw
    // ConcurrentWriteException instead of silently eating its commit.
    val lease = WriterLease.acquire(fs, path,
      MergeUpsert.DefaultLeaseStaleMs)
    try {
      // an interrupted prior commit is FINISHED, not swept: its marker +
      // staged data are a complete commit by protocol
      recover(spark, path)
      sweepResidue(fs, path)
      graft.sources.DeltaLog.replay(spark, path) match {
        case None => 0L
        case Some(st) =>
          val cutoff = System.currentTimeMillis() -
            (retentionHours * 3600 * 1000).toLong
          var n = 0L
          st.tombstones.toSeq.sortBy(_._1).foreach { case (rel, ts) =>
            if (ts <= cutoff) {
              val f = new Path(s"$path/$rel")
              if (fs.exists(f) && fs.delete(f, false)) n += 1
            }
          }
          if (n > 0)
            graft.sources.DeltaLog.commitInfo(spark, path, "VACUUM")
          n
      }
    } finally lease.release()
  }

  /** RESTORE TABLE ... VERSION AS OF under the table writer lease —
    * the multi-writer-safe form of [[graft.sources.DeltaLog.restore]]:
    * appends a commit whose file set equals `version`'s (history
    * preserved; the restore itself is time-travelable and restorable).
    * Throws ConcurrentWriteException while a live writer holds the
    * lease; finishes any interrupted prior commit first. Returns the
    * committed version.
    */
  def restore(spark: SparkSession, path: String, version: Long): Long = {
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lease = WriterLease.acquire(fs, path,
      MergeUpsert.DefaultLeaseStaleMs)
    try {
      recover(spark, path)
      val v = graft.sources.DeltaLog.restore(spark, path, version)
      refreshSymlinkManifest(spark, path)
      v
    } finally lease.release()
  }

  /** Bare `VACUUM` (no RETAIN clause): retention resolves like real
    * Delta's — the table's `delta.deletedFileRetentionDuration` property
    * when set, else the session conf, else 168 h. Non-delta paths sweep
    * residue only and return 0.
    */
  def vacuumTable(spark: SparkSession, path: String): Long = {
    val hours = graft.sources.DeltaLog.replay(spark, path) match {
      case Some(st) => graft.sources.DeltaLog
        .tombstoneRetentionMs(spark, st.configuration) / 3600000.0
      case None => vacuum(spark, path); return 0L
    }
    vacuum(spark, path, hours)
  }

  /** VACUUM-equivalent for the staging/backup dirs the merge path leaves on
    * interruption. Sweeps both the fixed legacy names and the per-writer
    * `__staging.<token>` / temp-file droppings (never the live `__lock`).
    * Skipped entirely while a LIVE lease exists — those dirs are then a
    * running writer's in-flight commit, not residue; stale locks (dead
    * writers) do leave residue and are swept through.
    */
  def vacuum(spark: SparkSession, path: String): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (liveLock(fs, path, MergeUpsert.DefaultLeaseStaleMs)) return
    sweepResidue(fs, path)
  }

  /** Is a live (non-stale) writer lease present at `path + "__lock"`? */
  private def liveLock(fs: org.apache.hadoop.fs.FileSystem, path: String,
      staleMs: Long): Boolean =
    try System.currentTimeMillis() - fs.getFileStatus(
      new Path(path + "__lock")).getModificationTime <= staleMs
    catch { case _: java.io.FileNotFoundException => false }

  private def sweepResidue(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Unit = {
    Seq("__staging", "__old", "__compact", "__tmp", "__bak", "__commit").foreach { suffix =>
      val p = new Path(path + suffix)
      if (fs.exists(p)) { fs.delete(p, true); () }
    }
    Seq("__staging.*", "__commit.tmp.*", "__lock.tmp.*", "__lock.broken.*")
      .foreach { pattern =>
        val matches =
          try fs.globStatus(new Path(path + pattern))
          catch { case scala.util.control.NonFatal(_) => null }
        if (matches != null) matches.foreach(s => fs.delete(s.getPath, true))
      }
  }

  /** Crash recovery for the merge/compact swap protocols. Call before
    * reads/writes of a table that may have been interrupted (Delta gets
    * this from its log; plain-parquet swaps need the explicit step).
    *
    * A `__commit` marker file means staged data was complete when the
    * writer died; the marker's content names the staging dir (per-writer
    * `__staging.<token>`) and the protocol variant — "parts" replays the
    * idempotent per-partition swap, "whole" replays the whole-table swap.
    * An empty marker is the pre-token layout: fixed `__staging` name,
    * partitioned protocol. A staging dir *without* a marker is an aborted
    * write and is left alone here (the live table was never touched); the
    * next leaseholder sweeps it.
    *
    * Legacy whole-table protocol (no marker): if a process died between
    * `rename(table, __old)` and `rename(__staging, table)`, the table dir
    * is missing but a complete staging or backup exists — restore it.
    *
    * Returns true when a repair action happened.
    */
  def recover(spark: SparkSession, path: String): Boolean = {
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val repaired = recoverFs(fs, path)
    // a replayed swap may have restored a now-stale symlink manifest —
    // re-derive it from the (also restored) log so external readers
    // never follow dead file URIs. A leftover swap-aside (crash inside
    // generateSymlinkManifest's rename pair) also forces a regenerate,
    // which sweeps the aside.
    val manifestTorn = fs.exists(new Path(path, SymlinkManifestAside))
    if ((repaired || manifestTorn) && graft.sources.DeltaLog.exists(fs, path))
      refreshSymlinkManifest(spark, path)
    repaired
  }

  /** [[recover]] against an explicit FileSystem (no SparkSession needed —
    * the protocol is pure metadata operations).
    */
  private[operators] def recoverFs(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Boolean = {
    val p = new Path(path)
    val bak = new Path(path + "__old")
    val legacyStaging = new Path(path + "__staging")
    val marker = new Path(path + "__commit")
    if (fs.exists(marker)) {
      // commit interrupted mid-swap (or mid-cleanup): staged data is
      // complete by protocol — finish the job the marker describes
      val (staging, mode) = MergeUpsert.readMarker(fs, path)
      if (mode == MergeUpsert.ModeWhole) {
        if (fs.exists(staging)) {
          if (fs.exists(p)) {
            if (fs.exists(bak)) fs.delete(bak, true)
            fs.rename(p, bak)
          }
          fs.rename(staging, p)
        } else if (!fs.exists(p) && fs.exists(bak)) {
          fs.rename(bak, p) // defensive: never reachable by protocol order
        }
      } else {
        MergeUpsert.commitSwap(fs, path, staging)
      }
      // unconditional (idempotent): a crash BETWEEN the original swap and
      // its own restoreDeltaLog leaves the only copy of _delta_log inside
      // __old — it must come back before finishCommit deletes that dir,
      // regardless of which branch above ran (or none)
      MergeUpsert.restoreDeltaLog(fs, path)
      MergeUpsert.finishCommit(fs, path, staging)
      true
    } else if (!fs.exists(p) && fs.exists(legacyStaging)) {
      // legacy whole-table: staging write completed but swap-in didn't
      fs.rename(legacyStaging, p)
      if (fs.exists(bak)) fs.delete(bak, true)
      true
    } else if (!fs.exists(p) && fs.exists(bak)) {
      fs.rename(bak, p)
      true
    } else false
  }

  /** A4 file-metadata aggregation: per-file row counts and total bytes of a
    * parquet table, distributed (input_file_name, no driver listing of rows).
    */
  def fileStats(spark: SparkSession, path: String): DataFrame = {
    // normalize URIs to plain paths: input_file_name() yields file:///x,
    // FileStatus yields file:/x
    val rows = spark.read.parquet(path)
      .groupBy(regexp_replace(input_file_name(), "^[a-z]+:/+", "/").alias("file"))
      .agg(count(lit(1)).alias("rows"))
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // recursive: partitioned tables nest data files under k=v directories
    val it = fs.listFiles(p, true)
    val sizes = Iterator.continually(it)
      .takeWhile(_.hasNext).map(_.next())
      .filterNot(_.getPath.getName.startsWith("_"))
      .map(s => (s.getPath.toUri.getPath, s.getLen)).toSeq
    import spark.implicits._
    rows.join(sizes.toDF("file", "bytes"), Seq("file"), "left")
  }
}
