package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DataType, DateType,
  IntegerType, LongType, ShortType, StringType}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}

/** Key-based upsert with Delta-MERGE semantics over plain Parquet
  * (this build has no Delta jars; the semantics mirror
  * light_transform.py:1382-1392 — `whenMatchedUpdateAll` /
  * `whenNotMatchedInsertAll` on the conjunction of IS_ID columns, with the
  * batch pre-deduped so a key never matches twice).
  *
  * merge(old, new, keys):
  *   - keys present in both → the NEW row wins (update-all)
  *   - keys only in old     → kept
  *   - keys only in new     → inserted
  *
  * Implementation: union with a precedence flag + one keep-latest window on
  * the keys. One shuffle on the id columns, no driver-side collection —
  * at 100 TB this is the same hash-partitioned join Delta MERGE performs
  * internally; AQE handles skewed keys.
  *
  * Two deliberate divergences from SQL MERGE's join semantics, both
  * self-healing rather than row-preserving: (a) NULL key values GROUP
  * together (window partitioning, not join equality — SQL's NULL≠NULL
  * would insert every NULL-keyed batch row alongside every NULL-keyed old
  * row, compounding forever); (b) old rows sharing one key — possible only
  * after the documented partition-move constraint is violated — collapse
  * to one deterministic survivor instead of all matching. The reference's
  * id columns are primary keys, so neither case arises on clean data.
  *
  * Scale: for partitioned tables, [[upsertParquet]] merges and rewrites
  * ONLY the partitions present in the batch (the plain-parquet analogue of
  * Delta MERGE touching only files containing matched keys) — an
  * incremental batch over a 100 TB table costs O(affected partitions), not
  * O(table). Unpartitioned tables still rewrite whole (there is no
  * sub-partition transaction unit without a log).
  */
object MergeUpsert {

  /** A second writer attempted to upsert a table whose lease is live. */
  final class ConcurrentWriteException(msg: String) extends RuntimeException(msg)

  /** Default lease staleness: a writer that hasn't heartbeated for this
    * long is presumed dead and its lock is broken.
    */
  val DefaultLeaseStaleMs: Long = 30L * 60 * 1000

  /** Table property marking the table as retention-mode: every write
    * keeps its replaced files as tombstones regardless of the call-site
    * `retain` arg. Pinned automatically by the first retained write, so
    * one routine default-arg write can never silently collapse the
    * retention window (ADVICE r17); unset it explicitly (null via
    * [[graft.sources.DeltaLog.setTableProperties]]) to leave retention
    * mode.
    */
  val RetainProp = "graft.retainDeletedFiles"

  /** Is retention live on this table? True when the [[RetainProp]]
    * property says so (O(1), the steady state — pinned by the first
    * retained write) or when any log-tombstoned file is still physically
    * present (the pre-property fallback; existence probes are bounded by
    * the tombstone set and short-circuit on the first retained file).
    * Log tombstone ENTRIES alone are NOT the signal — every merge writes
    * remove actions, retained or not; only on-disk survivors mean the
    * table holds travelable history an eager delete would destroy.
    */
  private[operators] def retentionActive(fs: FileSystem, path: String,
      st: Option[graft.sources.DeltaLog.LogState]): Boolean =
    st.exists { s =>
      s.configuration.get(RetainProp).contains("true") ||
        s.tombstones.keys.exists(rel => fs.exists(new Path(s"$path/$rel")))
    }

  /** Persist retention mode on the table (idempotent commit). */
  private[operators] def pinRetain(spark: SparkSession, path: String): Unit = {
    graft.sources.DeltaLog.setTableProperties(spark, path,
      Map(RetainProp -> "true"))
    ()
  }

  /** Merge `newDf` into `oldDf` by `idCols`.
    *
    * `autoMerge = true` mirrors the reference's Delta
    * `spark.databricks.delta.schema.autoMerge.enabled=true`
    * (light_transform.py:2013): columns new in the batch are added (null
    * for pre-existing rows), columns missing from the batch are filled with
    * null instead of throwing. On a same-name type conflict the OLD
    * (table) type is authoritative and the batch column is cast to it —
    * with ANSI off an incompatible value becomes null rather than failing
    * the pipeline (Delta would raise; the reference stack re-types
    * upstream, so conflicts here mean a misconfigured DSL cast).
    * Column matching is case-insensitive, like the analyzer and the DSL.
    */
  def merge(oldDf: DataFrame, newDf: DataFrame, idCols: Seq[String],
      autoMerge: Boolean = false): DataFrame = {
    require(idCols.nonEmpty, "merge requires at least one id column")
    val (oldAligned, newAligned) =
      if (!autoMerge) (oldDf, newDf.select(oldDf.columns.toSeq.map(col): _*))
      else {
        val oldTypes = oldDf.schema.map(f => f.name.toLowerCase -> f.dataType).toMap
        val newTypes = newDf.schema.map(f => f.name.toLowerCase -> f.dataType).toMap
        val newNames = newDf.schema.map(f => f.name.toLowerCase -> f.name).toMap
        val added = newDf.columns.filterNot(c => oldTypes.contains(c.toLowerCase))
        val unified: Seq[(String, DataType)] =
          oldDf.columns.toSeq.map(c => c -> oldTypes(c.toLowerCase)) ++
            added.map(c => c -> newTypes(c.toLowerCase))
        def align(df: DataFrame, have: Map[String, DataType],
            actual: Map[String, String]) =
          df.select(unified.map { case (name, t) =>
            have.get(name.toLowerCase) match {
              case Some(dt) if dt == t => col(actual(name.toLowerCase)).as(name)
              case Some(_) => col(actual(name.toLowerCase)).cast(t).as(name)
              case None => lit(null).cast(t).as(name)
            }
          }: _*)
        val oldNames = oldDf.schema.map(f => f.name.toLowerCase -> f.name).toMap
        (align(oldDf, oldTypes, oldNames), align(newDf, newTypes, newNames))
      }
    val flagged = oldAligned.withColumn("__prec", lit(0))
      .unionByName(newAligned.withColumn("__prec", lit(1)))
    // total order: precedence first, then a stable hash of the whole row —
    // a batch that slips two DISTINCT rows with one key past the upstream
    // dedup would otherwise tie at __prec=1 and survive nondeterministically
    // (run-to-run different payloads; Delta raises "multiple source rows
    // matched" there — we resolve deterministically instead of failing the
    // batch). Two IDENTICAL rows hash equal: same output either way.
    // xxhash64 rejects MapType anywhere in a column's type (Spark raises
    // unless legacy.allowHashOnMapType) — serialize such columns via
    // to_json first; any deterministic per-row function works for the
    // tie-break, and the idCols already pin the partition.
    def containsMap(dt: DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.exists(f => containsMap(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => containsMap(a.elementType)
      case _ => false
    }
    val payloadHash =
      xxhash64(flagged.schema.filterNot(_.name == "__prec").map { f =>
        if (containsMap(f.dataType)) to_json(col(f.name)) else col(f.name)
      }.toIndexedSeq: _*)
    val w = Window.partitionBy(idCols.map(col): _*)
      .orderBy(col("__prec").desc, payloadHash.asc)
    flagged
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__prec")
  }

  /** Upsert `batch` into the Parquet table at `path`; creates it when absent.
    *
    * Unpartitioned: write to a staging dir, swap whole-table (readers never
    * see a half-written table; Delta gets this from its log).
    *
    * Partitioned: derive the batch's distinct partition tuples (driver-side
    * KB metadata, the same role as Delta's log pruning), merge against a
    * pruned read of only those partition directories, stage the rewritten
    * partitions, then commit with a marker-file protocol whose per-partition
    * swap is idempotent — [[Maintenance.recover]] replays or aborts an
    * interrupted commit deterministically. Untouched partitions' files are
    * never read, rewritten, or renamed.
    *
    * Isolation: both paths stage under `__staging.<lease-token>` — unique
    * per writer — and record that name (plus the protocol variant) inside
    * the `__commit` marker, which is what recovery resolves. During the
    * acknowledged POSIX displacement window (two writers briefly both
    * believing they hold the lease, see [[WriterLease]]) the writers'
    * staged data is therefore disjoint: a displaced writer dies at its
    * pre-swap heartbeat having only ever written its own staging dir, and
    * the winner's eventual swap moves data no other writer could have
    * touched. Orphaned staging dirs from such deaths are swept by the next
    * leaseholder. The `__old` backup dir remains shared, but is only
    * touched after a successful heartbeat, inside the marker-protected
    * commit — the same small residual window as the swap itself.
    *
    * Partition-value rendering supports string / numeric / date columns
    * (the reference's cases). Reads use mergeSchema so evolved tables
    * (autoMerge) present their full column set.
    *
    * Constraint (inherent to partition-scoped merging, same as Delta with a
    * partition-pruning merge predicate): a key's partition value must be
    * stable — if a batch row lands in a different partition than the key's
    * existing row, the old copy is not visible to the merge and both
    * survive. The reference partitions by values derived from the row
    * itself (date-process/ID columns), which satisfies this.
    */
  def upsertParquet(
      spark: SparkSession,
      batch: DataFrame,
      path: String,
      idCols: Seq[String],
      partitionCols: Seq[String] = Nil,
      autoMerge: Boolean = true,
      leaseStaleMs: Long = DefaultLeaseStaleMs,
      /** When given, writer serialization runs through [[StoreLease]] on
        * this backend (CAS-race-free on a true conditional store) instead
        * of the filesystem rename protocol — the choice for object-store
        * tables and for coordinating threaded writers in one JVM.
        */
      lockStore: Option[LockStore] = None,
      /** Tombstone retention (the Delta `VACUUM ... 168 HOURS` storage
        * contract, light_transform.py:1394-1409): replaced data files are
        * kept on disk at their original paths — log-removed, so invisible
        * to [[graft.sources.DeltaLog.read]] — until
        * [[Maintenance.vacuum]]'s retention window passes, which is what
        * makes `VERSION AS OF` serve historical DATA. Opt-in because a
        * retained table must be read THROUGH the log (or a symlink
        * manifest): a raw `spark.read.parquet(dir)` directory listing
        * would see the tombstoned files and duplicate rows. Use one
        * consistent setting per table — a non-retaining write deletes ALL
        * backed-up files, including earlier tombstones in the partitions
        * it touches. Crash recovery of an interrupted commit falls back
        * to eager deletion (degraded retention, never a torn table).
        */
      retain: Boolean = false
  ): Unit = {
    // partition-dir names are rendered DRIVER-side (renderValue) on the
    // pruned-merge path and must agree byte-for-byte with Spark's own
    // partitionBy naming, or the existence probe misses the live dir and
    // the commit REPLACES the partition with batch-only rows — silent data
    // loss. Timestamps are the concrete trap (java.sql.Timestamp.toString
    // carries ".0", Spark's dir name does not). Refuse anything outside
    // the proven set on the FIRST write, before such a table can exist
    partitionCols.foreach { p =>
      val dt = batch.schema(batch.schema.fieldIndex(p)).dataType
      val ok = dt match {
        case StringType | DateType | ByteType | ShortType |
             IntegerType | LongType => true
        case _ => false
      }
      require(ok, s"partition column $p has type ${dt.simpleString} — " +
        "driver-side dir rendering is only proven to match Spark's for " +
        "string/date/integral partition columns; cast the column (e.g. " +
        "timestamp → date or string) before partitioning, or a renaming " +
        "mismatch would silently replace live partitions with batch-only " +
        "rows")
    }
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lease: TableLease = lockStore match {
      case Some(store) => StoreLease.acquire(store, path + "__lock", leaseStaleMs)
      case None => WriterLease.acquire(fs, path, leaseStaleMs)
    }
    try {
      Maintenance.recover(spark, path) // self-heal an interrupted prior swap
      sweepOrphanStaging(fs, path)     // dead writers' staged leftovers
      // r18: the batch is deduped only on the CREATE path — on the merge
      // paths [[merge]]'s keep-one-per-key window subsumes a full-row
      // dropDuplicates (identical rows hash equal in its tie-break, so
      // the survivor set is the same), and the upfront dropDuplicates
      // cost a full-batch-wide exchange before the window's own shuffle
      if (!fs.exists(hPath)) {
        val deduped = batch.dropDuplicates()
        write(deduped, path, partitionCols)
        graft.sources.DeltaLog.reconcile(spark, path, deduped.schema,
          partitionCols, operation = "WRITE")
        // retain=true at table CREATION pins retention mode even though
        // nothing was replaced yet — otherwise the next default-arg
        // write sees neither property nor on-disk tombstones and
        // silently deletes the files this caller asked to keep
        if (retain) pinRetain(spark, path)
      } else {
        // effective retention derives from table STATE, not just the call
        // arg (ADVICE r17): a retention-mode table ([[retentionActive]])
        // stays retained even when a caller forgets retain=true, so one
        // routine default-arg write cannot silently collapse the 168h
        // window; only VACUUM's retention pass deletes travelable files
        val priorState = graft.sources.DeltaLog.replay(spark, path)
        val effRetain = retain || retentionActive(fs, path, priorState)
        if (partitionCols.isEmpty) {
          // a retained table's directory contains tombstoned files — the
          // merge input is the listing MINUS log tombstones, never a raw
          // directory read (which would resurrect replaced rows)
          val existing =
            graft.sources.DeltaLog.listedMinusTombstones(spark, path,
                state = priorState) match {
              case Some(files) if files.isEmpty =>
                graft.sources.DeltaLog.read(spark, path).limit(0)
              case Some(files) =>
                spark.read.option("basePath", path).option("mergeSchema", "true")
                  .parquet(files.map(rel => s"$path/$rel"): _*)
              case None =>
                spark.read.option("mergeSchema", "true").parquet(path)
            }
          val merged = merge(existing, batch, idCols, autoMerge)
          val staging = stagingPath(path, lease.token)
          write(merged, staging.toString, partitionCols)
          lease.heartbeat() // staging (the long phase) done; still alive
          writeMarker(fs, path, staging, ModeWhole)
          wholeSwap(fs, path, staging)
          // reconcile BEFORE the retained files return to the tree: their
          // remove actions must be committed while the listing shows only
          // the new files, so a crash at any point leaves either a log
          // that already tombstones them or a tree that doesn't contain
          // them — never an unlogged duplicate
          graft.sources.DeltaLog.reconcile(spark, path, merged.schema, Nil,
            operation = "MERGE")
          Maintenance.refreshSymlinkManifest(spark, path)
          if (effRetain) { retainReplaced(fs, path); pinRetain(spark, path) }
          finishCommit(fs, path, staging)
        } else {
          prunedUpsert(spark, fs, path, batch, idCols, partitionCols,
            autoMerge, lease, effRetain, priorState)
        }
      }
      ()
    } finally lease.release()
  }

  /** Replace the live table dir with the staged one; resumable from any
    * crash point given the marker (see [[recoverFromMarker]]): each state
    * transition is a single atomic rename.
    */
  private def wholeSwap(fs: FileSystem, path: String, staging: Path): Unit = {
    val hPath = new Path(path)
    val bak = new Path(path + "__old")
    if (fs.exists(bak)) fs.delete(bak, true)
    if (fs.exists(hPath)) fs.rename(hPath, bak)
    fs.rename(staging, hPath)
    restoreDeltaLog(fs, path)
    ()
  }

  /** A whole-table swap carries `_delta_log` (and the symlink manifest,
    * when the table maintains one) into the `__old` backup with
    * everything else; move them back so the log's history survives the
    * rewrite (the post-swap reconcile then appends the diff commit, and
    * the write path refreshes the restored manifest). A crash between
    * swap and restore loses the log dir — reconcile rebuilds it from
    * scratch at version 0, a degraded-but-consistent restart, never a
    * torn log.
    */
  private[operators] def restoreDeltaLog(fs: FileSystem, path: String): Unit = {
    Seq(graft.sources.DeltaLog.LogDirName,
        Maintenance.SymlinkManifestDir).foreach { name =>
      val src = new Path(path + "__old", name)
      val dst = new Path(path, name)
      if (fs.exists(src) && !fs.exists(dst)) { fs.rename(src, dst); () }
    }
  }

  /** Tombstone retention: move every data file under the `__old` backup
    * back into the live tree at its original relative path. Their remove
    * actions are already committed (callers reconcile first), so readers
    * of the CURRENT version never see them — but `VERSION AS OF` can,
    * until [[Maintenance.vacuum]]'s retention passes. A destination
    * collision (same file name re-staged — impossible with Spark's
    * UUID part names) keeps the new file and drops the old copy.
    * Idempotent and crash-safe: each file is one rename; an interrupted
    * pass leaves the remainder in `__old` for recovery's eager delete
    * (degraded retention, never duplicates).
    */
  private[operators] def retainReplaced(fs: FileSystem, path: String): Unit = {
    val old = new Path(path + "__old")
    if (!fs.exists(old)) return
    val oldQ = fs.makeQualified(old)
    val it = fs.listFiles(old, true)
    while (it.hasNext) {
      val s = it.next()
      val rel = oldQ.toUri.relativize(fs.makeQualified(s.getPath).toUri).getPath
      val segs = rel.split("/")
      val hidden = segs.exists(seg =>
        (seg.startsWith("_") || seg.startsWith(".")) && !seg.contains("="))
      if (!hidden) {
        val dst = new Path(s"$path/$rel")
        if (fs.exists(dst)) fs.delete(s.getPath, false)
        else {
          fs.mkdirs(dst.getParent)
          fs.rename(s.getPath, dst)
        }
        ()
      }
    }
  }

  /** Row-level DELETE — `DELETE FROM table WHERE predicate`, the
    * take-down/right-to-be-forgotten primitive a training-data store
    * needs. SQL semantics: rows where the predicate is TRUE delete;
    * NULL-predicate rows are kept. Same crash-safe staging/swap/
    * reconcile protocol as the merge paths, under the same writer
    * lease; on a partitioned table only the partitions CONTAINING
    * matches rewrite (a partition whose every row matches swaps to
    * empty — its rows must go, not linger). Retention semantics carry
    * over: on a retention-mode table the replaced files become on-disk
    * tombstones, so the pre-delete version stays travelable and
    * [[graft.sources.DeltaLog.changes]] shows the deleted rows.
    * Reads anchor on the LOG's schema (not directory-name inference),
    * so partition values round-trip the rewrite byte-identically.
    *
    * @return number of rows deleted
    */
  def deleteWhere(
      spark: SparkSession,
      path: String,
      predicate: Column,
      partitionCols: Seq[String] = Nil,
      leaseStaleMs: Long = DefaultLeaseStaleMs,
      lockStore: Option[LockStore] = None,
      retain: Boolean = false
  ): Long = {
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hPath)) return 0L
    val lease: TableLease = lockStore match {
      case Some(store) => StoreLease.acquire(store, path + "__lock", leaseStaleMs)
      case None => WriterLease.acquire(fs, path, leaseStaleMs)
    }
    try {
      Maintenance.recover(spark, path)
      sweepOrphanStaging(fs, path)
      val priorState = graft.sources.DeltaLog.replay(spark, path)
      val effRetain = retain || retentionActive(fs, path, priorState)
      val logSchema = priorState.flatMap(st => Option(st.schemaString))
        .map(s => org.apache.spark.sql.types.DataType.fromJson(s)
          .asInstanceOf[org.apache.spark.sql.types.StructType])
      def readRels(rels: Seq[String]): DataFrame = {
        val paths = rels.map(rel => s"$path/$rel")
        val r = spark.read.option("basePath", path)
        logSchema match {
          case Some(sc) => r.schema(sc).parquet(paths: _*)
          case None => r.option("mergeSchema", "true").parquet(paths: _*)
        }
      }
      val allFiles = graft.sources.DeltaLog
        .listedMinusTombstones(spark, path, state = priorState)
      val table = allFiles match {
        case Some(files) if files.isEmpty => return 0L
        case Some(files) => readRels(files)
        case None => spark.read.option("mergeSchema", "true").parquet(path)
      }
      val matchedPred = predicate <=> lit(true)
      if (partitionCols.isEmpty) {
        val kept = table.filter(!matchedPred)
        val deleted = table.filter(matchedPred).count()
        if (deleted == 0) return 0L
        val staging = stagingPath(path, lease.token)
        write(kept, staging.toString, Nil)
        lease.heartbeat()
        writeMarker(fs, path, staging, ModeWhole)
        wholeSwap(fs, path, staging)
        graft.sources.DeltaLog.reconcile(spark, path, kept.schema, Nil,
          operation = "DELETE")
        Maintenance.refreshSymlinkManifest(spark, path)
        if (effRetain) { retainReplaced(fs, path); pinRetain(spark, path) }
        finishCommit(fs, path, staging)
        deleted
      } else {
        // partitions CONTAINING matches — bounded by the match set, the
        // usual partition-metadata collect
        val tuples = table.filter(matchedPred)
          .select(partitionCols.map(col): _*).distinct().collect()
        if (tuples.isEmpty) return 0L
        val dirs = tuples.map { row =>
          partitionCols.indices.map { i =>
            s"${escape(partitionCols(i))}=${renderValue(row.get(i))}"
          }.mkString("/")
        }.toIndexedSeq
        val liveRel = dirs.filter(d => fs.exists(new Path(s"$path/$d")))
        if (liveRel.isEmpty) return 0L
        val sliceFiles = graft.sources.DeltaLog
          .listedMinusTombstones(spark, path, Some(liveRel),
            state = priorState)
        val slice = sliceFiles match {
          case Some(files) if files.isEmpty => return 0L
          case Some(files) => readRels(files)
          case None => readRels(liveRel)
        }
        val deleted = slice.filter(matchedPred).count()
        if (deleted == 0) return 0L
        val kept = slice.filter(!matchedPred)
        val staging = stagingPath(path, lease.token)
        write(kept, staging.toString, partitionCols)
        // a partition whose every row matched writes NO staged dir — the
        // swap must still REPLACE it (with empty), or its rows linger
        liveRel.foreach { d =>
          val sd = new Path(s"$staging/$d")
          if (!fs.exists(sd)) { fs.mkdirs(sd); () }
        }
        lease.heartbeat()
        writeMarker(fs, path, staging, ModeParts)
        commitSwap(fs, path, staging)
        graft.sources.DeltaLog.reconcile(spark, path, kept.schema,
          partitionCols, operation = "DELETE",
          scopedDirs = Some(dirs))
        Maintenance.refreshSymlinkManifest(spark, path)
        if (effRetain) { retainReplaced(fs, path); pinRetain(spark, path) }
        finishCommit(fs, path, staging)
        deleted
      }
    } finally lease.release()
  }

  /** Row-level UPDATE — `UPDATE table SET col = expr, … WHERE predicate`.
    * SQL semantics: assignments apply exactly where the predicate is
    * TRUE (NULL/false rows pass through untouched); every assignment
    * expression reads the PRE-update row, so `SET a = b, b = a` swaps.
    * Assignment values cast to the column's existing type — an UPDATE
    * never evolves the schema. Partition columns cannot be assigned:
    * a row changing partitions needs a MERGE into the destination
    * (the per-partition dir swap would clobber the destination's
    * existing rows) — use [[deleteWhere]] + [[upsertParquet]] for
    * moves, like early Delta required. Same partition-pruned rewrite,
    * staging protocol, lease, retention and CDF behavior as
    * [[deleteWhere]].
    *
    * @return number of rows updated
    */
  def updateWhere(
      spark: SparkSession,
      path: String,
      predicate: Column,
      set: Map[String, Column],
      partitionCols: Seq[String] = Nil,
      leaseStaleMs: Long = DefaultLeaseStaleMs,
      lockStore: Option[LockStore] = None,
      retain: Boolean = false
  ): Long = {
    require(set.nonEmpty, "updateWhere needs at least one assignment")
    val partLower = partitionCols.map(_.toLowerCase).toSet
    val partHit = set.keys.filter(k => partLower.contains(k.toLowerCase))
    require(partHit.isEmpty,
      s"cannot assign partition column(s) ${partHit.mkString(", ")} — a " +
        "row changing partitions needs deleteWhere + upsertParquet")
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hPath)) return 0L
    val lease: TableLease = lockStore match {
      case Some(store) => StoreLease.acquire(store, path + "__lock", leaseStaleMs)
      case None => WriterLease.acquire(fs, path, leaseStaleMs)
    }
    try {
      Maintenance.recover(spark, path)
      sweepOrphanStaging(fs, path)
      val priorState = graft.sources.DeltaLog.replay(spark, path)
      val effRetain = retain || retentionActive(fs, path, priorState)
      val logSchema = priorState.flatMap(st => Option(st.schemaString))
        .map(s => org.apache.spark.sql.types.DataType.fromJson(s)
          .asInstanceOf[org.apache.spark.sql.types.StructType])
      def readRels(rels: Seq[String]): DataFrame = {
        val paths = rels.map(rel => s"$path/$rel")
        val r = spark.read.option("basePath", path)
        logSchema match {
          case Some(sc) => r.schema(sc).parquet(paths: _*)
          case None => r.option("mergeSchema", "true").parquet(paths: _*)
        }
      }
      val allFiles = graft.sources.DeltaLog
        .listedMinusTombstones(spark, path, state = priorState)
      val table = allFiles match {
        case Some(files) if files.isEmpty => return 0L
        case Some(files) => readRels(files)
        case None => spark.read.option("mergeSchema", "true").parquet(path)
      }
      val byLower = set.map { case (k, v) => k.toLowerCase -> v }
      val unknown = set.keys
        .filterNot(k => table.columns.exists(_.equalsIgnoreCase(k)))
      require(unknown.isEmpty,
        s"updateWhere: unknown column(s) ${unknown.mkString(", ")}")
      val matchedPred = predicate <=> lit(true)
      def applySet(df: DataFrame): DataFrame =
        df.select(df.schema.fields.toIndexedSeq.map { f =>
          byLower.get(f.name.toLowerCase) match {
            case Some(expr) =>
              when(matchedPred, expr.cast(f.dataType))
                .otherwise(col(f.name)).as(f.name)
            case None => col(f.name)
          }
        }: _*)
      if (partitionCols.isEmpty) {
        val updated = table.filter(matchedPred).count()
        if (updated == 0) return 0L
        val rewritten = applySet(table)
        val staging = stagingPath(path, lease.token)
        write(rewritten, staging.toString, Nil)
        lease.heartbeat()
        writeMarker(fs, path, staging, ModeWhole)
        wholeSwap(fs, path, staging)
        graft.sources.DeltaLog.reconcile(spark, path, rewritten.schema, Nil,
          operation = "UPDATE")
        Maintenance.refreshSymlinkManifest(spark, path)
        if (effRetain) { retainReplaced(fs, path); pinRetain(spark, path) }
        finishCommit(fs, path, staging)
        updated
      } else {
        val tuples = table.filter(matchedPred)
          .select(partitionCols.map(col): _*).distinct().collect()
        if (tuples.isEmpty) return 0L
        val dirs = tuples.map { row =>
          partitionCols.indices.map { i =>
            s"${escape(partitionCols(i))}=${renderValue(row.get(i))}"
          }.mkString("/")
        }.toIndexedSeq
        val liveRel = dirs.filter(d => fs.exists(new Path(s"$path/$d")))
        if (liveRel.isEmpty) return 0L
        val sliceFiles = graft.sources.DeltaLog
          .listedMinusTombstones(spark, path, Some(liveRel),
            state = priorState)
        val slice = sliceFiles match {
          case Some(files) if files.isEmpty => return 0L
          case Some(files) => readRels(files)
          case None => readRels(liveRel)
        }
        val updated = slice.filter(matchedPred).count()
        if (updated == 0) return 0L
        val rewritten = applySet(slice)
        val staging = stagingPath(path, lease.token)
        write(rewritten, staging.toString, partitionCols)
        lease.heartbeat()
        writeMarker(fs, path, staging, ModeParts)
        commitSwap(fs, path, staging)
        graft.sources.DeltaLog.reconcile(spark, path, rewritten.schema,
          partitionCols, operation = "UPDATE",
          scopedDirs = Some(dirs))
        Maintenance.refreshSymlinkManifest(spark, path)
        if (effRetain) { retainReplaced(fs, path); pinRetain(spark, path) }
        finishCommit(fs, path, staging)
        updated
      }
    } finally lease.release()
  }

  private def prunedUpsert(
      spark: SparkSession,
      fs: FileSystem,
      path: String,
      batch: DataFrame,
      idCols: Seq[String],
      partitionCols: Seq[String],
      autoMerge: Boolean,
      lease: TableLease,
      retain: Boolean,
      /** Pre-replayed log state from the caller (safe under the lease) —
        * spares the scoped listing below a second full replay.
        */
      priorState: Option[graft.sources.DeltaLog.LogState]
  ): Unit = {
    // 1. affected partitions: distinct tuples from the batch — bounded by
    //    the batch, not the table; collect() here is partition *metadata*
    val tuples = batch.select(partitionCols.map(col): _*).distinct().collect()
    val batchTypes = partitionCols
      .map(p => p -> batch.schema(batch.schema.fieldIndex(p)).dataType)
    val dirs = tuples.map { row =>
      partitionCols.indices.map { i =>
        s"${escape(partitionCols(i))}=${renderValue(row.get(i))}"
      }.mkString("/")
    }
    val liveRel = dirs.toIndexedSeq.filter(d => fs.exists(new Path(s"$path/$d")))
    val liveDirs = liveRel.map(d => new Path(s"$path/$d"))

    // 2. merge against only the affected slice (pruned read; mergeSchema so
    //    an evolved table's full columns are visible). On a delta-logged
    //    table the slice is listing-minus-tombstones: a retained
    //    partition dir holds replaced files a raw dir read would
    //    resurrect as stale rows
    val sliceFiles: Option[Seq[String]] =
      if (liveDirs.isEmpty) None
      else graft.sources.DeltaLog.listedMinusTombstones(spark, path,
        Some(liveRel), state = priorState)
    val merged =
      if (liveDirs.isEmpty || sliceFiles.exists(_.isEmpty)) batch
      else {
        val slicePaths = sliceFiles match {
          case Some(files) => files.map(rel => s"$path/$rel")
          case None => liveDirs.map(_.toString).toIndexedSeq
        }
        val existing = spark.read
          .option("basePath", path)
          .option("mergeSchema", "true")
          .parquet(slicePaths: _*)
        // dir-name inference may re-type partition values (e.g. date
        // strings); the batch's schema is authoritative for the rewrite
        val typed = batchTypes.foldLeft(existing) { case (df, (p, dt)) =>
          df.withColumn(p, col(p).cast(dt))
        }
        merge(typed, batch, idCols, autoMerge)
      }

    // 3. stage the rewritten partitions outside the table, in a dir only
    //    this leaseholder can name (per-token — see class doc)
    val staging = stagingPath(path, lease.token)
    write(merged, staging.toString, partitionCols)
    lease.heartbeat() // staging (the long phase) done; still alive

    // 4. commit marker: staged data is complete from here on — recovery
    //    replays the swap; without the marker, recovery ignores the staging
    writeMarker(fs, path, staging, ModeParts)

    // 5. idempotent per-partition swap
    commitSwap(fs, path, staging)

    // 6. delta log: scoped to the touched partition dirs — log upkeep is
    //    O(affected partitions), never an O(table) listing. Runs BEFORE
    //    retention returns the replaced files to the tree, so their
    //    remove actions are committed while the listing shows only the
    //    new files — a crash at any point leaves either a log that
    //    already tombstones them or a tree that doesn't contain them
    graft.sources.DeltaLog.reconcile(spark, path, merged.schema,
      partitionCols, operation = "MERGE",
      scopedDirs = Some(dirs.toIndexedSeq))
    Maintenance.refreshSymlinkManifest(spark, path)

    // 7. tombstone retention + cleanup
    if (retain) { retainReplaced(fs, path); pinRetain(spark, path) }
    finishCommit(fs, path, staging)
  }

  private[operators] def stagingPath(path: String, token: String): Path =
    new Path(s"$path$StagingInfix$token")

  private val StagingInfix = "__staging."
  private[operators] val ModeParts = "parts"
  private[operators] val ModeWhole = "whole"

  /** Publish the commit marker. Content resolves the commit for recovery:
    * line 1 = basename of the staging dir (per-writer unique), line 2 =
    * protocol variant ("parts" per-partition swap | "whole" table swap).
    * Written to a temp name then renamed into place so a crash mid-write
    * can't leave a half-written marker; only the post-heartbeat leaseholder
    * ever calls this.
    */
  private def writeMarker(fs: FileSystem, path: String, staging: Path,
      mode: String): Unit = {
    val tmp = new Path(s"${path}__commit.tmp.${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    out.write(s"${staging.getName}\n$mode\n"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    if (!fs.rename(tmp, new Path(path + "__commit"))) {
      fs.delete(tmp, false)
      // rename refused (HDFS semantics, marker already present): a prior
      // writer's commit was never cleaned up — recover it, then retry the
      // SAME write-tmp-then-rename path. Creating directly at the final
      // name here would reopen the torn-marker window the tmp+rename
      // protocol exists to close (a crash mid-create leaves a 0-line
      // marker that readMarker resolves to the legacy staging dir — the
      // wrong one — and recovery would then sweep the real staged batch)
      Maintenance.recoverFs(fs, path)
      val tmp2 = new Path(s"${path}__commit.tmp.${java.util.UUID.randomUUID()}")
      val out2 = fs.create(tmp2, true)
      out2.write(s"${staging.getName}\n$mode\n"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out2.close()
      if (!fs.rename(tmp2, new Path(path + "__commit"))) {
        fs.delete(tmp2, false)
        throw new IllegalStateException(
          s"commit marker for $path still present after recovery — " +
            "refusing to overwrite another writer's live commit")
      }
    }
  }

  /** Parse the commit marker: (staging dir, mode). A legacy / unreadable
    * marker (pre-token layout wrote an empty file) resolves to the old
    * fixed `__staging` name and the partitioned protocol.
    */
  private[operators] def readMarker(fs: FileSystem, path: String): (Path, String) = {
    val lines =
      try {
        val in = fs.open(new Path(path + "__commit"))
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      } catch { case scala.util.control.NonFatal(_) => Nil }
    lines match {
      case name :: mode :: _ if name.nonEmpty =>
        (new Path(new Path(path).getParent, name), mode)
      case _ => (new Path(path + "__staging"), ModeParts)
    }
  }

  /** Delete staging dirs left by writers that died before their commit
    * marker (the live table was never touched; the data is an aborted
    * batch). Caller must hold the table lease, and must run recovery
    * first so a marker-named staging is consumed, not swept.
    */
  private[operators] def sweepOrphanStaging(fs: FileSystem, path: String): Unit = {
    val orphans =
      try fs.globStatus(new Path(path + "__staging*"))
      catch { case scala.util.control.NonFatal(_) => null }
    if (orphans != null) orphans.foreach(s => fs.delete(s.getPath, true))
    ()
  }

  /** Swap every staged partition into the live table; safe to re-run after
    * a crash at any point. State per partition P is unambiguous:
    * staging/P present + live/P present → P untouched (back up live, move
    * staged in); staging/P present + live/P absent → backup done, move
    * staged in; staging/P absent → P already swapped.
    */
  private[operators] def commitSwap(fs: FileSystem, path: String,
      staging: Path): Unit = {
    val old = new Path(path + "__old")
    if (!fs.exists(staging)) return
    // listStatus returns scheme-qualified paths; qualify the root the same
    // way or relativize silently returns the absolute URI
    val stagingQ = fs.makeQualified(staging)
    partitionLeafDirs(fs, staging).foreach { leaf =>
      val rel = stagingQ.toUri.relativize(fs.makeQualified(leaf).toUri).getPath
      val live = new Path(s"$path/$rel")
      val bak = new Path(s"${old.toString}/$rel")
      if (fs.exists(live)) {
        fs.mkdirs(bak.getParent)
        if (fs.exists(bak)) fs.delete(bak, true)
        fs.rename(live, bak)
      }
      fs.mkdirs(live.getParent)
      fs.rename(leaf, live)
      ()
    }
  }

  private[operators] def finishCommit(fs: FileSystem, path: String,
      staging: Path): Unit = {
    fs.delete(new Path(path + "__commit"), false)
    fs.delete(new Path(path + "__old"), true)
    fs.delete(staging, true)
    ()
  }

  /** Leaf partition directories (`a=1/b=x`) under a root: descend while
    * children are `name=value` directories.
    */
  private def partitionLeafDirs(fs: FileSystem, root: Path): Seq[Path] = {
    val children = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
    if (children.isEmpty) Nil
    else children.flatMap { c =>
      val deeper = partitionLeafDirs(fs, c.getPath)
      if (deeper.isEmpty) Seq(c.getPath) else deeper
    }
  }

  /** Hive-style escaping of partition names/values, matching what
    * `DataFrameWriter.partitionBy` writes.
    */
  private def escape(s: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(s)

  private def renderValue(v: Any): String = v match {
    case null => "__HIVE_DEFAULT_PARTITION__"
    case other => escape(other.toString)
  }

  private def write(df: DataFrame, path: String, partitionCols: Seq[String]): Unit = {
    val writer = df.write.mode(SaveMode.Overwrite)
      .option("compression", "snappy")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(path)
  }
}
