package graft.sources

import graft.llmops.{DriverPar, Json}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}

import java.nio.charset.StandardCharsets.UTF_8

/** From-scratch Delta Lake transaction log (`_delta_log`) — the storage
  * format the reference's stage tables actually use
  * (light_transform.py:1356-1409 writes Delta via `delta-spark`; this
  * build has no Delta jars, so the log protocol itself is implemented
  * against the PUBLIC spec, delta-io PROTOCOL.md).
  *
  * Layout (protocol v1 reader / v2 writer — no column mapping, no
  * deletion vectors):
  *   - `<table>/_delta_log/%020d.json` — one commit per version; each
  *     line one action object: `protocol`, `metaData`, `add`, `remove`,
  *     `commitInfo`.
  *   - `<table>/_delta_log/%020d.checkpoint.parquet` — full-state
  *     snapshot every [[CheckpointInterval]] commits (single file, the
  *     classic checkpoint form), plus the `_last_checkpoint` pointer.
  *     Readers replay checkpoint + later JSON commits; log history
  *     before a checkpoint is not required by the protocol.
  *
  * Writing model: the engine's data movement stays the existing
  * lease+marker parquet protocols ([[graft.operators.MergeUpsert]],
  * [[graft.operators.Maintenance]]); [[reconcile]] runs after a
  * successful commit, diffs the table's data files against the last
  * logged state, and appends one commit with matching `remove`/`add`
  * actions. This makes log emission idempotent (no diff → no commit) and
  * crash-convergent: a writer that dies between data swap and reconcile
  * leaves a stale log that the NEXT writer's reconcile catches up —
  * readers in that window see the last consistent version's file list,
  * which for a whole-table swap may reference already-replaced files
  * (the same exposure Delta documents for files deleted outside the
  * protocol); tables needing stronger read isolation during crashes keep
  * the `__old` backup until reconcile has run.
  *
  * Scale: reconcile's listing is scoped — the partition-pruned merge
  * path passes only its affected partition directories, so log
  * maintenance is O(touched partitions), not O(table). Full listings
  * happen only where the operation itself already rewrote the whole
  * table. Log replay reads commit files through the bounded
  * [[DriverPar]] pool and starts from the newest checkpoint, so a
  * 100k-commit table costs one checkpoint read + a bounded JSON tail.
  *
  * Commit atomicity: actions are written to a temp file in `_delta_log`
  * and renamed (no-overwrite) to the next version; a refused rename
  * means a concurrent commit won that version — the diff is recomputed
  * against the fresh state and retried at the next number, the spec's
  * put-if-absent loop.
  */
object DeltaLog {

  val LogDirName = "_delta_log"
  val CheckpointInterval = 10
  /** Max put-if-absent retries before giving up (writers hold the table
    * lease, so real contention is a displaced-writer anomaly).
    */
  private val MaxCommitAttempts = 10

  final case class AddEntry(
      relPath: String,
      partitionValues: Map[String, String],
      size: Long,
      modificationTime: Long)

  final case class LogState(
      version: Long,
      tableId: String,
      schemaString: String,
      partitionColumns: Seq[String],
      files: Map[String, AddEntry],
      /** Log-removed files (rel path → deletionTimestamp) whose remove
        * action is still within the tombstone retention window — the
        * protocol's checkpoint tombstones. When the writer retained the
        * physical file (see [[graft.operators.MergeUpsert.upsertParquet]]
        * `retain`), these are what VERSION AS OF serves and what VACUUM
        * deletes once retention passes.
        */
      tombstones: Map[String, Long] = Map.empty,
      /** Per-table properties — the protocol's `metaData.configuration`
        * map. The reference sets `delta.deletedFileRetentionDuration` /
        * `delta.logRetentionDuration` here at write time
        * (light_transform.py:1373-1374); [[tombstoneRetentionMs]] /
        * [[logRetentionMs]] resolve table property first, then the
        * session conf, then the protocol default — so tables with
        * different retention coexist in one job.
        */
      configuration: Map[String, String] = Map.empty)

  /** Tombstone retention window, hours — the session-level default under
    * the TABLE property `delta.deletedFileRetentionDuration` (default
    * 168h = 7 days). Governs when checkpoints may drop remove tombstones
    * and is the default for [[graft.operators.Maintenance.vacuumTable]].
    */
  val TombstoneRetentionConf = "spark.graft.delta.tombstoneRetentionHours"
  val DefaultTombstoneRetentionHours = 168.0

  /** Commit-JSON retention, hours — the session-level default under the
    * TABLE property `delta.logRetentionDuration` (the reference pins
    * `interval 30 days`, light_transform.py:1373-1374). At checkpoint
    * time, commit JSONs and checkpoints older than this AND already
    * covered by a newer checkpoint are deleted — bounding the
    * `_delta_log` listing a table merged every few minutes would
    * otherwise grow without bound. Replay is checkpoint-based and
    * unaffected; DESCRIBE HISTORY covers only the retained tail.
    */
  val LogRetentionConf = "spark.graft.delta.logRetentionHours"
  val DefaultLogRetentionHours = 720.0 // interval 30 days

  /** The table-property names (the real Delta contract). */
  val TombstoneRetentionProp = "delta.deletedFileRetentionDuration"
  val LogRetentionProp = "delta.logRetentionDuration"

  /** Parse Delta's duration-property syntax — `interval N unit`, e.g.
    * `interval 168 hours`, `interval 30 days` (unit singular or plural:
    * week/day/hour/minute/second/millisecond) — into milliseconds.
    * Refuses loudly on anything else: a silently misread retention would
    * delete data early.
    */
  private[graft] def parseIntervalMs(s: String): Long = {
    val m = java.util.regex.Pattern
      .compile("(?i)^\\s*interval\\s+(\\d+)\\s+(\\w+?)s?\\s*$")
      .matcher(s)
    require(m.matches(), s"unparseable retention interval: '$s' " +
      "(expected e.g. 'interval 168 hours')")
    val n = m.group(1).toLong
    val unitMs = m.group(2).toLowerCase match {
      case "week" => 7L * 24 * 3600 * 1000
      case "day" => 24L * 3600 * 1000
      case "hour" => 3600L * 1000
      case "minute" => 60L * 1000
      case "second" => 1000L
      case "millisecond" => 1L
      case u => throw new IllegalArgumentException(
        s"unknown retention interval unit '$u' in '$s'")
    }
    require(n <= Long.MaxValue / unitMs,
      s"retention interval overflows millis: '$s'")
    n * unitMs
  }

  /** Effective tombstone retention: table property → session conf →
    * protocol default (168 h).
    */
  def tombstoneRetentionMs(spark: SparkSession,
      config: Map[String, String]): Long =
    config.get(TombstoneRetentionProp).map(parseIntervalMs).getOrElse(
      (spark.conf.get(TombstoneRetentionConf,
        DefaultTombstoneRetentionHours.toString).toDouble * 3600 * 1000).toLong)

  /** Effective commit-JSON retention: table property → session conf →
    * 30 days.
    */
  def logRetentionMs(spark: SparkSession,
      config: Map[String, String]): Long =
    config.get(LogRetentionProp).map(parseIntervalMs).getOrElse(
      (spark.conf.get(LogRetentionConf,
        DefaultLogRetentionHours.toString).toDouble * 3600 * 1000).toLong)

  /** Max actions per checkpoint file before the writer switches to the
    * protocol's multi-part form (`%020d.checkpoint.%010d.%010d.parquet`
    * + `"parts"` in `_last_checkpoint`). A 100-TB table with millions of
    * add entries must not funnel its whole state through one
    * `coalesce(1)` write; parts keep each file bounded. Configurable for
    * tests and tuning.
    */
  val CheckpointPartSizeConf = "spark.graft.delta.checkpointPartSize"
  val DefaultCheckpointPartSize = 100000

  def logDir(root: String): Path = new Path(root, LogDirName)

  def exists(fs: FileSystem, root: String): Boolean =
    fs.exists(logDir(root))

  // ---------------------------------------------------------------- replay

  /** Reconstruct the current state: newest checkpoint (if any) + ordered
    * JSON commits after it. None when the table has no `_delta_log`.
    * Refuses (throws) on a reader-protocol version above 1 or a
    * non-contiguous commit sequence — an unreadable log must never be
    * silently served as an empty table.
    */
  def replay(spark: SparkSession, root: String): Option[LogState] =
    replay(spark, root, Long.MaxValue)

  /** [[replay]] up to `asOf` (inclusive) — the VERSION AS OF time-travel
    * primitive. Refuses when the requested version predates the oldest
    * reconstructable state (history before a checkpoint may be cleaned)
    * or exceeds the log's head.
    */
  def replay(spark: SparkSession, root: String, asOf: Long): Option[LogState] =
    replayImpl(spark, root, asOf, Map.empty)

  /** Partition-SCOPED state reconstruction — the driver-memory-bounded
    * form of [[replay]] for huge tables: the checkpoint is read as a
    * DISTRIBUTED parquet scan with the partition predicate applied
    * before anything collects, so the driver materializes only the
    * matching partitions' add entries (plus the narrow tombstone set
    * and the ≤ [[CheckpointInterval]] post-checkpoint commits) instead
    * of the full multi-million-file map. The returned state's `files`
    * cover exactly the partitions matching `partitionFilter`
    * (key → required value, conjunctive); everything else about the
    * state (schema, configuration, tombstones, version) is complete.
    *
    * A scoped state is a READ artifact: never hand it to reconcile or
    * any writer path — its file map is deliberately partial.
    */
  def replayScoped(spark: SparkSession, root: String,
      partitionFilter: Map[String, String],
      asOf: Long = Long.MaxValue): Option[LogState] = {
    require(partitionFilter.nonEmpty,
      "replayScoped needs at least one partition predicate — use replay " +
        "for full state")
    replayImpl(spark, root, asOf, partitionFilter).map { st =>
      st.copy(files = st.files.filter { case (_, e) =>
        partitionFilter.forall { case (k, v) =>
          e.partitionValues.get(k).contains(v) } })
    }
  }

  /** Partition-pruned, time-travelable read: the table restricted to
    * the partitions matching `partitionFilter`, with driver memory
    * bounded by the PRUNED file set ([[replayScoped]]) — at 100 TB a
    * single-partition read no longer pays a full-table state
    * materialization on the driver.
    */
  def readPartitions(spark: SparkSession, root: String,
      partitionFilter: Map[String, String],
      asOf: Long = Long.MaxValue): DataFrame = {
    val st = replayScoped(spark, root, partitionFilter, asOf)
      .getOrElse(throw new IllegalArgumentException(
        s"no $LogDirName at $root — not a delta table"))
    require(st.schemaString != null,
      s"delta log at $root has no metaData action")
    val schema = DataType.fromJson(st.schemaString).asInstanceOf[StructType]
    if (st.files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else
      spark.read
        .option("basePath", root)
        .schema(schema)
        .parquet(st.files.keys.toSeq.sorted.map(rel => s"$root/$rel"): _*)
  }

  private def replayImpl(spark: SparkSession, root: String, asOf: Long,
      scope: Map[String, String]): Option[LogState] = {
    val fs = fileSystem(spark, root)
    val dir = logDir(root)
    if (!fs.exists(dir)) return None
    val entries = fs.listStatus(dir).toSeq.map(_.getPath.getName)
    val allCommits = entries.flatMap { n =>
      if (n.length == 25 && n.endsWith(".json") && n.take(20).forall(_.isDigit))
        Some(n.take(20).toLong)
      else None
    }.sorted
    // checkpoints: classic single-file, or the protocol's multi-part
    // form — a version counts only when COMPLETE (all declared parts
    // present); a torn multi-part write must never be replayed
    val singleCps: Map[Long, Seq[String]] = entries.flatMap { n =>
      if (n.endsWith(".checkpoint.parquet") && n.take(20).forall(_.isDigit))
        Some(n.take(20).toLong -> n)
      else None
    }.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val MultiPartName =
      """^(\d{20})\.checkpoint\.(\d{10})\.(\d{10})\.parquet$""".r
    val multiCps: Map[Long, Seq[String]] = entries.flatMap {
      case n @ MultiPartName(v, i, k) => Some((v.toLong, i.toInt, k.toInt, n))
      case _ => None
    }.groupBy(t => (t._1, t._3)).collect {
      case ((v, k), parts) if parts.map(_._2).toSet == (1 to k).toSet =>
        v -> parts.sortBy(_._2).map(_._4)
    }
    val cpFiles: Map[Long, Seq[String]] = multiCps ++ singleCps // single wins
    val allCheckpoints = cpFiles.keys.toSeq.sorted
    if (allCommits.isEmpty && allCheckpoints.isEmpty) return None
    if (asOf != Long.MaxValue) {
      val head = (allCommits ++ allCheckpoints).max
      require(asOf <= head,
        s"version $asOf does not exist at $root (head is $head)")
      require(allCommits.headOption.exists(_ <= asOf) ||
          allCheckpoints.exists(_ <= asOf),
        s"version $asOf at $root predates the oldest reconstructable " +
          "state (history before a checkpoint may have been cleaned)")
    }
    val commits = allCommits.filter(_ <= asOf)
    val checkpoints = allCheckpoints.filter(_ <= asOf)
    val base: Option[LogState] = checkpoints.lastOption.map { v =>
      readCheckpoint(spark, cpFiles(v).map(new Path(dir, _)), v, scope)
    }
    val tail = commits.filter(v => base.forall(v > _.version))
    base match {
      case None =>
        require(tail.headOption.contains(0L),
          s"delta log at $root starts at version ${tail.headOption.getOrElse(-1L)} " +
            "with no checkpoint — incomplete history, refusing to replay")
      case Some(st) =>
        require(tail.headOption.forall(_ == st.version + 1),
          s"delta log at $root jumps from checkpoint ${st.version} to " +
            s"${tail.headOption.getOrElse(-1L)} — missing commits")
    }
    tail.sliding(2).foreach {
      case Seq(a, b) => require(b == a + 1,
        s"delta log at $root has a gap between versions $a and $b")
      case _ => ()
    }
    // bounded-parallel reads; application below stays strictly ordered
    val bodies = DriverPar.parMap(tail) { v =>
      val in = fs.open(new Path(dir, f"$v%020d.json"))
      try new String(
        org.apache.commons.io.IOUtils.toByteArray(in), UTF_8)
      finally in.close()
    }
    var st = base.getOrElse(LogState(-1L, null, null, Nil, Map.empty))
    tail.zip(bodies).foreach { case (v, body) =>
      st = applyCommit(st, v, body, root)
    }
    Some(st)
  }

  private def applyCommit(
      st0: LogState, version: Long, body: String, root: String): LogState = {
    var st = st0.copy(version = version)
    body.split("\n").iterator.map(_.trim).filter(_.nonEmpty).foreach { line =>
      val obj = Json.parseObject(line)
      require(obj != null, s"unparseable action in delta log $root@$version")
      obj.foreach {
        case ("protocol", p: Map[_, _]) =>
          val reader = p.asInstanceOf[Map[String, Any]]
            .get("minReaderVersion").collect { case l: java.lang.Long => l.toInt }
            .getOrElse(1)
          require(reader <= 1,
            s"delta log $root requires reader version $reader; " +
              "this engine implements reader version 1")
        case ("metaData", m: Map[_, _]) =>
          val md = m.asInstanceOf[Map[String, Any]]
          st = st.copy(
            tableId = md.get("id").map(_.toString).orNull,
            schemaString = md.get("schemaString").map(_.toString).orNull,
            partitionColumns = md.get("partitionColumns") match {
              case Some(v: Vector[_]) => v.map(_.toString)
              case _ => Nil
            },
            configuration = md.get("configuration") match {
              case Some(c: Map[_, _]) => c.asInstanceOf[Map[String, Any]]
                .collect { case (k, v) if v != null => k -> v.toString }
              case _ => Map.empty
            })
        case ("add", a: Map[_, _]) =>
          val ad = a.asInstanceOf[Map[String, Any]]
          val rel = decodePath(ad("path").toString)
          st = st.copy(
            files = st.files.updated(rel, AddEntry(
              rel,
              ad.get("partitionValues") match {
                case Some(pv: Map[_, _]) => pv.asInstanceOf[Map[String, Any]]
                  .map { case (k, v) => k -> (if (v == null) null else v.toString) }
                case _ => Map.empty
              },
              ad.get("size").collect { case l: java.lang.Long => l.toLong }.getOrElse(0L),
              ad.get("modificationTime")
                .collect { case l: java.lang.Long => l.toLong }.getOrElse(0L))),
            tombstones = st.tombstones - rel)
        case ("remove", r: Map[_, _]) =>
          val rm = r.asInstanceOf[Map[String, Any]]
          val rel = decodePath(rm("path").toString)
          val ts = rm.get("deletionTimestamp")
            .collect { case l: java.lang.Long => l.toLong }.getOrElse(0L)
          st = st.copy(files = st.files - rel,
            tombstones = st.tombstones.updated(rel, ts))
        case _ => () // commitInfo, txn, unknown-but-forward-compatible
      }
    }
    st
  }

  // ------------------------------------------------------------- reconcile

  /** Append one commit reflecting the table's current data files.
    *
    * @param schema        full table schema INCLUDING partition columns
    *                      (the writer knows it; avoids a footer read)
    * @param partitionCols Hive partition columns, outermost first
    * @param dataChange    false for pure rewrites (OPTIMIZE/compaction)
    * @param replaceSchema true when the operation replaced the whole
    *                      table (Overwrite) so `schema` is authoritative;
    *                      false (default) unions it with the logged
    *                      schema — a partition-scoped merge batch may
    *                      carry fewer columns than an evolved table
    * @param scopedDirs    relative partition dirs this operation could
    *                      have touched — listing is restricted to them
    *                      and prior state is trusted elsewhere; ignored
    *                      (full listing) when no log exists yet
    * @param prior         pre-captured state, for operations whose write
    *                      mode destroyed `_delta_log` itself (Spark
    *                      Overwrite): the log restarts with a checkpoint
    *                      at the prior version, preserving version
    *                      continuity without the old commit files
    * @return the committed version, or the current version if no diff
    */
  def reconcile(
      spark: SparkSession,
      root: String,
      schema: StructType,
      partitionCols: Seq[String],
      dataChange: Boolean = true,
      operation: String = "WRITE",
      scopedDirs: Option[Seq[String]] = None,
      prior: Option[LogState] = None,
      replaceSchema: Boolean = false
  ): Long = {
    val fs = fileSystem(spark, root)
    prior.filter(_ => !fs.exists(logDir(root))).foreach { st =>
      // log destroyed by an Overwrite write: restart from a checkpoint
      // carrying the prior state so version numbering continues
      writeCheckpoint(spark, fs, root, st)
    }
    var attempt = 0
    while (true) {
      attempt += 1
      val state = replay(spark, root)
        .getOrElse(LogState(-1L, java.util.UUID.randomUUID().toString,
          null, partitionCols, Map.empty))
      val current: Map[String, AddEntry] = {
        val scoped = scopedDirs.filter(_ => state.version >= 0)
        val listedState = scoped match {
          case Some(dirs) =>
            val untouched = state.files.filterNot { case (rel, _) =>
              dirs.exists(d => rel.startsWith(d + "/")) }
            val listed = dirs.flatMap(d =>
              listDataFiles(fs, root, Some(d))).toMap
            untouched ++ listed
          case None => listDataFiles(fs, root, None)
        }
        // log-removed files physically RETAINED on disk (the tombstone
        // retention contract) are not current — without this exclusion a
        // later full listing would re-adopt a replaced file and duplicate
        // its rows
        listedState -- state.tombstones.keys
      }
      val schemaJson =
        if (replaceSchema || state.schemaString == null) schema.json
        else {
          val priorSchema =
            DataType.fromJson(state.schemaString).asInstanceOf[StructType]
          val byName = schema.fields.map(f => f.name -> f).toMap
          val kept = priorSchema.fields.map(f => byName.getOrElse(f.name, f))
          val added = schema.fields
            .filterNot(f => priorSchema.fieldNames.contains(f.name))
          StructType(kept ++ added).json
        }
      val removed = state.files.keys.filterNot(current.contains).toSeq.sorted
      val added = current.values.filter { e =>
        state.files.get(e.relPath) match {
          case Some(prev) =>
            prev.size != e.size || prev.modificationTime != e.modificationTime
          case None => true
        }
      }.toSeq.sortBy(_.relPath)
      val schemaChanged = state.schemaString != schemaJson ||
        state.partitionColumns != partitionCols
      if (removed.isEmpty && added.isEmpty && !schemaChanged &&
          state.version >= 0)
        return state.version
      val version = state.version + 1
      val now = System.currentTimeMillis()
      val sb = new StringBuilder
      sb.append(s"""{"commitInfo":{"timestamp":$now,""" +
        s""""operation":${jstr(operation)},"operationParameters":{},""" +
        s""""engineInfo":"graft-spark"}}""").append('\n')
      if (version == 0L)
        sb.append("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""")
          .append('\n')
      if (version == 0L || schemaChanged)
        sb.append(metaDataJson(state.tableId, schemaJson, partitionCols,
          state.configuration, now)).append('\n')
      removed.foreach { rel =>
        sb.append(s"""{"remove":{"path":${jstr(encodePath(rel))},""" +
          s""""deletionTimestamp":$now,"dataChange":$dataChange}}""")
          .append('\n')
      }
      added.foreach { e =>
        sb.append(s"""{"add":{"path":${jstr(encodePath(e.relPath))},""" +
          s""""partitionValues":${jmap(e.partitionValues)},""" +
          s""""size":${e.size},"modificationTime":${e.modificationTime},""" +
          s""""dataChange":$dataChange}}""").append('\n')
      }
      if (tryCommit(spark, fs, root, version, sb.toString)) {
        if (version > 0 && version % CheckpointInterval == 0) {
          val st = state.copy(version = version,
            schemaString = schemaJson, partitionColumns = partitionCols,
            files = (state.files -- removed) ++
              added.map(e => e.relPath -> e),
            tombstones = (state.tombstones ++ removed.map(_ -> now)) --
              added.map(_.relPath))
          writeCheckpoint(spark, fs, root, st)
        }
        return version
      }
      require(attempt < MaxCommitAttempts,
        s"delta commit for $root lost the version race $MaxCommitAttempts " +
          "times — refusing to spin (is the table lease being bypassed?)")
    }
    -1L // unreachable
  }

  /** Append a commitInfo-only commit (no state change) — the shape modern
    * Delta writes for VACUUM history markers. Returns the version.
    */
  def commitInfo(spark: SparkSession, root: String, operation: String): Long = {
    val fs = fileSystem(spark, root)
    var attempt = 0
    while (true) {
      attempt += 1
      val state = replay(spark, root).getOrElse(
        throw new IllegalArgumentException(
          s"no $LogDirName at $root — not a delta table"))
      val version = state.version + 1
      val body =
        s"""{"commitInfo":{"timestamp":${System.currentTimeMillis()},""" +
          s""""operation":${jstr(operation)},"operationParameters":{},""" +
          s""""engineInfo":"graft-spark"}}""" + "\n"
      if (tryCommit(spark, fs, root, version, body)) {
        if (version > 0 && version % CheckpointInterval == 0)
          writeCheckpoint(spark, fs, root, state.copy(version = version))
        return version
      }
      require(attempt < MaxCommitAttempts,
        s"delta commit for $root lost the version race $MaxCommitAttempts " +
          "times — refusing to spin (is the table lease being bypassed?)")
    }
    -1L // unreachable
  }

  /** Pluggable conditional-put backend for the commit itself — the delta-io
    * `LogStore` seam. When set (FQCN of a zero-arg
    * [[graft.operators.LockStore]]), the version file is published via
    * `createIfAbsent(<qualified commit path>, body)`: on a store with real
    * conditional writes (S3 If-None-Match, GCS ifGenerationMatch) that
    * makes the put-if-absent loop displacement-proof even with the table
    * lease bypassed — the posture delta-io takes for multi-writer S3. The
    * implementation must make the committed bytes durable AT the key (the
    * conditional-put target IS the commit file readers replay). Unset
    * (default), commits use the filesystem protocol below.
    */
  val CommitStoreClassConf = "spark.graft.delta.commitStoreClass"

  private val commitStores =
    new java.util.concurrent.ConcurrentHashMap[String, graft.operators.LockStore]

  private def commitStore(spark: SparkSession)
      : Option[graft.operators.LockStore] =
    spark.conf.get(CommitStoreClassConf, "") match {
      case "" => None
      case cn => Some(commitStores.computeIfAbsent(cn, c =>
        Class.forName(c).getDeclaredConstructor().newInstance()
          .asInstanceOf[graft.operators.LockStore]))
    }

  private def tryCommit(spark: SparkSession, fs: FileSystem, root: String,
      version: Long, body: String): Boolean = {
    val dir = logDir(root)
    fs.mkdirs(dir)
    commitStore(spark).foreach { store =>
      return store.createIfAbsent(
        fs.makeQualified(new Path(dir, f"$version%020d.json")).toString,
        body.getBytes(UTF_8))
    }
    val tmp = new Path(dir, s".tmp-commit-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes(UTF_8)) finally out.close()
    val target = new Path(dir, f"$version%020d.json")
    // put-if-absent. On HDFS-like stores rename refuses an existing
    // destination atomically. On the LOCAL filesystem it does NOT —
    // RawLocalFileSystem.rename is POSIX rename(2), which silently
    // replaces the destination, so an exists() pre-check is a TOCTOU
    // race between two unleased writers (e.g. compact racing an upsert).
    // There, hard-link the temp into place instead: link(2) fails with
    // EEXIST atomically, the real if-absent primitive.
    // OBJECT STORES (s3a et al.) get NO atomicity from this branch either:
    // S3A rename is copy+delete and does not refuse an existing
    // destination, so the exists() pre-check is the same TOCTOU — two
    // displaced writers could both "win" a version and one commit would be
    // silently lost. There the table LEASE is the real serialization (the
    // same posture delta-io takes: S3 single-writer unless an external
    // LogStore coordinates); deployments needing multi-writer S3 commits
    // must route through a conditional-put primitive (S3 If-None-Match)
    // or a coordination service — not this rename.
    val won =
      if (fs.getUri.getScheme == "file") {
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(target.toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath))
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        }
      } else !fs.exists(target) && fs.rename(tmp, target)
    // the local-FS branch leaves tmp (now a second link) behind either way
    if (!won || fs.getUri.getScheme == "file") fs.delete(tmp, false)
    won
  }

  private def metaDataJson(tableId: String, schemaJson: String,
      partitionCols: Seq[String], config: Map[String, String],
      now: Long): String = {
    val id = if (tableId == null)
      java.util.UUID.randomUUID().toString else tableId
    s"""{"metaData":{"id":${jstr(id)},""" +
      s""""format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${jstr(schemaJson)},""" +
      s""""partitionColumns":[${partitionCols.map(jstr).mkString(",")}],""" +
      s""""configuration":${jmap(config)},"createdTime":$now}}"""
  }

  // ------------------------------------------------------------ checkpoint

  private val CheckpointSchema: StructType = {
    DataType.fromJson(
      """{"type":"struct","fields":[
        |{"name":"protocol","type":{"type":"struct","fields":[
        |  {"name":"minReaderVersion","type":"integer","nullable":true,"metadata":{}},
        |  {"name":"minWriterVersion","type":"integer","nullable":true,"metadata":{}}]},
        |  "nullable":true,"metadata":{}},
        |{"name":"metaData","type":{"type":"struct","fields":[
        |  {"name":"id","type":"string","nullable":true,"metadata":{}},
        |  {"name":"format","type":{"type":"struct","fields":[
        |    {"name":"provider","type":"string","nullable":true,"metadata":{}},
        |    {"name":"options","type":{"type":"map","keyType":"string","valueType":"string","valueContainsNull":true},"nullable":true,"metadata":{}}]},
        |    "nullable":true,"metadata":{}},
        |  {"name":"schemaString","type":"string","nullable":true,"metadata":{}},
        |  {"name":"partitionColumns","type":{"type":"array","elementType":"string","containsNull":false},"nullable":true,"metadata":{}},
        |  {"name":"configuration","type":{"type":"map","keyType":"string","valueType":"string","valueContainsNull":true},"nullable":true,"metadata":{}},
        |  {"name":"createdTime","type":"long","nullable":true,"metadata":{}}]},
        |  "nullable":true,"metadata":{}},
        |{"name":"add","type":{"type":"struct","fields":[
        |  {"name":"path","type":"string","nullable":true,"metadata":{}},
        |  {"name":"partitionValues","type":{"type":"map","keyType":"string","valueType":"string","valueContainsNull":true},"nullable":true,"metadata":{}},
        |  {"name":"size","type":"long","nullable":true,"metadata":{}},
        |  {"name":"modificationTime","type":"long","nullable":true,"metadata":{}},
        |  {"name":"dataChange","type":"boolean","nullable":true,"metadata":{}}]},
        |  "nullable":true,"metadata":{}},
        |{"name":"remove","type":{"type":"struct","fields":[
        |  {"name":"path","type":"string","nullable":true,"metadata":{}},
        |  {"name":"deletionTimestamp","type":"long","nullable":true,"metadata":{}},
        |  {"name":"dataChange","type":"boolean","nullable":true,"metadata":{}}]},
        |  "nullable":true,"metadata":{}}
        |]}""".stripMargin).asInstanceOf[StructType]
  }

  private def writeCheckpoint(spark: SparkSession, fs: FileSystem,
      root: String, st: LogState): Unit = {
    val dir = logDir(root)
    fs.mkdirs(dir)
    val protoRow = Row(Row(1, 2), null, null, null)
    val metaRow = Row(null, Row(
      if (st.tableId == null) java.util.UUID.randomUUID().toString
      else st.tableId,
      Row("parquet", Map.empty[String, String]),
      st.schemaString, st.partitionColumns, st.configuration,
      System.currentTimeMillis()), null, null)
    val addRows = st.files.values.toSeq.sortBy(_.relPath).map(e =>
      Row(null, null, Row(encodePath(e.relPath), e.partitionValues,
        e.size, e.modificationTime, true), null))
    // tombstones ride in checkpoints (the protocol's remove entries) for
    // the retention window; past it an entry is dropped ONLY once its
    // physical file is gone (vacuumed) — a still-present expired file must
    // stay excluded from reconcile's listing or it would be re-adopted.
    // Retention resolves per-table (property → session conf → 168 h).
    val retentionMs = tombstoneRetentionMs(spark, st.configuration)
    val cutoff = System.currentTimeMillis() - retentionMs
    // existence checks run only for EXPIRED entries (none in the common
    // case); past a handful, one recursive listing answers them all
    // instead of a per-file RPC storm on an object store
    val expired = st.tombstones.filter { case (_, ts) => ts <= cutoff }
    val present: String => Boolean =
      if (expired.size <= 16) rel => fs.exists(new Path(root, rel))
      else {
        val listed = listDataFiles(fs, root, None).keySet
        listed.contains _
      }
    val removeRows = st.tombstones.toSeq
      .filter { case (rel, ts) => ts > cutoff || present(rel) }
      .sortBy(_._1)
      .map { case (rel, ts) =>
        Row(null, null, null, Row(encodePath(rel), ts, true)) }
    val rows = protoRow +: metaRow +: (addRows ++ removeRows)
    def writeOne(rs: Seq[Row], name: String): Unit = {
      val df = spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters
          .SeqHasAsJava(rs).asJava), CheckpointSchema)
      val tmp = new Path(dir, s".tmp-checkpoint-${java.util.UUID.randomUUID()}")
      df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      val part = fs.listStatus(tmp).map(_.getPath)
        .find(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException(
          s"checkpoint write produced no parquet part under $tmp"))
      val target = new Path(dir, name)
      if (fs.exists(target)) fs.delete(target, false)
      fs.rename(part, target)
      fs.delete(tmp, true)
      ()
    }
    // past the part-size threshold, the protocol's multi-part form keeps
    // each checkpoint file bounded (readers require ALL parts, so a torn
    // write is never replayed). `_last_checkpoint` is written LAST —
    // the commit point of the whole checkpoint.
    val partSize = math.max(3, spark.conf
      .get(CheckpointPartSizeConf, DefaultCheckpointPartSize.toString).toInt)
    val groups = rows.grouped(partSize).toSeq
    val n = groups.size
    if (n == 1)
      writeOne(rows, f"${st.version}%020d.checkpoint.parquet")
    else groups.zipWithIndex.foreach { case (rs, i) =>
      writeOne(rs,
        f"${st.version}%020d.checkpoint.${i + 1}%010d.$n%010d.parquet")
    }
    val parts = if (n > 1) s""","parts":$n""" else ""
    val lc = fs.create(new Path(dir, "_last_checkpoint"), true)
    try lc.write(
      s"""{"version":${st.version},"size":${rows.size}$parts"""
        .concat("}").getBytes(UTF_8))
    finally lc.close()
    // checkpoint time is also log-cleanup time (real Delta's hook): with
    // the new checkpoint durable, commit JSONs the retention window has
    // expired can go
    cleanExpiredLogs(spark, fs, root, st.configuration)
    ()
  }

  /** Force a checkpoint at the table's current version (Delta's explicit
    * `checkpoint()`), then run log-retention cleanup. Normally
    * checkpoints land automatically every [[CheckpointInterval]] commits;
    * the explicit form exists for maintenance jobs that want the
    * `_delta_log` listing bounded NOW. Returns the checkpointed version.
    */
  def checkpoint(spark: SparkSession, root: String): Long = {
    val st = replay(spark, root).getOrElse(
      throw new IllegalArgumentException(
        s"no $LogDirName at $root — not a delta table"))
    writeCheckpoint(spark, fileSystem(spark, root), root, st)
    st.version
  }

  /** Delete commit JSONs and checkpoints that are BOTH (a) older than the
    * table's log retention (`delta.logRetentionDuration` property →
    * session conf → 30 days) and (b) superseded by a newer checkpoint —
    * i.e. everything before the newest checkpoint whose own files have
    * all expired. Deleting up to a checkpoint BOUNDARY (never an
    * arbitrary expired prefix) keeps every retained version replayable:
    * any `asOf` at or past the boundary replays from a checkpoint ≥ its
    * preceding one; anything older refuses with the documented
    * "predates the oldest reconstructable state". Without this, a table
    * merged every few minutes grows an unbounded `_delta_log` listing —
    * the exact O(files) driver walk history() and replay's listing pay.
    * Returns the number of log files deleted.
    */
  def cleanExpiredLogs(spark: SparkSession, fs: FileSystem, root: String,
      config: Map[String, String]): Long = {
    val dir = logDir(root)
    if (!fs.exists(dir)) return 0L
    val cutoff = System.currentTimeMillis() - logRetentionMs(spark, config)
    val entries = fs.listStatus(dir).toSeq
    def versionOf(n: String): Option[Long] =
      if (n.length >= 20 && n.take(20).forall(_.isDigit))
        Some(n.take(20).toLong)
      else None
    val SingleName = """^(\d{20})\.checkpoint\.parquet$""".r
    val MultiName = """^(\d{20})\.checkpoint\.(\d{10})\.(\d{10})\.parquet$""".r
    val isCheckpointFile: String => Boolean = n =>
      SingleName.pattern.matcher(n).matches() ||
        MultiName.pattern.matcher(n).matches()
    // boundary: newest COMPLETE checkpoint, all of whose files are
    // expired. Completeness matters — a torn multi-part set must never
    // anchor deletion (replay couldn't use it as base); and every part
    // must be past the cutoff, not just one, so a half-fresh set can't
    // delete still-retained history.
    val singles = entries.flatMap(s => s.getPath.getName match {
      case SingleName(v) => Some(v.toLong -> s.getModificationTime)
      case _ => None
    })
    val multis = entries.flatMap(s => s.getPath.getName match {
      case MultiName(v, i, k) =>
        Some((v.toLong, k.toInt, i.toInt, s.getModificationTime))
      case _ => None
    }).groupBy(t => (t._1, t._2)).collect {
      case ((v, k), parts) if parts.map(_._3).toSet == (1 to k).toSet =>
        v -> parts.map(_._4).max
    }
    val boundary = (singles ++ multis)
      .collect { case (v, newest) if newest <= cutoff => v }
      .maxOption
    boundary match {
      case None => 0L
      case Some(b) =>
        var n = 0L
        entries.foreach { s =>
          val name = s.getPath.getName
          val deletable =
            (name.endsWith(".json") || isCheckpointFile(name)) &&
              versionOf(name).exists(_ < b)
          if (deletable && fs.delete(s.getPath, false)) n += 1
        }
        n
    }
  }

  /** SET TBLPROPERTIES: commit a metaData action carrying the current
    * state with `props` merged into the configuration map (a null value
    * unsets its key). The reference sets
    * `delta.deletedFileRetentionDuration` / `delta.logRetentionDuration`
    * this way at write time (light_transform.py:1373-1374). Returns the
    * committed version (current version when nothing changed).
    */
  def setTableProperties(spark: SparkSession, root: String,
      props: Map[String, String]): Long = {
    val fs = fileSystem(spark, root)
    var attempt = 0
    while (true) {
      attempt += 1
      val state = replay(spark, root).getOrElse(
        throw new IllegalArgumentException(
          s"no $LogDirName at $root — not a delta table"))
      require(state.schemaString != null,
        s"delta log at $root has no metaData action")
      val merged = (state.configuration ++ props).filter(_._2 != null)
      if (merged == state.configuration) return state.version
      val version = state.version + 1
      val now = System.currentTimeMillis()
      val body =
        s"""{"commitInfo":{"timestamp":$now,""" +
          s""""operation":"SET TBLPROPERTIES","operationParameters":{},""" +
          s""""engineInfo":"graft-spark"}}""" + "\n" +
          metaDataJson(state.tableId, state.schemaString,
            state.partitionColumns, merged, now) + "\n"
      if (tryCommit(spark, fs, root, version, body)) {
        if (version > 0 && version % CheckpointInterval == 0)
          writeCheckpoint(spark, fs, root,
            state.copy(version = version, configuration = merged))
        return version
      }
      require(attempt < MaxCommitAttempts,
        s"delta commit for $root lost the version race $MaxCommitAttempts " +
          "times — refusing to spin (is the table lease being bypassed?)")
    }
    -1L // unreachable
  }

  /** Reads one checkpoint — classic single-file or all parts of a
    * multi-part set. Driver-memory bound: the full file map materializes
    * on the driver (the same bound delta-standalone accepts); multi-part
    * keeps the FILES bounded, not the replayed map — a table whose state
    * outgrows driver memory needs a manifest-style reader, out of scope
    * for the reference's table sizes.
    */
  private def readCheckpoint(spark: SparkSession, files: Seq[Path],
      version: Long, scope: Map[String, String] = Map.empty): LogState = {
    val df0 = spark.read.parquet(files.map(_.toString): _*)
    // partition scope: prune ADD rows executor-side, before anything
    // collects — metaData/protocol/remove rows (narrow) always pass, so
    // schema, configuration and the tombstone set stay complete
    val df =
      if (scope.isEmpty) df0
      else {
        import org.apache.spark.sql.functions.{col, element_at, lit}
        val addMatches = scope.map { case (k, v) =>
          element_at(col("add.partitionValues"), lit(k)) === lit(v)
        }.reduce(_ && _)
        df0.filter(col("add").isNull || addMatches)
      }
    val rows = df.collect()
    var st = LogState(version, null, null, Nil, Map.empty)
    rows.foreach { r =>
      val protoIdx = r.fieldIndex("protocol")
      if (!r.isNullAt(protoIdx)) {
        val reader = r.getStruct(protoIdx).getInt(0)
        require(reader <= 1,
          s"checkpoint ${files.head} requires reader version $reader")
      }
      val metaIdx = r.fieldIndex("metaData")
      if (!r.isNullAt(metaIdx)) {
        val m = r.getStruct(metaIdx)
        st = st.copy(
          tableId = m.getString(m.fieldIndex("id")),
          schemaString = m.getString(m.fieldIndex("schemaString")),
          partitionColumns = m.getSeq[String](m.fieldIndex("partitionColumns")),
          configuration =
            Option(m.getMap[String, String](m.fieldIndex("configuration")))
              .map(_.toMap).getOrElse(Map.empty))
      }
      val addIdx = r.fieldIndex("add")
      if (!r.isNullAt(addIdx)) {
        val a = r.getStruct(addIdx)
        val rel = decodePath(a.getString(a.fieldIndex("path")))
        st = st.copy(files = st.files.updated(rel, AddEntry(
          rel,
          Option(a.getMap[String, String](a.fieldIndex("partitionValues")))
            .map(_.toMap).getOrElse(Map.empty),
          a.getLong(a.fieldIndex("size")),
          a.getLong(a.fieldIndex("modificationTime")))))
      }
      val rmIdx = r.fieldIndex("remove")
      if (!r.isNullAt(rmIdx)) {
        val rm = r.getStruct(rmIdx)
        val rel = decodePath(rm.getString(rm.fieldIndex("path")))
        val tsIdx = rm.fieldIndex("deletionTimestamp")
        val ts = if (rm.isNullAt(tsIdx)) 0L else rm.getLong(tsIdx)
        st = st.copy(tombstones = st.tombstones.updated(rel, ts))
      }
    }
    st
  }

  // ------------------------------------------------------------------ read

  /** Read the table as its log describes it — the file list comes from
    * replay, never from directory listing, so readers see exactly the
    * last committed version (stray/in-flight files are invisible, the
    * Delta reader contract).
    */
  def read(spark: SparkSession, root: String): DataFrame =
    read(spark, root, Long.MaxValue)

  /** Time travel: the table exactly as committed at `asOf` (VERSION AS
    * OF). Historical data files must still exist on disk. Writers that
    * pass `retain = true` ([[graft.operators.MergeUpsert.upsertParquet]],
    * [[graft.operators.Maintenance.compact]]) keep replaced files as
    * on-disk tombstones until [[graft.operators.Maintenance.vacuum]]'s
    * retention window passes — the reference's `VACUUM ... 168 HOURS`
    * contract — so this serves real DATA for any version inside the
    * window. Non-retaining writers delete replaced files immediately; a
    * version whose files are gone refuses with a FileNotFound at scan
    * time — never a silently wrong row set.
    */
  def read(spark: SparkSession, root: String, asOf: Long): DataFrame = {
    val st = replay(spark, root, asOf)
      .getOrElse(throw new IllegalArgumentException(
        s"no $LogDirName at $root — not a delta table"))
    require(st.schemaString != null,
      s"delta log at $root has no metaData action")
    val schema = DataType.fromJson(st.schemaString).asInstanceOf[StructType]
    if (st.files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], schema)
    else
      spark.read
        .option("basePath", root)
        .schema(schema)
        .parquet(st.files.keys.toSeq.sorted.map(rel => s"$root/$rel"): _*)
  }

  /** RESTORE TABLE ... VERSION AS OF — commit a NEW version whose file
    * set (and schema, and partition columns) equal `targetVersion`'s:
    * adds for files only the target has (clearing their tombstones —
    * the re-adoption path), removes for files only the head has
    * (tombstoning them, so the restore itself is restorable). History
    * is preserved — restore never rewrites the log, it appends, exactly
    * like Delta's RESTORE.
    *
    * Requires every target file to still exist on disk (retention mode
    * holds replaced files for the window; a vacuumed target refuses
    * loudly BEFORE committing anything). Caller must hold the table
    * writer lease for multi-writer tables —
    * [[graft.operators.Maintenance.restore]] is the leased wrapper.
    * Returns the committed version (the current version when the head
    * already equals the target).
    */
  def restore(spark: SparkSession, root: String,
      targetVersion: Long): Long = {
    val fs = fileSystem(spark, root)
    var attempt = 0
    while (true) {
      attempt += 1
      val target = replay(spark, root, targetVersion).getOrElse(
        throw new IllegalArgumentException(
          s"no $LogDirName at $root — not a delta table"))
      require(target.version == targetVersion,
        s"version $targetVersion does not exist at $root " +
          s"(resolved ${target.version})")
      val head = replay(spark, root).get
      val added = (target.files -- head.files.keys).values.toSeq
        .sortBy(_.relPath)
      val removed = head.files.keys
        .filterNot(target.files.contains).toSeq.sorted
      val schemaChanged = head.schemaString != target.schemaString ||
        head.partitionColumns != target.partitionColumns
      if (added.isEmpty && removed.isEmpty && !schemaChanged)
        return head.version
      // refuse BEFORE committing: a vacuumed target must not half-apply
      val missing = added.filterNot(e =>
        fs.exists(new Path(s"$root/${e.relPath}")))
      require(missing.isEmpty,
        s"cannot restore $root to version $targetVersion: " +
          s"${missing.size} of its files were vacuumed (first: " +
          s"${missing.head.relPath}); only versions inside the " +
          "tombstone retention window are restorable")
      val version = head.version + 1
      val now = System.currentTimeMillis()
      val sb = new StringBuilder
      sb.append(s"""{"commitInfo":{"timestamp":$now,""" +
        s""""operation":"RESTORE","operationParameters":""" +
        s"""{"version":"$targetVersion"},"engineInfo":"graft-spark"}}""")
        .append('\n')
      if (schemaChanged)
        sb.append(metaDataJson(head.tableId, target.schemaString,
          target.partitionColumns, head.configuration, now)).append('\n')
      removed.foreach { rel =>
        sb.append(s"""{"remove":{"path":${jstr(encodePath(rel))},""" +
          s""""deletionTimestamp":$now,"dataChange":true}}""").append('\n')
      }
      added.foreach { e =>
        sb.append(s"""{"add":{"path":${jstr(encodePath(e.relPath))},""" +
          s""""partitionValues":${jmap(e.partitionValues)},""" +
          s""""size":${e.size},"modificationTime":${e.modificationTime},""" +
          s""""dataChange":true}}""").append('\n')
      }
      if (tryCommit(spark, fs, root, version, sb.toString)) {
        if (version > 0 && version % CheckpointInterval == 0) {
          val st = head.copy(version = version,
            schemaString = target.schemaString,
            partitionColumns = target.partitionColumns,
            files = target.files,
            tombstones = (head.tombstones ++ removed.map(_ -> now)) --
              target.files.keys)
          writeCheckpoint(spark, fs, root, st)
        }
        return version
      }
      require(attempt < MaxCommitAttempts,
        s"delta commit for $root lost the version race $MaxCommitAttempts " +
          "times — refusing to spin (is the table lease being bypassed?)")
    }
    -1L // unreachable
  }

  /** Change data feed between two committed versions —
    * `table_changes(t, from, to)`: every row the range inserted tagged
    * `_change_type = 'insert'`, every row it removed tagged `'delete'`
    * (an update is its delete+insert pair, the CDF convention when no
    * per-row lineage is stored).
    *
    * Computed from the LOG's file-level delta, never a full-snapshot
    * diff: only files added in the range minus files removed in the
    * range are read, so a partition-pruned merge that touched 2 of
    * 1000 partitions costs two partitions' IO regardless of table
    * size — the scalable shape for incremental downstream consumers
    * (the reference's stage tables feed exactly such consumers).
    * Row-level semantics are multiset (`exceptAll`): rewriting a file
    * unchanged contributes nothing; duplicate rows count by
    * multiplicity.
    *
    * Requires the range's replaced files to still exist — retention
    * mode ([[graft.operators.MergeUpsert.RetainProp]]) holds them as
    * on-disk tombstones for the retention window; a vacuumed or
    * non-retained range refuses at scan time (FileNotFound), and a
    * `fromVersion` behind the cleaned log refuses in replay — never a
    * silently wrong change set.
    */
  def changes(spark: SparkSession, root: String, fromVersion: Long,
      toVersion: Long = Long.MaxValue): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    require(fromVersion >= 0, s"negative fromVersion: $fromVersion")
    val from = replay(spark, root, fromVersion)
      .getOrElse(throw new IllegalArgumentException(
        s"no $LogDirName at $root — not a delta table"))
    val to = replay(spark, root, toVersion)
      .getOrElse(throw new IllegalArgumentException(
        s"no $LogDirName at $root — not a delta table"))
    require(to.version >= from.version,
      s"toVersion ${to.version} precedes fromVersion ${from.version}")
    require(to.schemaString != null,
      s"delta log at $root has no metaData action")
    val schema = DataType.fromJson(to.schemaString).asInstanceOf[StructType]
    def readFiles(rels: Seq[String]): DataFrame =
      if (rels.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      else spark.read.option("basePath", root)
        .option("mergeSchema", "true")
        .parquet(rels.sorted.map(rel => s"$root/$rel"): _*)
    val added = readFiles((to.files.keySet -- from.files.keySet).toSeq)
    val removed = readFiles((from.files.keySet -- to.files.keySet).toSeq)
    // align columns across schema evolution: absent columns null-fill
    val inserted = added.exceptAll(
        removed.unionByName(added.limit(0), allowMissingColumns = true)
          .select(added.columns.map(col).toSeq: _*))
      .withColumn("_change_type", lit("insert"))
    val deleted = removed.exceptAll(
        added.unionByName(removed.limit(0), allowMissingColumns = true)
          .select(removed.columns.map(col).toSeq: _*))
      .withColumn("_change_type", lit("delete"))
    inserted.unionByName(deleted, allowMissingColumns = true)
  }

  /** `DESCRIBE DETAIL` — one row of table-level metadata off a single
    * replay: version, file count, total live bytes, partition columns,
    * configuration, tombstone count (the retention footprint VACUUM
    * would reclaim). The operator's first look at an unfamiliar table.
    */
  def detail(spark: SparkSession, root: String): DataFrame = {
    val st = replay(spark, root)
      .getOrElse(throw new IllegalArgumentException(
        s"no $LogDirName at $root — not a delta table"))
    import spark.implicits._
    Seq((root, st.version, st.files.size.toLong,
        st.files.values.map(_.size).sum,
        st.partitionColumns, st.configuration, st.tombstones.size.toLong))
      .toDF("location", "version", "num_files", "size_in_bytes",
        "partition_columns", "configuration", "num_tombstones")
  }

  /** [[changes]] with per-commit attribution — real Delta's
    * `table_changes` row shape: each row carries `_commit_version`, the
    * version whose commit produced it (a row updated twice in the range
    * appears once per commit, where the collapsed [[changes]] would
    * cancel the intermediate hop). Work is the sum of the PER-COMMIT
    * file deltas — each step reads only the files that commit added or
    * removed, so a range of partition-pruned merges costs the touched
    * partitions per commit, never snapshots.
    */
  def changesPerVersion(spark: SparkSession, root: String,
      fromVersion: Long, toVersion: Long = Long.MaxValue): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val head = replay(spark, root)
      .getOrElse(throw new IllegalArgumentException(
        s"no $LogDirName at $root — not a delta table")).version
    val to = math.min(toVersion, head)
    require(to >= fromVersion,
      s"toVersion $to precedes fromVersion $fromVersion")
    val steps = (fromVersion until to).map { v =>
      changes(spark, root, v, v + 1)
        .withColumn("_commit_version", lit(v + 1))
    }
    if (steps.isEmpty)
      changes(spark, root, fromVersion, to)
        .withColumn("_commit_version", lit(to))
        .limit(0)
    else steps.reduce(_ unionByName _)
  }

  /** Relative paths of the data files on disk under `root` (scoped to
    * `subs` dirs when given) EXCLUDING log tombstones — the view a writer
    * reads on a possibly-retained table. Listing-driven (not the log's
    * add set) so it self-heals a crash-stale log: a file only ever
    * coexists with live data AFTER its remove action committed, so
    * listing-minus-tombstones is exact in every crash window. None when
    * the table has no `_delta_log` (plain directory reads are then exact).
    */
  def listedMinusTombstones(spark: SparkSession, root: String,
      subs: Option[Seq[String]] = None,
      /** Pre-replayed state, to spare a second log replay when the
        * caller already holds one (safe under the table lease — no
        * other writer can advance the log mid-operation).
        */
      state: Option[LogState] = None): Option[Seq[String]] =
    state.orElse(replay(spark, root)).map { st =>
      val fs = fileSystem(spark, root)
      val listed = subs match {
        case Some(ds) =>
          ds.flatMap(d => listDataFiles(fs, root, Some(d)).keys)
        case None => listDataFiles(fs, root, None).keys.toSeq
      }
      listed.filterNot(st.tombstones.contains).sorted
    }

  // --------------------------------------------------------------- history

  private val HistorySchema: StructType = DataType.fromJson(
    """{"type":"struct","fields":[
      |{"name":"version","type":"long","nullable":false,"metadata":{}},
      |{"name":"timestamp","type":"timestamp","nullable":true,"metadata":{}},
      |{"name":"operation","type":"string","nullable":true,"metadata":{}},
      |{"name":"num_added_files","type":"long","nullable":false,"metadata":{}},
      |{"name":"num_removed_files","type":"long","nullable":false,"metadata":{}},
      |{"name":"schema_changed","type":"boolean","nullable":false,"metadata":{}},
      |{"name":"data_changed","type":"boolean","nullable":false,"metadata":{}}
      |]}""".stripMargin).asInstanceOf[StructType]

  /** DESCRIBE HISTORY equivalent: one row per RETAINED commit (history
    * before a cleaned checkpoint is absent by protocol), newest first —
    * version, commit timestamp, operation, add/remove file counts,
    * whether the commit carried a metaData (schema) action, and whether
    * any add was a data change (false across a pure OPTIMIZE rewrite).
    *
    * Log retention: [[cleanExpiredLogs]] (run at every checkpoint)
    * deletes pre-checkpoint commits past the table's
    * `delta.logRetentionDuration` (default 30 days), which SHORTENS what
    * this returns — replay/read are unaffected (the checkpoint carries
    * state), but DESCRIBE HISTORY covers only the retained tail. Same
    * contract as real Delta. Pinned in DeltaLogSpec ("history() covers
    * only RETAINED commit JSONs").
    */
  def history(spark: SparkSession, root: String): DataFrame = {
    val fs = fileSystem(spark, root)
    val dir = logDir(root)
    require(fs.exists(dir), s"no $LogDirName at $root — not a delta table")
    val versions = fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(n => n.length == 25 && n.endsWith(".json") &&
        n.take(20).forall(_.isDigit))
      .map(_.take(20).toLong).sorted
    val rows = DriverPar.parMap(versions) { v =>
      val in = fs.open(new Path(dir, f"$v%020d.json"))
      val body =
        try new String(org.apache.commons.io.IOUtils.toByteArray(in), UTF_8)
        finally in.close()
      var ts = 0L
      var op: String = null
      var adds = 0L
      var removes = 0L
      var meta = false
      var dataChange = false
      body.split("\n").iterator.map(_.trim).filter(_.nonEmpty).foreach { line =>
        val obj = Json.parseObject(line)
        if (obj != null) obj.foreach {
          case ("commitInfo", m: Map[_, _]) =>
            val ci = m.asInstanceOf[Map[String, Any]]
            ts = ci.get("timestamp")
              .collect { case l: java.lang.Long => l.toLong }.getOrElse(0L)
            op = ci.get("operation").map(_.toString).orNull
          case ("add", a: Map[_, _]) =>
            adds += 1
            if (a.asInstanceOf[Map[String, Any]]
                .get("dataChange").contains(true)) dataChange = true
          case ("remove", _) => removes += 1
          case ("metaData", _) => meta = true
          case _ => ()
        }
      }
      Row(v, new java.sql.Timestamp(ts), op, adds, removes, meta, dataChange)
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), HistorySchema)
      .orderBy(col("version").desc)
  }

  // --------------------------------------------------------------- listing

  /** Data files under `root` (or `root/sub`), keyed by table-relative
    * path; `_`- and `.`-prefixed names are not data (log dir, Spark
    * `_SUCCESS`, hidden/temp files) at any depth — EXCEPT directory
    * segments containing `=`, which are partition dirs even when the
    * column name starts with an underscore (the same exemption Spark's
    * own partition discovery applies; without it a `_date=...` layout
    * would be silently invisible to the log).
    */
  private def listDataFiles(fs: FileSystem, root: String,
      sub: Option[String]): Map[String, AddEntry] = {
    val rootQ = fs.makeQualified(new Path(root))
    val start = sub.map(d => new Path(rootQ, d)).getOrElse(rootQ)
    if (!fs.exists(start)) return Map.empty
    val out = Map.newBuilder[String, AddEntry]
    val it = fs.listFiles(start, true)
    while (it.hasNext) {
      val s = it.next()
      val rel = rootQ.toUri.relativize(s.getPath.toUri).getPath
      val segs = rel.split("/")
      val dirHidden = segs.dropRight(1).exists(seg =>
        (seg.startsWith("_") || seg.startsWith(".")) && !seg.contains("="))
      val fileHidden =
        segs.last.startsWith("_") || segs.last.startsWith(".")
      if (!dirHidden && !fileHidden) {
        out += rel -> AddEntry(rel, partitionValuesOf(segs.dropRight(1).toIndexedSeq),
          s.getLen, s.getModificationTime)
      }
    }
    out.result()
  }

  private def partitionValuesOf(dirSegs: Seq[String]): Map[String, String] =
    dirSegs.filter(_.contains("=")).map { seg =>
      val Array(k, v) = seg.split("=", 2)
      val key = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .unescapePathName(k)
      val value = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .unescapePathName(v)
      key -> (if (value == "__HIVE_DEFAULT_PARTITION__") null else value)
    }.toMap

  // ------------------------------------------------------------- utilities

  private def fileSystem(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** RFC 3986 percent-encoding of a relative path, per segment — the
    * spec's `add.path` encoding. `=` stays literal for partition-dir
    * readability (it is not reserved in a path segment).
    */
  private val Unreserved: Set[Char] =
    (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9')).toSet ++ Set('-', '_', '.', '~', '=')

  private[sources] def encodePath(rel: String): String =
    rel.split("/", -1).map { seg =>
      val sb = new StringBuilder(seg.length)
      seg.getBytes(UTF_8).foreach { b =>
        val c = (b & 0xff).toChar
        if (b > 0 && Unreserved(c)) sb.append(c)
        else sb.append(f"%%${b & 0xff}%02X")
      }
      sb.toString
    }.mkString("/")

  private[sources] def decodePath(enc: String): String = {
    val out = new java.io.ByteArrayOutputStream(enc.length)
    var i = 0
    while (i < enc.length) {
      val c = enc.charAt(i)
      if (c == '%' && i + 2 < enc.length) {
        out.write(Integer.parseInt(enc.substring(i + 1, i + 3), 16))
        i += 3
      } else {
        // self-written logs percent-encode all non-ASCII, but a foreign
        // writer may leave chars above U+007F literal — emit their UTF-8
        // bytes (surrogate pairs as one code point), not the low 8 bits
        // of the UTF-16 code unit
        if (c < 0x80) { out.write(c.toInt); i += 1 }
        else if (Character.isHighSurrogate(c) && i + 1 < enc.length &&
            Character.isLowSurrogate(enc.charAt(i + 1))) {
          out.write(enc.substring(i, i + 2).getBytes(UTF_8)); i += 2
        } else { out.write(c.toString.getBytes(UTF_8)); i += 1 }
      }
    }
    new String(out.toByteArray, UTF_8)
  }

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def jmap(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) =>
      s"${jstr(k)}:${if (v == null) "null" else jstr(v)}"
    }.mkString("{", ",", "}")
}
