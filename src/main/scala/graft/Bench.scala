package graft
import org.apache.spark.sql.SparkSession
/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR,
  * prints one JSON line {"metric":…,"queries":{…}} AND writes the same JSON
  * to SPARK_GRAFT_BENCH_OUT (default bench_out.json) — log scrapers lose
  * the line to sbt prefixes, the file never does.
  * SPARK_GRAFT_BENCH_ONLY=q34,q43 restricts to a comma-separated subset
  * (prefix match) for quick iteration. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    // Scale probes model a bigger cluster's shuffle width on the same
    // local cores: partitions pinned to core count make per-partition
    // state grow linearly with corpus size (a real cluster grows
    // partitions with executors), so sfN probes may override it.
    val shuffleParts = sys.env.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
      .flatMap(_.toIntOption)
      .getOrElse(cpus.toIntOption.getOrElse(32))
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-bench"),
      shufflePartitions = shuffleParts
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // materialize every output row of the physical plan (a bare count()
    // would let Catalyst prune the projections and under-measure)
    def exec(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()
    // warm the JVM + file cache once so measured times are steady-state
    SparkEntry.queries.get("q01_pricing_summary")
      .foreach(fn => try { exec(fn(spark, sfDir)) } catch { case _: Throwable => () })
    // Contention canary: a fixed-work pure-CPU aggregate (no IO, no shuffle)
    // timed immediately before and after the battery. Its cost is invariant
    // to the query set, so an inflated canary (vs a clean-machine reference
    // of ~0.2-0.4 s, or pre/post disagreement) flags a contaminated run —
    // round 4's driver bench read as a 75% regression that was pure machine
    // noise, which per-query timings alone cannot distinguish from a real one.
    def canary(): Double = {
      val t0 = System.nanoTime()
      exec(spark.range(0L, 400000000L, 1L, cpus.toIntOption.getOrElse(32))
        .selectExpr("sum(id * 2654435761 % 1000003) AS s"))
      (System.nanoTime() - t0) / 1e9
    }
    canary() // warm codegen for the canary plan itself
    val canaryPre = canary()
    // min over INTERLEAVED passes (all queries pass 1, then all pass 2, …):
    // back-to-back runs of one query share any transient contention burst,
    // so consecutive-min still reads a busy box as a per-query regression
    // (rounds 4 and 5 both produced phantom 2-13x slowdowns that clean
    // re-runs refuted). Interleaving separates a query's samples by a full
    // battery (~1 min), longer than scheduler/GC/IO bursts.
    val passes = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toIntOption.getOrElse(2))
    val selected = (SparkEntry.queries ++ SparkEntry.benchOnlyQueries)
      .toSeq.sortBy(_._1).filter { case (name, _) =>
        only.forall(_.exists(name.startsWith))
      }
    // per-query samples tagged with the canary SEGMENT they ran in, so a
    // contaminated window can be re-run instead of shipped (see below)
    val samples =
      scala.collection.mutable.Map.empty[String,
        scala.collection.mutable.ArrayBuffer[(Double, Int)]]
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    // In-battery canaries: round 8 proved the pre/post pair cannot see
    // mid-run contamination (GC/driver pressure inflated mid-battery heavy
    // queries ~2× in BOTH interleaved passes — min-of-passes can't remove
    // what hits every pass). A canary every ~20 queries timestamps the
    // pollution window; round 17 makes the harness SELF-DEFENDING — a
    // query whose every sample sits between elevated canaries is re-run
    // after the battery in a verified-clean window, or flagged "suspect"
    // in the JSON when no clean window arrives.
    val canarySeries = scala.collection.mutable.ArrayBuffer.empty[Double]
    var sinceCanary = 0
    // Per-query state drop: operators localCheckpoint/persist internally;
    // checkpoint blocks free only when the RDD is GC'd and the async
    // ContextCleaner drains. Left in place they accumulate block-manager
    // state across the 254-query battery and inflated late heavy queries
    // up to ~3× in r15 (q89 7.1 s battery vs 2.2 s clean). Triggered GC is
    // gated on leftover storage actually existing, so queries that kept
    // nothing pay nothing.
    var sinceGc = 0
    def dropQueryState(): Unit = {
      spark.catalog.clearCache() // persisted frames unpin immediately
      sinceGc += 1
      // broadcast blocks (per-read dictionary/metadata ships) never show
      // in getRDDStorageInfo, so the storage-gated GC alone lets them
      // accumulate across a 500-execution battery and inflate the tail —
      // a periodic GC drains the ContextCleaner for those too
      if (spark.sparkContext.getRDDStorageInfo.nonEmpty || sinceGc >= 25) {
        sinceGc = 0
        System.gc() // release checkpoint/broadcast refs to the cleaner
        val deadline = System.nanoTime() + 3L * 1000 * 1000 * 1000
        while (spark.sparkContext.getRDDStorageInfo.nonEmpty &&
            System.nanoTime() < deadline) Thread.sleep(50)
      }
    }
    (1 to passes).foreach { _ =>
      selected.foreach { case (name, fn) =>
        dropQueryState()
        if (sinceCanary >= 20) { canarySeries += canary(); sinceCanary = 0 }
        sinceCanary += 1
        val seg = canarySeries.length // segment = samples since last canary
        val t0 = System.nanoTime()
        val ok = try { exec(fn(spark, sfDir)); true }
          catch { case _: Throwable => false }
        val dt = (System.nanoTime() - t0) / 1e9
        // a throwing pass never contributes a time — the old path recorded
        // the failure's wall time, hiding broken queries as fast ones
        if (ok) samples.getOrElseUpdate(name,
          scala.collection.mutable.ArrayBuffer.empty) += ((dt, seg))
        ()
      }
    }
    selected.foreach { case (name, _) =>
      if (!samples.contains(name)) failed.add(name)
    }
    val canaryPost = canary()
    // Self-defense: segment k is bounded by canary k-1 (canary_pre for
    // k=0) and canary k (canary_post past the series). A segment is clean
    // when BOTH boundaries sit within 1.3× of the best canary observed —
    // the run's own clean-machine reference. A query keeps the min of its
    // clean-segment samples; one with none is re-run post-battery inside
    // a canary-verified window (two attempts), and stays flagged
    // "suspect" if the machine never goes quiet.
    val allCanaries = (canaryPre +: canarySeries.toSeq :+ canaryPost).sorted
    // median, not min: the canary has warmup/jitter variance of its own,
    // and contamination hits a minority of segments — min would read
    // normal jitter as contamination and re-run half the battery. An
    // absolute 0.15 s slack keeps millisecond jitter on a fast canary
    // from flagging either.
    val baseline = allCanaries(allCanaries.length / 2)
    val canaryLimit = math.max(1.3 * baseline, baseline + 0.15)
    def segClean(k: Int): Boolean = {
      val lo = if (k == 0) canaryPre else canarySeries(k - 1)
      val hi = if (k < canarySeries.length) canarySeries(k) else canaryPost
      math.max(lo, hi) <= canaryLimit
    }
    val best = scala.collection.mutable.Map.empty[String, Double]
    val suspect = scala.collection.mutable.LinkedHashSet.empty[String]
    val reran = scala.collection.mutable.LinkedHashSet.empty[String]
    selected.foreach { case (name, _) =>
      samples.get(name).foreach { ss =>
        val clean = ss.collect { case (t, k) if segClean(k) => t }
        if (clean.nonEmpty) best(name) = clean.min
        else { best(name) = ss.map(_._1).min; suspect.add(name) }
        ()
      }
    }
    val byName = selected.toMap
    suspect.toSeq.foreach { name =>
      val fn = byName(name)
      var verified = false
      var attempts = 0
      while (!verified && attempts < 2) {
        attempts += 1
        dropQueryState()
        val cPre = canary()
        val t0 = System.nanoTime()
        val ok = try { exec(fn(spark, sfDir)); true }
          catch { case _: Throwable => false }
        val dt = (System.nanoTime() - t0) / 1e9
        val cPost = canary()
        if (ok) {
          best(name) = math.min(best(name), dt)
          if (math.max(cPre, cPost) <= canaryLimit) {
            verified = true
            suspect.remove(name)
            reran.add(name)
          }
        } else verified = true // broken is not contamination; leave as-is
        ()
      }
    }
    val results = selected.collect {
      case (name, _) if best.contains(name) => name -> best(name)
    }
    // ms precision: full-double rendering made the 126-query line long
    // enough that log-tail scrapers truncated it mid-JSON (round 8 lost
    // the per-query record); 3 decimals halves the line and loses nothing
    // a benchmark at this scale can claim to resolve
    def f(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val failedJson =
      if (failed.isEmpty) ""
      else s""","failed":[${failed.map("\"" + _ + "\"").mkString(",")}]"""
    def nameList(key: String, names: Iterable[String]): String =
      if (names.isEmpty) ""
      else s""","$key":[${names.map("\"" + _ + "\"").mkString(",")}]"""
    val canSeries = canarySeries.map(f).mkString("[", ",", "]")
    val json =
      s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,""" +
        s""""canary_pre":${f(canaryPre)},"canary_post":${f(canaryPost)},""" +
        s""""canary_series":$canSeries""" +
        nameList("reran", reran) + nameList("suspect", suspect) +
        s"""$failedJson,"sf":"$sfDir"}"""
    println(json)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
