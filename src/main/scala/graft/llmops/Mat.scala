package graft.llmops

import org.apache.spark.sql.DataFrame

/** Materialization strategy for intermediate frames that several stages
  * of one job re-scan.
  *
  * The house default is eager `localCheckpoint(true)`: blocks free with
  * the RDD (no CacheManager pinning across micro-batches), but the
  * lineage is truncated to executor-resident blocks — on a real cluster
  * an executor loss makes them unrecoverable and fails the job. For long
  * BATCH runs on preemptible executors, callers pass `checkpointDir` and
  * the frame is snapshotted to reliable storage instead: same lineage
  * truncation, but downstream stages replan from a durable parquet scan
  * that survives any executor loss (the `duplicateClusters` precedent,
  * now uniform across the batch ANN/dedup entry points). The caller owns
  * the directory — delete it once the job's result is consumed.
  */
private[graft] object Mat {

  def snapshot(df: DataFrame, checkpointDir: Option[String],
      label: String): DataFrame =
    checkpointDir match {
      case Some(dir) =>
        val p = s"$dir/graft-snap-$label-${java.util.UUID.randomUUID()}"
        df.write.mode("overwrite").parquet(p)
        df.sparkSession.read.parquet(p)
      case None => df.localCheckpoint(true)
    }
}
