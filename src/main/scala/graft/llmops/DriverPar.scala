package graft.llmops

/** Bounded-parallel driver-side planning I/O.
  *
  * Every multi-file container reader (Avro / Arrow / ORC / BGZF /
  * seekable zstd) reads a small per-file header, footer, or seek
  * table on the driver before any task schedules. Each read is one
  * blocking filesystem open + read; done serially that planning pass
  * is O(files) sequential round-trips — minutes of driver wall time
  * at 100k shards, the exact bottleneck Spark's own parquet source
  * avoids with its thread-pooled footer pass. [[parMap]] hides the
  * per-file latency behind a bounded daemon pool while preserving
  * input order and original exception types, so the readers' refusal
  * contracts (schema disagreement, not-a-BGZF-member, …) stay
  * byte-identical to the serial loop they replace.
  */
object DriverPar {

  /** Order-preserving parallel map over planning items.
    *
    * The result vector lines up index-for-index with `items`. If any
    * item fails, the FIRST failure in input order rethrows its
    * ORIGINAL exception (unwrapped from the pool's
    * `ExecutionException`), matching what the serial loop would have
    * thrown — deterministic regardless of completion order. Pool
    * threads are daemons and the pool is torn down before returning,
    * so repeated plans never leak threads; in-flight work for
    * later items is interrupted once a failure is chosen.
    */
  def parMap[A, B](items: Seq[A], parallelism: Int = 32)(
      f: A => B): Vector[B] = {
    if (items.isEmpty) return Vector.empty
    val n = math.max(1, math.min(parallelism, items.size))
    if (n == 1) return items.iterator.map(f).toVector
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      n,
      new java.util.concurrent.ThreadFactory {
        private val k = new java.util.concurrent.atomic.AtomicInteger
        def newThread(r: Runnable): Thread = {
          val t = new Thread(r, s"graft-plan-io-${k.getAndIncrement()}")
          t.setDaemon(true)
          t
        }
      })
    try {
      val futures = items.map { a =>
        pool.submit(new java.util.concurrent.Callable[B] {
          def call(): B = f(a)
        })
      }
      futures.iterator.map { fut =>
        try fut.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw e.getCause
        }
      }.toVector
    } finally pool.shutdownNow()
  }

  /** Scan-task count for a planned list of (file/range/stripe) items —
    * byte-aware instead of one-task-per-item (guide §6 small files):
    * enough tasks that each handles ~`bytesPerTask`, floored at the
    * session's default parallelism so small corpora still use every
    * core, capped by the item count (an item is the split granularity —
    * it cannot be subdivided further here) and by 4096 (the historical
    * planning cap). A 100k-shard 3 TB landing dir still gets one task
    * per 32 MB range; a 1000-file directory of KB-sized shards now packs
    * into `defaultParallelism` tasks instead of 1000 task launches.
    */
  def planPartitions(spark: org.apache.spark.sql.SparkSession,
      nItems: Int, totalBytes: Long, bytesPerTask: Long): Int = {
    val byBytes = math.ceil(
      totalBytes.toDouble / math.max(1L, bytesPerTask)).toLong
    val floor = spark.sparkContext.defaultParallelism.toLong
    math.max(1L, math.min(math.min(nItems.toLong,
      math.max(byBytes, floor)), 4096L)).toInt
  }
}
