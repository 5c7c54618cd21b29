package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
/** Dev scratch: phase-level timing of the hot queries (not part of the
  * driver contract; used to attribute bench seconds to pipeline stages).
  */
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[profile] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    def exec(df: DataFrame): Unit = { df.queryExecution.toRdd.count(); () }
    def tbl(n: String) = spark.read.parquet(s"$sfDir/$n.parquet")

    // warm
    exec(tbl("documents").limit(10))

    val which = args.headOption.getOrElse("all")

    if (which == "all" || which == "q51") {
      val d = tbl("documents").filter(col("doc_id") < 2000).repartition(32)
      val doubled = d.unionByName(d.withColumn("doc_id", col("doc_id") + 1000000))
      t("q51 minhashNearDups(pairs)") {
        exec(graft.llmops.DedupOps.minhashNearDups(doubled, "text", "doc_id",
          numHashes = 16, bands = 4, threshold = 0.9, wordShingleN = Some(3))
          .select("key_a", "key_b"))
      }
      val pairs = graft.llmops.DedupOps.minhashNearDups(doubled, "text", "doc_id",
        numHashes = 16, bands = 4, threshold = 0.9, wordShingleN = Some(3))
        .select("key_a", "key_b")
      t("q51 duplicateClusters(on top)") {
        exec(graft.llmops.DedupOps.duplicateClusters(pairs))
      }
    }

    if (which == "all" || which == "q115") {
      val emb = tbl("embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val eps = when(col("vec_id") % 3 === 0, lit(0.0))
        .when(col("vec_id") % 3 === 1, lit(0.001)).otherwise(lit(0.12))
      val jit = emb.withColumn("embedding", transform(col("embedding"),
          (x, i) => x * (lit(1.0) + eps * (i % 5 - lit(2)))))
        .withColumn("vec_id", col("vec_id") + lit(1000000L))
      val corpus = emb.unionByName(jit)
      t("q115 corpus materialize") { exec(corpus) }
      t("q115 semDedup full") {
        exec(graft.llmops.Similarity.semDedup(corpus, "vec_id", "embedding",
          tau = 0.999, nClusters = 16))
      }
    }

    if (which == "all" || which == "q89") {
      val emb = tbl("embeddings")
      val queries = emb.filter(col("vec_id") < 5)
      t("q89 pqTopK full") {
        exec(graft.llmops.Similarity.pqTopK(emb, "vec_id", "embedding",
          queries, "vec_id", "embedding", k = 3, numSubspaces = 8,
          numCentroids = 16))
      }
    }

    if (which == "all" || which == "q127") {
      val emb = tbl("embeddings")
      val queries = emb.filter(col("vec_id") < 5)
      t("q127 ivfAdcTopK full") {
        exec(graft.llmops.Similarity.ivfAdcTopK(emb, "vec_id", "embedding",
          queries, "vec_id", "embedding", k = 3,
          nCentroids = 16, nProbe = 4, numSubspaces = 8, pqCentroids = 16))
      }
    }

    if (which == "all" || which == "q88") {
      val d = tbl("documents").select(col("doc_id"), col("text"))
      val donors = d.filter(col("doc_id") < 50)
        .select(col("doc_id").alias("__oid"),
          substring(col("text"), 1, 80).alias("__oslice"))
      val src = d.join(broadcast(donors), col("__oid") === col("doc_id") % 50)
        .select(col("doc_id"),
          concat(col("text"), lit(" "), col("__oslice")).alias("text"))
      t("q88 src materialize") { exec(src) }
      t("q88 grams only (portable)") {
        exec(graft.llmops.DedupOps.substringGrams(src, "text", "doc_id", 40,
          portable = true))
      }
      t("q88 full portable") {
        exec(graft.llmops.DedupOps.exactSubstringDedup(src, "text", "doc_id",
          minLen = 40).select(col("doc_id"), col("dedup_text")))
      }
      t("q88 full fast") {
        exec(graft.llmops.DedupOps.exactSubstringDedup(src, "text", "doc_id",
          minLen = 40, portable = false).select(col("doc_id"), col("dedup_text")))
      }
    }

    if (which == "all" || which == "s25") {
      val n = 10
      val root = java.nio.file.Files.createTempDirectory("graft-prof-s25")
        .toString + "/t"
      val base = tbl("orders").filter(col("o_orderkey") < 2000)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          (col("o_orderkey") % 8).cast("int").as("p")).cache()
      base.count()
      t("s25 initial upsert") {
        graft.operators.MergeUpsert.upsertParquet(spark, base, root,
          Seq("o_orderkey"), Seq("p"), retain = true)
      }
      var i = 0
      while (i < n) {
        val batch = base.filter(col("p").isin(i % 8, (i + 1) % 8))
          .withColumn("o_totalprice", -col("o_totalprice"))
        t(s"s25 merge $i") {
          graft.operators.MergeUpsert.upsertParquet(spark, batch, root,
            Seq("o_orderkey"), Seq("p"))
        }
        i += 1
      }
      t("s25 compact") { graft.operators.Maintenance.compact(spark, root) }
      t("s25 manifest") {
        graft.operators.Maintenance.generateSymlinkManifest(spark, root)
      }
      t("s25 checkpoint") { graft.sources.DeltaLog.checkpoint(spark, root); () }
      t("s25 vacuum") {
        graft.operators.Maintenance.vacuum(spark, root, retentionHours = 0.0); ()
      }
      t("s25 history+read+agg") {
        val hist = graft.sources.DeltaLog.history(spark, root).count()
        val live = graft.sources.DeltaLog.read(spark, root)
        exec(live.agg(count(lit(1)).as("rows"),
          sum(col("o_totalprice")).as("sum_price"))
          .withColumn("history_rows", lit(hist)))
      }
      base.unpersist()
    }
    spark.stop()
  }
}
