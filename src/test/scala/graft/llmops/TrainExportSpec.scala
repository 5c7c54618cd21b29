package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TrainExportSpec extends SparkTestBase {
  import spark.implicits._

  test("shuffle shards are deterministic and stable under corpus growth") {
    val small = (1L to 500L).toDF("id")
    val big = (1L to 1000L).toDF("id")
    val s1 = TrainExport.shuffleShards(small, "id", 4)
      .select("id", "shard").as[(Long, Int)].collect().toMap
    val s2 = TrainExport.shuffleShards(small, "id", 4)
      .select("id", "shard").as[(Long, Int)].collect().toMap
    assert(s1 === s2, "same assignment every run")
    val grown = TrainExport.shuffleShards(big, "id", 4)
      .select("id", "shard").as[(Long, Int)].collect().toMap
    assert(s1.forall { case (id, sh) => grown(id) == sh },
      "a document's shard never changes when the corpus grows")
    // positions are a contiguous 1..n ranking per shard
    val pos = TrainExport.shuffleShards(small, "id", 4)
      .groupBy("shard").agg(count(lit(1)).as("n"), max("pos").as("mx"),
        min("pos").as("mn"))
      .collect()
    pos.foreach { r =>
      assert(r.getAs[Long]("mn") === 1L)
      assert(r.getAs[Long]("mx") === r.getAs[Long]("n"))
    }
    // all shards populated, none pathological
    assert(pos.length === 4)
  }

  test("sequence packing: bins advance with the running token sum, per shard") {
    val docs = (1L to 200L).map(i => (i, 100L)).toDF("id", "toks")
    val packed = TrainExport.packSequences(docs, "id", "toks", 2, 250L)
      .select("shard", "pos", "bin").as[(Int, Long, Long)].collect()
      .groupBy(_._1)
    packed.foreach { case (_, rows) =>
      val byPos = rows.sortBy(_._2)
      // with 100-token docs and budget 250: start offsets 0,100,200,300… →
      // bins 0,0,0,1,1,2,2,2,3,… — never decreasing, first is 0
      assert(byPos.head._3 === 0L)
      assert(byPos.sliding(2).forall { case Array(a, b) => b._3 >= a._3 },
        "bin ids must be monotone in stream order")
      // every bin holds 2 or 3 hundred-token docs (250 budget)
      val sizes = byPos.groupBy(_._3).map(_._2.length).toSet
      assert(sizes.subsetOf(Set(2, 3)), s"unexpected bin sizes $sizes")
    }
  }

  test("writeShards lays out one partition dir per shard in shuffle order") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString
    val docs = (1L to 300L).map(i => (i, s"doc $i")).toDF("id", "text")
    TrainExport.writeShards(docs, "id", 4, s"$dir/out")
    val back = spark.read.parquet(s"$dir/out")
    assert(back.count() === 300)
    assert(back.select("shard").distinct().count() === 4)
    // round trip agrees with the pure assignment
    val expect = TrainExport.shuffleShards(docs, "id", 4)
      .select("id", "shard").as[(Long, Int)].collect().toMap
    val got = back.select("id", "shard").as[(Long, Int)].collect().toMap
    assert(got === expect)
  }

  test("writeShardsJsonl emits gzipped JSON lines per shard dir") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shards_jl").toString
    val docs = (1L to 120L).map(i => (i, s"doc $i")).toDF("id", "text")
    TrainExport.writeShardsJsonl(docs, "id", 3, s"$dir/out")
    val shardDirs = new java.io.File(s"$dir/out").listFiles
      .filter(_.getName.startsWith("shard="))
    assert(shardDirs.length === 3)
    assert(shardDirs.forall(_.listFiles.exists(_.getName.endsWith(".json.gz"))))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("pos",
        org.apache.spark.sql.types.LongType)))
    val back = spark.read.schema(schema).json(s"$dir/out/shard=1")
    assert(back.count() > 0)
    assert(back.select("id").distinct().count() === back.count())
  }
}
