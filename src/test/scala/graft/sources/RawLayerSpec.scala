package graft.sources

import graft.SparkTestBase
import graft.llmops.Multimodal
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

class RawLayerSpec extends SparkTestBase {
  import spark.implicits._

  test("K2 stringified raw write: all columns land as strings") {
    val root = Files.createTempDirectory("graft-raw").toString
    val df = Seq((1, 2.5, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("i", "d", "ts")
    RawLayer.writeRawStringified(df, s"$root/t")
    val back = spark.read.parquet(s"$root/t")
    assert(back.schema.fields.forall(_.dataType.typeName === "string"))
    assert(back.collect().head.getString(0) === "1")
  }

  test("K3 CSV round trip") {
    val root = Files.createTempDirectory("graft-csv").toString
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v")
    RawLayer.writeCsv(df, s"$root/c")
    val back = spark.read.option("header", "true").csv(s"$root/c")
    assert(back.count() === 2)
  }

  test("S5 config CSV scan: ;-delimited latin-1 with header") {
    val root = Files.createTempDirectory("graft-cfg").toString
    Files.write(Paths.get(s"$root/tables.csv"),
      "COLUMNS;LOAD_TYPE;SOURCE_TABLE\nid, nombre;incremental;ACTIVIDAD\n"
        .getBytes("ISO-8859-1"))
    val df = RawLayer.readConfigCsv(spark, s"$root/tables.csv")
    val row = df.collect().head
    assert(df.columns.toSeq === Seq("COLUMNS", "LOAD_TYPE", "SOURCE_TABLE"))
    assert(row.getString(0) === "id, nombre")
  }

  test("JSONL round trip: explicit schema, escapes survive, gzip variant") {
    val root = Files.createTempDirectory("graft-jsonl").toString
    val df = Seq(
      (1L, "plain words"),
      (2L, "quotes \" and \\ backslash\nand a newline"),
      (3L, "unicode café 日本")).toDF("id", "text")
    RawLayer.writeJsonl(df, s"$root/plain")
    val back = RawLayer.readJsonl(spark, s"$root/plain", df.schema, strict = true)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(back.toSeq === Seq((1L, "plain words"),
      (2L, "quotes \" and \\ backslash\nand a newline"),
      (3L, "unicode café 日本")))

    RawLayer.writeJsonl(df, s"$root/gz", gzip = true)
    assert(new java.io.File(s"$root/gz").listFiles.exists(_.getName.endsWith(".gz")))
    assert(RawLayer.readJsonl(spark, s"$root/gz", df.schema).count() === 3)
  }

  test("K7 deletePrefix removes a target dir") {
    val root = Files.createTempDirectory("graft-del").toString
    Seq(1).toDF("x").write.parquet(s"$root/t")
    RawLayer.deletePrefix(spark, s"$root/t")
    assert(!Files.exists(Paths.get(s"$root/t")))
  }

  test("S6 binaryFile ingestion → asset rows → feature extraction") {
    val root = Files.createTempDirectory("graft-bin").toString
    Files.write(Paths.get(s"$root/a.bin"), Array[Byte](1, 2, 3, 4))
    Files.write(Paths.get(s"$root/b.bin"), Array[Byte](9, 8, 7))
    val assets = Multimodal.readBinaryAssets(spark, root, "image")
    assert(assets.count() === 2)
    assert(assets.schema("content").dataType.typeName === "binary")
    val feats = Multimodal.extractImageFeatures(assets, dim = 8)
    val rows = feats.select("asset_id", "width", "feature").collect()
    assert(rows.length === 2)
    assert(rows.forall(_.getAs[Seq[Float]]("feature").size == 8))
    // deterministic: same bytes → same stub feature
    val again = Multimodal.extractImageFeatures(assets, dim = 8)
      .select("asset_id", "feature").collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    rows.foreach(r => assert(again(r.getLong(0)) === r.getSeq[Float](2)))
  }

  test("coarse single-file scans repartition up to minPartitions") {
    // binaryFile is not splittable: ONE file scans as one task, so the
    // per-row decode batteries downstream would run single-core on a
    // 1000-executor cluster. The guard fans the rows back out.
    val root = Files.createTempDirectory("graft-coarse").toString
    Files.write(Paths.get(s"$root/one.bin"), Array.fill[Byte](4096)(7))
    val coarse = Multimodal.readBinaryAssets(spark, root, "image",
      minPartitions = 0) // opt out: the scan's own partitioning
    assert(coarse.rdd.getNumPartitions === 1)
    val fanned = Multimodal.readBinaryAssets(spark, root, "image",
      minPartitions = 8)
    assert(fanned.rdd.getNumPartitions === 8)
    assert(fanned.count() === 1)
    // default: the session's parallelism
    val auto = Multimodal.readBinaryAssets(spark, root, "image")
    assert(auto.rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism)
  }
}
