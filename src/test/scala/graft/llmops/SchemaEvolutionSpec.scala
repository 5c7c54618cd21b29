package graft.llmops

import graft.SparkTestBase
import java.nio.file.Files
import org.apache.spark.sql.Row

/** Schema evolution across container shards: lakes accumulate files
  * written months apart — later shards add columns. `mergeSchemas =
  * true` unions fields by name in first-appearance order, fills NULL
  * where a shard lacks a field, and refuses same-name/different-type
  * (evolution merges names, never types). Default stays the strict
  * identical-schema contract.
  */
class SchemaEvolutionSpec extends SparkTestBase {

  test("avro: added column fills NULL in old shards; strict mode refuses") {
    val dir = Files.createTempDirectory("graft-evo-avro").toString
    val v1 = """{"type":"record","name":"D","fields":[
      {"name":"doc_id","type":"long"},{"name":"text","type":"string"}]}"""
    val v2 = """{"type":"record","name":"D","fields":[
      {"name":"doc_id","type":"long"},{"name":"text","type":"string"},
      {"name":"lang","type":["null","string"]}]}"""
    Files.write(java.nio.file.Paths.get(s"$dir/a.avro"),
      AvroWriter.write(v1, (0 until 30).map(i => Row(i.toLong, s"t$i"))))
    Files.write(java.nio.file.Paths.get(s"$dir/b.avro"),
      AvroWriter.write(v2, (30 until 60).map(i =>
        Row(i.toLong, s"t$i", if (i % 5 == 0) null else s"l$i"))))
    intercept[IllegalArgumentException] {
      Avro.readAvroFiles(spark, dir)
    }
    val df = Avro.readAvroFiles(spark, dir, mergeSchemas = true)
    assert(df.schema.fieldNames.toSeq ==
      Seq("path", "doc_id", "text", "lang"))
    val rows = df.collect().sortBy(_.getLong(1))
    assert(rows.length == 60)
    rows.foreach { r =>
      val i = r.getLong(1).toInt
      assert(r.getString(2) == s"t$i")
      if (i < 30 || i % 5 == 0) assert(r.isNullAt(3))
      else assert(r.getString(3) == s"l$i")
    }
    // same name, different type: refuse loudly
    Files.write(java.nio.file.Paths.get(s"$dir/c.avro"),
      AvroWriter.write(
        """{"type":"record","name":"D","fields":[
           {"name":"doc_id","type":"long"},{"name":"text","type":"long"}]}""",
        Seq(Row(99L, 7L))))
    val e = intercept[IllegalArgumentException] {
      Avro.readAvroFiles(spark, dir, mergeSchemas = true)
    }
    assert(e.getMessage.contains("never types"))
  }

  test("orc: evolution merge, column subset, prune on an absent column") {
    val ss = spark
    import ss.implicits._
    val dir = Files.createTempDirectory("graft-evo-orc").toString
    // v1 shard via the twin writer; v2 shard (adds score) via Spark
    val v1 = (0 until 40).map(i => (i.toLong, s"t$i")).toDF(
      "doc_id", "text")
    val aOut = new java.io.FileOutputStream(s"$dir/a.orc")
    val aW = new OrcWriter.Streamer(v1.schema, aOut)
    aW.append(v1.collect().toIndexedSeq); aW.finish(); aOut.close()
    (40 until 80).map(i => (i.toLong, s"t$i", i * 1.5))
      .toDF("doc_id", "text", "score").coalesce(1)
      .write.mode("overwrite").orc(s"$dir/v2")
    val v2orc = new java.io.File(s"$dir/v2").listFiles()
      .filter(_.getName.endsWith(".orc")).head
    java.nio.file.Files.move(v2orc.toPath,
      java.nio.file.Paths.get(s"$dir/b.orc"))
    intercept[IllegalArgumentException] { Orc.readOrcFiles(spark, s"$dir/*.orc") }
    val df = Orc.readOrcFiles(spark, s"$dir/*.orc", mergeSchemas = true)
    assert(df.schema.fieldNames.toSeq ==
      Seq("path", "doc_id", "text", "score"))
    val rows = df.collect().sortBy(_.getLong(1))
    assert(rows.length == 80)
    rows.foreach { r =>
      val i = r.getLong(1).toInt
      assert(r.getString(2) == s"t$i")
      if (i < 40) assert(r.isNullAt(3)) else assert(r.getDouble(3) == i * 1.5)
    }
    // column subset including an evolved column
    val sub = Orc.readOrcFiles(spark, s"$dir/*.orc",
      columns = Seq("doc_id", "score"), mergeSchemas = true)
    assert(sub.schema.fieldNames.toSeq == Seq("path", "doc_id", "score"))
    assert(sub.count() == 80)
    // pruneBy on a column absent from the v1 shard: stats prove
    // nothing there, so v1 rows all survive; v2 prunes normally
    val pruned = Orc.readOrcFiles(spark, s"$dir/*.orc",
      pruneBy = Some(("doc_id", 0L, 10L)), mergeSchemas = true)
    assert(pruned.count() >= 11) // at least the matching v1 rows
  }

  test("arrow: evolution merge incl. a view column present in one shard") {
    import Arrow._
    val dir = Files.createTempDirectory("graft-evo-arrow").toString
    val f1 = Vector(
      AField("id", nullable = false, AInt(64)),
      AField("text", nullable = true, AString(large = false)))
    val f2 = f1 :+ AField("lang", nullable = true, AView(binary = false))
    Files.write(java.nio.file.Paths.get(s"$dir/a.arrow"),
      ArrowWriter.write(f1, (0 until 25).map(i => Row(i.toLong, s"t$i"))))
    Files.write(java.nio.file.Paths.get(s"$dir/b.arrow"),
      ArrowWriter.write(f2, (25 until 50).map(i =>
        Row(i.toLong, s"t$i", s"language-tag-$i"))))
    intercept[IllegalArgumentException] {
      Arrow.readArrowFiles(spark, dir)
    }
    val df = Arrow.readArrowFiles(spark, dir, mergeSchemas = true)
    assert(df.schema.fieldNames.toSeq == Seq("path", "id", "text", "lang"))
    val rows = df.collect().sortBy(_.getLong(1))
    assert(rows.length == 50)
    rows.foreach { r =>
      val i = r.getLong(1).toInt
      assert(r.getString(2) == s"t$i")
      if (i < 25) assert(r.isNullAt(3))
      else assert(r.getString(3) == s"language-tag-$i")
    }
    // selecting only the evolved column still aligns both shards
    val only = Arrow.readArrowFiles(spark, dir, columns = Seq("lang"),
      mergeSchemas = true)
    assert(only.collect().count(!_.isNullAt(1)) == 25)
  }
}
