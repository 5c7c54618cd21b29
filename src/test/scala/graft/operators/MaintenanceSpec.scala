package graft.operators

import graft.SparkTestBase
import graft.config.EndpointConfig
import graft.extract.LoadPlanner
import graft.llmops.VectorStore
import org.apache.spark.sql.functions._

import java.nio.file.Files
import java.sql.DriverManager

class MaintenanceSpec extends SparkTestBase {
  import spark.implicits._

  test("zvalue2 interleaves bits; zorderWrite beats a linear sort at box pruning") {
    // bit-exact interleave goldens: (a=0b101, b=0b011) → z = 0b011011...
    // z bits: a at even positions, b at odd → a=5,b=3: 1(a0)+2(b0)+0(a1)+8(b1)+16(a2)+0(b2)=27
    val g = Seq((5L, 3L, 27L), (0L, 0L, 0L), (255L, 0L, 0x5555L),
      (0L, 255L, 0xAAAAL), (255L, 255L, 0xFFFFL))
    val gdf = g.map(t => (t._1, t._2)).toDF("a", "b")
      .select(Maintenance.zvalue2(col("a"), col("b"), bits = 8).as("z"))
      .as[Long].collect().toSeq
    assert(gdf === g.map(_._3))

    // a 64×64 grid of (a, b): z-order clusters files into compact
    // rectangles, so a box predicate on the SECOND column prunes files
    // a linear sort on the first column cannot
    val rows = for (a <- 0 until 64; b <- 0 until 64) yield (a.toLong, b.toLong)
    val df = rows.toDF("a", "b")
    val root = Files.createTempDirectory("graft-zorder").toString
    Maintenance.zorderWrite(spark, df, s"$root/z", "a", "b",
      bits = 6, numFiles = 16)
    df.repartitionByRange(16, col("a")).sortWithinPartitions("a")
      .write.parquet(s"$root/lin")
    def filesOverlapping(path: String, colName: String, lo: Long, hi: Long): Long =
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min(col(colName)).as("mn"), max(col(colName)).as("mx"))
        .filter(col("mn") <= hi && col("mx") >= lo)
        .count()
    val zFiles = filesOverlapping(s"$root/z", "b", 10, 13)
    val linFiles = filesOverlapping(s"$root/lin", "b", 10, 13)
    // the linear layout scatters every b-value into every file; z-order
    // confines a 4-wide b-band to a minority of files
    assert(linFiles === 16L, s"baseline should not prune b (got $linFiles)")
    assert(zFiles <= 8L, s"z-order should prune most files on b (got $zFiles)")
    // and the rewrite is lossless
    assert(spark.read.parquet(s"$root/z").count() === rows.length.toLong)
    // empty input degrades to an empty table, not a crash
    Maintenance.zorderWrite(spark, df.filter(col("a") < 0), s"$root/empty",
      "a", "b")
    assert(spark.read.parquet(s"$root/empty").count() === 0L)
  }

  test("zvalueN: n-way interleave goldens; 3-D write prunes on every axis") {
    // golden: n=3, bits=2 — a=0b11, b=0b01, c=0b10:
    // pos 0..5 = a0,b0,c0,a1,b1,c1 = 1,1,0,1,0,1 → 0b101011 = 43
    val g3 = Seq((3L, 1L, 2L)).toDF("a", "b", "c")
      .select(Maintenance.zvalueN(
        Seq(col("a"), col("b"), col("c")), bits = 2).as("z"))
      .as[Long].head()
    assert(g3 === 43L)
    // n=2 delegation reproduces zvalue2 bit-for-bit
    val pairs = Seq((5L, 3L), (255L, 0L), (123L, 201L))
    val viaN = pairs.toDF("a", "b")
      .select(Maintenance.zvalueN(Seq(col("a"), col("b")), bits = 8).as("z"))
      .as[Long].collect().toSeq
    val via2 = pairs.toDF("a", "b")
      .select(Maintenance.zvalue2(col("a"), col("b"), bits = 8).as("z"))
      .as[Long].collect().toSeq
    assert(viaN === via2)
    // 64-bit budget refusal
    intercept[IllegalArgumentException] {
      Maintenance.zvalueN(Seq(col("a"), col("b"), col("c")), bits = 22)
    }

    // a 16×16×16 cube: a 3-D clustered layout confines a narrow band on
    // EACH axis — including the last — to a minority of files, which a
    // linear sort on the first column cannot do
    val rows = for (a <- 0 until 16; b <- 0 until 16; c <- 0 until 16)
      yield (a.toLong, b.toLong, c.toLong)
    val df = rows.toDF("a", "b", "c")
    val root = Files.createTempDirectory("graft-zorder3").toString
    Maintenance.zorderWriteN(spark, df, s"$root/z", Seq("a", "b", "c"),
      bits = 4, numFiles = 16)
    df.repartitionByRange(16, col("a")).sortWithinPartitions("a")
      .write.parquet(s"$root/lin")
    def filesOverlapping(path: String, colName: String, lo: Long, hi: Long): Long =
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min(col(colName)).as("mn"), max(col(colName)).as("mx"))
        .filter(col("mn") <= hi && col("mx") >= lo)
        .count()
    for (axis <- Seq("b", "c")) {
      val zF = filesOverlapping(s"$root/z", axis, 4, 7)
      val linF = filesOverlapping(s"$root/lin", axis, 4, 7)
      assert(linF === 16L, s"baseline should not prune $axis (got $linF)")
      assert(zF <= 10L, s"3-D z-order should prune on $axis (got $zF)")
    }
    assert(spark.read.parquet(s"$root/z").count() === rows.length.toLong)
  }

  test("zorderBucket stays integer-exact past the 53-bit double envelope") {
    // span ≈ 2^45 (dividend ≈ 2^61): double division would round;
    // IntegralDivide must agree with BigInt floor division bit-for-bit
    val minV = 0L
    val maxV = (1L << 45) - 1
    val bits = 16
    val vs = Seq(0L, 1L, (1L << 44) + 12345L, maxV - 1, maxV,
      (1L << 43) + 1, 9876543219876L)
    val got = vs.toDF("v")
      .select(Maintenance.zorderBucket(col("v"), minV, maxV, bits).as("bk"))
      .as[Long].collect().toSeq
    val want = vs.map { v =>
      ((BigInt(v - minV) * (1L << bits)) / (BigInt(maxV) - minV + 1)).toLong
    }
    assert(got === want)
    assert(want.forall(b => b >= 0 && b < (1L << bits)))
    // a span whose dividend would wrap 64-bit math refuses loudly
    intercept[IllegalArgumentException] {
      Maintenance.zorderBucket(col("v"), 0L, Long.MaxValue - 1, bits)
    }
  }

  test("K6 compact rewrites many small files into few") {
    val root = Files.createTempDirectory("graft-compact").toString
    val path = s"$root/t"
    (1 to 1000).toDF("x").repartition(50).write.parquet(path)
    val before = new java.io.File(path).listFiles().count(_.getName.endsWith(".parquet"))
    assert(before >= 50)
    Maintenance.compact(spark, path)
    val after = new java.io.File(path).listFiles().count(_.getName.endsWith(".parquet"))
    assert(after <= 2)
    assert(spark.read.parquet(path).count() === 1000)
  }

  test("K6 compact preserves hive partition layout and shrinks per-dir files") {
    val root = Files.createTempDirectory("graft-compact-p").toString
    val path = s"$root/t"
    (1 to 1000).map(i => (i, s"p${i % 3}"))
      .toDF("x", "pt").repartition(40)
      .write.partitionBy("pt").parquet(path)
    val dirBefore = new java.io.File(s"$path/pt=p0")
    assert(dirBefore.listFiles().count(_.getName.endsWith(".parquet")) >= 30)
    Maintenance.compact(spark, path)
    // layout survives: same partition dirs, few files each
    (0 to 2).foreach { i =>
      val d = new java.io.File(s"$path/pt=p$i")
      assert(d.isDirectory, s"partition dir pt=p$i must survive compaction")
      assert(d.listFiles().count(_.getName.endsWith(".parquet")) <= 2)
    }
    val back = spark.read.parquet(path)
    assert(back.count() === 1000)
    assert(back.filter(col("pt") === "p0").count() === 333)
  }

  test("K6 compact preserves MULTI-LEVEL partition layout") {
    // first-level-only detection used to rewrite a=/b= tables with
    // partitionBy("a") alone, destroying the b level
    val root = Files.createTempDirectory("graft-compact-n").toString
    val path = s"$root/t"
    (1 to 600).map(i => (i, s"a${i % 2}", s"b${i % 3}"))
      .toDF("x", "pa", "pb").repartition(20)
      .write.partitionBy("pa", "pb").parquet(path)
    Maintenance.compact(spark, path)
    (0 to 1).foreach { a =>
      (0 to 2).foreach { b =>
        val d = new java.io.File(s"$path/pa=a$a/pb=b$b")
        assert(d.isDirectory, s"nested dir pa=a$a/pb=b$b must survive")
      }
    }
    val back = spark.read.parquet(path)
    assert(back.count() === 600)
    assert(back.filter(col("pa") === "a0" && col("pb") === "b0").count() === 100)
  }

  test("A4 fileStats covers nested partition-dir files") {
    val root = Files.createTempDirectory("graft-stats-p").toString
    val path = s"$root/t"
    (1 to 100).map(i => (i, s"p${i % 2}")).toDF("x", "pt")
      .repartition(1).write.partitionBy("pt").parquet(path)
    val stats = Maintenance.fileStats(spark, path).collect()
    assert(stats.length === 2) // one data file per partition dir
    assert(stats.forall(r => !r.isNullAt(r.fieldIndex("bytes"))),
      "recursive listing must supply sizes for nested files")
    assert(stats.map(_.getAs[Long]("rows")).sum === 100)
  }

  test("vacuum removes merge scratch dirs") {
    val root = Files.createTempDirectory("graft-vac").toString
    val path = s"$root/t"
    Seq(1).toDF("x").write.parquet(path)
    Seq(2).toDF("x").write.parquet(path + "__staging")
    Maintenance.vacuum(spark, path)
    assert(!new java.io.File(path + "__staging").exists())
    assert(new java.io.File(path).exists())
  }

  test("recover restores a table lost mid-swap") {
    val root = Files.createTempDirectory("graft-rec").toString
    val path = s"$root/t"
    // simulate: staging write completed, table renamed away, then crash
    (1 to 10).toDF("x").write.parquet(path + "__staging")
    (1 to 5).toDF("x").write.parquet(path + "__old")
    assert(Maintenance.recover(spark, path))
    assert(spark.read.parquet(path).count() === 10) // newer staging wins
    assert(!new java.io.File(path + "__old").exists())
    assert(!Maintenance.recover(spark, path)) // idempotent no-op after

    // upsert self-heals: a merge over the recovered table works
    MergeUpsert.upsertParquet(spark, Seq(99).toDF("x"), path, Seq("x"))
    assert(spark.read.parquet(path).count() === 11)
  }

  test("A4 fileStats reports per-file rows and bytes") {
    val root = Files.createTempDirectory("graft-stats").toString
    val path = s"$root/t"
    (1 to 100).toDF("x").repartition(4).write.parquet(path)
    val stats = Maintenance.fileStats(spark, path).collect()
    assert(stats.map(_.getAs[Long]("rows")).sum === 100)
    assert(stats.forall(_.getAs[Long]("bytes") > 0))
  }

  test("S3 fetchMinMax runs the planning aggregate source-side") {
    val conn = DriverManager.getConnection("jdbc:derby:memory:mmdb;create=true")
    val st = conn.createStatement()
    try st.execute("DROP TABLE APP.NUMS") catch { case _: Exception => () }
    st.execute("CREATE TABLE APP.NUMS (v INT)")
    st.execute("INSERT INTO APP.NUMS VALUES (0), (5), (17), (42)")
    st.close(); conn.close()
    val table = graft.config.TableConfig(
      stageTableName = "nums", sourceTable = "NUMS", sourceSchema = "APP",
      columns = "v", partitionColumn = "v")
    val ep = EndpointConfig("T", "derby", "0", "mmdb", "l", "app")
    // <> 0 guard excludes the zero row
    assert(LoadPlanner.fetchMinMax(spark, table, ep, "") === Some((5L, 42L)))
  }

  test("K9 vector store: upsert by id + exact and approximate top-k query") {
    val root = Files.createTempDirectory("graft-vs").toString
    val store = new VectorStore(spark, s"$root/vs")
    val v1 = Seq(
      (1L, Array(1.0f, 0.0f), "a"),
      (2L, Array(0.0f, 1.0f), "b")).toDF("vec_id", "embedding", "tag")
    store.upsert(v1)
    // upsert overwrites id=2, inserts id=3
    val v2 = Seq(
      (2L, Array(0.9f, 0.1f), "b2"),
      (3L, Array(1.0f, 0.1f), "c")).toDF("vec_id", "embedding", "tag")
    store.upsert(v2)
    val tbl = store.table().orderBy("vec_id").collect()
    assert(tbl.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(tbl(1).getString(2) === "b2")

    val q = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val exact = store.query(q, k = 2).orderBy("rank").collect()
    assert(exact.head.getLong(1) === 3L) // closest to (1,0) excluding self
    // metadata filter restricts the corpus
    val filtered = store.query(q, k = 2, filter = Some(col("tag") === "b2")).collect()
    assert(filtered.map(_.getLong(1)).toSeq === Seq(2L))
    // includeSelf: the literal Pinecone contract — a stored id queried
    // by itself returns at rank 1, cosine 1.0
    val self = store.query(q, k = 2, includeSelf = true).orderBy("rank").collect()
    assert(self.head.getLong(1) === 1L && self.head.getDouble(2) > 0.999)
    val selfLsh = store.query(q, k = 2, approximate = true,
      includeSelf = true).orderBy("rank").collect()
    assert(selfLsh.head.getLong(1) === 1L)
  }

  test("embedStub is deterministic and batch-shaped") {
    val df = Seq((1L, "hello"), (2L, "world")).toDF("id", "text")
    val e1 = VectorStore.embedStub(df, "text", dim = 8).select("embedding").collect()
    val e2 = VectorStore.embedStub(df, "text", dim = 8).select("embedding").collect()
    assert(e1.map(_.getSeq[Float](0)).toSeq === e2.map(_.getSeq[Float](0)).toSeq)
    assert(e1.head.getSeq[Float](0).size === 8)
  }


  test("bloomWrite plants parquet bloom filters that answer key probes") {
    val root = Files.createTempDirectory("graft-bloom").toString
    val df = spark.range(0, 20000)
      .select(col("id").as("k"), (col("id") % 97).as("v"))
    Maintenance.bloomWrite(df, s"$root/t", Seq("k"), ndv = 20000, numFiles = 2)

    // data survives the rewrite
    assert(spark.read.parquet(s"$root/t").count() == 20000)

    // footer-level proof: the k column chunk carries a bloom filter, v
    // does not; behavioral proof: the filter answers present-key probes
    // positively and rejects most absent keys
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    val files = new java.io.File(s"$root/t").listFiles
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    assert(files.nonEmpty)
    var present = 0; var presentHit = 0
    var absent = 0; var absentHit = 0
    files.foreach { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        r.getFooter.getBlocks.asScala.foreach { block =>
          val kCol = block.getColumns.asScala
            .find(_.getPath.toDotString == "k").get
          val vCol = block.getColumns.asScala
            .find(_.getPath.toDotString == "v").get
          assert(kCol.getBloomFilterOffset >= 0, "k must carry a bloom filter")
          assert(vCol.getBloomFilterOffset < 0, "v must not")
          val bf = r.getBloomFilterDataReader(block).readBloomFilter(kCol)
          assert(bf != null)
          val lo = kCol.getStatistics.genericGetMin.asInstanceOf[Long]
          val hi = kCol.getStatistics.genericGetMax.asInstanceOf[Long]
          (lo to hi by math.max(1L, (hi - lo) / 50)).foreach { key =>
            present += 1
            if (bf.findHash(bf.hash(key))) presentHit += 1
          }
          (1 to 200).foreach { i =>
            absent += 1
            if (bf.findHash(bf.hash(1000000L + i * 7919L))) absentHit += 1
          }
        }
      } finally r.close()
    }
    assert(presentHit == present, "bloom filters admit every present key")
    assert(absentHit * 10 < absent * 5,
      s"absent-key false positives out of control: $absentHit/$absent")
  }

  test("symlink manifest lists exactly the logged files; writes refresh it") {
    val dir = Files.createTempDirectory("graft-manifest").toString + "/t"
    val fs = new org.apache.hadoop.fs.Path("/tmp")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def manifestOf(sub: String): Seq[String] = {
      val p = java.nio.file.Paths.get(
        dir, Maintenance.SymlinkManifestDir, sub, "manifest")
      new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        .split("\n").filter(_.nonEmpty).toSeq
    }
    def loggedByDir(): Map[String, Seq[String]] = {
      val st = graft.sources.DeltaLog.replay(spark, dir).get
      val rootQ = fs.makeQualified(new org.apache.hadoop.fs.Path(dir))
      st.files.keys.toSeq.groupBy(rel =>
        rel.substring(0, math.max(0, rel.lastIndexOf('/'))))
        .map { case (d, fsq) => d -> fsq.sorted.map(rel =>
          new org.apache.hadoop.fs.Path(rootQ, rel).toUri.toString) }
    }
    MergeUpsert.upsertParquet(spark,
      Seq((1, "a", "p1"), (2, "b", "p2")).toDF("id", "v", "part"),
      dir, Seq("id"), partitionCols = Seq("part"))
    Maintenance.generateSymlinkManifest(spark, dir)
    // golden: per-partition manifest = exactly the logged data files
    var want = loggedByDir()
    assert(want.keySet === Set("part=p1", "part=p2"))
    want.foreach { case (d, uris) => assert(manifestOf(d) === uris, d) }
    // a MERGE into p2 refreshes p2's manifest (presence-based auto-update)
    val p2Before = manifestOf("part=p2")
    MergeUpsert.upsertParquet(spark,
      Seq((2, "B", "p2")).toDF("id", "v", "part"),
      dir, Seq("id"), partitionCols = Seq("part"))
    want = loggedByDir()
    assert(manifestOf("part=p2") !== p2Before)
    want.foreach { case (d, uris) => assert(manifestOf(d) === uris, d) }
    // OPTIMIZE rewrites every file; the manifest must follow
    Maintenance.compact(spark, dir)
    want = loggedByDir()
    want.foreach { case (d, uris) => assert(manifestOf(d) === uris, d) }
    // retention: tombstoned files stay on disk but NEVER enter the
    // manifest — external readers see only live files
    MergeUpsert.upsertParquet(spark,
      Seq((1, "A", "p1")).toDF("id", "v", "part"),
      dir, Seq("id"), partitionCols = Seq("part"), retain = true)
    val st = graft.sources.DeltaLog.replay(spark, dir).get
    assert(st.tombstones.nonEmpty)
    val all = (manifestOf("part=p1") ++ manifestOf("part=p2")).toSet
    assert(st.tombstones.keys.forall(rel => !all.exists(_.endsWith(rel))))
    want = loggedByDir()
    want.foreach { case (d, uris) => assert(manifestOf(d) === uris, d) }
    // the manifest itself never pollutes the log or a Spark scan
    assert(st.files.keys.forall(!_.contains(Maintenance.SymlinkManifestDir)))
    // unpartitioned tables: single top-level manifest
    val dir2 = Files.createTempDirectory("graft-manifest2").toString + "/t"
    MergeUpsert.upsertParquet(spark,
      Seq((1, "a")).toDF("id", "v"), dir2, Seq("id"))
    Maintenance.generateSymlinkManifest(spark, dir2)
    val top = java.nio.file.Paths.get(
      dir2, Maintenance.SymlinkManifestDir, "manifest")
    assert(java.nio.file.Files.exists(top))
    val st2 = graft.sources.DeltaLog.replay(spark, dir2).get
    val uris = new String(java.nio.file.Files.readAllBytes(top), "UTF-8")
      .split("\n").filter(_.nonEmpty).toSeq
    assert(uris.length === st2.files.size)
    // whole-table swap (unpartitioned MERGE) carries + refreshes it
    MergeUpsert.upsertParquet(spark,
      Seq((2, "b")).toDF("id", "v"), dir2, Seq("id"))
    val uris2 = new String(java.nio.file.Files.readAllBytes(top), "UTF-8")
      .split("\n").filter(_.nonEmpty).toSeq
    val st3 = graft.sources.DeltaLog.replay(spark, dir2).get
    assert(uris2.sorted === st3.files.keys.toSeq.sorted.map(rel =>
      new org.apache.hadoop.fs.Path(
        fs.makeQualified(new org.apache.hadoop.fs.Path(dir2)), rel)
        .toUri.toString))
  }

  test("manifest swap: a crash between the two renames is recoverable") {
    val dir = Files.createTempDirectory("graft-manifest-crash").toString + "/t"
    val fs = new org.apache.hadoop.fs.Path("/tmp")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    MergeUpsert.upsertParquet(spark,
      Seq((1, "a")).toDF("id", "v"), dir, Seq("id"))
    Maintenance.generateSymlinkManifest(spark, dir)
    val mroot = new org.apache.hadoop.fs.Path(dir,
      Maintenance.SymlinkManifestDir)
    val aside = new org.apache.hadoop.fs.Path(dir,
      Maintenance.SymlinkManifestAside)
    // simulate the crash window: old manifest parked aside, new never
    // renamed in — the table has NO mroot, only the aside
    assert(fs.rename(mroot, aside))
    assert(!fs.exists(mroot) && fs.exists(aside))
    // the aside still marks the table as manifest-maintaining, so a
    // recover() regenerates from the log and sweeps the aside — without
    // it, manifest maintenance would silently end here
    Maintenance.recover(spark, dir)
    assert(fs.exists(mroot), "recover regenerates the manifest")
    assert(!fs.exists(aside), "the aside leftover is swept")
    val top = java.nio.file.Paths.get(dir,
      Maintenance.SymlinkManifestDir, "manifest")
    val uris = new String(java.nio.file.Files.readAllBytes(top), "UTF-8")
      .split("\n").filter(_.nonEmpty).toSeq
    val st = graft.sources.DeltaLog.replay(spark, dir).get
    assert(uris.length === st.files.size)
    // same crash window, healed by the presence-based WRITE-path refresh
    assert(fs.rename(mroot, aside))
    MergeUpsert.upsertParquet(spark,
      Seq((2, "b")).toDF("id", "v"), dir, Seq("id"))
    assert(fs.exists(mroot) && !fs.exists(aside),
      "a write-path refresh also heals the torn swap")
  }
}
