package graft.expressions

import graft.SparkTestBase
import graft.llmops.{DedupOps, TextAnalysis}
import org.apache.spark.sql.functions._

/** The native text-hash kernels must be bit-identical to the built-in
  * compositions they replace — that equivalence is what lets the operators
  * swap in the single-pass expressions without changing any result.
  */
class TextHashesSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    .select("doc_id", "text")

  test("native SimHash64 equals the HOF simhash64 composition") {
    val mismatches = docs
      .withColumn("native", DedupOps.simhash64Native(col("text")))
      .withColumn("hof", DedupOps.simhash64(col("text")))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(mismatches === 0)
  }

  test("native SimHash64 equals the former explode+groupBy sign-sum form") {
    val bitSums = (0 until 64).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1, lit(1L))
        .otherwise(lit(-1L))).alias(s"c$b"))
    val simCol = (0 until 64).map(b =>
      when(col(s"c$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce((a, c) => a.bitwiseOR(c))
    val legacy = docs
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).alias("t"))
      .select(col("doc_id"), xxhash64(col("t")).alias("h"))
      .groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), simCol.alias("legacy"))
    val joined = docs
      .select(col("doc_id"), DedupOps.simhash64Native(col("text")).alias("native"))
      .join(legacy, "doc_id")
    assert(joined.filter(col("native") =!= col("legacy")).count() === 0)
    assert(joined.count() > 0)
  }

  test("portable SimHash64 token hash matches conv(substr(md5,1,15),16,10)") {
    // one-token texts: the signature majority of a single token is the
    // token hash's own bits, so sim == md5-prefix hash for bits 0..59
    val one = Seq("alpha", "bravo charlie".replace(" ", ""), "x").toDF("text")
    val checked = one
      .withColumn("sim", DedupOps.simhash64Native(col("text"), portable = true))
      .withColumn("expected",
        conv(substring(md5(col("text")), 1, 15), 16, 10).cast("long"))
      .filter(col("sim") =!= col("expected"))
    assert(checked.count() === 0)
  }

  test("native MinHashSig equals min(xxhash64(shingle, seed)) over explode") {
    val n = 3; val numHashes = 16
    val hashAggs = (0 until numHashes).map(i =>
      min(xxhash64(col("s"), lit(i))).alias(s"h$i"))
    val legacy = docs
      .select(col("doc_id"), DedupOps.wordShingles(col("text"), n).alias("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), explode(col("sh")).alias("s"))
      .groupBy("doc_id").agg(hashAggs.head, hashAggs.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"h$i")): _*).alias("legacy"))
    val joined = docs
      .select(col("doc_id"),
        DedupOps.minhashSigNative(col("text"), n, numHashes).alias("native"))
      .filter(size(col("native")) > 0)
      .join(legacy, "doc_id")
    assert(joined.filter(col("native") =!= col("legacy")).count() === 0)
    assert(joined.count() > 0)
    // docs with <n tokens yield an empty signature on both paths
    val emptyNative = Seq("only two", "one", "").toDF("text")
      .select(DedupOps.minhashSigNative(col("text"), n, numHashes).alias("sig"))
    assert(emptyNative.filter(size(col("sig")) > 0).count() === 0)
  }

  test("empty and whitespace-edge texts tokenize like split(' ')") {
    // "" → [""], "a  b" → ["a","","b"], trailing space keeps empty token
    val edge = Seq("", "a  b", "a b ", " a").toDF("text")
    val m = edge
      .withColumn("native", DedupOps.simhash64Native(col("text")))
      .withColumn("hof", DedupOps.simhash64(col("text")))
      .filter(col("native") =!= col("hof"))
    assert(m.count() === 0)
  }

  test("native LshBuckets equals the posexplode+groupBy projection-sum form") {
    import graft.llmops.Similarity
    val numPlanes = 12; val numTables = 4
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // legacy composition: explode dims, 48 projection sums, repack bits
    val projSums = (0 until numTables).flatMap { tb =>
      (0 until numPlanes).map { p =>
        sum(col("x").cast("double") *
          Similarity.planeSign(tb * numPlanes + p, col("d"))).alias(s"pr_${tb}_$p")
      }
    }
    val legacy = emb
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "x")))
      .groupBy("vec_id").agg(projSums.head, projSums.tail: _*)
      .select(col("vec_id") +: (0 until numTables).map { tb =>
        (0 until numPlanes).map { p =>
          when(col(s"pr_${tb}_$p") > 0, lit(1L << p)).otherwise(lit(0L))
        }.reduce((a, b) => a.bitwiseOR(b)).alias(s"b$tb")
      }: _*)
    val native = emb.select(col("vec_id"),
      Similarity.lshBucketsNative(col("embedding"), numPlanes, numTables)
        .alias("bk"))
      .select(col("vec_id") +:
        (0 until numTables).map(tb => element_at(col("bk"), tb + 1).alias(s"n$tb")): _*)
    val joined = native.join(legacy, "vec_id")
    val mismatch = (0 until numTables)
      .map(tb => col(s"n$tb") =!= col(s"b$tb"))
      .reduce(_ || _)
    assert(joined.filter(mismatch).count() === 0)
    assert(joined.count() > 0)
  }

  test("LshBuckets: null vector elements match the Column form (all-zero buckets)") {
    import graft.llmops.Similarity
    // Column form: a null element nulls the projection -> every bit 0;
    // the kernel must not unbox null to 0.0 and emit real bucket ids
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, Seq[java.lang.Double](1.0, null, 3.0)),
        org.apache.spark.sql.Row(2L, Seq[java.lang.Double](1.0, 2.0, 3.0))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType, containsNull = true)))))
    val nativeB = df.select(col("vec_id"),
      Similarity.lshBucketsNative(col("embedding"), 12, 2).alias("bk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val columnB = df.select(col("vec_id"),
      Similarity.lshBucket(col("embedding"), 12).alias("b0"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nativeB(1L).forall(_ == 0L), "null element => all-zero buckets")
    assert(columnB(1L) === 0L, "Column form agrees")
    assert(nativeB(2L).head === columnB(2L), "clean vectors still agree")
    assert(nativeB(2L).head !== 0L)
  }

  test("planeSign matches pmod semantics past the Long-overflow plane index") {
    import graft.llmops.Similarity
    // global plane index >= ~3475 overflows x*2654435761 into negative
    // Longs, where Scala % and Spark pmod diverge — the kernel must stay
    // bit-identical to the SQL-replayable Column form everywhere
    val dims = Seq(0, 1, 7, 63)
    val planes = Seq(0, 100, 3474, 3475, 4000, 4095, 100000)
    val rows = for (p <- planes; d <- dims) yield (p, d)
    val got = rows.map { case (p, d) =>
      graft.expressions.LshBuckets.planeSign(p, d) }
    val sqlGot = spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(
        rows.map { case (p, d) => org.apache.spark.sql.Row(p, d) }).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("p",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("d",
          org.apache.spark.sql.types.IntegerType))))
    // evaluate each (p, d) pair through the Column form on its own row
    val fromSql = rows.map { case (p, d) =>
      sqlGot.filter(col("p") === p && col("d") === d)
        .select(Similarity.planeSign(p, col("d"))).head().getDouble(0)
    }
    assert(got === fromSql, s"kernel/Column divergence: $got vs $fromSql")
  }

  test("n-gram kernels refuse non-positive lengths at construction") {
    import graft.expressions.{CharNGrams, MinHashSig, WordNGrams}
    val c = org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString("a b c"),
      org.apache.spark.sql.types.StringType)
    intercept[IllegalArgumentException] { WordNGrams(c, 0, distinct = false) }
    intercept[IllegalArgumentException] { CharNGrams(c, 0) }
    intercept[IllegalArgumentException] { MinHashSig(c, 0, 16) }
    intercept[IllegalArgumentException] { MinHashSig(c, 3, 0) }
    intercept[IllegalArgumentException] {
      graft.expressions.TokenInSetCount(c, Seq("a\nb")) }
    intercept[IllegalArgumentException] {
      graft.expressions.UnicodeNorm(c, "NFX") }
  }

  test("native CosineSim equals the HOF cosine composition") {
    import graft.llmops.Similarity
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val pairs = emb.alias("a").join(emb.alias("b"),
        col("a.vec_id") < col("b.vec_id") && col("b.vec_id") < 50)
      .select(col("a.embedding").alias("va"), col("b.embedding").alias("vb"))
    val m = pairs
      .withColumn("native", Similarity.cosine(col("va"), col("vb")))
      .withColumn("hof", Similarity.cosineHof(col("va"), col("vb")))
      .filter(col("native") =!= col("hof"))
    assert(m.count() === 0)
  }

  test("native WordNGrams equals the HOF shingle composition") {
    import graft.llmops.DedupOps
    val m = docs
      .withColumn("native", DedupOps.wordShingles(col("text"), 3))
      .withColumn("hof", DedupOps.wordShinglesHof(col("text"), 3))
      .filter(col("native") =!= col("hof"))
    assert(m.count() === 0)
    // whitespace edges: empty tokens participate in grams; <n tokens → empty
    val edge = Seq("a  b c", "a b", "", "x y z w").toDF("text")
    val e = edge
      .withColumn("native", DedupOps.wordShingles(col("text"), 3))
      .withColumn("hof", DedupOps.wordShinglesHof(col("text"), 3))
      .filter(col("native") =!= col("hof"))
    assert(e.count() === 0)
  }

  test("native CharNGrams equals the HOF char-shingle composition") {
    import graft.llmops.DedupOps
    val m = docs
      .withColumn("native", DedupOps.shingles(col("text"), 5))
      .withColumn("hof", DedupOps.shinglesHof(col("text"), 5))
      .filter(col("native") =!= col("hof"))
    assert(m.count() === 0)
    val edge = Seq("  MiXeD   Case  ", "ab", "", "abcde").toDF("text")
      .withColumn("native", DedupOps.shingles(col("text"), 5))
      .withColumn("hof", DedupOps.shinglesHof(col("text"), 5))
      .filter(col("native") =!= col("hof"))
    assert(edge.count() === 0)
  }

  test("native TokenInSetCount equals the HOF stopword-hit composition") {
    import graft.llmops.TextAnalysis
    val words = TextAnalysis.Stopwords("en")
    val m = docs
      .withColumn("native", TextAnalysis.stopwordHits(col("text"), words))
      .withColumn("hof", TextAnalysis.stopwordHitsHof(col("text"), words))
      .filter(col("native") =!= col("hof"))
    assert(m.count() === 0)
    // occurrences, not distinct hits
    val r = Seq("the the a x").toDF("text")
      .select(TextAnalysis.stopwordHits(col("text"), words)).collect().head.getInt(0)
    assert(r === 3)
  }

  test("portable winnow fingerprints match the md5-prefix window-min model") {
    // tiny doc, k=3, w=2: recompute expected fingerprints in Scala with
    // the same md5-prefix hash and rightmost-tie window minimum
    val text = "the cat sat"
    val norm = text.toLowerCase
    val k = 3; val w = 2
    val n = norm.length - k + 1
    val hs = (0 until n).map(i => TextHashKernels.md5Prefix60(norm.substring(i, i + k)))
    val picks = (0 to n - w).map { t =>
      // rightmost index attaining the window min
      (t until t + w).minBy(j => (hs(j), -j))
    }.distinct
    val expected = picks.map(hs).distinct.sorted
    val got = Seq(text).toDF("text")
      .select(explode(DedupOps.winnowFingerprints(col("text"), k, w,
        portable = true)).alias("fp"))
      .select("fp").as[Long].collect().distinct.sorted
    assert(got.toSeq === expected)
  }
}
