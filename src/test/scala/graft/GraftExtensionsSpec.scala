package graft

class GraftExtensionsSpec extends SparkTestBase {

  test("graft_* SQL functions register and evaluate") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT
        graft_clear_string(' None ') AS cleared,
        graft_clear_string(' x ', 'dflt') AS trimmed,
        graft_date_magic('739062', 'yyyy-MM-dd') AS magic_date,
        graft_datetime_magic('739062', '70000') AS magic_ts,
        graft_byte_magic('0x54') AS flag,
        graft_period_magic(3, 2025) AS period,
        graft_fingerprint('Hello  World') AS fp,
        graft_token_count('a b c') AS n,
        graft_lang_id('the cat sat of the mat') AS lang
      """).collect().head
    assert(row.isNullAt(0))
    assert(row.getString(1) === "x")
    assert(row.getDate(2).toString === "2024-06-25")
    assert(row.getTimestamp(3).toString === "2024-06-25 07:00:00.0")
    assert(row.getString(4) === "T")
    assert(row.getString(5) === "202503")
    assert(row.getString(6) ===
      java.security.MessageDigest.getInstance("MD5")
        .digest("hello world".getBytes("UTF-8")).map("%02x".format(_)).mkString)
    assert(row.getInt(7) === 3)
    assert(row.getString(8) === "en")
  }

  test("functions run against a table scan in SQL") {
    GraftFunctions.register(spark)
    spark.read.parquet(s"$sf0001/documents.parquet").createOrReplaceTempView("docs_ext")
    val n = spark.sql(
      "SELECT count(DISTINCT graft_fingerprint(text)) FROM docs_ext").collect().head.getLong(0)
    assert(n > 0)
    val simhash = spark.sql(
      "SELECT graft_simhash(text) FROM docs_ext LIMIT 1").collect().head.getLong(0)
    assert(simhash !== 0L)
  }

  test("native vector/text kernels are SQL-callable and agree with the Column API") {
    import org.apache.spark.sql.functions._
    GraftFunctions.register(spark)
    spark.read.parquet(s"$sf0001/documents.parquet").createOrReplaceTempView("docs_nk")
    spark.read.parquet(s"$sf0001/embeddings.parquet").createOrReplaceTempView("emb_nk")

    // simhash: SQL = native Column path
    val simMismatch = spark.sql(
      "SELECT doc_id, graft_simhash(text) AS s FROM docs_nk")
      .join(spark.read.parquet(s"$sf0001/documents.parquet")
        .select(col("doc_id"),
          graft.llmops.DedupOps.simhash64Native(col("text")).alias("c")), "doc_id")
      .filter(col("s") =!= col("c")).count()
    assert(simMismatch === 0)

    // minhash signature arity + buckets arity
    val sig = spark.sql(
      "SELECT graft_minhash_sig(text, 3, 16) AS sig FROM docs_nk LIMIT 1")
      .collect().head.getSeq[Long](0)
    assert(sig.length === 16)
    val buckets = spark.sql(
      "SELECT graft_lsh_buckets(embedding, 12, 4) AS b FROM emb_nk LIMIT 1")
      .collect().head.getSeq[Long](0)
    assert(buckets.length === 4)

    // cosine of a vector with itself ≈ 1
    val cos = spark.sql(
      "SELECT graft_cosine(embedding, embedding) AS c FROM emb_nk LIMIT 1")
      .collect().head.getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-9)

    // curation functions
    val row = spark.sql(
      """SELECT graft_word_ngrams('a b c d', '2') AS wg,
         graft_char_ngrams('AB CD', '2') AS cg,
         graft_scrub_pii('mail x@y.io now') AS pii,
         graft_dedup_lines('a\nb\na') AS dl""").collect().head
    assert(row.getSeq[String](0) === Seq("a b", "b c", "c d"))
    assert(row.getSeq[String](1) === Seq("ab", "b ", " c", "cd"))
    assert(row.getString(2) === "mail <EMAIL> now")
    assert(row.getString(3) === "a\nb")

    // URL curation functions
    val urlRow = spark.sql(
      """SELECT graft_url_host('HTTP://Ex.COM:80/a') AS h,
         graft_url_domain('http://a.b.ex.com/x') AS d,
         graft_url_normalize('HTTP://Ex.COM:80/a?utm_source=t&k=1#f') AS n""")
      .collect().head
    assert(urlRow.getString(0) === "ex.com")
    assert(urlRow.getString(1) === "ex.com")
    assert(urlRow.getString(2) === "http://ex.com/a?k=1")

    // document extraction: text path + unsupported-format NULL
    val doc = spark.sql(
      """SELECT graft_doc_extract(CAST('hi  there' AS BINARY), 'text/plain') AS t,
         graft_doc_extract(CAST('x' AS BINARY), 'application/pdf') AS p""").collect().head
    assert(doc.getString(0) === "hi there")
    assert(doc.isNullAt(1))

    // image header metadata
    spark.createDataFrame(Seq(Tuple1(graft.llmops.ImageWriter.gif(31, 17))))
      .toDF("content").createOrReplaceTempView("img_nk")
    val dims = spark.sql(
      "SELECT graft_image_dims(content) AS d FROM img_nk").collect().head
      .getStruct(0)
    assert((dims.getString(0), dims.getInt(1), dims.getInt(2)) === ("gif", 31, 17))
  }

  test("literal-argument validation raises a clear error") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_date_magic('739062', text) FROM (SELECT 'x' AS text)").collect()
    }
    assert(e.getMessage.contains("must be a string literal"))
  }
}
