package graft.tools
import org.apache.spark.sql.functions._
/** Dev scratch: attribute q96's seconds to its sub-expressions. */
object ProfileQ96 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.queryExecution.toRdd.count() // warm
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      println(f"[q96] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val chunked = regexp_replace(col("text"), "((?:\\S+ ){9}\\S+) ", "$1\n")
    val dotted = concat(regexp_replace(chunked, "\n", ".\n"), lit("."))
    val built = d.select(col("doc_id"), concat(dotted,
        when(col("doc_id") % 3 === 0, lit("\ntiny line.")).otherwise(lit("")))
      .as("text"))
    t("built (regex fixture)")(built)
    val T = graft.llmops.TextAnalysis
    t("c4CleanLines only")(T.c4CleanLines(built, "text"))
    def grams(n: Int) = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.WordNGrams(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(col("text")),
        n, distinct = false))
    val withArrays = built
      .withColumn("__words", filter(split(col("text"), " "), w => length(w) > 0))
      .withColumn("__sw", array_sort(col("__words")))
      .withColumn("__g2s", array_sort(grams(2)))
      .withColumn("__g5s", array_sort(grams(5)))
    t("arrays (split+sorts+grams)")(withArrays)
    val maxRun =
      """aggregate(__sw,
         named_struct('p', '', 'r', 0L, 'b', 0L),
         (s, x) -> named_struct('p', x,
           'r', IF(x = s.p, s.r + 1L, 1L),
           'b', GREATEST(s.b, IF(x = s.p, s.r + 1L, 1L))),
         s -> s.b)"""
    val topGram =
      """aggregate(__g2s,
         named_struct('p', '', 'r', 0L, 'bg', CAST(NULL AS STRING), 'bc', 0L),
         (s, x) -> named_struct('p', x,
           'r', IF(x = s.p, s.r + 1L, 1L),
           'bg', IF(IF(x = s.p, s.r + 1L, 1L) > s.bc, x, s.bg),
           'bc', GREATEST(s.bc, IF(x = s.p, s.r + 1L, 1L))),
         s -> named_struct('bg', s.bg, 'bc', s.bc))"""
    val dupChars =
      """aggregate(__g5s,
         named_struct('p', '', 'r', 0L, 'a', 0L),
         (s, x) -> named_struct('p', x,
           'r', IF(x = s.p, s.r + 1L, 1L),
           'a', s.a + IF(x = s.p, 0L,
             IF(s.r > 1L, s.r * length(s.p), 0L))),
         s -> s.a + IF(s.r > 1L, s.r * length(s.p), 0L))"""
    t("arrays + 3 folds")(withArrays
      .withColumn("a", expr(maxRun))
      .withColumn("b", expr(topGram))
      .withColumn("c", expr(dupChars)))
    val lmSrc = built.filter(col("doc_id") < 250).select(col("text"))
    t("full curationSignals")(T.curationSignals(built, "doc_id", "text",
      T.charNgramCounts(lmSrc, "text", 3), T.charNgramCounts(lmSrc, "text", 2)))
    spark.stop()
  }
}
