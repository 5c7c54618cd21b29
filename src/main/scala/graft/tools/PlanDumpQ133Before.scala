package graft.tools
import org.apache.spark.sql.functions._
/** Dev scratch: reconstructs q133's PRE-r18 expression shape (separate
  * audioEnvelopeHash + mp3Samples evaluations, i.e. two full decodes per
  * MP3 row) over the same fixtures, to dump the before-plan the fused
  * Mp3DecodeStats kernel replaced. Kept for the r18 plan evidence.
  */
object PlanDumpQ133Before {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outFile) = args
    val spark = graft.GraftSession.local()
    val M = graft.llmops.Multimodal
    val src = graft.SparkEntry.mp3TwinFixturesDF(spark, sfDir)
    val h = src
      .withColumn("eh", M.audioEnvelopeHash(col("content")))
      .withColumn("ms", M.mp3Samples(col("content")))
      .withColumn("av", M.avMeta(col("content")))
      .withColumn("durok",
        abs(col("av.duration_ms") -
          (col("ms.mp3_frames").cast("long") * 1152L * 1000L / 44100L)) <= 30)
    val df = h.groupBy(col("doc_id")).agg(
        max(when(col("fmt") === "wav", col("eh"))).as("wh"),
        max(when(col("fmt") === "mp3", col("eh"))).as("mh"),
        max(when(col("fmt") === "mp3", col("ms.n_frames"))).as("n_dec"),
        max(when(col("fmt") === "mp3", col("ms.mp3_frames"))).as("mp3_frames"),
        max(when(col("fmt") === "mp3", col("durok"))).as("dur_ok"))
      .select(col("doc_id"),
        shiftrightunsigned(col("wh"), 32).as("hash_hi"),
        col("wh").bitwiseAND(lit(0xFFFFFFFFL)).as("hash_lo"),
        when(col("wh").isNotNull && col("mh").isNotNull,
          bit_count(col("wh").bitwiseXOR(col("mh"))).cast("long"))
          .as("hamming"),
        col("n_dec"), col("mp3_frames"), col("dur_ok"))
      .orderBy("doc_id")
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
