package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Dev tool: dump `.explain("formatted")` for a comma-separated list of
  * SparkEntry queries (prefix match, like Bench's BENCH_ONLY) to
  * `<outDir>/<query>.txt` — the plan evidence the optimization rounds
  * commit under plans/. Usage:
  *   runMain graft.PlanDump <sfDir> <outDir> <q1,q2,...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, list) = args
    val wanted = list.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-plandump"),
      shufflePartitions = cpus.toIntOption.getOrElse(32)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    (SparkEntry.queries ++ SparkEntry.benchOnlyQueries).toSeq.sortBy(_._1)
      .filter { case (name, _) => wanted.exists(name.startsWith) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.write(Paths.get(outDir, s"$name.txt"),
            plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          println(s"[plandump] wrote $name")
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
