package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory for the engine.
  *
  * Mirrors the reference's session configuration
  * (reference: artifacts/aws-glue/code/stage/light_transform.py:2009-2020):
  * AQE + skew handling on, Kryo serialization, LEGACY time-parser policy
  * (Visual-FoxPro-era date formats depend on it), and — critically for the
  * cast-to-null semantics of the `fn_transform_*` DSL — ANSI mode OFF
  * (Glue 4.0 = Spark 3.3 where ANSI was off by default; Spark 4 flipped it).
  *
  * Session timezone is UTC so results are engine-independent (the DuckDB
  * oracle runs in UTC); the reference's America/Lima anchoring only affects
  * ingest window *generation*, which takes the zone as a parameter
  * (see extract.DateWindows).
  */
object GraftSession {

  /** Standard engine configs, applied to any builder. */
  def configure(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.timeParserPolicy", "LEGACY")
      // nanosecond-precision parquet timestamps (e.g. the events table)
      // surface as LongType nanos instead of failing the scan
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.localShuffleReader.enabled", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.parquet.compression.codec", "snappy")
      .config("spark.ui.enabled", "false")

  /** Local session for tests / benchmarks. */
  def local(cores: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = configure(
      SparkSession.builder().master(s"local[$cores]").appName(appName),
      shufflePartitions = cores
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Apply the engine configs to an existing session (e.g. one the driver
    * created) so DSL cast/parse semantics hold regardless of who built it.
    * Only runtime-changeable SQL confs are set here.
    */
  def tune(spark: SparkSession, shufflePartitions: Int = 32): SparkSession = {
    val c = spark.conf
    c.set("spark.sql.shuffle.partitions", shufflePartitions.toString)
    c.set("spark.sql.session.timeZone", "UTC")
    c.set("spark.sql.ansi.enabled", "false")
    c.set("spark.sql.legacy.timeParserPolicy", "LEGACY")
    c.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    c.set("spark.sql.adaptive.enabled", "true")
    spark
  }
}
