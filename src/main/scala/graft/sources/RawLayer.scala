package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}

/** Raw-layer sources and sinks.
  *
  * The raw landing convention (reference: extract_data.py:693-698,
  * utils/extract_data_v2/load/formatters/parquet_formatter.py:16-50) is
  * snappy Parquet with **every column stringified** — schema-blind at raw,
  * schema-on-write at stage (SURVEY §1.2).
  */
object RawLayer {

  /** S4 raw Parquet scan with existence pre-check
    * (light_transform.py:1706-1784). Returns None when the partition dir is
    * absent — the empty-table path (K8).
    */
  def readRaw(spark: SparkSession, path: String): Option[DataFrame] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    // a dir that exists but holds no readable parquet (an extract that
    // died mid-write leaving only _temporary, or swept data files) is
    // EMPTY input, not a permanent failure — schema inference throws
    // AnalysisException there, and the K8 typed-empty path must apply
    try Some(spark.read.parquet(path))
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getMessage != null &&
            e.getMessage.toLowerCase.contains("unable to infer schema") =>
        None
    }
  }

  /** K2 stringified Parquet write: cast all columns to string first. */
  def writeRawStringified(df: DataFrame, path: String): Unit =
    stringify(df).write.mode(SaveMode.Overwrite)
      .option("compression", "snappy").parquet(path)

  /** All-columns-to-string projection (parquet_formatter.py:33-34). */
  def stringify(df: DataFrame): DataFrame =
    df.select(df.columns.map(c => col(c).cast(StringType).alias(c)).toIndexedSeq: _*)

  /** K1 plain snappy Parquet write. */
  def writeRaw(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("compression", "snappy").parquet(path)

  /** K3 CSV write (load/formatters/csv_formatter.py:16-50). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** JSONL write (one JSON object per line) — the interchange format
    * training stacks consume and crawl dumps arrive in. `gzip=true`
    * compresses per-file (splittable-enough at shard granularity since
    * each partition is its own .gz).
    */
  def writeJsonl(df: DataFrame, path: String, gzip: Boolean = false): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (gzip) w.option("compression", "gzip") else w).json(path)
  }

  /** JSONL read with a REQUIRED schema: Spark's schema inference is a
    * full extra pass over the files — never acceptable at corpus scale,
    * so this API makes the caller state the schema. Malformed lines land
    * as nulls (PERMISSIVE) rather than failing a 100 TB job on one bad
    * record; pass `strict=true` to FAILFAST instead.
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType,
      strict: Boolean = false): DataFrame =
    spark.read.schema(schema)
      .option("mode", if (strict) "FAILFAST" else "PERMISSIVE")
      .json(path)

  /** K7 target cleanup before a full re-extract
    * (extract_data_spark.py:362-375).
    */
  def deletePrefix(spark: SparkSession, path: String): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }

  /** S5 config CSV scan via Spark (`;`-delimited latin-1 with header —
    * light_transform.py:585-617). The plain-Scala loader in
    * [[graft.config.ConfigLoader]] is preferred for driver-side metadata;
    * this reader exists for config files that live on cluster storage.
    */
  def readConfigCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("delimiter", ";")
      .option("encoding", "ISO-8859-1")
      .option("header", "true")
      .csv(path)

  /** K8 typed empty DataFrame from column metadata
    * (light_transform.py:1444-1462, 1805-1813) — the engine must be able to
    * materialize a schema with zero data.
    */
  def emptyTyped(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

  def schemaFor(columns: Seq[(String, org.apache.spark.sql.types.DataType)]): StructType =
    StructType(columns.map { case (n, t) => StructField(n, t, nullable = true) })
}
