package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed table layout — the storage-side half of the 100 TB join story.
  *
  * A table bucketed (and optionally sorted) on its join/aggregation keys
  * lets Catalyst plan joins and aggregations between co-bucketed tables
  * with ZERO shuffle: each task zips bucket i of both sides. For the
  * reference's recurring equi-joins on stage tables (stage MERGE keys,
  * dimension joins) this converts the dominant exchange at scale into a
  * local merge — the plain-parquet equivalent of Delta's Z-order + bucket
  * pruning advice. Buckets also prune point lookups on the bucket key.
  *
  * Bucketed layouts require the table catalog (bucket metadata lives there,
  * not in parquet footers), so these write `saveAsTable` managed/external
  * tables — the same catalog [[graft.catalog.CatalogSync]] registers stage
  * tables into.
  */
object Bucketing {

  /** Write `df` as a bucketed (+sorted) table. `numBuckets` sizes the
    * parallelism of future bucket-local joins: pick ≈ table size /
    * target-partition-size, and keep it IDENTICAL across tables that join
    * together — co-bucketed joins need equal bucket counts.
    */
  def saveBucketed(
      df: DataFrame,
      tableName: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Nil,
      path: Option[String] = None
  ): Unit = {
    require(bucketCols.nonEmpty, "bucketing requires at least one column")
    val base = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    val sorted =
      if (sortCols.nonEmpty) base.sortBy(sortCols.head, sortCols.tail: _*)
      else base
    val located = path.fold(sorted)(p => sorted.option("path", p))
    located.saveAsTable(tableName)
  }
}
