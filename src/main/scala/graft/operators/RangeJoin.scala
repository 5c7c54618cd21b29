package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Bucketized point-in-interval join — the scale-safe form of
  * `p BETWEEN start AND end`.
  *
  * A naive range predicate gives Catalyst no equi-key, so the plan
  * degenerates to BroadcastNestedLoopJoin (or a cartesian product) — the
  * classic footgun that works at a demo SF and melts at 100 TB. Binning
  * restores a hash-partitionable key: points land in bin
  * `floor(p / binWidth)`, each interval is exploded to every bin it
  * overlaps, and the join is a plain equi-join on (keys…, bin) followed by
  * the exact BETWEEN filter. Each (point, interval) pair meets in exactly
  * one bin — the point's — so no dedup pass is needed.
  *
  * Cost model: interval rows replicate by `ceil(len / binWidth) + 1`, so
  * pick `binWidth` near the typical interval length — one knob, bounded
  * blowup, shuffle on narrow keys. AQE handles residual bin skew like any
  * other keyed join.
  */
object RangeJoin {

  /** Inner join of points to every interval containing them
    * (`start ≤ p ≤ end`, inclusive both ends), equi-matched on `keys` when
    * given. Output carries all point columns plus the interval columns.
    * Interval columns must not collide with point columns (alias first).
    */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      keys: Seq[String] = Nil,
      binWidth: Long = 3600L
  ): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def bin(c: Column): Column = floor(c / binWidth).cast("long")

    val p = points.withColumn("__bin", bin(col(pointCol)))
    val iv = intervals
      .withColumn("__bin",
        explode(sequence(bin(col(startCol)), bin(col(endCol)))))

    p.join(iv, keys :+ "__bin")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }
}
