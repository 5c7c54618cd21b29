package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Explicit skew mitigation for the cases AQE's runtime skew-join split
  * can't fix — e.g. a single pathological key in a shuffle aggregation, or
  * a broadcast-ineligible dimension joined on a power-law key.
  *
  * Standard salting construction: the skewed (fact) side gets a random-ish
  * but *deterministic* salt derived from the row, the small side is
  * replicated once per salt value, and the join key becomes (key, salt) —
  * spreading each hot key over `saltFactor` reducers.
  */
object Skew {

  private def saltCol(saltFactor: Int, deterministicFrom: Seq[Column]): Column =
    pmod(xxhash64(deterministicFrom: _*), lit(saltFactor)).cast("int")

  /** Salted inner/left join: `big` join `small` on equi-keys.
    * `small` is replicated saltFactor× (only viable when it is orders of
    * magnitude smaller — the same precondition as a broadcast).
    * `saltFrom` columns of `big` drive the deterministic salt; pass a
    * unique id (or all columns) for even spread.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltFrom: Seq[String],
      saltFactor: Int = 16,
      joinType: String = "inner"
  ): DataFrame = {
    // the construction replicates `small` saltFactor× — correct only for
    // join types that preserve NOTHING unmatched from the small side; a
    // right/full join would emit each unmatched small row once per replica
    val ok = Set("inner", "cross", "left", "leftouter", "left_outer",
      "leftsemi", "left_semi", "semi", "leftanti", "left_anti", "anti")
    require(ok.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin does not support joinType '$joinType': the replicated " +
        "small side would duplicate its unmatched rows saltFactor times; " +
        "use a plain join (with AQE skew handling) for right/full outer")
    val salted = big.withColumn("__salt",
      saltCol(saltFactor, saltFrom.map(col)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Two-phase salted aggregation: partial aggregate on (keys, salt), then
    * final aggregate on keys — caps any single reducer's input at
    * ~1/saltFactor of the hottest key. Aggregations must be decomposable
    * (sum/count/min/max: partial = final).
    */
  def saltedSumCount(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      saltFrom: Seq[String],
      saltFactor: Int = 16
  ): DataFrame = {
    val salted = df.withColumn("__salt", saltCol(saltFactor, saltFrom.map(col)))
    salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).alias("__psum"), count(lit(1)).alias("__pcnt"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).alias(s"sum_$valueCol"),
        sum(col("__pcnt")).alias("cnt"))
  }
}
