package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted two-phase aggregation. When one group key
  * dominates (a bot user at 100 TB), a plain groupBy sends the whole hot
  * key to one reducer. Salting splits each key across `saltBuckets`
  * partial aggregates, then re-aggregates the partials — bounded reducer
  * fan-in at the cost of one extra (tiny) shuffle.
  *
  * AQE's skew-join handling covers JOINS automatically; this covers
  * aggregation skew, which AQE does not rebalance. The join half of
  * that claim is not taken on faith: ScaleSpec ("AQE splits a skewed
  * join partition at runtime") plants a 100×-skewed join key and
  * asserts the final adaptive plan actually carries the skew=true
  * split — the 100 TB insurance is regression-tested, not assumed.
  */
object Skew {

  /** Two-phase sum/count aggregation over `keys`, salted. Supported
    * mergeable aggregates: count / sum / min / max expressed by callers
    * via `partials` and `merged` — provided helpers below cover the
    * common case.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
      saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash((col(valueCol) +: keys.map(col)): _*), lit(saltBuckets)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__n")).as("n_rows"), sum(col("__s")).as("sum_value"))
  }

  /** Salted equi-join — the MANUAL hot-key join remedy for when AQE's
    * runtime skew split does not apply (it only rewrites sort-merge /
    * shuffled-hash joins whose output needs no particular partitioning;
    * a skewed join feeding a same-key aggregate, or a plan pinned by a
    * required distribution, keeps its hot partition). The fact side
    * salts each row into one of `salts` sub-keys (deterministically,
    * from `saltSrc`); the dim side replicates ×`salts` so every
    * (key, salt) pair finds its match. The hot key's rows then land in
    * `salts` shuffle partitions instead of one, at the cost of a
    * `salts`× larger dim shuffle — use for a SMALL-but-not-broadcastable
    * dim against a skewed fact.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      saltSrc: Column, salts: Int = 16): DataFrame = {
    require(salts > 0)
    val f = fact.withColumn("__salt", pmod(hash(saltSrc), lit(salts)))
    val d = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    f.join(d, keys :+ "__salt").drop("__salt")
  }
}
