package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view refresh
  * path. A warehouse keeps a per-key aggregate table; each load merges
  * the PARTIAL aggregate of the new batch into it instead of rescanning
  * the fact table. Correct for any algebraic accumulator set: counts
  * and sums merge by SUM, mins by MIN, maxes by MAX; non-mergeable
  * statistics (avg, ratios) are derived AFTER the merge from merged
  * accumulators.
  *
  * Scale shape: the refresh touches |base agg| + |delta| rows — at
  * 100 TB the fact table is never rescanned, and the merge aggregate is
  * partial+final (map-side combine collapses each side's keys before
  * the exchange). Refresh composes: merging batches one at a time
  * equals merging their union, equals the full recompute (the
  * PipelineSpec law).
  */
object Incremental {

  /** One batch's (or the base table's) partial aggregate. `sums` are
    * summed, `mins` min'd, `maxs` max'd; a `n_rows` count accumulator
    * is always added (count merges as a sum).
    */
  def partialAggregate(df: DataFrame, keys: Seq[String], sums: Seq[String],
      mins: Seq[String], maxs: Seq[String]): DataFrame = {
    val aggs: Seq[Column] =
      (count(lit(1)).as("n_rows") +:
        (sums.map(c => sum(col(c)).as(s"sum_$c")) ++
          mins.map(c => min(col(c)).as(s"min_$c")) ++
          maxs.map(c => max(col(c)).as(s"max_$c"))))
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge an existing aggregate with a delta's partial aggregate
    * (both in [[partialAggregate]]'s column layout). Keys present in
    * only one side pass through unchanged — unionByName + one
    * aggregate, no join.
    */
  def mergeAggregates(baseAgg: DataFrame, deltaAgg: DataFrame,
      keys: Seq[String], sums: Seq[String], mins: Seq[String],
      maxs: Seq[String]): DataFrame = {
    val u = baseAgg.unionByName(deltaAgg)
    val aggs: Seq[Column] =
      (sum(col("n_rows")).as("n_rows") +:
        (sums.map(c => sum(col(s"sum_$c")).as(s"sum_$c")) ++
          mins.map(c => min(col(s"min_$c")).as(s"min_$c")) ++
          maxs.map(c => max(col(s"max_$c")).as(s"max_$c"))))
    u.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
