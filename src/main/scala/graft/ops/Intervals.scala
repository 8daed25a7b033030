package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval algebra over event-derived time ranges: merge overlapping
  * intervals into maximal islands and measure per-key coverage — the
  * "how much wall-clock was this user actually active?" class of
  * question (ad exposure, device uptime, session coverage) that naive
  * sum-of-durations double-counts whenever intervals overlap.
  *
  * Formulation: per key, sort intervals by (start, end); a row opens a
  * NEW island iff its start exceeds the running maximum end of all
  * predecessors; the island ordinal is the running sum of those flags;
  * the merged interval per island is (min start, max end). All three
  * windows and the final island aggregation share ONE key-partitioned
  * exchange (the aggregation's (key, island) grouping is co-located
  * under the key partitioning), so the whole merge is a single shuffle
  * — the sessionization-core discipline (Sessionize.scala) applied to
  * the interval domain. Touching intervals merge (half-open semantics:
  * start == predecessor end is no gap).
  */
object Intervals {

  /** Merged maximal islands: one row per (key, island) with
    * [start, end) bounds and the member-interval count.
    */
  def merge(iv: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(startCol), col(endCol))
    val runMax = max(col(endCol)).over(w.rowsBetween(Window.unboundedPreceding, -1))
    iv
      .withColumn("__new", (col(startCol) > coalesce(runMax,
        lit(Long.MinValue))).cast("long"))
      .withColumn("island", sum(col("__new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("island"))
      .agg(min(col(startCol)).as("start_us"), max(col(endCol)).as("end_us"),
        count(lit(1)).as("n_merged"))
  }

  /** Per-key coverage: total length of the UNION of the key's
    * intervals, plus the island count — [[merge]] rolled up one level
    * (the rollup adds no exchange: it groups by the key the islands are
    * already partitioned on).
    */
  def coverage(iv: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame =
    merge(iv, keyCol, startCol, endCol)
      .groupBy(col(keyCol))
      .agg(sum(col("end_us") - col("start_us")).as("covered_us"),
        count(lit(1)).as("n_islands"))
}
