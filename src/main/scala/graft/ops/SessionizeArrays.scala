package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Array/higher-order-function sessionization — covers the operator
  * surface of the reference's deprecated first-cut implementation
  * (SessionizationUdf.scala:46–108: groupBy + collect_list(struct) +
  * array_sort + zip_with + explode), re-expressed WITHOUT the Scala
  * closure UDF (SessionizationUdf.scala:58–74): the per-user sequential
  * fold becomes Catalyst HOFs (transform/aggregate/zip_with).
  *
  * Session numbering is a single O(n) fold per user: one `aggregate`
  * builds the running-sum array of the boundary flags (acc = struct of
  * total so far + sums list), then `zip_with` pairs it back onto the
  * sorted events. Per-step `concat` still copies the accumulator list
  * (HOF lambdas are interpreted, Spark has no in-place scan), but that
  * is a flat memcpy of longs — the earlier per-i aggregate(slice(...))
  * re-ran an interpreted fold for EVERY prefix, quadratic in per-user
  * event count and the slowest query in the whole bench. The window
  * formulation in [[Sessionize]] remains the production path — the
  * reference itself deprecated the array path for it
  * (SessionizationUdf.scala:10–13) — but the engine keeps both because
  * the aggregation/nested-array/generator surface (SURVEY.md §2 A1,
  * F10–F15) must exist.
  */
object SessionizeArrays {

  /** Returns (user, event_id, session_no) computed entirely via the
    * collect_list → HOF → explode path. Equivalent to
    * [[Sessionize.withSessionNo]] output projected to these columns.
    */
  def sessionNumbers(
      df: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      idCol: String = "event_id",
      gapSec: Long = Sessionize.DefaultGapSec): DataFrame = {
    val gapUs = gapSec * 1000000L
    val grouped = df
      .select(col(userCol), struct(col(tsCol).as("ts"), col(idCol).as("event_id")).as("ev"))
      .groupBy(col(userCol))
      .agg(array_sort(collect_list(col("ev"))).as("evs"))

    val n = size(col("evs"))
    val ts = (i: org.apache.spark.sql.Column) =>
      unix_micros(element_at(col("evs"), i).getField("ts"))
    val flags = transform(sequence(lit(1), n), i =>
      when(i === 1 || ts(i) - ts(i - 1) > gapUs, 1L).otherwise(0L))

    grouped
      .withColumn("__flags", flags)
      // one pass: running sum of the flags, materialized as an array the
      // same length as evs; the finish lambda projects the sums list
      .withColumn("__sums", aggregate(
        col("__flags"),
        struct(lit(0L).as("s"), array().cast("array<long>").as("arr")),
        (acc, x) => struct((acc.getField("s") + x).as("s"),
          concat(acc.getField("arr"), array(acc.getField("s") + x)).as("arr")),
        acc => acc.getField("arr")))
      .withColumn("__labeled", zip_with(col("evs"), col("__sums"), (e, s) =>
        struct(e.getField("event_id").as("event_id"), s.as("session_no"))))
      .select(col(userCol), explode(col("__labeled")).as("e"))
      // star-expansion flattens the struct (reference P9, SUDF:103–107)
      .select(col(userCol), col("e.*"))
  }
}
