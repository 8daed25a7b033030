package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dimensional-modeling operators — the warehouse side of a training-data
  * platform (provenance/metadata dimensions change over time; joins
  * against them must be reproducible as-of any snapshot).
  */
object Dimensions {

  /** Build a type-2 slowly-changing-dimension history from a change log:
    * one row per RUN of equal attribute value per key, with
    * [valid_from, valid_to) interval bounds — valid_to is null on the
    * open (current) row. Consecutive log rows with an unchanged
    * attribute collapse into the run's first row (the standard
    * SCD2-from-CDC condense); a key returning to an earlier value opens
    * a NEW interval (A→B→A is three rows, not two).
    *
    * Determinism: ordering is (tsCol, tieCol) with a unique tie column,
    * so equal-timestamp changes produce a stable history (possibly
    * zero-length intervals — the honest representation of two changes
    * recorded at one timestamp).
    *
    * NULL attribute values are first-class: a key's first row is
    * detected by row_number (NOT by the lag being null — a real CDC log
    * can carry null attributes), and change detection is the null-safe
    * `<=>` negation, so a transition TO null opens an interval, a
    * transition FROM null opens an interval, and consecutive nulls
    * collapse into one run like any other equal values.
    *
    * Scale posture: one shuffle on the key — the change-filter lag, the
    * first-row rank, the run lead, and all three windows share the same
    * (key) partitioning and (ts, tie) sort, so Catalyst plans a single
    * Exchange + Sort for the whole chain. No join, no driver state.
    */
  def scd2(log: DataFrame, keyCol: String, attrCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    log
      .withColumn("__rn", row_number().over(w))
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .filter(col("__rn") === 1 || !(col("__prev") <=> col(attrCol)))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .select(col(keyCol), col(attrCol), col("valid_from"), col("valid_to"))
  }

  /** Point-in-time read of an SCD2 table ([[scd2]] output): each key's
    * attribute value valid AT `tsUs` — the snapshot join that makes
    * feature/metadata lookups reproducible (train/serve skew guard:
    * reading today's dimension for yesterday's facts silently leaks the
    * future). Interval semantics are half-open [from, to); keys whose
    * history starts after `tsUs` are absent. A pure partition-local
    * filter over the (already small) dimension — no shuffle at all
    * beyond what built the history.
    */
  def snapshotAt(history: DataFrame, tsUs: Long,
      validFromCol: String = "valid_from",
      validToCol: String = "valid_to"): DataFrame =
    history.filter(col(validFromCol) <= tsUs &&
        (col(validToCol).isNull || col(validToCol) > tsUs))
      .drop(validFromCol, validToCol)
}
