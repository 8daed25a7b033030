package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Post-write validation checks, engine-side (reference runs these from
  * Airflow after each hour: sessionization_batch_test.py:39–87):
  * row-count parity between input and output partitions, and non-null
  * session ids. Single-action implementations (one aggregate each) so a
  * 100 TB check is one scan, not a collect.
  */
object DataQuality {

  /** (input rows, output rows, parity) — DAGT:59–60 invariant. */
  def rowCountParity(in: DataFrame, out: DataFrame): (Long, Long, Boolean) = {
    val a = in.count(); val b = out.count()
    (a, b, a == b)
  }

  /** Number of NULLs in a column — must be 0 for session_id
    * (DAGT:69–71 invariant).
    */
  def nullCount(df: DataFrame, column: String): Long =
    df.agg(sum(col(column).isNull.cast("long"))).head().getLong(0)

  /** Attach free validation metrics to a job's existing action via
    * `Dataset.observe`: row count and null count ride along with whatever
    * the pipeline already executes (e.g. the write), so the audit costs
    * ZERO extra scans — versus [[rowCountParity]]/[[nullCount]] which
    * each run their own aggregate. Read results from `obs.get` after any
    * action on the returned frame.
    */
  def observed(df: DataFrame, nullCheckCol: String): (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation()
    (df.observe(obs, count(lit(1)).as("n_rows"),
      sum(col(nullCheckCol).isNull.cast("long")).as("n_nulls")), obs)
  }
}
