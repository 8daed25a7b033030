package graft

/** Frozen sf0.01 goldens for the two rows-only sketch queries.
  *
  * `approx_distinct_parts` (HLL++) and `approx_percentiles`
  * (percentile_approx / Greenwald–Khanna) are the only two
  * SparkEntry.queries with no DuckDB oracle — the driver records a
  * rows-only check and SketchBounds red-tests their error bounds every
  * round. Bounds alone leave one hole: a Spark-upgrade drift INSIDE the
  * bounds window would pass silently. Both sketches are deterministic
  * for a fixed dataset (no randomness at execution; HLL++ hashes are
  * seed-fixed, GK merge order is plan-deterministic at a fixed
  * partition count), so we pin the exact sf0.01 values here.
  *
  * Gated on [[SparkSpec.isDriverTestdata]]: the numbers are properties
  * of the dev container's driver-generated dataset; CI's
  * tools/gen_testdata.py data is schema-compatible but value-different,
  * so there the test self-skips (bounds + oracle battery still run).
  *
  * If a Spark upgrade legitimately moves these (algorithm change), the
  * failure is the point — re-freeze consciously, citing the release
  * note, rather than let the drift ride in unseen.
  */
class SketchGoldenSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  private def rows(name: String): Seq[Row] = {
    val df = SparkEntry.queries(name)(spark, Sf001)
    df.collect().toSeq
  }

  test("approx_distinct_parts sf0.01 golden (HLL++ exact-value freeze)") {
    assume(isDriverTestdata, "golden values pin the driver dataset")
    assert(rows("approx_distinct_parts") === Seq(
      Row("A", 1947L, 20028L),
      Row("N", 1947L, 19926L),
      Row("R", 1947L, 20046L)))
  }

  test("approx_percentiles sf0.01 golden (GK sketch exact-value freeze)") {
    assume(isDriverTestdata, "golden values pin the driver dataset")
    assert(rows("approx_percentiles") === Seq(
      Row("A", 52832.76, 99754.65, 103922.45, 20028L),
      Row("N", 53042.23, 99525.17, 104001.38, 19926L),
      Row("R", 53219.57, 99860.51, 103912.57, 20046L)))
  }
}
