package graft

import org.apache.spark.sql.functions._

/** The bench's own instrumentation contract (r6 verdict items 2 and 6):
  * task failures must be attributed to the query that caused them, and
  * every pass must carry a host-load sample.
  */
class BenchSpec extends SparkSpec {

  test("task failures are attributed to the flaky query, not its neighbors") {
    val listener = new TaskFailureListener
    spark.sparkContext.addSparkListener(listener)
    try {
      // a clean query inside a drained window: zero failures attributed
      val (okSecs, okFailed, okLoad) = Bench.measure(spark, listener) {
        spark.range(1000L).agg(sum(col("id"))).count(): Unit
      }
      assert(okSecs >= 0.0)
      assert(okFailed == 0L, s"clean query charged $okFailed task failures")
      assert(okLoad > 0.0, "loadavg sample missing on this platform")

      // the deliberately flaky query: raise_error fails its task (and in
      // local mode, with spark.task.maxFailures=1, the job) — measure
      // must record the -1.0 sentinel AND charge the failure to THIS
      // window
      // (a bare raise_error PROJECTION would be column-pruned under
      // count(); the assert_true filter is load-bearing for the count)
      val (badSecs, badFailed, _) = Bench.measure(spark, listener) {
        spark.range(10L).filter(assert_true(col("id") < 5L).isNull)
          .count(): Unit
      }
      assert(badSecs == -1.0, "a throwing query must record the sentinel")
      assert(badFailed >= 1L, "the flaky query's task failure went unattributed")

      // and the window AFTER the flaky one is clean again — no failure
      // bleed-through from undrained listener events
      val (_, afterFailed, _) = Bench.measure(spark, listener) {
        spark.range(1000L).agg(sum(col("id"))).count(): Unit
      }
      assert(afterFailed == 0L,
        s"flaky query's failures bled into the next window: $afterFailed")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("loadAvg1m reads a plausible host load") {
    val l = Bench.loadAvg1m()
    assert(l >= 0.0 && l < 10000.0, s"loadavg $l")
  }
}
