package graft

import org.apache.spark.sql.functions._

import graft.ops.{Sessionize, SessionizeArrays}

/** Re-expression of the reference's unit-test semantics
  * (SessionizationBuiltInTest.scala t1–t4, FIXTURES.md §A) on (user_id,
  * ts, event_id) fixtures, plus equivalence and property checks.
  */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def fixture(rows: (Long, String, Long)*) =
    rows.toSeq.toDF("user_id", "ts_s", "event_id")
      .withColumn("ts", to_timestamp($"ts_s"))
      .drop("ts_s")

  // t1 — gap rule: 31-min gap splits, ≤30-min keeps; per user.
  test("t1: 30-minute gap rule splits sessions per user") {
    val df = fixture(
      (1L, "2019-10-01 10:00:00", 1L), (1L, "2019-10-01 10:10:00", 2L),
      (1L, "2019-10-01 10:41:00", 3L), (1L, "2019-10-01 10:50:00", 4L),
      (2L, "2019-10-01 10:00:00", 5L), (2L, "2019-10-01 10:20:00", 6L),
      (2L, "2019-10-01 10:55:00", 7L))
    val out = Sessionize.withSessionNo(df)
      .select($"user_id", $"event_id", $"session_no")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((1L, 1L)) == out((1L, 2L)))          // 10-min gap keeps
    assert(out((1L, 2L)) != out((1L, 3L)))          // 31-min gap splits
    assert(out((1L, 3L)) == out((1L, 4L)))
    assert(out((2L, 5L)) == out((2L, 6L)))
    assert(out((2L, 6L)) != out((2L, 7L)))          // 35-min gap splits
  }

  test("t1b: gap of exactly 1800s continues the session (strict >)") {
    val df = fixture(
      (1L, "2019-10-01 10:00:00", 1L), (1L, "2019-10-01 10:30:00", 2L),
      (1L, "2019-10-01 11:00:01", 3L))  // 1801s after event 2
    val out = Sessionize.withSessionNo(df)
      .select($"event_id", $"session_no")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == out(2L))   // exactly 30:00 → same session
    assert(out(2L) != out(3L))   // 30:01 → split
  }

  // t2 — out-of-order input sessionizes by event time, not input order.
  test("t1c: session_window boundary agrees with the gap rule at exactly 1800s") {
    // Pins the boundary semantics the session_window_agg oracle relies
    // on: an event at exactly the previous window's end MERGES (Spark's
    // merge condition is inclusive), matching the reference's strict
    // `time_diff > 1800` rule; one second later it splits.
    val atBoundary = fixture(
      (1L, "2019-10-01 10:00:00", 1L), (1L, "2019-10-01 10:30:00", 2L))
    assert(Sessionize.withSessionNo(atBoundary)
      .select(countDistinct($"session_no")).head.getLong(0) == 1)
    assert(atBoundary.groupBy($"user_id", session_window($"ts", "30 minutes"))
      .count().count() == 1)
    val pastBoundary = fixture(
      (1L, "2019-10-01 10:00:00", 1L), (1L, "2019-10-01 10:30:01", 2L))
    assert(Sessionize.withSessionNo(pastBoundary)
      .select(countDistinct($"session_no")).head.getLong(0) == 2)
    assert(pastBoundary.groupBy($"user_id", session_window($"ts", "30 minutes"))
      .count().count() == 2)
  }

  test("t2: input order does not matter") {
    val ordered = fixture(
      (1L, "2019-10-01 10:00:00", 1L), (1L, "2019-10-01 10:15:00", 2L),
      (1L, "2019-10-01 10:55:00", 3L))
    val shuffled = fixture(
      (1L, "2019-10-01 10:00:00", 1L), (1L, "2019-10-01 10:55:00", 3L),
      (1L, "2019-10-01 10:15:00", 2L))
    val a = Sessionize.withSessionId(ordered)
      .select("event_id", "session_id").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b = Sessionize.withSessionId(shuffled)
      .select("event_id", "session_id").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b)
    assert(a.map(_._2).size == 2) // 40-min gap between events 2 and 3
  }

  // t3 — cross-batch carry: active carried id kept, expired re-minted.
  test("t3: carried session ids survive for active sessions only") {
    val boundaryUs = java.time.Instant.parse("2019-10-01T10:00:00Z").toEpochMilli * 1000L
    val prev = Seq(
      (1L, "2019-10-01 09:35:00", 10L, "sessionExpired"), // 31 min before first hour-10 event
      (2L, "2019-10-01 09:45:00", 11L, "session2"))       // 25 min before → active
      .toDF("user_id", "ts_s", "event_id", "session_id")
      .withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")
    val cur = fixture(
      (1L, "2019-10-01 10:06:00", 20L),
      (2L, "2019-10-01 10:10:00", 21L))
      .withColumn("session_id", lit(null).cast("string"))
    val unioned = prev.unionByName(cur)
    val out = Sessionize.withCarriedSessionId(unioned)
      .select($"event_id", $"session_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(21L) == "session2")      // within 25 min → carried id kept
    assert(out(20L) != "sessionExpired") // 31-min gap → new sha2 id minted
    assert(out(20L).length == 64)
  }

  // t4 — active-session state load: stale dropped, latest row per session.
  test("t4: activeLatestPerSession keeps only the latest row of live sessions") {
    val boundaryUs = java.time.Instant.parse("2019-10-01T01:00:00Z").toEpochMilli * 1000L
    val sessions = Seq(
      (1L, "2019-10-01 00:29:00", 1L, "stale"),   // 31 min before boundary
      (2L, "2019-10-01 00:40:00", 2L, "live1"),
      (2L, "2019-10-01 00:45:00", 3L, "live1"),   // same session, later row
      (3L, "2019-10-01 00:50:00", 4L, "live2"),
      (4L, "2019-10-01 00:30:00", 5L, "edge"))    // exactly −30:00 → kept (>=)
      .toDF("user_id", "ts_s", "event_id", "session_id")
      .withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")
    val out = Sessionize.activeLatestPerSession(sessions, boundaryUs)
      .select($"session_id", $"event_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("live1" -> 3L, "live2" -> 4L, "edge" -> 5L))
  }

  test("reference-exact last(ignoreNulls) forward fill equals running-sum formulation") {
    // The reference propagates session ids with last(_, ignoreNulls=true)
    // over ROWS UNBOUNDED PRECEDING (SBI:104–108, W4). Our core uses the
    // boundary running sum; this pins their equivalence on real data.
    val ev = Tables.events(spark, Sf0001)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    val seeded = ev
      .withColumn("gap", unix_micros($"ts") - lag(unix_micros($"ts"), 1).over(w))
      .withColumn("seed",
        when($"gap".isNull || $"gap" > 1800000000L,
          sha2(concat_ws("-", $"user_id", unix_micros($"ts")), 256)))
      .withColumn("sid", last($"seed", ignoreNulls = true)
        .over(w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    val viaLast = seeded.select("event_id", "sid")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaCore = graft.ops.Sessionize.withSessionId(ev)
      .select("event_id", "session_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaLast == viaCore)
  }

  test("window path and HOF/array path agree on real data") {
    val ev = Tables.events(spark, Sf0001)
    val a = Sessionize.withSessionNo(ev)
      .select("event_id", "session_no").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = SessionizeArrays.sessionNumbers(ev)
      .select("event_id", "session_no").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("properties: within-session gaps <= 1800s, session starts > 1800s, ids non-null") {
    val ev = Tables.events(spark, Sf0001)
    val s = Sessionize.withSessionId(ev).cache()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val gaps = s.withColumn("gap", unix_micros($"ts") - lag(unix_micros($"ts"), 1).over(w))
      .withColumn("same", $"session_no" === lag($"session_no", 1).over(w))
    assert(gaps.filter($"same" && $"gap" > 1800000000L).count() == 0)
    assert(gaps.filter(!$"same" && $"gap" <= 1800000000L).count() == 0)
    assert(s.filter($"session_id".isNull).count() == 0)
    assert(s.count() == ev.count())                      // row preservation
    assert(s.select("session_id").distinct().count() ==
      s.select("user_id", "session_no").distinct().count()) // id uniqueness
    s.unpersist()
  }

  test("windowFunnel: latest-start dominance, window violations, ties, order") {
    import org.apache.spark.sql.functions.timestamp_micros
    def ev(rows: (String, Long, String, Long)*) =
      rows.toDF("user_id", "tus", "event_type", "event_id")
        .select($"user_id", timestamp_micros($"tus" * 1000000L).as("ts"),
          $"event_type", $"event_id")
    val W = 3600L
    val df = ev(
      // A: clean chain inside the hour → 3
      ("a", 0L, "view", 1L), ("a", 100L, "click", 2L), ("a", 3599L, "purchase", 3L),
      // B: the DOMINANCE case — the early view would put the purchase
      // outside the window (6500 − 0 > 3600); the LATER view at 3000
      // rescues the chain (6500 − 3000 ≤ 3600). A first-occurrence
      // analysis reports 2; the correct answer is 3.
      ("b", 0L, "view", 1L), ("b", 3000L, "view", 2L),
      ("b", 3500L, "click", 3L), ("b", 6500L, "purchase", 4L),
      // C: purchase outside the window of every chain start → 2
      ("c", 0L, "view", 1L), ("c", 100L, "click", 2L), ("c", 4000L, "purchase", 3L),
      // D: click BEFORE the only view never chains → 1
      ("d", 0L, "click", 1L), ("d", 10L, "view", 2L),
      // E: no funnel steps at all → 0
      ("e", 0L, "error", 1L),
      // F: same-timestamp steps chain through the tie order
      // (event_id) — t₂ = t₁ is a valid chain → 2
      ("f", 50L, "view", 1L), ("f", 50L, "click", 2L))
    val got = graft.ops.Sessionize.windowFunnel(
        df, Seq("view", "click", "purchase"), W)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 3L, "b" -> 3L, "c" -> 2L, "d" -> 1L,
      "e" -> 0L, "f" -> 2L))
    // intermediate steps must ALSO sit inside the window of the start:
    // view@0, click@5000 (outside), purchase@5100 → stage 1, even
    // though purchase − click is tiny
    val late = graft.ops.Sessionize.windowFunnel(
        ev(("g", 0L, "view", 1L), ("g", 5000L, "click", 2L),
          ("g", 5100L, "purchase", 3L)),
        Seq("view", "click", "purchase"), W)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(late === Map("g" -> 1L))
    // repeated step names refuse loudly
    intercept[IllegalArgumentException] {
      graft.ops.Sessionize.windowFunnel(df, Seq("view", "view"), W)
    }
  }
}
