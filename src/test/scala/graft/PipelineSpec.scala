package graft

import org.apache.spark.sql.functions._

import graft.ops.{Cdc, DataQuality, Diff, Dimensions, Entity, Intervals}

/** Unit tests for the pipeline-maintenance operators (Cdc / Diff /
  * DataQuality.runChecks / Entity) — fixture edge cases the sf-scale
  * oracles don't isolate: delete-vs-upsert precedence, the incremental
  * ≡ full-rebuild SCD2 invariant on adversarial logs (null attributes,
  * same-ts changes, run continuation across the batch boundary),
  * null↔value diff transitions, and per-check-type violation counts.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("applyChangelog: upsert replaces, delete removes, untouched keys pass through") {
    val snap = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "attr", "v")
    val changes = Seq(
      (1L, "a2", 11L, "U", 100L, 1L), // update key 1
      (2L, "xx", 0L, "D", 100L, 2L),  // delete key 2
      (4L, "d", 40L, "U", 100L, 3L))  // insert key 4
      .toDF("k", "attr", "v", "op", "ts", "tie")
    val out = Cdc.applyChangelog(snap, changes, Seq("k"), Seq("attr", "v"),
      "op", "ts", "tie").orderBy("k")
      .as[(Long, String, Long)].collect()
    assert(out.toSeq == Seq((1L, "a2", 11L), (3L, "c", 30L), (4L, "d", 40L)))
  }

  test("applyChangelog: latest change wins, ties broken by the tie column") {
    val snap = Seq((1L, "old", 0L)).toDF("k", "attr", "v")
    val changes = Seq(
      (1L, "mid", 1L, "U", 100L, 5L),
      (1L, "late", 2L, "U", 200L, 1L),  // latest ts wins over earlier tie
      (1L, "tie-lo", 3L, "U", 200L, 0L) // same ts: higher tie wins
    ).toDF("k", "attr", "v", "op", "ts", "tie")
    val out = Cdc.applyChangelog(snap, changes, Seq("k"), Seq("attr", "v"),
      "op", "ts", "tie").as[(Long, String, Long)].collect()
    assert(out.toSeq == Seq((1L, "late", 2L)))
  }

  test("applyChangelog: a delete then nothing leaves the key absent; delete of absent key is a no-op") {
    val snap = Seq((1L, "a")).toDF("k", "attr")
    val changes = Seq(
      (1L, "zz", "D", 10L, 1L),
      (9L, "zz", "D", 10L, 2L)) // delete of a key not in the snapshot
      .toDF("k", "attr", "op", "ts", "tie")
    val out = Cdc.applyChangelog(snap, changes, Seq("k"), Seq("attr"),
      "op", "ts", "tie").collect()
    assert(out.isEmpty)
  }

  private def scd2Cols = Seq("k", "attr", "valid_from", "valid_to")

  /** incremental merge at `boundary` ≡ full rebuild, on any log. */
  private def assertMergeEqualsRebuild(
      log: org.apache.spark.sql.DataFrame, boundary: Long): Unit = {
    val hist = Dimensions.scd2(log.filter(col("ts") < boundary), "k", "attr", "ts", "tie")
    val merged = Cdc.scd2Merge(hist, log.filter(col("ts") >= boundary),
        "k", "attr", "ts", "tie")
      .orderBy(scd2Cols.map(col): _*)
    val rebuilt = Dimensions.scd2(log, "k", "attr", "ts", "tie")
      .orderBy(scd2Cols.map(col): _*)
    assert(merged.collect().toSeq == rebuilt.collect().toSeq)
  }

  test("scd2Merge ≡ full rebuild: A→B→A, continuation, null attrs, new keys, same-ts changes") {
    val log = Seq(
      // key 1: A→B in prefix, B continues across the boundary (no new
      // interval), then back to A (reopen)
      (1L, Some("A"), 10L, 1L), (1L, Some("B"), 20L, 2L),
      (1L, Some("B"), 110L, 3L), (1L, Some("A"), 120L, 4L),
      // key 2: transition TO null across the boundary, consecutive
      // nulls collapse, then FROM null
      (2L, Some("x"), 10L, 5L), (2L, None, 105L, 6L),
      (2L, None, 110L, 7L), (2L, Some("y"), 120L, 8L),
      // key 3: batch-only (fresh history), with a same-ts pair resolved
      // by the tie (zero-length first interval)
      (3L, Some("p"), 100L, 9L), (3L, Some("q"), 100L, 10L),
      // key 4: prefix-only, untouched by the batch
      (4L, Some("z"), 50L, 11L))
      .toDF("k", "attr", "ts", "tie")
    assertMergeEqualsRebuild(log, 100L)
  }

  test("scd2Merge ≡ full rebuild on the orders log at several boundaries") {
    val log = Tables.orders(spark, Sf0001).select(
      $"o_custkey".as("k"), $"o_orderpriority".as("attr"),
      unix_micros($"o_orderdate".cast("timestamp")).as("ts"),
      $"o_orderkey".as("tie"))
    // quartile-ish boundaries of the date range, plus degenerate splits
    // (empty batch / empty history)
    for (b <- Seq(760000000000000L, 830000000000000L, Long.MinValue, Long.MaxValue))
      assertMergeEqualsRebuild(log, b)
  }

  test("tableDiff: classifies added/removed/changed, null↔value is a change, unchanged absent") {
    val a = Seq((1L, Some("x")), (2L, Some("y")), (3L, None), (4L, Some("s")))
      .toDF("k", "v")
    val b = Seq((1L, Some("x")), (2L, Some("y2")), (3L, Some("now")), (5L, Some("new")))
      .toDF("k", "v")
    val out = Diff.tableDiff(a, b, Seq("k"), Seq("v"))
      .select($"k", $"change").as[(Long, String)].collect().toMap
    assert(out == Map(2L -> "changed", 3L -> "changed", 4L -> "removed", 5L -> "added"))
  }

  test("columnDrift: reports per-column deltas") {
    val a = Seq((1L, Some("x")), (2L, Some("y"))).toDF("k", "v")
    val b = Seq((1L, Some("x")), (2L, None), (3L, Some("x"))).toDF("k", "v")
    val out = Diff.columnDrift(a, b, Seq("k", "v"))
      .select($"col_name", $"rows_delta", $"nulls_delta", $"distinct_delta")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("k") == ((1L, 0L, 1L)))
    assert(out("v") == ((1L, 1L, -1L)))
  }

  test("runChecks: per-type violation counts on a planted fixture") {
    val dim = Seq(10L, 20L).toDF("id")
    val df = Seq(
      (1L, Some(10L), "ok", 5L),
      (1L, Some(20L), "ok", 5L),   // duplicate key
      (2L, None, "ok", 5L),        // null FK (passes FK, fails not-null)
      (3L, Some(99L), "bad", -1L)) // dangling FK, bad status, bad range
      .toDF("k", "fk", "status", "v")
    val out = DataQuality.runChecks(df, Seq(
      DataQuality.NotNull("nn", "fk"),
      DataQuality.Unique("uq", Seq("k")),
      DataQuality.Satisfies("st", col("status") === "ok"),
      DataQuality.Satisfies("rng", col("v") > 0),
      DataQuality.RefIntegrity("fk", "fk", dim, "id")))
      .select($"check_name", $"n_violations", $"passed")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map(
      "nn" -> ((1L, 0L)), "uq" -> ((1L, 0L)), "st" -> ((1L, 0L)),
      "rng" -> ((1L, 0L)), "fk" -> ((1L, 0L))))
  }

  test("runChecks: clean table passes; empty/duplicate suites fail loudly") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val out = DataQuality.runChecks(df, Seq(
      DataQuality.NotNull("nn", "v"),
      DataQuality.Unique("uq", Seq("k"))))
      .select($"check_name", $"n_violations", $"passed")
      .as[(String, Long, Long)].collect().toSet
    assert(out == Set(("nn", 0L, 1L), ("uq", 0L, 1L)))
    intercept[IllegalArgumentException](DataQuality.runChecks(df, Nil))
    intercept[IllegalArgumentException](DataQuality.runChecks(df,
      Seq(DataQuality.NotNull("x", "k"), DataQuality.NotNull("x", "v"))))
  }

  test("runChecks: NULL predicate result counts as a violation, not a pass") {
    val df = Seq[(Long, Option[Long])]((1L, Some(5L)), (2L, None)).toDF("k", "v")
    val out = DataQuality.runChecks(df,
      Seq(DataQuality.Satisfies("pos", col("v") > 0)))
      .select($"n_violations").as[Long].head()
    assert(out == 1L) // v=null ⇒ predicate UNKNOWN ⇒ violation
  }

  test("Entity.resolve: transitive closure labels, singletons are their own entity") {
    val df = Seq(
      (1L, "red widget", "B1"), (2L, "red widget", "B1"),  // identical → pair
      (3L, "red gadget", "B1"),  // shares 1 of 3 tokens with 1/2 — below 1/2
      (4L, "red widget", "B2"),  // identical name, DIFFERENT block — no pair
      (5L, "lone thing", "B3"))
      .toDF("id", "nm", "blk")
    val out = Entity.resolve(df, "id", "nm", Seq("blk"), 1, 2)
      .select($"id", $"entity_id", $"n_members")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 1L, 2L), (2L, 1L, 2L), (3L, 3L, 1L),
      (4L, 4L, 1L), (5L, 5L, 1L)))
  }

  test("upsertLatest is order-insensitive: any batch split converges to global latest-wins") {
    val snap = Seq((1L, "s", 0L, 0L)).toDF("k", "v", "ts", "tie")
    val b1 = Seq((1L, "late", 30L, 1L), (2L, "b", 10L, 2L)).toDF("k", "v", "ts", "tie")
    val b2 = Seq((1L, "mid", 20L, 3L), (3L, "c", 5L, 4L)).toDF("k", "v", "ts", "tie")
    def state(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("k").as[(Long, String, Long, Long)].collect().toSeq
    val global = state(Cdc.upsertLatest(snap, b1.unionByName(b2), Seq("k"), "ts", "tie"))
    // sequential in either order — including the late-timestamp batch
    // FIRST — lands on the same state
    val fwd = state(Cdc.upsertLatest(
      Cdc.upsertLatest(snap, b1, Seq("k"), "ts", "tie"), b2, Seq("k"), "ts", "tie"))
    val rev = state(Cdc.upsertLatest(
      Cdc.upsertLatest(snap, b2, Seq("k"), "ts", "tie"), b1, Seq("k"), "ts", "tie"))
    assert(global == Seq((1L, "late", 30L, 1L), (2L, "b", 10L, 2L), (3L, "c", 5L, 4L)))
    assert(fwd == global && rev == global)
  }

  test("runCdcUpsert drives the foreachBatch merge over multiple out-of-order batches") {
    val base = java.nio.file.Files.createTempDirectory("graft-cdc-spec")
    val in = s"$base/in"
    // file 1 carries the LATER change for key 1; file 2 the earlier one
    Seq((1L, "late", 30L, 1L), (2L, "b", 10L, 2L)).toDF("k", "v", "ts", "tie")
      .repartition(1).write.parquet(in)
    Seq((1L, "mid", 20L, 3L)).toDF("k", "v", "ts", "tie")
      .repartition(1).write.mode("append").parquet(in)
    val snap0 = Seq((1L, "s", 0L, 0L), (9L, "keep", 1L, 5L)).toDF("k", "v", "ts", "tie")
    val finalSnap = graft.streaming.StreamingJob.runCdcUpsert(
      spark, snap0.schema, in, snap0, Seq("k"), "ts", "tie",
      s"$base/work", s"$base/ckpt")
    val out = spark.read.parquet(finalSnap).orderBy("k")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out == Seq((1L, "late", 30L, 1L), (2L, "b", 10L, 2L), (9L, "keep", 1L, 5L)))
    // maxFilesPerTrigger=1 must actually have produced one snapshot per batch
    assert(new java.io.File(s"$base/work").list().count(_.startsWith("snap_")) == 3)
  }

  test("Intervals.merge: overlap and touch merge, gaps split, containment absorbs") {
    val iv = Seq(
      (1L, 0L, 10L), (1L, 5L, 20L),   // overlap → one island [0,20)
      (1L, 20L, 30L),                 // touching (half-open) → same island
      (1L, 40L, 50L), (1L, 42L, 44L), // containment absorbs → [40,50)
      (2L, 0L, 100L))                 // other key unaffected
      .toDF("k", "s", "e")
    val out = Intervals.merge(iv, "k", "s", "e")
      .select($"k", $"start_us", $"end_us", $"n_merged")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 0L, 30L, 3L), (1L, 40L, 50L, 2L), (2L, 0L, 100L, 1L)))
    val cov = Intervals.coverage(iv, "k", "s", "e")
      .select($"k", $"covered_us", $"n_islands")
      .as[(Long, Long, Long)].collect().toSet
    assert(cov == Set((1L, 40L, 2L), (2L, 100L, 1L)))
  }

  test("Intervals.merge plans a single exchange for the whole chain") {
    val iv = Seq((1L, 0L, 10L)).toDF("k", "s", "e")
    val plan = Intervals.merge(iv, "k", "s", "e")
      .queryExecution.executedPlan.toString
    val exchanges = "(?m)^\\s*[+:]?-?\\s*Exchange".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 Exchange:\n$plan")
  }

  test("Incremental: batch-at-a-time merge == merged union == full recompute") {
    import graft.ops.Incremental
    val facts = Seq(
      (1L, 10L, 0), (1L, 30L, 0), (1L, 20L, 1), (2L, 5L, 1),
      (2L, 7L, 2), (3L, 100L, 2)).toDF("k", "v", "batch")
    val keys = Seq("k"); val cols = Seq("v")
    def part(b: Int) = Incremental.partialAggregate(
      facts.filter($"batch" === b), keys, cols, cols, cols)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("k").collect().map(_.toSeq).toSeq
    // fold batches one at a time
    val folded = (1 to 2).foldLeft(part(0)) { (acc, b) =>
      Incremental.mergeAggregates(acc, part(b), keys, cols, cols, cols) }
    // merge the union of deltas in one refresh
    val once = Incremental.mergeAggregates(part(0),
      Incremental.partialAggregate(facts.filter($"batch" >= 1), keys, cols, cols, cols),
      keys, cols, cols, cols)
    val full = Incremental.partialAggregate(facts, keys, cols, cols, cols)
    assert(canon(folded) == canon(full))
    assert(canon(once) == canon(full))
    // a key absent from every delta (3 only in batch 2) passes through
    assert(canon(folded).exists(r => r.head == 3L))
  }

  test("Entity.matchPairs: threshold is a strict integer comparison") {
    val df = Seq((1L, "a b c", "B"), (2L, "a b d", "B")).toDF("id", "nm", "blk")
    // inter=2, uni=4 → jaccard = 1/2 exactly: NOT > 1/2, pair excluded
    assert(Entity.matchPairs(df, "id", "nm", Seq("blk"), 1, 2).count() == 0)
    // but > 2/5 includes it
    assert(Entity.matchPairs(df, "id", "nm", Seq("blk"), 2, 5).count() == 1)
  }
}
