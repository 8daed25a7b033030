package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.Skew

/** Scale-mechanics specs: salted aggregation equivalence and bucketed
  * co-located joins (the pre-shuffled join layout for repeated fact-fact
  * joins at scale).
  */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals plain aggregation") {
    val li = Tables.lineitem(spark, Sf0001)
    val salted = Skew.saltedSumCount(li, Seq("l_returnflag"), "l_quantity")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val plain = li.groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"), sum($"l_quantity").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    // doubles: per-group sums of the same values; salting changes add
    // order, so compare with tolerance on the sum
    val saltedMap = salted.map(t => t._1 -> (t._2, t._3)).toMap
    val plainMap = plain.map(t => t._1 -> (t._2, t._3)).toMap
    assert(saltedMap.keySet == plainMap.keySet)
    saltedMap.foreach { case (k, (n, s)) =>
      assert(n == plainMap(k)._1)
      assert(math.abs(s - plainMap(k)._2) < 1e-6 * math.abs(s))
    }
  }

  test("bucketed tables join without a shuffle exchange") {
    // runtime conf on the shared session (a second builder.getOrCreate in
    // the same JVM would silently ignore static confs)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      Tables.lineitem(spark, Sf0001).write
        .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("li_bucketed")
      Tables.orders(spark, Sf0001).write
        .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("ord_bucketed")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected no shuffle, got:\n$plan")
      // co-located join still returns the right row count
      val expected = Tables.lineitem(spark, Sf0001)
        .join(Tables.orders(spark, Sf0001), col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(joined.count() == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("runtime bloom filter prunes the fact side of a selective dim join") {
    // Spark's InjectRuntimeFilter: a selective filter on the dimension
    // side materializes a bloom filter that is pushed into the fact
    // scan — at 100 TB this skips most of the probe input before the
    // shuffle. Thresholds are lowered so the tiny test tables qualify;
    // on a real cluster the defaults (10MB creation side) do this
    // automatically for exactly this plan shape.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // shuffle join, else no filter needed
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = Tables.lineitem(spark, Sf0001)
      val ord = Tables.orders(spark, Sf0001).filter($"o_orderpriority" === "1-URGENT")
      val joined = li.join(ord, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority").agg(sum($"l_quantity").as("qty"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("bloom_filter") || plan.contains("might_contain"),
        s"no runtime bloom filter injected:\n$plan")
      assert(joined.collect().nonEmpty)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed join partition at runtime") {
    // The runtime answer to key skew (complementing the static salting
    // in Skew.saltedSumCount): AQE detects an oversized shuffle
    // partition and splits it into parallel sub-joins. Thresholds are
    // shrunk so the planted hot key qualifies on test data.
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "10KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 50k rows on ONE key vs 500 spread over 100 keys; join to a
      // per-key table — partition 0 is ~100x its siblings.
      val hot = spark.range(50000).select(lit(0L).as("k"), $"id".as("v"))
        .union(spark.range(500).select(($"id" % 100 + 1).as("k"), $"id".as("v")))
      val dim = spark.range(101).select($"id".as("k"), ($"id" * 10).as("w"))
      // NOTE: no groupBy on the join key downstream — that would make
      // the aggregate reuse the join's hash partitioning, and AQE
      // (rightly) refuses a skew split that would force a re-shuffle.
      val joined = hot.join(dim, "k").agg(sum($"v" + $"w").as("s"))
      joined.collect() // AQE final plan exists only after execution
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"no skew split in final plan:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salted join equals plain join and spreads the hot key across partitions") {
    // 20k rows on ONE key joined to a 101-row dim: a plain shuffle join
    // serializes the hot key into a single partition; the salted join
    // must (a) produce the identical result and (b) land the hot key's
    // rows in many shuffle partitions.
    val hot = spark.range(20000).select(lit(0L).as("k"), $"id".as("v"))
      .union(spark.range(500).select(($"id" % 100 + 1).as("k"), $"id".as("v")))
    val dim = spark.range(101).select($"id".as("k"), ($"id" * 10).as("w"))
    // AQE's small-partition coalescing would merge this tiny test
    // shuffle back into one partition and hide the spread being measured
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val salted = Skew.saltedJoin(hot, dim, Seq("k"), saltSrc = $"v", salts = 16)
      val plain = hot.join(dim, "k")
      assert(salted.count() == plain.count())
      assert(salted.agg(sum($"v" + $"w")).head.getLong(0) ==
        plain.agg(sum($"v" + $"w")).head.getLong(0))
      // hot key spread: its rows occupy many partitions after the salted
      // shuffle; the plain join pins them all to one
      def spreadOf(df: org.apache.spark.sql.DataFrame): Long =
        df.filter($"k" === 0L)
          .select(org.apache.spark.sql.functions.spark_partition_id().as("p"))
          .distinct().count()
      val saltedSpread = spreadOf(salted)
      val plainSpread = spreadOf(plain)
      assert(plainSpread == 1L, s"plain join spread $plainSpread")
      // 16 salt values can spread across at most min(16, shuffle
      // partitions) reducers; allow one collision of slack
      val parts = spark.conf.get("spark.sql.shuffle.partitions").toLong
      assert(saltedSpread >= math.min(16L, parts) - 1,
        s"hot key in only $saltedSpread of $parts partition(s)")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("sessionization core completes on a hot user (10^6 events in one task)") {
    // The 100 TB assumption at Sessionize.scala is "no single user
    // exceeds a partition" — this pins the boundary: one synthetic user
    // with a million events (every 100th gap > 30 min → 10k sessions)
    // must flow through the single-exchange W1–W4 chain in ONE window
    // task without spilling the test into failure. The measured time is
    // documented in the Sessionize scaladoc.
    val n = 1000000L
    val baseUs = 1700000000000000L
    val hot = spark.range(n).select(
      lit(7L).as("user_id"),
      timestamp_micros(lit(baseUs) + $"id" * 1000000L +
        expr("id DIV 100") * 2000000000L).as("ts"),
      $"id".as("event_id"))
    val t0 = System.nanoTime()
    val sessions = graft.ops.Sessionize.withSessionNo(hot)
    val agg = sessions.groupBy($"user_id")
      .agg(max($"session_no").as("n_sessions"), count(lit(1)).as("n_events"))
      .head()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"hot-user 10^6-event chain: $secs%.1fs")
    assert(agg.getLong(1) == 10000L, s"expected 10000 sessions, got $agg")
    assert(agg.getLong(2) == n)

    // Downstream LOW-CARDINALITY rollups (session_duration_histogram
    // style) must not re-serialize the hot key into one reducer: the
    // salted two-phase pre-aggregation gives the same result with the
    // hot group split across tasks first.
    val durations = sessions.groupBy($"user_id", $"session_no")
      .agg(((max(unix_micros($"ts")) - min(unix_micros($"ts"))) / 60000000L)
        .cast("long").as("minutes"))
    val salted = Skew.saltedSumCount(durations, Seq("minutes"), "session_no")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val plain = durations.groupBy($"minutes").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(salted.keySet == plain.keySet)
    plain.foreach { case (k, c) => assert(salted(k) == c, s"bucket $k") }
  }

  test("window spill boundary: a 10^7-event single user spills to disk and completes") {
    // r9 verdict #6: past the 10^6 in-memory hot-user point, the real
    // bot-user bound at 100 TB is a single key whose window buffer
    // exceeds executor memory — ExternalAppendOnlyUnsafeRowArray must
    // SPILL, not OOM. The two knobs (documented in the Sessionize
    // scaladoc): spark.sql.windowExec.buffer.in.memory.threshold (rows
    // held as objects before switching to the unsafe sorter) and
    // spark.sql.windowExec.buffer.spill.threshold (rows in the sorter
    // before each disk spill). The spill threshold is pinned low here so
    // the test proves the DISK path deterministically rather than
    // depending on the test JVM's heap; the listener asserts bytes
    // actually hit disk.
    val n = 10000000L
    val baseUs = 1700000000000000L
    val prev = Seq("spark.sql.windowExec.buffer.in.memory.threshold",
      "spark.sql.windowExec.buffer.spill.threshold")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.windowExec.buffer.in.memory.threshold", "4096")
    spark.conf.set("spark.sql.windowExec.buffer.spill.threshold", "262144")
    val spilledBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          spilledBytes.addAndGet(te.taskMetrics.diskBytesSpilled): Unit
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val hot = spark.range(n).select(
        lit(9L).as("user_id"),
        timestamp_micros(lit(baseUs) + $"id" * 1000000L +
          expr("id DIV 1000") * 2000000000L).as("ts"),
        $"id".as("event_id"))
      val t0 = System.nanoTime()
      val agg = graft.ops.Sessionize.withSessionNo(hot)
        .groupBy($"user_id")
        .agg(max($"session_no").as("n_sessions"), count(lit(1)).as("n_events"))
        .head()
      val secs = (System.nanoTime() - t0) / 1e9
      info(f"hot-user 10^7-event spilled chain: $secs%.1fs")
      assert(agg.getLong(1) == 10000L, s"expected 10000 sessions, got $agg")
      assert(agg.getLong(2) == n)
      // listener bus is async — poll briefly for the metrics to land
      val deadline = System.nanoTime() + 10000000000L
      while (spilledBytes.get() == 0L && System.nanoTime() < deadline)
        Thread.sleep(100)
      assert(spilledBytes.get() > 0L,
        "the window buffer must have spilled to disk at this scale")
      info(f"disk bytes spilled: ${spilledBytes.get() / 1048576.0}%.0f MiB")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("sequence packing completes on a hot shard (10^6 docs in one window task)") {
    // pack_sequences' 100 TB assumption is "shards pack independently and
    // no shard exceeds a partition" — this pins the boundary, exactly
    // like the hot-user test above: ONE source shard with a million docs
    // serializes its running-sum window into a single task and must
    // still complete. The measured time is documented at the
    // pack_sequences query. The ESCAPE HATCH for a shard that outgrows a
    // task — TextOps.packSequencesTwoPhase (per-bucket windows + a tiny
    // prefix-sum merge of bucket totals) — is measured on the SAME shard
    // below: identical packing, serialized span shrunk from 10^6 rows to
    // one 65536-row bucket.
    val n = 1000000L
    val docs = spark.range(n).select(
      $"id".as("doc_id"), lit("shard0").as("source"),
      (($"id" % 37L) + 1L).as("n_tokens"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val t0 = System.nanoTime()
    val packed = docs.withColumn("cum", sum($"n_tokens").over(w))
      .select($"doc_id", $"n_tokens",
        (($"cum" - $"n_tokens") / 4096).cast("long").as("bin_no"),
        $"cum")
    val agg = packed.agg(count(lit(1)).as("n"), max($"cum").as("total"),
      max($"bin_no").as("last_bin")).head()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"hot-shard 10^6-doc packing: $secs%.1fs")
    assert(agg.getLong(0) == n)
    // exact totals: max(cum) must equal the independent sum, and the last
    // bin is the window the final doc's first token lands in
    val total = docs.agg(sum($"n_tokens")).head().getLong(0)
    assert(agg.getLong(1) == total)
    val lastTokens = (n - 1) % 37 + 1
    assert(agg.getLong(2) == (total - lastTokens) / 4096)

    // the two-phase escape hatch on the SAME hot shard: 16 parallel
    // 65536-doc bucket windows instead of one 10^6-doc window task
    val t1 = System.nanoTime()
    val two = graft.ops.TextOps.packSequencesTwoPhase(docs, bucketWidth = 65536L)
    val agg2 = two.agg(count(lit(1)).as("n"), sum($"offset_tokens").as("so"),
      sum($"bin_no").as("sb"), max($"offset_tokens" + $"n_tokens").as("total")).head()
    val secs2 = (System.nanoTime() - t1) / 1e9
    info(f"hot-shard 10^6-doc packing, two-phase: $secs2%.1fs (single-window: $secs%.1fs)")
    // identical packing: row count, offset/bin checksums, exact total
    val chk = packed.agg(sum($"cum" - $"n_tokens"), sum($"bin_no")).head()
    assert(agg2.getLong(0) == n)
    assert(agg2.getLong(1) == chk.getLong(0))
    assert(agg2.getLong(2) == chk.getLong(1))
    assert(agg2.getLong(3) == total)
    // regression guard only — the real claim is the parallel shape, and
    // host contention makes a strict time assertion flaky
    assert(secs2 < math.max(secs * 3, 30.0), f"two-phase $secs2%.1fs vs $secs%.1fs")
  }

  test("wide profile (50 columns) completes in one pass; expand factor measured") {
    // profile()'s c-column cost model: ONE scan, but Spark plans the
    // c distinct aggregates via expand — (c+1)× shuffle rows. Fine at
    // the 5-column audit width; this pins the WIDE-table boundary the
    // way pack_sequences pins its hot-shard boundary: 50 columns ×
    // 2·10^5 rows → ~10^7 expanded rows must still complete in one
    // aggregate, and the plan must show exactly one Expand and one
    // scan. The measured time is documented at DataQuality.profile.
    val nRows = 200000L
    val nCols = 50
    val colsExprs = (0 until nCols).map(i => (($"id" * (i + 1)) % 9973L).as(s"c$i"))
    val wide = spark.range(nRows).select(colsExprs: _*)
    val names = (0 until nCols).map(i => s"c$i")
    val t0 = System.nanoTime()
    val prof = graft.ops.DataQuality.profile(wide, names)
    val rows = prof.collect()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"50-column × 2e5-row profile: $secs%.1fs")
    assert(rows.length == nCols)
    // exact stats for a couple of spot columns: c0 = id % 9973 over 2e5
    // rows covers all 9973 residues; every column is fully non-null
    val byName = rows.map(r => r.getString(0) -> r).toMap
    assert(byName("c0").getLong(1) == nRows)  // n_rows
    assert(byName("c0").getLong(2) == nRows)  // n_nonnull
    assert(byName("c0").getLong(3) == 9973L)  // n_distinct
    assert(names.forall(c => byName(c).getLong(2) == nRows))
    // plan shape: the multi-distinct rewrite plans through Expand
    val plan = prof.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), plan)
    assert(!plan.contains("CartesianProduct"))
    // regression guard, generous for host contention
    assert(secs < 120.0, f"wide profile took $secs%.1fs")

    // the WIDTH escape hatch: batched profile must return the identical
    // stats while keeping each expand tuple batch-wide, not 50-wide
    val t1 = System.nanoTime()
    val batched = graft.ops.DataQuality.profileBatched(wide, names, batchSize = 10)
    val bRows = batched.collect()
    val secsB = (System.nanoTime() - t1) / 1e9
    info(f"50-column × 2e5-row profile, batched(10): $secsB%.1fs (single-agg: $secs%.1fs)")
    assert(bRows.map(_.toSeq).toSet == rows.map(_.toSeq).toSet)
  }

  test("z-order layout bounds per-file spans on BOTH dimensions") {
    // The data-skipping property itself: files written in z-order keep
    // min/max ranges narrow for both clustering keys, so row-group
    // statistics prune scans filtered on either; a single-column sort
    // leaves the second key spanning its full domain in every file.
    val li = Tables.lineitem(spark, Sf0001)
      .select(($"l_partkey" % 256).as("a"), ($"l_orderkey" % 256).as("b"))
    val dir = Files.createTempDirectory("graft-zorder").toString
    graft.ops.Layout.zOrderBy(li, $"a", $"b", 8).write.parquet(s"$dir/z")
    li.repartitionByRange(8, $"a").sortWithinPartitions($"a")
      .write.parquet(s"$dir/bya")
    def spans(path: String): (Double, Double) = {
      val r = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg((max($"a") - min($"a")).as("sa"), (max($"b") - min($"b")).as("sb"))
        .agg(avg($"sa"), avg($"sb")).head
      (r.getDouble(0), r.getDouble(1))
    }
    val (za, zb) = spans(s"$dir/z")
    val (aa, ab) = spans(s"$dir/bya")
    assert(aa < 64 && ab > 180, s"sort-by-a spans: a=$aa b=$ab")
    assert(za < 180 && zb < 180, s"z-order spans: a=$za b=$zb")
  }

  test("containment df-cap kills boilerplate fan-out but keeps rare-shingle evidence") {
    import graft.ops.Dedup
    // 200 docs all share one 3-token boilerplate footer (df=200 > cap 50):
    // without the cap the inverted index would fan out 200² candidate
    // rows from that single shingle. With it, the footer contributes
    // NOTHING — no pairs. Two docs additionally share a rare 14-token
    // quote (df=2): containment must still find that pair.
    val footer = "common footer tokens"
    val quote = (0 until 14).map(t => s"q$t").mkString(" ")
    val docs = ((0 until 198).map(i =>
      (i.toLong, (0 until 12).map(t => s"u${i}_$t").mkString(" ") + " " + footer)) ++
      Seq((500L, quote + " " + footer),
          (501L, quote + " tail0 tail1 tail2 " + footer))).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // ONLY the rare-quote pair (both directions where the 80% bar holds):
    // doc 500's capped shingles are the 12 quote shingles + 2 bridge
    // shingles into the footer (the footer's own shingle is capped away);
    // 12 of its ~14 capped shingles sit in 501 → ≥80% one way
    assert(pairs.nonEmpty, "rare-shingle containment must survive the cap")
    assert(pairs.forall { case (a, b) => Set(a, b).subsetOf(Set(500L, 501L)) },
      s"boilerplate fan-out leaked: $pairs")
  }

  test("k-means trainer frees each round's cache; only the final round survives") {
    import graft.ops.Similarity
    // the connectedComponents discipline applied to the Lloyd loop: a
    // 4-round training run must NOT leak one cached RDD per round for
    // the life of the session — round k−1 is freed when round k
    // materializes, the shared quantized-corpus cache is freed before
    // returning, and exactly the final round's cache survives until
    // releaseCaches()
    graft.ops.Dedup.releaseCaches()
    Similarity.releaseCaches()
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.size
    val emb = Tables.embeddings(spark, Sf0001)
    val r = Similarity.kmeansTrain(emb, emb.filter(col("vec_id") < 8),
      maxIter = 4, requireConvergence = false)
    assert(r.iterations >= 2, "fixture converged too fast to test round release")
    assert(r.centroids.count() == 512L)
    val during = sc.getPersistentRDDs.size
    assert(during <= before + 1,
      s"per-round caches leaked: $before persistent RDDs before, $during after")
    Similarity.releaseCaches()
    assert(sc.getPersistentRDDs.size <= before, "final round survived release")
  }

  test("hot shingle (df = 10^6) stays bounded: df-cap/first-seen collapse map-side") {
    import graft.ops.Dedup
    // r6 verdict item 1 boundary pin: boilerplate shingles are skewed BY
    // DEFINITION — here ONE 3-token footer shingle is planted in every
    // one of 10^6 docs. The old window-on-shingle form had to land all
    // 10^6 occurrences in a single window task before the df-cap could
    // drop them; the groupBy+join-back shape collapses the hot key
    // per-partition (map-side partial aggregation) and leaves the only
    // per-key co-location to an AQE-skew-splittable join probe. Pinned
    // structurally (partial agg keyed by shingle, NO window over the
    // shingle column) and behaviorally (both ops complete and are exact
    // on the fixture; wall time recorded via info()).
    val n = 1000000L
    val docs = spark.range(n).select(
      $"id".as("doc_id"),
      concat(lit("u"), $"id", lit("a u"), $"id", lit("b boiler plate footer"))
        .as("text"))
    // tokens: [u{i}a, u{i}b, boiler, plate, footer] → 3 shingles/doc, of
    // which "boiler plate footer" has df = 10^6 (cap 50 discards it)
    val cont = Dedup.containmentPairs(docs)
    val contPlan = cont.queryExecution.executedPlan.toString
    assert(!contPlan.contains("windowspecdefinition(shingle"),
      "df-cap must not be a window over the skewed shingle key")
    assert(contPlan.contains("partial_count"),
      "df-cap must collapse map-side via partial aggregation")
    val nov = Dedup.noveltyFraction(docs)
    val novPlan = nov.queryExecution.executedPlan.toString
    assert(!novPlan.contains("windowspecdefinition(shingle"),
      "first-seen must not be a window over the skewed shingle key")
    assert(novPlan.contains("partial_min"),
      "first-seen must collapse map-side via partial aggregation")
    val t0 = System.nanoTime()
    // every doc's two unique shingles are below minShingles=10 once the
    // hot footer shingle is capped away → zero candidate pairs; the cost
    // of this query IS the df-cap over the skewed key
    assert(cont.count() == 0L, "boilerplate-only overlap must yield no pairs")
    val secsCont = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    // doc 0 sees the footer shingle first (3/3 novel); every later doc
    // has exactly its 2 unique shingles novel (2/3)
    val novAgg = nov.agg(count(lit(1)), sum($"n_novel"), sum($"n_shingles")).head()
    val secsNov = (System.nanoTime() - t1) / 1e9
    info(f"hot-shingle 10^6-doc df-cap: containment $secsCont%.1fs, novelty $secsNov%.1fs")
    assert(novAgg.getLong(0) == n)
    assert(novAgg.getLong(1) == 2L * n + 1L)
    assert(novAgg.getLong(2) == 3L * n)
    Dedup.releaseCaches()
  }

  test("hot LSH band (10^4 near-identical docs in one bucket) stays linear: chain replaces all-pairs") {
    import graft.ops.Dedup
    // r9 verdict item 1 boundary pin: a cluster of near-identical
    // documents shares identical MinHash signatures → identical band
    // keys → ONE bucket holds all k members in every band. Uncapped,
    // the band self-join emits 8·k·(k−1)/2 = 4·10⁸ candidate rows from
    // this fixture (10¹² at the web-corpus k = 10⁶ the cap targets);
    // capped, each bucket emits the k−1 two-level chain edges and the
    // whole stage is linear in k.
    val k = 10000L
    val docs = spark.range(k).select($"id".as("doc_id"),
      lit("alpha beta gamma delta epsilon zeta eta theta iota kappa").as("text"))
    val sig = Dedup.minhashSignatureRows(Dedup.shingleRows(docs))
      .cache()
    sig.count()
    val t0 = System.nanoTime()
    val pairs = Dedup.lshCandidates(sig) // default cap 256
    // all 8 buckets hold the same members, the chain depends only on
    // ids → every band emits the SAME k−1 edges; distinct → k−1
    val nPairs = pairs.count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"hot-band $k%d-doc cluster: capped candidates in $secs%.1fs")
    assert(nPairs == k - 1, s"chain must emit exactly k-1 edges, got $nPairs")
    // the loud overflow counter: all 8 buckets report hot, and the
    // avoided quadratic is accounted pair-exactly
    val stats = Dedup.hotBandStats(sig).head()
    assert(stats.getAs[Long]("n_bands") == 8L)
    assert(stats.getAs[Long]("n_hot_bands") == 8L)
    assert(stats.getAs[Long]("max_band_size") == k)
    assert(stats.getAs[Long]("pairs_avoided") == 8L * (k * (k - 1) / 2 - (k - 1)))
    // component preserved: the k−1 edges span ONE component covering
    // every doc, labeled by the minimum id — exactly what the all-pairs
    // clique would have produced
    val cc = Dedup.connectedComponents(pairs)
    val agg = cc.agg(count(lit(1)), countDistinct($"cluster_id"),
      min($"cluster_id")).head()
    assert(agg.getLong(0) == k && agg.getLong(1) == 1L && agg.getLong(2) == 0L)
    sig.unpersist()
    Dedup.releaseCaches()
  }

  test("consolidation at realistic fan-in: 10^3 batch dirs fold in one pass, driver-bounded") {
    // The consolidate scaladocs claim ~10^4 hourly batch directories as
    // the motivating scale but the protocol was only ever tested at a
    // handful (r10 verdict task 5). This pins 10^3 REAL directories:
    // the listing + explicit-path read must complete in one job, the
    // row accounting must be exact, and the wall-clock and driver
    // memory stay bounded (the protocol's driver work is one
    // fs.listStatus per source plus the path seq — O(batches), no
    // per-dir Spark job).
    val base = Files.createTempDirectory("graft-fanin").toString
    val out = s"$base/index"
    val docs = Tables.documents(spark, Sf0001).limit(40)
    val docsP = s"$base/docs"; docs.write.parquet(docsP)
    graft.jobs.BuildDedupIndex.run(spark, docsP, out)
    // one template batch dir, then 999 filesystem copies — the store
    // tolerates duplicate band rows by contract, and copying exercises
    // exactly what fan-in stresses (directory count), not row volume
    val t = spark.range(50).select(concat(lit("band"), $"id").as("band"),
      $"id".as("doc_id"))
    t.select($"doc_id", $"band").coalesce(1)
      .write.parquet(s"$out/buckets/batch=b0000")
    val tplDir = new java.io.File(s"$out/buckets/batch=b0000")
    val dataFiles = tplDir.listFiles().filter(f =>
      f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    val nDirs = 1000
    val t0 = System.nanoTime()
    (1 until nDirs).foreach { i =>
      val d = new java.io.File(f"$out/buckets/batch=b$i%04d")
      d.mkdirs()
      dataFiles.foreach(f => java.nio.file.Files.copy(f.toPath,
        new java.io.File(d, f.getName).toPath))
    }
    val secsGen = (System.nanoTime() - t0) / 1e9
    val before = spark.read.parquet(s"$out/buckets").count()
    val batches = (0 until nDirs).map(i => f"b$i%04d")
    val mem0 = {
      System.gc()
      val rt = Runtime.getRuntime; rt.totalMemory() - rt.freeMemory()
    }
    val t1 = System.nanoTime()
    graft.jobs.BuildDedupIndex.consolidate(spark, out, batches)
    val secs = (System.nanoTime() - t1) / 1e9
    val mem1 = {
      val rt = Runtime.getRuntime; rt.totalMemory() - rt.freeMemory()
    }
    // exact accounting: every source row lives in the consolidated
    // partition, sources are gone, base is untouched
    assert(spark.read.parquet(s"$out/buckets").count() == before,
      "consolidation must preserve every row")
    val dirs = new java.io.File(s"$out/buckets").listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).toSeq
    assert(dirs.count(_.startsWith("batch=consol-")) == 1 &&
      dirs.contains("batch=base") && dirs.size == 2,
      s"expected base + one consol dir, got ${dirs.size}")
    // boundary documented at consolidateBatches: measured ~5 s for
    // 10^3 dirs on local[32] (the 10^3-path scan plan, linear in
    // dirs) — extrapolates to ~1 min at the scaladoc's 10^4 claim
    assert(secs < 300, f"10^3-dir consolidate took $secs%.1f s")
    info(f"10^3-dir consolidate: $secs%.1f s (gen $secsGen%.1f s), " +
      f"driver heap delta ${(mem1 - mem0) / 1e6}%.0f MB, rows $before")
  }

  test("additive-store consolidation at 10^3 batch fan-in: one merge pass, cells exact") {
    // the manifest protocol's own fan-in measurement (the dedup-store
    // test covers the explicit-path read shape; this adds the
    // per-batch fs work the additive protocol does on top — sidecar
    // checks, meta dirs, manifest commit — all O(batches))
    val base = Files.createTempDirectory("graft-addfanin").toString
    val out = s"$base/store"
    val items = spark.range(2000)
      .select(concat(lit("tok"), $"id" % 97).as("item"))
    val itemsP = s"$base/items"; items.write.parquet(itemsP)
    graft.jobs.BuildSketchStore.run(spark, itemsP, out)
    // one template append, then filesystem copies — fan-in stresses
    // directory count, not row volume
    graft.jobs.BuildSketchStore.append(spark, itemsP, out, "b0000")
    val cDir = new java.io.File(s"$out/counters/batch=b0000")
    val mDir = new java.io.File(s"$out/meta/batch=b0000")
    def dataFiles(d: java.io.File) = d.listFiles().filter(f =>
      f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    val nDirs = 1000
    (1 until nDirs).foreach { i =>
      Seq((cDir, s"$out/counters"), (mDir, s"$out/meta")).foreach {
        case (tpl, root) =>
          val d = new java.io.File(f"$root/batch=b$i%04d"); d.mkdirs()
          dataFiles(tpl).foreach(f => java.nio.file.Files.copy(f.toPath,
            new java.io.File(d, f.getName).toPath))
      }
    }
    def cells() = graft.jobs.BuildSketchStore.mergedCounters(spark, out)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val before = cells()
    val t0 = System.nanoTime()
    graft.jobs.BuildSketchStore.consolidate(spark, out,
      (0 until nDirs).map(i => f"b$i%04d"))
    val secs = (System.nanoTime() - t0) / 1e9
    assert(cells() == before,
      "10^3-batch consolidation must not change a single cell")
    val dirs = new java.io.File(s"$out/counters").listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).toSet
    assert(dirs.size == 2 && dirs.contains("batch=base"),
      s"expected base + one consol dir, got ${dirs.size}")
    // measured ~7 s on local[32]: the 10^3-path merge read plus
    // ~3*10^3 fs existence checks — linear in batches, comfortably
    // under any hourly cadence
    assert(secs < 300, f"10^3-batch additive consolidate took $secs%.1f s")
    info(f"10^3-batch additive consolidate: $secs%.1f s")
  }

  test("range-partitioned sorted write produces non-overlapping sorted files") {
    // The data-skipping layout: repartitionByRange gives files with
    // disjoint key ranges, sortWithinPartitions orders rows inside each —
    // parquet min/max stats then prune row groups on key predicates.
    val base = Files.createTempDirectory("graft-range").toString
    Tables.orders(spark, Sf0001)
      .repartitionByRange(4, col("o_custkey"))
      .sortWithinPartitions("o_custkey")
      .write.parquet(s"$base/orders_ranged")
    val files = new java.io.File(s"$base/orders_ranged").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(files.length >= 2)
    val ranges = files.map { f =>
      val keys = spark.read.parquet(f).select("o_custkey")
        .collect().map(_.getLong(0))
      assert(keys.sameElements(keys.sorted), s"unsorted within $f")
      (keys.min, keys.max)
    }
    // files' [min,max] ranges must not overlap pairwise
    val sortedR = ranges.sortBy(_._1)
    sortedR.sliding(2).foreach {
      case Array((_, aMax), (bMin, _)) => assert(aMax <= bMin, sortedR.mkString(","))
      case _ =>
    }
  }

  test("native set-op counts are exact on 10^5-element arrays") {
    // the counting expressions' claim is NO result-array materialization
    // — two 10^5-element sides must count in linear time and exact ints
    val n = 100000
    val a = (0 until n).map(i => s"t$i")
    val b = (n / 2 until n + n / 2).map(i => s"t$i")
    val df = Seq((1L, a, b)).toDF("id", "a", "b")
    val t0 = System.nanoTime()
    val r = df.select(
      graft.expressions.IntersectSize.intersectSizeNative($"a", $"b").as("i"),
      graft.expressions.UnionSize.unionSizeNative($"a", $"b").as("u"),
      graft.expressions.DistinctSize.distinctSizeNative($"a").as("d"))
      .collect().head
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"3 counts over 10^5-element arrays: $secs%.2fs")
    assert(r.getInt(0) == n / 2 && r.getInt(1) == n + n / 2 && r.getInt(2) == n)
    assert(secs < 30.0)
  }

  test("per-row trigram ops stay linear on a 10^5-token document") {
    // The lambda-CSE boundary: Catalyst does not common-subexpression-
    // eliminate through lambda bodies, so `transform(sequence(...),
    // i => element_at(toks, i))` with `toks` an INLINE split re-splits
    // the whole string per gram — O(n²) per doc (the shape that made
    // each BPE round 5.5 s at sf0.1; measured 14× after materializing
    // the array). repetitionStats/gopherRules now bind the token and
    // gram arrays in their own projections; this pins the boundary: a
    // single 10^5-token document (10 GB of string work under the old
    // form: 10^10 char touches) must complete in seconds, with exact
    // counts. One hot doc + normal docs, so the projection also proves
    // row-parallel shape is unaffected.
    val nTok = 100000
    val hot = (0 until nTok).map(i => s"t${i % 31}").mkString(" ")
    val df = Seq((1L, hot), (2L, "a b c d e f")).toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val rep = graft.ops.TextOps.repetitionStats(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val gop = graft.ops.TextOps.gopherRules(df).collect()
      .map(r => r.getLong(0) -> r.getLong(5)).toMap
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"10^5-token doc through repetitionStats + gopherRules: $secs%.1fs")
    // 31 distinct tokens cycling → every 3-gram is one of 31 patterns
    assert(rep(1L) == (nTok - 2L, 31L))
    assert(rep(2L) == (4L, 4L))
    assert(gop(1L) == nTok - 2L - 31L)    // n_dup_grams
    // generous contention headroom; the old quadratic form would take
    // minutes-to-hours here, not seconds
    assert(secs < 60.0, f"trigram ops took $secs%.1fs on a 10^5-token doc")
    // the streaming postings fold is per-row too: its sorted-run-length
    // encoding must stay O(n log n) on the same hot doc (the rejected
    // probe-per-distinct-token form is O(n·u) — fine at u=31, quadratic
    // on high-entropy docs, so the fixture alone can't catch it; the
    // shape is pinned structurally by using only starts/zip_with)
    val t1 = System.nanoTime()
    val posts = graft.ops.Search.perRowPostings(df)
      .groupBy($"doc_id").agg(count(lit(1)).as("u"), sum($"tf").as("n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val secsPost = (System.nanoTime() - t1) / 1e9
    assert(posts(1L) == (31L, nTok.toLong) && posts(2L) == (6L, 6L))
    info(f"10^5-token doc through perRowPostings: $secsPost%.1fs")
    assert(secsPost < 60.0)
  }

  test("FastSS typo pairs stay dictionary-bounded on a 5·10^4-value dictionary") {
    // editDistancePairs' scale contract: cost is dictionary-sized ×
    // value length (variants ≈ |dict|·(len+1) rows, the join keyed on
    // the variant). 50k distinct 11-char hex-id values are two orders
    // past the testdata AND an adversarially DENSE d=1 space —
    // sequential hex ids differ in one digit constantly, so the true
    // answer is ~1.4M pairs (measured), far past any real brand/city
    // dictionary's typo density. The op must still complete in seconds
    // with the planted single-deletion typos among the output.
    val n = 50000L
    val vals = spark.range(n).select(
      concat(lit("v"), lpad(conv(col("id").cast("string"), 10, 16), 10, "0"))
        .as("v"))
    // plant 100 single-char-deletion typos of the first 100 values
    val typos = spark.range(100L).select(
      concat(lit("v"), lpad(conv(col("id").cast("string"), 10, 16), 10, "0"))
        .substr(lit(2), lit(11)).as("v"))
    val t0 = System.nanoTime()
    val pairs = graft.ops.Dedup.editDistancePairs(
      vals.unionByName(typos), "v")
    val nPairs = pairs.count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"50k-value dictionary through FastSS d=1: $secs%.1fs, $nPairs pairs")
    assert(nPairs >= 100L, s"planted typos not all found: $nPairs")
    assert(secs < 60.0, f"dictionary join took $secs%.1fs")
  }

  test("FastSS d=2 neighborhood stays dictionary-bounded on a 10^4-value dictionary") {
    // The d=2 variant count is Σ_{i≤2} C(len, i) ≈ len²/2 per value
    // (~79 variants for an 11-char value vs 12 at d=1) and the hex-id
    // space is adversarially dense at d=2 (two free substitution
    // positions), so 10k sequential ids already generate a candidate
    // volume far past any real brand/city dictionary. The op must
    // complete in seconds, find planted distance-2 typos, and the
    // variant arrays must match the closed-form count — the boundary
    // where an accidentally-exponential neighborhood would explode.
    val n = 10000L
    val vals = spark.range(n).select(
      concat(lit("v"), lpad(conv(col("id").cast("string"), 10, 16), 10, "0"))
        .as("v"))
    // plant 50 DOUBLE-deletion typos of the first 50 values — invisible
    // to d=1 blocking, must be found at d=2
    val typos = spark.range(50L).select(
      concat(lit("v"), lpad(conv(col("id").cast("string"), 10, 16), 10, "0"))
        .substr(lit(3), lit(11)).as("v"))
    val planted = typos.collect().map(_.getString(0)).toSet
    val t0 = System.nanoTime()
    val pairs = graft.ops.Dedup.editDistancePairs(
      vals.unionByName(typos), "v", maxDist = 2)
    val nPairs = pairs.count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"10k-value dictionary through FastSS d=2: $secs%.1fs, $nPairs pairs")
    // every planted double-deletion typo appears in some d=2 pair with
    // its source (dist 2, lengths 11 vs 9 → unreachable at d=1)
    val found = pairs.filter(col("dist") === 2)
      .select(col("name_b")).collect().map(_.getString(0)).toSet ++
      pairs.filter(col("dist") === 2)
        .select(col("name_a")).collect().map(_.getString(0)).toSet
    assert(planted.subsetOf(found),
      s"missing planted d=2 typos: ${planted.diff(found).take(5)}")
    assert(secs < 90.0, f"d=2 dictionary join took $secs%.1fs")
  }

  test("classifier inference stays linear on a 10^5-token doc and takes a 10^5-bucket model") {
    // Two classifier boundaries: (a) the serving form's aggregate fold
    // must be O(tokens) per row — a 10^5-token document through the
    // literal-map scorer completes in seconds with the exact count; (b)
    // the batch form must accept a model far past literal size (10^5
    // buckets ride a broadcast join, the 10^6+ regime's shape) and
    // agree with the serving form on the same docs.
    val nTok = 100000
    val hot = (0 until nTok).map(i => s"t${i % 257}").mkString(" ")
    val docs = Seq((1L, hot), (2L, "t0 t1 t2")).toDF("doc_id", "text")
    val wMap: Map[Long, Long] = (0L until 1024L).map(b => b -> (b - 512L)).toMap
    val t0 = System.nanoTime()
    val served = graft.ops.TextOps.linearScore(docs, wMap, nBuckets = 1024)
      .orderBy("doc_id").collect()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"10^5-token doc through the literal-map scorer: $secs%.1fs")
    assert(served(0).getLong(1) == nTok.toLong)
    assert(secs < 60.0, f"serving fold took $secs%.1fs — no longer linear")
    // big-model broadcast path: 10^5 buckets, same answers as serving
    val bigW = spark.range(100000L)
      .select($"id".as("bucket"), ($"id" % 1024L - 512L).as("w_micros"))
    val bigMap: Map[Long, Long] = (0L until 100000L).map(b => b -> (b % 1024L - 512L)).toMap
    val a = graft.ops.TextOps.hashedLinearScore(docs, bigW, nBuckets = 100000)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = graft.ops.TextOps.linearScore(docs, bigMap, nBuckets = 100000)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a == b, "broadcast form and literal form diverged on a 10^5-bucket model")
  }

  test("batched BPE at k=64 picks per round: measured driver-loop budget for a 30k vocab") {
    // bpeTrainBatched is the claimed 30k-vocabulary path, but until now
    // it had only run at 2 rounds × 2 picks (r7 verdict item 3). This
    // pins the k=64 boundary the pack_sequences way: run REAL rounds at
    // production batch width, split the per-round cost into the corpus
    // pass (P) and the per-pick cached TakeOrdered pull (q) via two
    // batch widths, and record the extrapolated 30k budget. The cost
    // model (documented at bpeTrainBatched): a 30k vocab at k=64 is
    // ceil(30000/64) = 469 rounds × (P_corpus + 64·q_pick); P scales
    // with corpus size on the cluster, q is a driver-side constant —
    // ~tens of ms — because each pull is a TakeOrdered(1) over the
    // CACHED distinct-pair counts, never a corpus job.
    // Synthetic corpus: the testdata documents carry only 31 distinct
    // tokens — at most ~15 symbol-disjoint pairs exist, so k=64 rounds
    // are impossible there. A real training corpus has a 10^4+ token
    // vocabulary; 5000 docs × 80 tokens over 1000 distinct tokens
    // (hash-derived, fully columnar) reproduces that regime.
    val docs = spark.range(5000L).select($"id".as("doc_id"),
      array_join(transform(sequence(lit(0), lit(79)),
        j => concat(lit("w"),
          pmod(xxhash64($"id" * 101 + j), lit(1000)))), " ").as("text"))
    val t64 = {
      val t0 = System.nanoTime()
      val res = graft.ops.TextOps.bpeTrainBatched(docs, nRounds = 2, batchSize = 64)
      val n = res.merges.count()
      graft.ops.TextOps.releaseCaches()
      // the corpus genuinely supports 64 symbol-disjoint merges/round —
      // otherwise the measurement (and the 30k claim) would be vacuous
      assert(res.nRounds == 2 && n == 128L,
        s"expected 2 full rounds of 64 picks, got $n merges")
      (System.nanoTime() - t0) / 1e9
    }
    val t8 = {
      val t0 = System.nanoTime()
      val res = graft.ops.TextOps.bpeTrainBatched(docs, nRounds = 2, batchSize = 8)
      assert(res.nRounds == 2 && res.merges.count() == 16L)
      graft.ops.TextOps.releaseCaches()
      (System.nanoTime() - t0) / 1e9
    }
    // T(k) ≈ rounds·(P + k·q): two widths solve for both components
    val qPick = math.max(0.0, (t64 - t8) / (2.0 * 56.0))
    val pCorpus = math.max(0.0, t8 / 2.0 - 8.0 * qPick)
    val rounds30k = math.ceil(30000.0 / 64.0)
    val budget30k = rounds30k * (pCorpus + 64.0 * qPick)
    info(f"k=64 2 rounds: $t64%.1fs; k=8 2 rounds: $t8%.1fs -> per-pick " +
      f"q=${qPick * 1000}%.0fms, per-round corpus pass P=$pCorpus%.2fs; " +
      f"30k vocab = ${rounds30k.toInt} rounds = $budget30k%.0fs at this SF")
    // regression guards, generous for host contention: a pick must stay
    // a cached driver pull (sub-second), and a round must not regress to
    // corpus-sized work per PICK
    assert(qPick < 1.0, f"per-pick pull cost $qPick%.2fs - no longer a cached TakeOrdered")
    assert(t64 < 300.0, f"2 rounds at k=64 took $t64%.0fs")
  }

  test("bloom-pruned incremental dedup stays increment-bounded against a 10^6-doc seen corpus") {
    // The daily-crawl boundary: 10^6 seen docs, a 10^4-doc increment
    // (1% verbatim re-crawls). The bloom build is one explode +
    // bit_or aggregate over seen (linear, no driver state); the probe
    // and verify touch increment-sized data only — seen is scanned,
    // never exchanged. At 2^20 bits / 4 probes the FP rate at 10^6
    // keys is ~7%-ish per probe-set — the exact verify must absorb
    // whatever FPs occur and still return the exact answer.
    val seen = spark.range(1000000L).select($"id".as("doc_id"),
      concat(lit("seen corpus document body "), $"id").as("text"))
    val inc = spark.range(10000L).select(($"id" + 2000000L).as("doc_id"),
      when($"id" % 100 === 0, concat(lit("seen corpus document body "), $"id"))
        .otherwise(concat(lit("genuinely novel increment doc "), $"id"))
        .as("text"))
    val t0 = System.nanoTime()
    val out = graft.ops.Dedup.bloomNovelDocuments(inc, seen,
      mBits = 1 << 20, kProbes = 4)
    val novel = out.filter(!$"is_novel").count()
    val total = out.count()
    val secs = (System.nanoTime() - t0) / 1e9
    graft.ops.Dedup.releaseCaches()
    info(f"10^6-seen / 10^4-increment bloom dedup: $secs%.1fs, $novel dups of $total")
    assert(total == 10000L && novel == 100L,
      s"exactness lost at scale: $novel dups (want 100) of $total")
    assert(secs < 60.0, f"bloom incremental dedup took $secs%.1fs")
  }

  test("MLM/T5 corruption prep stays linear on a 10^5-token document") {
    // Both ops are per-position md5 projections; the boundary pins that
    // a hot document costs O(n) — one explode, no per-position rescans
    // of the text (the lambda-CSE trap), and for t5_spans the island
    // windows stay per-doc.
    val nTok = 100000
    val hot = (0 until nTok).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, hot), (2L, "a b c")).toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val masked = graft.ops.TextOps.mlmMask(docs).count()
    val spans = graft.ops.TextOps.corruptionSpans(docs)
      .agg(sum($"n_corrupted")).head().getLong(0)
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"10^5-token doc through mlmMask+corruptionSpans: $secs%.1fs, " +
      f"$masked masked, $spans span-corrupted")
    // ~15% of positions each, ±5% absolute at n = 10^5
    assert(masked > nTok * 10 / 100 && masked < nTok * 20 / 100)
    assert(spans > nTok * 10 / 100 && spans < nTok * 20 / 100)
    assert(secs < 60.0, f"corruption prep took $secs%.1fs on a 10^5-token doc")
  }

  test("bpeApply serves a real 30k-merge vocabulary: measured corpus-apply cost") {
    // The train discipline applied to SERVING (r8 verdict #3): the k=64
    // boundary measured training at vocab scale; this measures APPLY.
    // 5000 docs × 80 tokens over a 1000-token alphabet (the k=64
    // corpus) through a 30k-merge table. The vocabulary-dominates
    // regime: ~79 adjacent pairs/doc against 30k merges means ≈ 99.9%
    // of the vocab is ABSENT from any one document, so the pair-index
    // gate turns 30k O(len) replace passes/doc (naive ≈ 1.7·10^7 char
    // ops/doc — minutes for the corpus) into 30k O(1) probes + a
    // handful of applied passes. Cost model pinned at bpeApply's
    // scaladoc: O(len + merges + applied·len) per doc.
    val docs = spark.range(5000L).select($"id".as("doc_id"),
      array_join(transform(sequence(lit(0), lit(79)),
        j => concat(lit("w"),
          pmod(xxhash64($"id" * 101 + j), lit(1000)))), " ").as("text"))
    // 30k deterministic merges over the same alphabet; a few percent
    // occur somewhere in the corpus, matching a trained vocab's shape
    val merges = (0 until 30000).map(m =>
      (s"w${m % 1000}", s"w${(m * 7 + 3) % 1000}"))
    val t0 = System.nanoTime()
    val out = graft.ops.TextOps.bpeApply(docs, merges)
      .agg(sum($"n_symbols"), sum($"n_tokens")).head()
    val secs = (System.nanoTime() - t0) / 1e9
    val nSym = out.getLong(0); val nTok = out.getLong(1)
    info(f"30k-merge vocab over 5000x80-token docs: $secs%.1fs " +
      f"(${secs / 5000 * 1000}%.2f ms/doc), $nTok tokens -> $nSym symbols")
    assert(nTok == 400000L)
    assert(nSym < nTok, "no merge applied — the fixture lost its realism")
    // generous contention headroom; the naive 30k-pass loop measured
    // minutes here, the indexed gate seconds
    assert(secs < 120.0, f"30k-merge corpus apply took $secs%.1fs")
  }

  test("stopword query term (df = 10^6) stays partial-agg bounded in search ops") {
    import graft.ops.{Search, Sketches}
    // A query containing a stopword makes that term's postings
    // corpus-sized. The postings aggregate keys on (token, doc) —
    // distinct per doc, so the hot TOKEN never lands in one task — and
    // the top-k is TakeOrdered, never a global sort. Phrase search on
    // the same corpus joins on (doc, pos): fine-grained keys, bounded
    // by the fixture's one true match.
    val n = 1000000L
    val docs = spark.range(n).select(
      $"id".as("doc_id"),
      concat(lit("u"), $"id", lit("a the u"), $"id", lit("b")).as("text"))
    val ranked = Search.rankedSearch(docs, Seq("the", "u5a"), k = 10)
    val plan = ranked.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "top-k must be TakeOrdered, not a global sort")
    assert(!plan.contains("windowspecdefinition"),
      "scoring must never window over the hot token")
    val t0 = System.nanoTime()
    val top = ranked.collect()
    val secsRank = (System.nanoTime() - t0) / 1e9
    // doc 5 matches BOTH terms; everyone else only 'the' with identical
    // tf/dl, so ties break on doc_id
    assert(top.head.getLong(0) == 5L && top.head.getLong(2) == 2L)
    assert(top.drop(1).map(_.getLong(0)).toSeq ==
      (0L until 10L).filterNot(_ == 5L).take(9))
    Search.releaseCaches()
    val t1 = System.nanoTime()
    val phrase = Search.phraseSearch(docs, Seq("u5a", "the")).collect()
    val secsPhrase = (System.nanoTime() - t1) / 1e9
    assert(phrase.toSeq.map(r => (r.getLong(0), r.getInt(1))) == Seq((5L, 0)))
    Search.releaseCaches()
    // CMS over the same skewed stream: the counter table is bounded by
    // d x w REGARDLESS of the 10^6-item universe, and the heavy-hitter
    // answer is exact
    val items = docs.select(explode(split($"text", " ")).as("item"))
    val counters = Sketches.cmsCounters(items, width = 1024, depth = 3)
    assert(counters.count() <= 3L * 1024L,
      "counter table must stay d*w regardless of universe size")
    val t2 = System.nanoTime()
    val hh = Sketches.cmsHeavyHitters(items, n / 2, width = 1024, depth = 3)
      .collect()
    val secsHh = (System.nanoTime() - t2) / 1e9
    assert(hh.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("the", n)))
    info(f"10^6-doc search family: ranked $secsRank%.1fs, phrase $secsPhrase%.1fs, cms-heavy $secsHh%.1fs")
  }

  test("windowFunnel completes on a hot user (10^6 events in one partition)") {
    import graft.ops.Sessionize
    // the funnel's one concentration point is the per-user sort — a
    // 10^6-event user lands in a single window partition (the
    // sessionize-core spill story applies). Planted pattern: the chain
    // completes only through the LAST view (every earlier view's
    // window expires before the purchase) — the dominance fold must
    // track the running max through all 10^6 rows.
    val n = 1000000L
    val w = 3600L
    val events = spark.range(n).select(
      lit(7L).as("user_id"),
      org.apache.spark.sql.functions.timestamp_micros($"id" * 1000000L).as("ts"),
      when($"id" === n - 3, "view")
        .when($"id" === n - 2, "click")
        .when($"id" === n - 1, "purchase")
        .when(pmod($"id", lit(97L)) === 0, "view")
        .otherwise("scroll").as("event_type"),
      $"id".as("event_id"))
    val t0 = System.nanoTime()
    val got = Sessionize.windowFunnel(events,
        Seq("view", "click", "purchase"), w)
      .collect()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"10^6-event hot-user funnel: $secs%.1fs")
    assert(got.toSeq.map(r => (r.getLong(0), r.getLong(1))) == Seq((7L, 3L)))
  }

  test("HLL register fold stays 2^p-bounded on a 10^7-occurrence stream") {
    import graft.ops.Hll
    // the summary-bound claim at its extreme: 10^7 occurrences of 10^6
    // distinct items fold to at most m = 4096 register rows, with the
    // max collapsing map-side (partial_max below the exchange) so each
    // task ships ≤ m rows whatever its input size. The estimate must
    // land in the 3σ band (σ = 1.04/√4096 ≈ 1.6%) — measured accuracy
    // at a scale the oracle fixtures never reach.
    val n = 10000000L
    val distinct = 1000000L
    val occ = spark.range(n)
      .select(concat(lit("item"), pmod($"id", lit(distinct))).as("item"))
    val regs = Hll.registers(occ, "item", p = 12)
    val plan = regs.queryExecution.executedPlan.toString
    assert(plan.contains("partial_max"),
      "the register fold must collapse map-side via partial aggregation")
    val t0 = System.nanoTime()
    val nRegs = regs.count()
    val secsFold = (System.nanoTime() - t0) / 1e9
    assert(nRegs <= 4096L,
      s"register table must stay <= 2^p rows regardless of input ($nRegs)")
    val est = Hll.estimate(regs, p = 12).head().getLong(0)
    val rel = math.abs(est - distinct).toDouble / distinct
    info(f"10^7-occurrence HLL fold: $secsFold%.1fs, est=$est rel_err=$rel%.4f")
    assert(rel <= 0.049, f"estimate outside the 3-sigma band: $rel%.4f")
  }

  test("takedown at boundary scale: 10^5 tombstones / 10^2 batches — delete, read, compact, read measured") {
    // The r11 verdict's top task: deleteDocs recomputes its decrement
    // row from the FULL tombstone set and every read anti-joins it, so
    // the lifecycle's real boundary is tombstone-set size x directory
    // count. This measures that boundary at 10^5 tombstones across
    // 10^2 delete batches on BOTH stores, then shows compactTombstones
    // collapsing the directory axis with byte-identical results.
    // The row axis is irreducible by design (frozen dls must survive
    // forever for the decrement; delete-wins-forever needs every id) —
    // at 10^5 rows the anti-join side broadcasts; past broadcast size
    // it becomes a doc_id-keyed shuffle of the already-pruned,
    // query-term-sized postings, never a corpus pass.
    val base = Files.createTempDirectory("graft-tsbound").toString
    val docs = Tables.documents(spark, Sf0001)
    val docsP = s"$base/docs"
    docs.select($"doc_id", $"text").write.parquet(docsP)
    val out = s"$base/index"
    graft.jobs.BuildTextIndex.run(spark, docsP, out)
    // two REAL takedowns first (docs actually in the store — they set
    // the decrement row the synthetic flood must never perturb)
    val realDel = s"$base/realdel"
    docs.filter($"doc_id" % 7 === 0).select($"doc_id").write.parquet(realDel)
    graft.jobs.BuildTextIndex.deleteDocs(spark, realDel, out, "real0")
    assert(spark.read.parquet(s"$out/meta/batch=deletes")
      .head.getLong(0) == -docs.filter($"doc_id" % 7 === 0).count())
    // the flood: 98 synthetic batches x ~1000 DISTINCT never-indexed
    // ids (dl null — exactly what a takedown list of docs your store
    // never ingested looks like), written directly as batch dirs (the
    // layout deleteDocs produces; writing via 98 deleteDocs calls
    // would measure 98 recomputes, not the boundary state)
    val nBatch = 98; val perBatch = 1000
    val tGen0 = System.nanoTime()
    (0 until nBatch).foreach { i =>
      spark.range(1000000L + i.toLong * perBatch,
          1000000L + (i + 1).toLong * perBatch)
        .select($"id".as("doc_id"), lit(null).cast("int").as("dl"))
        .coalesce(1).write.parquet(s"$out/deletes/batch=syn$i")
    }
    val secsGen = (System.nanoTime() - tGen0) / 1e9
    val terms = Seq("hash", "scan", "stream")
    def search() = {
      val r = graft.jobs.BuildTextIndex.searchStored(spark, out, terms, 15)
        .collect().map(_.toSeq).toSeq
      graft.ops.Search.releaseCaches(); r
    }
    // boundary DELETE: one real takedown with 10^2 dirs / 10^5 rows
    // present — its decrement recompute reads the whole set
    val realDel2 = s"$base/realdel2"
    docs.filter($"doc_id" % 11 === 0).select($"doc_id").write.parquet(realDel2)
    val tDel0 = System.nanoTime()
    graft.jobs.BuildTextIndex.deleteDocs(spark, realDel2, out, "real1")
    val secsDel = (System.nanoTime() - tDel0) / 1e9
    // boundary READ: the anti-join pays the full 10^2-dir listing
    val tRead0 = System.nanoTime()
    val want = search()
    val secsReadB = (System.nanoTime() - tRead0) / 1e9
    val decAfter = spark.read.parquet(s"$out/meta/batch=deletes")
      .collect().map(_.toSeq).toSeq
    // COMPACT: 10^2 dirs -> 1, nothing observable changes
    val tComp0 = System.nanoTime()
    graft.jobs.BuildTextIndex.compactTombstones(spark, out)
    val secsComp = (System.nanoTime() - tComp0) / 1e9
    val tRead1 = System.nanoTime()
    val got = search()
    val secsReadA = (System.nanoTime() - tRead1) / 1e9
    assert(got == want, "compaction changed search results")
    assert(spark.read.parquet(s"$out/meta/batch=deletes")
      .collect().map(_.toSeq).toSeq == decAfter,
      "compaction must leave the decrement row untouched")
    val dirs = new java.io.File(s"$out/deletes").listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).toSeq
    assert(dirs.size == 1, s"expected one compacted dir, got ${dirs.size}")
    // distinct accounting: the two real batches overlap on %77 docs,
    // which the fold correctly collapses to one row each
    assert(spark.read.parquet(s"$out/deletes").count() ==
      nBatch.toLong * perBatch +
        docs.filter($"doc_id" % 7 === 0 || $"doc_id" % 11 === 0).count(),
      "every distinct tombstone must survive the fold exactly once")
    // the synthetic dl-null flood never touches the decrement row:
    // after real1 it counts exactly the union of the two REAL batches
    // (every one of their docs was indexed, so each decrements once)
    val nRealDocs = docs.filter($"doc_id" % 7 === 0 || $"doc_id" % 11 === 0)
      .count()
    assert(decAfter.head.head == -nRealDocs,
      s"decrement n_docs must be -$nRealDocs (got ${decAfter.head.head}) — " +
        "the dl-null flood must contribute zero")
    // dedup-store twin at the same boundary
    val dout = s"$base/dindex"
    graft.jobs.BuildDedupIndex.run(spark, docsP, dout)
    (0 until nBatch).foreach { i =>
      spark.range(1000000L + i.toLong * perBatch,
          1000000L + (i + 1).toLong * perBatch)
        .select($"id".as("doc_id"))
        .coalesce(1).write.parquet(s"$dout/deletes/batch=syn$i")
    }
    val batchP = s"$base/probebatch"
    docs.filter($"doc_id" % 13 === 0).select($"doc_id", $"text")
      .write.parquet(batchP)
    def probe() = {
      val r = graft.jobs.BuildDedupIndex.append(spark, batchP, docsP,
          dout, batchId = "probeQ")
        .select("doc_a", "doc_b").collect().map(_.toSeq).toSet
      graft.ops.Dedup.releaseCaches(); r
    }
    val tProbe0 = System.nanoTime()
    val dWant = probe()
    val secsProbeB = (System.nanoTime() - tProbe0) / 1e9
    val tDComp0 = System.nanoTime()
    graft.jobs.BuildDedupIndex.compactTombstones(spark, dout)
    val secsDComp = (System.nanoTime() - tDComp0) / 1e9
    val tProbe1 = System.nanoTime()
    assert(probe() == dWant, "dedup probe changed across the fold")
    val secsProbeA = (System.nanoTime() - tProbe1) / 1e9
    assert(new java.io.File(s"$dout/deletes").listFiles()
      .count(_.getName.startsWith("batch=")) == 1)
    // loose walls (shared host): the point is the MEASUREMENT + the
    // invariants above, not a tight SLA. Dev-box only — CI's 4-vCPU
    // shared runner is sized differently; the correctness asserts
    // above still run there
    if (isDriverTestdata)
      assert(secsDel < 120 && secsReadB < 120 && secsComp < 120,
        "boundary blowup")
    info(f"text store @ 10^5/10^2: delete $secsDel%.1f s, read-before " +
      f"$secsReadB%.1f s, compact $secsComp%.1f s, read-after $secsReadA%.1f s " +
      f"(gen $secsGen%.1f s)")
    info(f"dedup store @ 10^5/10^2: probe-before $secsProbeB%.1f s, " +
      f"compact $secsDComp%.1f s, probe-after $secsProbeA%.1f s")
  }
}
