package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Sessionize

/** Event-stream operator surface beyond core sessionization: the union
  * carry (SURVEY §2.4 U1), ingest partition derivation (§2.1 S6 / DFD
  * parity), conditional projection (§2.2 P10), JSON props extraction and
  * as-of forward fill (§2.6 W4 analog).
  */
object EventQueries {

  /** 2024-01-15 00:00:00 UTC — same boundary as active_sessions. */
  private val BoundaryUs = 1705276800000000L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "union_carry" -> { (spark, dir) =>
      // U1: unionByName(allowMissingColumns) — prev rows carry session_id,
      // current rows get NULL injected. The reference's state-carry move
      // (SessionizationBuiltIn.scala:54–55).
      import spark.implicits._
      val ev = Tables.events(spark, dir)
      val prev = Sessionize.withSessionId(ev.filter(unix_micros($"ts") <= BoundaryUs))
        .drop("session_no")
      val cur = ev.filter(unix_micros($"ts") > BoundaryUs)
      val unioned = prev.unionByName(cur, allowMissingColumns = true)
      unioned
        .groupBy($"session_id".isNull.as("is_current"))
        .agg(count(lit(1)).as("n_rows"),
          min($"event_id").as("min_event"), max($"event_id").as("max_event"))
        .orderBy("is_current")
    },

    "hour_partitions" -> { (spark, dir) =>
      // DailyFileDivider parity (DFD:26–45): derive Hive partition columns
      // event_date/event_hour from ts; count per partition. At 100 TB this
      // is the repartition(date,hour)+partitionBy write layout.
      import spark.implicits._
      Tables.events(spark, dir)
        .withColumn("event_date", date_format($"ts", "yyyy-MM-dd"))
        .withColumn("event_hour", date_format($"ts", "HH"))
        .groupBy($"event_date", $"event_hour")
        .agg(count(lit(1)).as("n_rows"),
          sum(round($"value" * 100).cast("long")).as("value_cents"))
        .orderBy("event_date", "event_hour")
    },

    "eventtype_when" -> { (spark, dir) =>
      // P10: 3-branch when/otherwise (CaseWhen), null-producing branch.
      import spark.implicits._
      Tables.events(spark, dir)
        .withColumn("kind",
          when($"event_type" === "purchase", lit("money"))
            .when($"event_type" === "error", lit(null).cast("string"))
            .otherwise(lit("engagement")))
        .groupBy($"kind")
        .agg(count(lit(1)).as("n_rows"),
          sum(round($"value" * 100).cast("long")).as("value_cents"))
        .orderBy(asc_nulls_first("kind"))
    },

    "json_props" -> { (spark, dir) =>
      // JSON-in-string extraction; regexp-based so both engines agree
      // without JSON-extension semantics differences. get_json_object is
      // the Spark-native route; regexp keeps the oracle portable.
      import spark.implicits._
      Tables.events(spark, dir)
        .withColumn("k", regexp_extract($"props", "\"k\":\\s*(\\d+)", 1).cast("long"))
        .groupBy(($"k" % 10).as("k_mod"))
        .agg(count(lit(1)).as("n_rows"), sum($"k").as("sum_k"))
        .orderBy("k_mod")
    },

    "variant_json" -> { (spark, dir) =>
      // Spark 4 VARIANT: parse the JSON string ONCE into the binary
      // semi-structured type and extract with variant_get — unlike
      // get_json_object, repeated accesses don't re-parse the string,
      // and the format is the one columnar shredding reads at scale.
      import spark.implicits._
      Tables.events(spark, dir)
        .withColumn("v", parse_json($"props"))
        .select(expr("variant_get(v, '$.k', 'long')").as("k"))
        .groupBy(($"k" % 7).as("k_mod"))
        .agg(count(lit(1)).as("n_rows"), sum($"k").as("sum_k"), max($"k").as("max_k"))
        .orderBy("k_mod")
    },

    "json_native" -> { (spark, dir) =>
      // Spark-native JSON extraction (get_json_object); DuckDB oracles it
      // with json_extract_string. Complements json_props' regexp route.
      import spark.implicits._
      Tables.events(spark, dir)
        .withColumn("k", get_json_object($"props", "$.k").cast("long"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_rows"), sum($"k").as("sum_k"),
          min($"k").as("min_k"), max($"k").as("max_k"))
        .orderBy("event_type")
    },

    "winsorized_stats" -> { (spark, dir) =>
      // Robust aggregation: clamp each event_type's values to its
      // nearest-rank P01/P99 before summing (the mean that one corrupt
      // sensor reading cannot drag). Nearest-rank percentiles are PURE
      // INTEGER: the value at row_number ceil(q·n) = (q·n + 99) ∕ 100
      // in (cents, event_id) order — no interpolation, no floats;
      // clamping and sums stay int64.
      import spark.implicits._
      val b = Tables.events(spark, dir).select($"event_type", $"event_id",
        round($"value" * 100).cast("long").as("cents"))
      val w = Window.partitionBy($"event_type").orderBy($"cents", $"event_id")
      val ranked = b
        .withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(Window.partitionBy($"event_type")))
      // Spark's `/` on longs is DOUBLE division — floor() restores the
      // integer ceil-rank formula
      val lowRk = floor(($"n" + 99L) / 100L)
      val highRk = floor(($"n" * 99L + 99L) / 100L)
      val bounds = ranked
        .filter($"rk" === lowRk || $"rk" === highRk)
        .groupBy($"event_type")
        .agg(min(when($"rk" === lowRk, $"cents")).as("p01"),
          max(when($"rk" === highRk, $"cents")).as("p99"))
      ranked.join(broadcast(bounds), "event_type")
        .withColumn("clamped", greatest(least($"cents", $"p99"), $"p01"))
        .groupBy($"event_type")
        .agg(first($"p01").as("p01"), first($"p99").as("p99"),
          sum($"clamped").as("clamped_sum"), count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    "value_histogram" -> { (spark, dir) =>
      // The mergeable profile fold: event cents in fixed $5 buckets —
      // ONE map-side-combining aggregate whose output is bounded by the
      // value range, never the row count; the unit the profile store
      // persists per batch and merges by addition.
      import spark.implicits._
      graft.ops.Sketches.bucketHistogram(
          Tables.events(spark, dir)
            .select(round($"value" * 100).cast("long").as("cents")),
          "cents", width = 500L)
        .orderBy("bucket")
    },

    "bucketed_quantiles" -> { (spark, dir) =>
      // Quantiles WITHOUT a corpus sort: p50/p90/p99/p999 of event
      // cents as nearest-rank bucket bounds (error < width=100, i.e.
      // < $1) derived from the histogram by pure integer arithmetic —
      // the scale answer to winsorized_stats' full-sort percentiles.
      import spark.implicits._
      val hist = graft.ops.Sketches.bucketHistogram(
        Tables.events(spark, dir)
          .select(round($"value" * 100).cast("long").as("cents")),
        "cents", width = 100L)
      graft.ops.Sketches.bucketedQuantiles(hist, 100L,
          Seq((1, 2), (9, 10), (99, 100), (999, 1000)))
        .orderBy("rank", "q_den")
    },

    "quantiles_stored" -> { (spark, dir) =>
      // The persisted form (BuildProfileStore): three per-batch
      // histograms folded to disk with width pinned in per-batch meta,
      // merged at read through the loud width/device gate, quantiles
      // from the merged table — identical to the one-shot derivation,
      // no source re-scan.
      import spark.implicits._
      val base = java.nio.file.Files.createTempDirectory("graft-prof-store")
      val cents = Tables.events(spark, dir)
        .select($"event_id", round($"value" * 100).cast("long").as("cents"))
      def slice(p: String, f: org.apache.spark.sql.Column): String = {
        cents.filter(f).select($"cents").write.mode("overwrite").parquet(p); p
      }
      val out = s"$base/store"
      // overlap the independent slice stagings and the disjoint-batch
      // appends (guide §2.6); run-before-append stays ordered
      graft.jobs.Overlap.all(
        () => slice(s"$base/h0", $"event_id" % 3 === 0): Unit,
        () => slice(s"$base/h1", $"event_id" % 3 === 1): Unit,
        () => slice(s"$base/h2", $"event_id" % 3 === 2): Unit)
      graft.jobs.BuildProfileStore.run(spark, s"$base/h0", out, "cents", 100L)
      graft.jobs.Overlap.all(
        () => graft.jobs.BuildProfileStore.append(spark, s"$base/h1", out, "h1", "cents"),
        () => graft.jobs.BuildProfileStore.append(spark, s"$base/h2", out, "h2", "cents"))
      graft.jobs.BuildProfileStore.quantiles(spark, out,
          Seq((1, 2), (9, 10), (99, 100), (999, 1000)))
        .orderBy("rank", "q_den")
    },

    "table_profile" -> { (spark, dir) =>
      // Single-pass column profile of the events table (the first audit
      // against any new table): per column, rows / non-nulls / exact
      // distincts / min / max. Floats are profiled as integer cents
      // (float min/max STRING formatting is engine-specific; values are
      // not).
      import spark.implicits._
      val b = Tables.events(spark, dir).select($"event_id", $"user_id",
        $"event_type", round($"value" * 100).cast("long").as("cents"))
      graft.ops.DataQuality.profile(b,
          Seq("cents", "event_id", "event_type", "user_id"))
        .orderBy("col_name")
    },

    "table_profile_batched" -> { (spark, dir) =>
      // The WIDTH escape hatch under the same oracle: batchSize=2 forces
      // the 4 profiled columns through TWO unioned aggregates (each
      // expand tuple 2 columns wide instead of 4) — measured 5× faster
      // than the single-aggregate form at 50 columns (ScaleSpec). The
      // oracle is identical to table_profile: batching must not change
      // a single stat.
      import spark.implicits._
      val b = Tables.events(spark, dir).select($"event_id", $"user_id",
        $"event_type", round($"value" * 100).cast("long").as("cents"))
      graft.ops.DataQuality.profileBatched(b,
          Seq("cents", "event_id", "event_type", "user_id"), batchSize = 2)
        .orderBy("col_name")
    },

    "rolling_outliers" -> { (spark, dir) =>
      // WINDOWED exact 3-sigma anomaly detection: each event against
      // its user's trailing 8-event window EXCLUDING itself —
      // value_outliers' integer identity (v·n−S)² > 9·(n·Q−S²) applied
      // over a rows-frame, so a user whose spend drifts still flags the
      // spike a GLOBAL sigma would absorb. The self-exclusion is load-
      // bearing: with the current row in its own window, max |v−μ|/σ
      // over n ≤ 9 samples is (n−1)/√n < 3 and the test can NEVER fire.
      // Requires n ≥ 5 trailing samples. ONE key exchange (user_id
      // window); sums in decimal(38,0)/HUGEINT, no floats.
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(-8, -1)
      val base = Tables.events(spark, dir).select($"event_id", $"user_id", $"ts",
        round($"value" * 100).cast("long").as("cents"))
      val withStats = base
        .withColumn("n", count(lit(1)).over(w).cast("decimal(38,0)"))
        .withColumn("s", sum($"cents".cast("decimal(38,0)")).over(w))
        .withColumn("q", sum(($"cents" * $"cents").cast("decimal(38,0)")).over(w))
      val d = $"cents".cast("decimal(38,0)") * $"n" - $"s"
      withStats
        .filter($"n" >= 5 && d * d > lit(9) * ($"n" * $"q" - $"s" * $"s"))
        .select($"event_id", $"user_id", $"cents", $"n".cast("long").as("n_win"))
        .orderBy("event_id")
    },

    "value_outliers" -> { (spark, dir) =>
      // Exact z-score outlier detection (the numeric data-quality
      // filter): events whose value sits more than 3 population
      // standard deviations from their event_type's mean. No floats
      // anywhere: with integer cents v, per-group n, S=Σv, Q=Σv², the
      // test |v−μ| > 3σ is the pure-integer (v·n−S)² > 9·(n·Q−S²) —
      // decimal(38,0) here, HUGEINT in the oracle, exact in both. The
      // per-group stats are a tiny broadcast; the corpus side is one
      // partial-aggregated shuffle + a per-row filter.
      import spark.implicits._
      val base = Tables.events(spark, dir).select($"event_id", $"event_type",
        round($"value" * 100).cast("long").as("cents"))
      val stats = base.groupBy($"event_type").agg(
        count(lit(1)).cast("decimal(38,0)").as("n"),
        sum($"cents".cast("decimal(38,0)")).as("s"),
        sum(($"cents" * $"cents").cast("decimal(38,0)")).as("q"))
      val d = $"cents".cast("decimal(38,0)") * $"n" - $"s"
      base.join(broadcast(stats), "event_type")
        .filter(d * d > lit(9) * ($"n" * $"q" - $"s" * $"s"))
        .select($"event_id", $"event_type", $"cents")
        .orderBy("event_id")
    },

    "hash_sample" -> { (spark, dir) =>
      // Deterministic hash sampling — the scalable way to sample training
      // data (reproducible across runs/engines, no RNG state): keep rows
      // whose md5(event_id) starts below a threshold ≈ 10%.
      import spark.implicits._
      Tables.events(spark, dir)
        .filter(conv(substring(md5($"event_id".cast("string")), 1, 4), 16, 10)
          .cast("long") < lit(6554))  // 6554/65536 ≈ 10%
        .select($"event_id", $"user_id", $"event_type")
        .orderBy("event_id")
    },

    "stratified_sample" -> { (spark, dir) =>
      // Per-stratum deterministic sampling at different rates per
      // event_type (balancing a training mix): rate depends on stratum.
      import spark.implicits._
      val rate = when($"event_type" === "purchase", 52429)   // ~80%
        .when($"event_type" === "view", 6554)                // ~10%
        .otherwise(lit(19661))                               // ~30%
      Tables.events(spark, dir)
        .filter(conv(substring(md5($"event_id".cast("string")), 1, 4), 16, 10)
          .cast("long") < rate)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_sampled"), min($"event_id").as("min_id"))
        .orderBy("event_type")
    },

    "date_spine_fill" -> { (spark, dir) =>
      // Gap filling: a generated per-user day spine (sequence + explode,
      // map-side) left-joined with actual daily spend so missing days
      // surface as zeros — the standard time-series densification move.
      import spark.implicits._
      val ev = Tables.events(spark, dir).filter($"user_id" < 20)
        .select($"user_id", floor(unix_micros($"ts") / lit(86400000000L)).as("day"),
          round($"value" * 100).cast("long").as("cents"))
      val daily = ev.groupBy($"user_id", $"day").agg(sum($"cents").as("day_cents"))
      val spine = ev.groupBy($"user_id")
        .agg(min($"day").as("d0"), max($"day").as("d1"))
        .select($"user_id", explode(sequence($"d0", $"d1")).as("day"))
      spine.join(daily, Seq("user_id", "day"), "left")
        .select($"user_id", $"day", coalesce($"day_cents", lit(0L)).as("day_cents"))
        .orderBy("user_id", "day")
    },

    "running_distinct_users" -> { (spark, dir) =>
      // Cumulative distinct users per day. A windowed COUNT(DISTINCT) is
      // not computable incrementally — the scalable form: each user
      // contributes on their FIRST day only (one aggregate), then a
      // running sum over the daily new-user counts (one tiny window).
      import spark.implicits._
      val firstDay = Tables.events(spark, dir)
        .select($"user_id", floor(unix_micros($"ts") / lit(86400000000L)).as("day"))
        .groupBy($"user_id").agg(min($"day").as("day"))
      val daily = firstDay.groupBy($"day").agg(count(lit(1)).as("new_users"))
      val w = Window.orderBy($"day").rowsBetween(Window.unboundedPreceding, 0)
      daily.withColumn("cum_users", sum($"new_users").over(w))
        .orderBy("day")
    },

    "interpolate_gaps" -> { (spark, dir) =>
      // Linear interpolation over the densified spine: missing days get
      // prev + (next − prev) · Δ/span, where prev/next come from
      // asymmetric-frame IGNORE NULLS window fills (no self-join, no
      // per-gap loop). All inputs are exact integers (cents, day
      // ordinals); the interpolation itself is a fixed-shape float
      // chain, identical across engines.
      import spark.implicits._
      val ev = Tables.events(spark, dir).filter($"user_id" < 20)
        .select($"user_id", floor(unix_micros($"ts") / lit(86400000000L)).as("day"),
          round($"value" * 100).cast("long").as("cents"))
      val daily = ev.groupBy($"user_id", $"day").agg(sum($"cents").as("cents"))
      val spine = ev.groupBy($"user_id")
        .agg(min($"day").as("d0"), max($"day").as("d1"))
        .select($"user_id", explode(sequence($"d0", $"d1")).as("day"))
      val wB = Window.partitionBy($"user_id").orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, 0)
      val wF = Window.partitionBy($"user_id").orderBy($"day")
        .rowsBetween(0, Window.unboundedFollowing)
      spine.join(daily, Seq("user_id", "day"), "left")
        .withColumn("pc", last($"cents", ignoreNulls = true).over(wB))
        .withColumn("pd", last(when($"cents".isNotNull, $"day"), ignoreNulls = true).over(wB))
        .withColumn("nc", first($"cents", ignoreNulls = true).over(wF))
        .withColumn("nd", first(when($"cents".isNotNull, $"day"), ignoreNulls = true).over(wF))
        .select($"user_id", $"day",
          when($"cents".isNotNull, $"cents".cast("double"))
            .otherwise($"pc".cast("double") +
              ($"nc".cast("double") - $"pc".cast("double")) *
              (($"day" - $"pd").cast("double") / ($"nd" - $"pd").cast("double")))
            .as("value_interp"),
          $"cents".isNull.as("was_missing"))
        .orderBy("user_id", "day")
    },

    "first_last_touch" -> { (spark, dir) =>
      // min_by/max_by attribution: first and last event type per user in
      // one hash aggregate — no window, no self-join. Deterministic
      // because (user_id, ts) is unique in this corpus.
      import spark.implicits._
      Tables.events(spark, dir)
        .groupBy($"user_id")
        .agg(
          min_by($"event_type", unix_micros($"ts")).as("first_touch"),
          max_by($"event_type", unix_micros($"ts")).as("last_touch"),
          min(unix_micros($"ts")).as("first_us"),
          max(unix_micros($"ts")).as("last_us"))
        .orderBy("user_id")
    },

    "reservoir_sample" -> { (spark, dir) =>
      // Fixed-size deterministic sample: order by a keyed hash, keep k.
      // Plans as TakeOrderedAndProject — each partition keeps its own
      // top-k then the driver merges k·p rows, so no global sort ever
      // materializes (the distributed reservoir-sampling equivalent).
      import spark.implicits._
      Tables.events(spark, dir)
        .withColumn("rnd", md5($"event_id".cast("string")))
        .orderBy("rnd").limit(200)
        .select($"event_id", $"user_id", $"event_type")
        .orderBy("event_id")
    },

    "cube_events" -> { (spark, dir) =>
      // Full CUBE over (event_type, day-of-week) with grouping_id —
      // completes the grouping-sets surface next to rollup_lineitem.
      // 2^2 grouping sets expand map-side (Expand operator), then one
      // hash aggregate: at scale the cube costs one pass, not four.
      import spark.implicits._
      Tables.events(spark, dir)
        .select($"event_type", dayofweek($"ts").cast("long").as("dow"),
          round($"value" * 100).cast("long").as("cents"))
        .cube($"event_type", $"dow")
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
          sum($"cents").as("value_cents"))
        .orderBy($"gid", $"event_type".asc_nulls_first, $"dow".asc_nulls_first)
    },

    "asof_prior_signup" -> { (spark, dir) =>
      // As-of forward fill: for every event, the user's most recent
      // signup at-or-before it (W4 last(ignoreNulls) analog, expressed as
      // max-over-frame which is deterministic and portable).
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(spark, dir)
        .withColumn("prior_signup_us",
          max(when($"event_type" === "signup", unix_micros($"ts"))).over(w))
        .filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"prior_signup_us")
        .orderBy("event_id")
    },

    "salted_join" -> { (spark, dir) =>
      // The MANUAL hot-key join remedy (ops/Skew.saltedJoin) under the
      // driver's oracle: a planted skew key puts 80% of all events on
      // ONE join key ('hot'), joined to a small constructed dim. The
      // salted join replicates the dim ×16 and spreads the hot key's
      // rows across 16 shuffle partitions (ScaleSpec proves the spread
      // and AQE-inapplicability); the oracle is the PLAIN equi-join —
      // salting must be result-invariant. Salt source is event_id, so
      // the salt assignment is deterministic.
      import spark.implicits._
      val fact = Tables.events(spark, dir).select($"event_id",
        when($"event_id" % 10 < 8, lit("hot"))
          .otherwise(concat(lit("k"), ($"event_id" % 10).cast("string")))
          .as("jkey"))
      val dim = Seq(("hot", 1L), ("k8", 9L), ("k9", 10L)).toDF("jkey", "weight")
      graft.ops.Skew.saltedJoin(fact, dim, Seq("jkey"), saltSrc = $"event_id")
        .select($"event_id", $"jkey", $"weight")
        .orderBy("event_id")
    })

  val oracles: Map[String, String] = Map(
    "union_carry" ->
      """WITH e AS (SELECT * FROM events),
        |prev AS (
        |  SELECT event_id,
        |         sha256(user_id::VARCHAR || '-' || start_us::VARCHAR) AS session_id
        |  FROM (
        |    SELECT event_id, user_id, ts,
        |           min(epoch_us(ts)) OVER (PARTITION BY user_id, session_no) AS start_us
        |    FROM (
        |      SELECT *, SUM(CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END)
        |                OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_no
        |      FROM (
        |        SELECT event_id, user_id, ts,
        |               epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |        FROM e WHERE epoch_us(ts) <= 1705276800000000)))),
        |unioned AS (
        |  SELECT e.event_id, prev.session_id FROM e JOIN prev USING (event_id)
        |  UNION ALL
        |  SELECT event_id, NULL AS session_id FROM e WHERE epoch_us(ts) > 1705276800000000)
        |SELECT session_id IS NULL AS is_current, count(*) AS n_rows,
        |       min(event_id) AS min_event, max(event_id) AS max_event
        |FROM unioned GROUP BY 1 ORDER BY is_current""".stripMargin,

    "hour_partitions" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS event_date, strftime(ts, '%H') AS event_hour,
        |       count(*) AS n_rows,
        |       SUM(round(value * 100)::BIGINT)::BIGINT AS value_cents
        |FROM events GROUP BY 1, 2 ORDER BY event_date, event_hour""".stripMargin,

    "eventtype_when" ->
      """SELECT CASE WHEN event_type = 'purchase' THEN 'money'
        |            WHEN event_type = 'error' THEN NULL
        |            ELSE 'engagement' END AS kind,
        |       count(*) AS n_rows,
        |       SUM(round(value * 100)::BIGINT)::BIGINT AS value_cents
        |FROM events GROUP BY 1 ORDER BY kind NULLS FIRST""".stripMargin,

    "json_props" ->
      """SELECT (k % 10) AS k_mod, count(*) AS n_rows, SUM(k)::BIGINT AS sum_k
        |FROM (SELECT regexp_extract(props, '"k":\s*(\d+)', 1)::BIGINT AS k FROM events)
        |GROUP BY 1 ORDER BY k_mod""".stripMargin,

    "variant_json" ->
      """SELECT (k % 7) AS k_mod, count(*) AS n_rows,
        |       SUM(k)::BIGINT AS sum_k, max(k) AS max_k
        |FROM (SELECT json_extract_string(props, '$.k')::BIGINT AS k FROM events)
        |GROUP BY 1 ORDER BY k_mod""".stripMargin,

    "json_native" ->
      """SELECT event_type, count(*) AS n_rows,
        |       SUM(k)::BIGINT AS sum_k, min(k) AS min_k, max(k) AS max_k
        |FROM (SELECT event_type, json_extract_string(props, '$.k')::BIGINT AS k FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // nearest-rank P01/P99 by pure-integer rank formulas, then clamp+sum
    "winsorized_stats" ->
      """WITH b AS (SELECT event_type, event_id, round(value * 100)::BIGINT AS cents
        |           FROM events),
        |r AS (SELECT *,
        |        row_number() OVER (PARTITION BY event_type ORDER BY cents, event_id)::BIGINT AS rk,
        |        count(*) OVER (PARTITION BY event_type)::BIGINT AS n
        |      FROM b),
        |bounds AS (SELECT event_type,
        |             min(CASE WHEN rk = (n + 99) // 100 THEN cents END)::BIGINT AS p01,
        |             max(CASE WHEN rk = (n * 99 + 99) // 100 THEN cents END)::BIGINT AS p99
        |           FROM r WHERE rk = (n + 99) // 100 OR rk = (n * 99 + 99) // 100
        |           GROUP BY event_type)
        |SELECT r.event_type, p01, p99,
        |       sum(greatest(least(cents, p99), p01))::BIGINT AS clamped_sum,
        |       count(*)::BIGINT AS n
        |FROM r JOIN bounds USING (event_type)
        |GROUP BY r.event_type, p01, p99
        |ORDER BY event_type""".stripMargin,

    "value_histogram" ->
      """WITH b AS (SELECT round(value * 100)::BIGINT AS cents FROM events)
        |SELECT (cents - ((cents % 500 + 500) % 500)) // 500 AS bucket,
        |       count(*)::BIGINT AS cnt
        |FROM b GROUP BY 1 ORDER BY bucket""".stripMargin,

    "bucketed_quantiles" ->
      """WITH b AS (SELECT round(value * 100)::BIGINT AS cents FROM events),
        |h AS (SELECT (cents - ((cents % 100 + 100) % 100)) // 100 AS bucket,
        |             count(*)::BIGINT AS cnt
        |      FROM b GROUP BY 1),
        |c AS (SELECT bucket, cnt, sum(cnt) OVER (ORDER BY bucket)::BIGINT AS cum FROM h),
        |n AS (SELECT sum(cnt)::BIGINT AS n_total FROM h),
        |t AS (SELECT q_num::INTEGER AS q_num, q_den::INTEGER AS q_den
        |      FROM (VALUES (1, 2), (9, 10), (99, 100), (999, 1000)) AS v(q_num, q_den))
        |SELECT q_num, q_den, n_total,
        |       (q_num * n_total + q_den - 1) // q_den AS rank, bucket,
        |       (bucket * 100)::BIGINT AS lo, (bucket * 100 + 99)::BIGINT AS hi
        |FROM t CROSS JOIN n JOIN c
        |  ON (c.cum - c.cnt) < ((q_num * n_total + q_den - 1) // q_den)
        | AND ((q_num * n_total + q_den - 1) // q_den) <= c.cum
        |ORDER BY rank, q_den""".stripMargin,

    "quantiles_stored" ->
      """WITH b AS (SELECT round(value * 100)::BIGINT AS cents FROM events),
        |h AS (SELECT (cents - ((cents % 100 + 100) % 100)) // 100 AS bucket,
        |             count(*)::BIGINT AS cnt
        |      FROM b GROUP BY 1),
        |c AS (SELECT bucket, cnt, sum(cnt) OVER (ORDER BY bucket)::BIGINT AS cum FROM h),
        |n AS (SELECT sum(cnt)::BIGINT AS n_total FROM h),
        |t AS (SELECT q_num::INTEGER AS q_num, q_den::INTEGER AS q_den
        |      FROM (VALUES (1, 2), (9, 10), (99, 100), (999, 1000)) AS v(q_num, q_den))
        |SELECT q_num, q_den, n_total,
        |       (q_num * n_total + q_den - 1) // q_den AS rank, bucket,
        |       (bucket * 100)::BIGINT AS lo, (bucket * 100 + 99)::BIGINT AS hi
        |FROM t CROSS JOIN n JOIN c
        |  ON (c.cum - c.cnt) < ((q_num * n_total + q_den - 1) // q_den)
        | AND ((q_num * n_total + q_den - 1) // q_den) <= c.cum
        |ORDER BY rank, q_den""".stripMargin,

    "table_profile" ->
      """WITH b AS (SELECT event_id, user_id, event_type,
        |                  round(value * 100)::BIGINT AS cents FROM events)
        |SELECT 'cents' AS col_name, count(*)::BIGINT AS n_rows,
        |       count(cents)::BIGINT AS n_nonnull, count(DISTINCT cents)::BIGINT AS n_distinct,
        |       min(cents)::VARCHAR AS min_repr, max(cents)::VARCHAR AS max_repr FROM b
        |UNION ALL
        |SELECT 'event_id', count(*)::BIGINT, count(event_id)::BIGINT,
        |       count(DISTINCT event_id)::BIGINT, min(event_id)::VARCHAR, max(event_id)::VARCHAR FROM b
        |UNION ALL
        |SELECT 'event_type', count(*)::BIGINT, count(event_type)::BIGINT,
        |       count(DISTINCT event_type)::BIGINT, min(event_type), max(event_type) FROM b
        |UNION ALL
        |SELECT 'user_id', count(*)::BIGINT, count(user_id)::BIGINT,
        |       count(DISTINCT user_id)::BIGINT, min(user_id)::VARCHAR, max(user_id)::VARCHAR FROM b
        |ORDER BY col_name""".stripMargin,

    // batching is a physical choice; the stats must be identical
    "table_profile_batched" ->
      """WITH b AS (SELECT event_id, user_id, event_type,
        |                  round(value * 100)::BIGINT AS cents FROM events)
        |SELECT 'cents' AS col_name, count(*)::BIGINT AS n_rows,
        |       count(cents)::BIGINT AS n_nonnull, count(DISTINCT cents)::BIGINT AS n_distinct,
        |       min(cents)::VARCHAR AS min_repr, max(cents)::VARCHAR AS max_repr FROM b
        |UNION ALL
        |SELECT 'event_id', count(*)::BIGINT, count(event_id)::BIGINT,
        |       count(DISTINCT event_id)::BIGINT, min(event_id)::VARCHAR, max(event_id)::VARCHAR FROM b
        |UNION ALL
        |SELECT 'event_type', count(*)::BIGINT, count(event_type)::BIGINT,
        |       count(DISTINCT event_type)::BIGINT, min(event_type), max(event_type) FROM b
        |UNION ALL
        |SELECT 'user_id', count(*)::BIGINT, count(user_id)::BIGINT,
        |       count(DISTINCT user_id)::BIGINT, min(user_id)::VARCHAR, max(user_id)::VARCHAR FROM b
        |ORDER BY col_name""".stripMargin,

    // |v−μ| > 3σ as the integer cross-multiply (v·n−S)² > 9·(n·Q−S²)
    "rolling_outliers" ->
      """WITH b AS (SELECT event_id, user_id, ts, round(value * 100)::BIGINT AS cents
        |           FROM events),
        |w AS (SELECT event_id, user_id, cents,
        |             count(*) OVER win::HUGEINT AS n,
        |             sum(cents) OVER win::HUGEINT AS s,
        |             sum(cents * cents) OVER win::HUGEINT AS q
        |      FROM b WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
        |                            ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING))
        |SELECT event_id, user_id, cents, n::BIGINT AS n_win FROM w
        |WHERE n >= 5
        |  AND (cents::HUGEINT * n - s) * (cents::HUGEINT * n - s) > 9 * (n * q - s * s)
        |ORDER BY event_id""".stripMargin,

    "value_outliers" ->
      """WITH b AS (SELECT event_id, event_type, round(value * 100)::BIGINT AS cents
        |           FROM events),
        |st AS (SELECT event_type, count(*)::HUGEINT AS n, sum(cents)::HUGEINT AS s,
        |              sum(cents * cents)::HUGEINT AS q
        |       FROM b GROUP BY 1)
        |SELECT event_id, event_type, cents FROM b JOIN st USING (event_type)
        |WHERE (cents::HUGEINT * n - s) * (cents::HUGEINT * n - s) > 9 * (n * q - s * s)
        |ORDER BY event_id""".stripMargin,

    "hash_sample" ->
      """SELECT event_id, user_id, event_type FROM events
        |WHERE ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT < 6554
        |ORDER BY event_id""".stripMargin,

    "stratified_sample" ->
      """SELECT event_type, count(*) AS n_sampled, min(event_id) AS min_id
        |FROM events
        |WHERE ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT <
        |      CASE WHEN event_type = 'purchase' THEN 52429
        |           WHEN event_type = 'view' THEN 6554
        |           ELSE 19661 END
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "date_spine_fill" ->
      """WITH ev AS (
        |  SELECT user_id, floor(epoch_us(ts) / 86400000000)::BIGINT AS day,
        |         round(value * 100)::BIGINT AS cents
        |  FROM events WHERE user_id < 20),
        |daily AS (SELECT user_id, day, SUM(cents)::BIGINT AS day_cents
        |          FROM ev GROUP BY 1, 2),
        |spine AS (
        |  SELECT user_id, unnest(generate_series(min(day), max(day))) AS day
        |  FROM ev GROUP BY user_id)
        |SELECT s.user_id, s.day, coalesce(d.day_cents, 0)::BIGINT AS day_cents
        |FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
        |ORDER BY s.user_id, s.day""".stripMargin,

    "running_distinct_users" ->
      """WITH fd AS (
        |  SELECT user_id, min(floor(epoch_us(ts) / 86400000000)::BIGINT) AS day
        |  FROM events GROUP BY user_id),
        |daily AS (SELECT day, count(*) AS new_users FROM fd GROUP BY day)
        |SELECT day, new_users,
        |       SUM(new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_users
        |FROM daily ORDER BY day""".stripMargin,

    "interpolate_gaps" ->
      """WITH ev AS (
        |  SELECT user_id, floor(epoch_us(ts) / 86400000000)::BIGINT AS day,
        |         round(value * 100)::BIGINT AS cents
        |  FROM events WHERE user_id < 20),
        |daily AS (SELECT user_id, day, SUM(cents)::BIGINT AS cents
        |          FROM ev GROUP BY 1, 2),
        |spine AS (
        |  SELECT user_id, unnest(generate_series(min(day), max(day))) AS day
        |  FROM ev GROUP BY user_id),
        |j AS (SELECT s.user_id, s.day, d.cents
        |      FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day),
        |f AS (SELECT *,
        |  last_value(cents IGNORE NULLS) OVER
        |    (PARTITION BY user_id ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pc,
        |  last_value(CASE WHEN cents IS NOT NULL THEN day END IGNORE NULLS) OVER
        |    (PARTITION BY user_id ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
        |  first_value(cents IGNORE NULLS) OVER
        |    (PARTITION BY user_id ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nc,
        |  first_value(CASE WHEN cents IS NOT NULL THEN day END IGNORE NULLS) OVER
        |    (PARTITION BY user_id ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
        |  FROM j)
        |SELECT user_id, day,
        |       CASE WHEN cents IS NOT NULL THEN cents::DOUBLE
        |            ELSE pc::DOUBLE + (nc::DOUBLE - pc::DOUBLE)
        |                 * ((day - pd)::DOUBLE / (nd - pd)::DOUBLE) END AS value_interp,
        |       (cents IS NULL) AS was_missing
        |FROM f ORDER BY user_id, day""".stripMargin,

    "first_last_touch" ->
"""SELECT user_id,
        |       arg_min(event_type, epoch_us(ts)) AS first_touch,
        |       arg_max(event_type, epoch_us(ts)) AS last_touch,
        |       min(epoch_us(ts)) AS first_us, max(epoch_us(ts)) AS last_us
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "reservoir_sample" ->
      """SELECT event_id, user_id, event_type FROM (
        |  SELECT event_id, user_id, event_type, md5(event_id::VARCHAR) AS rnd
        |  FROM events ORDER BY rnd LIMIT 200)
        |ORDER BY event_id""".stripMargin,

    "cube_events" ->
      """WITH x AS (SELECT event_type, (dayofweek(ts) + 1)::BIGINT AS dow,
        |                  round(value * 100)::BIGINT AS cents FROM events)
        |SELECT event_type, dow, GROUPING(event_type, dow)::BIGINT AS gid,
        |       count(*) AS n, SUM(cents)::BIGINT AS value_cents
        |FROM x GROUP BY CUBE(event_type, dow)
        |ORDER BY gid, event_type NULLS FIRST, dow NULLS FIRST""".stripMargin,

    "asof_prior_signup" ->
      """SELECT event_id, user_id, prior_signup_us FROM (
        |  SELECT event_id, user_id, event_type,
        |         max(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) OVER (
        |           PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prior_signup_us
        |  FROM events)
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    // the PLAIN equi-join: salting must be result-invariant
    "salted_join" ->
      """WITH f AS (
        |  SELECT event_id,
        |         CASE WHEN event_id % 10 < 8 THEN 'hot'
        |              ELSE 'k' || (event_id % 10)::VARCHAR END AS jkey
        |  FROM events),
        |d(jkey, weight) AS (VALUES ('hot', 1), ('k8', 9), ('k9', 10))
        |SELECT event_id, jkey, weight::BIGINT AS weight
        |FROM f JOIN d USING (jkey)
        |ORDER BY event_id""".stripMargin)
}
