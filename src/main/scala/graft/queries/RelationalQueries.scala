package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational operator surface over the TPC-H-ish tables (SURVEY.md §2.3
  * joins, §2.4 set ops, §2.5 aggregations, §2.6 windows, §2.7 sorts/limits).
  * The reference's pipeline never joins (SURVEY.md §2.3) but the engine must
  * expose the full join surface; these queries exercise it against DuckDB.
  *
  * Scale notes per query are in the scaladoc of each entry: the intent is
  * that every plan here survives a 1000-executor / 100 TB run — fact-fact
  * joins shuffle on their join keys only and aggregates are partial+final
  * (map-side combine). Broadcast policy: only tables bounded BY
  * CONSTRUCTION (nation=25, region=5, top-N profiles) carry explicit
  * broadcast hints; customer/part/supplier GROW with scale factor, so
  * their join strategy is left to statistics + AQE (locally they still
  * broadcast — they sit under the threshold — but a hint would force a
  * driver OOM at 100 TB).
  *
  * Money → integer cents before SUM (exact in both engines); see
  * SessionQueries for the full portability rules.
  */
object RelationalQueries {

  private def cents(c: Column): Column = round(c * 100).cast("long")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> { (spark, dir) =>
      // TPC-H Q1 shape: scan-heavy partial+final hash aggregate, tiny
      // group count — map-side combine does almost all the work at scale.
      import spark.implicits._
      Tables.lineitem(spark, dir)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"l_quantity".cast("long")).as("sum_qty"),
          sum(cents($"l_extendedprice")).as("sum_base_cents"),
          sum(cents($"l_extendedprice" * (lit(1) - $"l_discount"))).as("sum_disc_cents"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    "q3_top_orders" -> { (spark, dir) =>
      // TPC-H Q3 shape: filtered customer joins orders (strategy left to
      // stats/AQE), then one shuffle join with lineitem on the order key.
      import spark.implicits._
      val cust = Tables.customer(spark, dir).filter($"c_mktsegment" === "BUILDING")
      val ord = Tables.orders(spark, dir)
      val li = Tables.lineitem(spark, dir)
      ord.join(cust, $"o_custkey" === $"c_custkey")
        .join(li, $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_orderkey", date_format($"o_orderdate", "yyyy-MM-dd").as("order_date"))
        .agg(sum(cents($"l_extendedprice" * (lit(1) - $"l_discount"))).as("revenue_cents"),
          count(lit(1)).as("n_items"))
        .orderBy($"revenue_cents".desc, $"l_orderkey")
        .limit(10)
    },

    "q5_region_revenue" -> { (spark, dir) =>
      // Star join: nation/region are bounded enums (hinted broadcast);
      // customer joins by stats/AQE; the single shuffle join
      // orders⋈lineitem carries the weight at scale.
      import spark.implicits._
      val reg = Tables.region(spark, dir).filter($"r_name" === "EUROPE")
      val nat = Tables.nation(spark, dir)
      val cust = Tables.customer(spark, dir)
      val ord = Tables.orders(spark, dir)
      val li = Tables.lineitem(spark, dir)
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
        .groupBy($"n_name")
        .agg(sum(cents($"l_extendedprice" * (lit(1) - $"l_discount"))).as("revenue_cents"),
          count(lit(1)).as("n_rows"))
        .orderBy("n_name")
    },

    "brand_join" -> { (spark, dir) =>
      // Dim join: part is small relative to lineitem but grows with SF —
      // stats/AQE pick broadcast when it fits.
      import spark.implicits._
      Tables.lineitem(spark, dir)
        .join(Tables.part(spark, dir), $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand")
        .agg(sum($"l_quantity".cast("long")).as("sum_qty"),
          sum(cents($"l_extendedprice")).as("sum_base_cents"),
          count(lit(1)).as("n_rows"))
        .orderBy("p_brand")
    },

    "semi_join_parts" -> { (spark, dir) =>
      // left_semi = EXISTS; no fact columns flow, so only the key shuffles.
      import spark.implicits._
      val recent = Tables.lineitem(spark, dir)
        .filter($"l_shipdate" >= lit(java.sql.Timestamp.valueOf("2000-01-01 00:00:00")))
      Tables.part(spark, dir)
        .join(recent, $"p_partkey" === $"l_partkey", "left_semi")
        .select($"p_partkey", $"p_name")
        .orderBy("p_partkey")
    },

    "anti_join_customers" -> { (spark, dir) =>
      // left_anti = NOT EXISTS (customers with no urgent orders — filtered
      // right side so the result is non-trivial at every scale factor).
      import spark.implicits._
      val urgent = Tables.orders(spark, dir).filter($"o_orderpriority" === "1-URGENT")
      Tables.customer(spark, dir)
        .join(urgent, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name")
        .orderBy("c_custkey")
    },

    "set_ops_custkeys" -> { (spark, dir) =>
      // INTERSECT / EXCEPT surface (SURVEY §2.4 — engine exposes beyond U1).
      import spark.implicits._
      val ord = Tables.orders(spark, dir)
      def keys(status: String) = ord.filter($"o_orderstatus" === status).select($"o_custkey")
      keys("O").intersect(keys("F")).except(keys("P"))
        .orderBy("o_custkey")
    },

    "distinct_counts" -> { (spark, dir) =>
      // count(DISTINCT) forces the expand+two-phase agg plan; exact.
      import spark.implicits._
      Tables.orders(spark, dir)
        .groupBy($"o_orderpriority")
        .agg(countDistinct($"o_custkey").as("n_custs"),
          count(lit(1)).as("n_orders"),
          sum(cents($"o_totalprice")).as("total_cents"))
        .orderBy("o_orderpriority")
    },

    "rollup_lineitem" -> { (spark, dir) =>
      // ROLLUP grouping sets; NULL group labels coalesced for portability.
      import spark.implicits._
      Tables.lineitem(spark, dir)
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n_rows"), sum($"l_quantity".cast("long")).as("sum_qty"))
        .select(coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
          coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
          $"n_rows", $"sum_qty")
        .orderBy("returnflag", "linestatus")
    },

    "range_join_ship" -> { (spark, dir) =>
      // Equi-key + range predicate: the equi key (orderkey) drives the
      // shuffle; the range condition is a post-join filter — no O(n²).
      import spark.implicits._
      Tables.orders(spark, dir)
        .join(Tables.lineitem(spark, dir),
          $"l_orderkey" === $"o_orderkey" &&
            $"l_shipdate" >= $"o_orderdate" &&
            $"l_shipdate" <= $"o_orderdate" + expr("INTERVAL 60 DAYS"))
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_rows"),
          sum(cents($"l_extendedprice")).as("sum_base_cents"))
        .orderBy("o_orderpriority")
    },

    "topk_per_group" -> { (spark, dir) =>
      // Per-group top-k via row_number; at scale this is the rank-pushdown
      // pattern (WindowGroupLimit kicks in on Spark 3.5+/4.x).
      import spark.implicits._
      val w = Window.partitionBy($"p_type").orderBy($"p_retailprice".desc, $"p_partkey")
      Tables.part(spark, dir)
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= 3)
        .select($"p_type", $"rk".cast("long").as("rk"), $"p_partkey",
          cents($"p_retailprice").as("price_cents"))
        .orderBy("p_type", "rk")
    },

    "topk_per_group_agg" -> { (spark, dir) =>
      // Same answer as topk_per_group, but via the typed TopK Aggregator:
      // the k-bounded buffer lives on the MAP side, so the shuffle
      // carries k rows per group instead of the whole table — the shape
      // to prefer when top-k feeds further aggregation and
      // WindowGroupLimit cannot apply. Oracle: the row_number form.
      import spark.implicits._
      Tables.part(spark, dir)
        .groupBy($"p_type")
        .agg(graft.ops.TopK.topKUdaf(3)($"p_retailprice", $"p_partkey").as("top"))
        .select($"p_type", posexplode($"top").as(Seq("pos", "t")))
        .select($"p_type", ($"pos" + 1).cast("long").as("rk"),
          $"t._2".as("p_partkey"), cents($"t._1").as("price_cents"))
        .orderBy("p_type", "rk")
    },

    "window_funcs" -> { (spark, dir) =>
      // rank/dense_rank/ntile/lag/lead in one pass over one window spec.
      import spark.implicits._
      val w = Window.partitionBy($"c_mktsegment").orderBy($"c_acctbal".desc, $"c_custkey")
      Tables.customer(spark, dir)
        .select($"c_mktsegment", $"c_custkey",
          // rank family returns int32 in Spark but int64 in DuckDB — cast
          // so the driver's hash compare sees identical physical types.
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          ntile(4).over(w).cast("long").as("quartile"),
          lag($"c_custkey", 1).over(w).as("prev_cust"),
          lead($"c_custkey", 1).over(w).as("next_cust"))
        .orderBy("c_mktsegment", "rnk", "c_custkey")
    },

    "rolling_sum" -> { (spark, dir) =>
      // Bounded ROWS frame (sliding window) per supplier timeline.
      import spark.implicits._
      val w = Window.partitionBy($"l_suppkey")
        .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
        .rowsBetween(-3, Window.currentRow)
      Tables.lineitem(spark, dir)
        .select($"l_suppkey", $"l_orderkey", $"l_linenumber",
          sum(cents($"l_extendedprice")).over(w).as("rolling_cents"))
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    },

    "global_sort_limit" -> { (spark, dir) =>
      // Global order-by + limit → TakeOrderedAndProject (no full sort).
      import spark.implicits._
      Tables.lineitem(spark, dir)
        .select($"l_orderkey", $"l_linenumber", cents($"l_extendedprice").as("price_cents"))
        .orderBy($"price_cents".desc, $"l_orderkey", $"l_linenumber")
        .limit(100)
    },

    "latest_order_per_cust" -> { (spark, dir) =>
      // Latest-row-per-group (reference W5+P5 pattern on business data).
      import spark.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate".desc, $"o_orderkey".desc)
      Tables.orders(spark, dir)
        .withColumn("rk", row_number().over(w))
        .filter($"rk" === 1)
        .select($"o_custkey", $"o_orderkey",
          date_format($"o_orderdate", "yyyy-MM-dd").as("order_date"))
        .orderBy("o_custkey")
    },

    "scd2_history" -> { (spark, dir) =>
      // Type-2 slowly-changing-dimension build from a change log: each
      // customer's order-priority history as [valid_from, valid_to)
      // runs (valid_to null on the current row; A→B→A reopens). The
      // warehouse-side op that makes dimension joins reproducible as-of
      // any snapshot.
      import spark.implicits._
      val log = Tables.orders(spark, dir).select($"o_custkey",
        // o_orderdate is TIMESTAMP_NTZ; cast in the UTC session = DuckDB's epoch_us
        $"o_orderpriority", unix_micros($"o_orderdate".cast("timestamp")).as("ts_us"), $"o_orderkey")
      graft.ops.Dimensions.scd2(log, "o_custkey", "o_orderpriority", "ts_us", "o_orderkey")
        .orderBy("o_custkey", "valid_from", "o_orderpriority")
    },

    "scd2_snapshot" -> { (spark, dir) =>
      // Point-in-time dimension read over the scd2_history table: each
      // customer's order priority valid AT the fixed mid-range instant
      // 1998-04-01 (epoch_us 891388800000000) — the snapshot join that
      // guards against train/serve future-leak. Pure filter over the
      // history; no new shuffle.
      import spark.implicits._
      val log = Tables.orders(spark, dir).select($"o_custkey",
        $"o_orderpriority", unix_micros($"o_orderdate".cast("timestamp")).as("ts_us"), $"o_orderkey")
      val hist = graft.ops.Dimensions.scd2(log, "o_custkey", "o_orderpriority", "ts_us", "o_orderkey")
      graft.ops.Dimensions.snapshotAt(hist, 891388800000000L)
        .orderBy("o_custkey")
    },

    "pivot_events" -> { (spark, dir) =>
      // Pivot (columnarize a categorical): per user, one count column per
      // event_type. Values enumerated explicitly so the plan is a single
      // pass (no collect-distinct pre-query) — the 100 TB-safe form.
      import spark.implicits._
      graft.Tables.events(spark, dir)
        .groupBy($"user_id")
        .pivot("event_type", Seq("view", "click", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("user_id")
    },

    "unpivot_events" -> { (spark, dir) =>
      // Unpivot (melt): the inverse of pivot_events, via the same
      // single-pass plan — kind/count pairs exploded back to rows.
      import spark.implicits._
      val p = graft.Tables.events(spark, dir)
        .groupBy($"user_id")
        .pivot("event_type", Seq("view", "click", "purchase"))
        .agg(count(lit(1)))
        .na.fill(0L)
      p.unpivot(Array($"user_id"), Array($"view", $"click", $"purchase"),
          "kind", "n_events")
        .orderBy("user_id", "kind")
    },

    "percentiles" -> { (spark, dir) =>
      // Exact interpolated percentiles over integer cents — both engines
      // interpolate lower + f·(upper−lower) on exact ints, so the float
      // results are identical.
      import spark.implicits._
      Tables.orders(spark, dir)
        .groupBy($"o_orderpriority")
        .agg(
          expr("percentile(CAST(ROUND(o_totalprice * 100) AS BIGINT), 0.5)").as("p50"),
          expr("percentile(CAST(ROUND(o_totalprice * 100) AS BIGINT), 0.9)").as("p90"),
          count(lit(1)).as("n_rows"))
        .orderBy("o_orderpriority")
    },

    "q7_nation_volume" -> { (spark, dir) =>
      // TPC-H Q7 shape: 4-table join with a cross-pair nation predicate
      // and a year rollup — supplier/customer nation dims broadcast.
      import spark.implicits._
      val li = Tables.lineitem(spark, dir)
      val sup = Tables.supplier(spark, dir).filter($"s_nationkey".isin(0, 1))
      val ord = Tables.orders(spark, dir)
      val cust = Tables.customer(spark, dir).filter($"c_nationkey".isin(0, 1))
      li.join(sup, $"l_suppkey" === $"s_suppkey")
        .join(ord, $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .filter(($"s_nationkey" === 0 && $"c_nationkey" === 1) ||
          ($"s_nationkey" === 1 && $"c_nationkey" === 0))
        .groupBy($"s_nationkey".cast("long").as("supp_nation"),
          $"c_nationkey".cast("long").as("cust_nation"),
          year($"l_shipdate").cast("long").as("ship_year"))
        .agg(sum(cents($"l_extendedprice" * (lit(1) - $"l_discount"))).as("volume_cents"),
          count(lit(1)).as("n_rows"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    },

    "monthly_revenue" -> { (spark, dir) =>
      // Calendar rollup over a fact-fact join: revenue by order month.
      import spark.implicits._
      Tables.orders(spark, dir)
        .join(Tables.lineitem(spark, dir), $"l_orderkey" === $"o_orderkey")
        .groupBy(date_format($"o_orderdate", "yyyy-MM").as("order_month"))
        .agg(sum(cents($"l_extendedprice" * (lit(1) - $"l_discount"))).as("revenue_cents"),
          countDistinct($"o_orderkey").as("n_orders"))
        .orderBy("order_month")
    },

    "sql_correlated" -> { (spark, dir) =>
      // The SQL entry surface: spark.sql over registered views, with a
      // correlated scalar subquery (Catalyst decorrelates it into an
      // aggregate + join — no per-row re-execution).
      Tables.part(spark, dir).createOrReplaceTempView("part_v")
      spark.sql(
        """SELECT p_type, p_partkey, CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_cents
          |FROM part_v p
          |WHERE p_retailprice = (SELECT min(p2.p_retailprice) FROM part_v p2
          |                       WHERE p2.p_type = p.p_type)
          |ORDER BY p_type, p_partkey""".stripMargin)
    },

    "lateral_recent_orders" -> { (spark, dir) =>
      // LATERAL correlated subquery in FROM (SQL surface): per customer,
      // the two most recent orders. Catalyst rewrites the correlation
      // into a join + per-group limit — no per-row re-execution.
      Tables.customer(spark, dir).createOrReplaceTempView("customer_v")
      Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
      spark.sql(
        """SELECT c_custkey, o_orderkey, date_format(o_orderdate, 'yyyy-MM-dd') AS order_date
          |FROM customer_v,
          |LATERAL (SELECT o_orderkey, o_orderdate FROM orders_v
          |         WHERE o_custkey = c_custkey
          |         ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 2) t
          |ORDER BY c_custkey, o_orderkey""".stripMargin)
    },

    "session_duration_histogram" -> { (spark, dir) =>
      // Analytic rollup of the sessionization core: distribution of
      // session durations in 10-minute buckets.
      import spark.implicits._
      graft.ops.Sessionize.withSessionNo(Tables.events(spark, dir))
        .groupBy($"user_id", $"session_no")
        .agg(((max(unix_micros($"ts")) - min(unix_micros($"ts"))) / 1000000L).as("dur_sec"))
        .groupBy(floor($"dur_sec" / 600).as("bucket_10min"))
        .agg(count(lit(1)).as("n_sessions"),
          // floor THEN cast: DuckDB's double→int cast rounds while
          // Spark's truncates; floor makes both exact.
          floor(min($"dur_sec")).cast("long").as("min_sec"),
          floor(max($"dur_sec")).cast("long").as("max_sec"))
        .orderBy("bucket_10min")
    },

    "rolling_range_sum" -> { (spark, dir) =>
      // RANGE frame over event-time micros: each event's trailing-hour
      // spend per user. Complements rolling_sum's ROWS frame — RANGE
      // bounds are value-based, so the frame is tie-safe by construction.
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy(unix_micros($"ts"))
        .rangeBetween(-3600000000L, 0)
      Tables.events(spark, dir)
        .select($"event_id", $"user_id",
          sum(round($"value" * 100).cast("long")).over(w).as("hour_cents"))
        .orderBy("event_id")
    },

    "bool_aggs" -> { (spark, dir) =>
      // Boolean aggregates: count_if / bool_and / bool_or per group.
      import spark.implicits._
      Tables.lineitem(spark, dir)
        .groupBy($"l_returnflag")
        .agg(count_if($"l_quantity" > 25).as("n_bulk"),
          bool_and($"l_discount" >= 0).as("all_nonneg_disc"),
          bool_or($"l_tax" > 0.07).as("any_high_tax"))
        .orderBy("l_returnflag")
    },

    "window_value_funcs" -> { (spark, dir) =>
      // first_value/last_value/nth_value over an explicit full-partition
      // frame (the default frame stops at CURRENT ROW, which makes
      // last_value a no-op — a classic window-function trap both engines
      // share).
      import spark.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(spark, dir).select(
        $"o_custkey", $"o_orderkey",
        first($"o_orderkey").over(w).as("first_order"),
        last($"o_orderkey").over(w).as("last_order"),
        nth_value($"o_orderkey", 2).over(w).as("second_order"))
        .orderBy("o_custkey", "o_orderkey")
    },

    "grouping_sets_explicit" -> { (spark, dir) =>
      // Explicit GROUPING SETS — the general form rollup/cube desugar to,
      // here with two non-hierarchical sets (by flag, by status).
      Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_v")
      spark.sql(
        """SELECT l_returnflag, l_linestatus, count(*) AS n,
          |       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
          |FROM lineitem_v
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
          |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
    },

    "salted_agg" -> { (spark, dir) =>
      // Skew-mitigated aggregation: each key splits across 16 salted
      // partial aggregates before the final merge (bounded reducer
      // fan-in for hot keys — aggregation skew is the one case AQE does
      // NOT rebalance). Values are integer cents, so the result is
      // salt-invariant and exactly matches the plain GROUP BY oracle.
      import spark.implicits._
      val li = Tables.lineitem(spark, dir)
        .withColumn("cents", cents($"l_extendedprice"))
      graft.ops.Skew.saltedSumCount(li, Seq("l_returnflag"), "cents")
        .select($"l_returnflag", $"n_rows",
          $"sum_value".cast("long").as("sum_cents"))
        .orderBy("l_returnflag")
    },

    "q12_shipmode" -> { (spark, dir) =>
      // TPC-H Q12 shape: shuffle join + conditional CASE aggregation —
      // urgent/non-urgent order counts per return flag.
      import spark.implicits._
      Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_returnflag")
        .agg(
          sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
            .as("high_line_count"),
          sum(when(!$"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
            .as("low_line_count"))
        .orderBy("l_returnflag")
    },

    "q18_large_orders" -> { (spark, dir) =>
      // TPC-H Q18 shape: HAVING on an aggregate, then join the
      // qualifying keys back to the dimension chain. The having filter
      // runs on the aggregated (small) side, so the join-back broadcasts.
      import spark.implicits._
      val big = Tables.lineitem(spark, dir)
        .groupBy($"l_orderkey")
        .agg(sum($"l_quantity".cast("long")).as("sum_qty"))
        .filter($"sum_qty" > 150)
      Tables.orders(spark, dir)
        .join(big, $"o_orderkey" === $"l_orderkey")
        .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
        .select($"c_custkey", $"c_name", $"o_orderkey",
          date_format($"o_orderdate", "yyyy-MM-dd").as("order_date"), $"sum_qty")
        .orderBy($"sum_qty".desc, $"o_orderkey")
    },

    "q19_disjunctive" -> { (spark, dir) =>
      // TPC-H Q19 shape: OR-of-ANDs predicate across a join — Catalyst
      // pushes the common conjuncts (brand membership) into both scans
      // while the residual disjunction evaluates post-join.
      import spark.implicits._
      val li = Tables.lineitem(spark, dir)
      val part = Tables.part(spark, dir)
      li.join(part, $"l_partkey" === $"p_partkey")
        .filter(
          ($"p_brand" === "Brand#1" && $"p_size".between(1, 15) && $"l_quantity" < 20) ||
          ($"p_brand" === "Brand#2" && $"p_size".between(10, 30) && $"l_quantity" >= 20))
        .agg(sum(cents($"l_extendedprice" * (lit(1) - $"l_discount"))).as("revenue_cents"),
          count(lit(1)).as("n_rows"))
    },

    "q4_priority" -> { (spark, dir) =>
      // TPC-H Q4 shape: EXISTS decorrelates to a left_semi join; count
      // orders with at least one returned line item, by priority.
      import spark.implicits._
      Tables.orders(spark, dir)
        .join(Tables.lineitem(spark, dir).filter($"l_returnflag" === "R")
          .select($"l_orderkey"), $"o_orderkey" === $"l_orderkey", "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    },

    "q6_scan_revenue" -> { (spark, dir) =>
      // TPC-H Q6 shape: pure scan + conjunctive filter + one global agg.
      // The predicates must reach the parquet reader (PushedFilters,
      // asserted in PlanSpec) — at 100 TB this is the difference between
      // reading row groups and skipping them on statistics.
      import spark.implicits._
      Tables.lineitem(spark, dir)
        .filter($"l_discount" >= 0.02 && $"l_discount" <= 0.06 && $"l_quantity" < 10)
        .agg(sum(cents($"l_extendedprice" * $"l_discount")).as("revenue_cents"),
          count(lit(1)).as("n_rows"))
    },

    "window_dist_funcs" -> { (spark, dir) =>
      // Distribution window functions: percent_rank/cume_dist are
      // int/int doubles with a unique order key, so both engines compute
      // bit-identical values.
      import spark.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      Tables.orders(spark, dir)
        .select($"o_custkey", $"o_orderkey",
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy("o_custkey", "o_orderkey")
    },

    "q2_min_cost_supp" -> { (spark, dir) =>
      // TPC-H Q2 shape (no partsupp table in this testdata, so lineitem
      // is the part↔supplier cost link): cheapest supplier per small
      // part. Per-(part,supp) min unit cost, then rank-1 per part with a
      // deterministic tie-break, then broadcast-join the two dims back.
      // unit cost as floor(1000·price/qty): per-row IEEE division is
      // engine-identical and floor makes it an exact integer.
      import spark.implicits._
      val li = Tables.lineitem(spark, dir)
      val smallParts = Tables.part(spark, dir).filter($"p_size" <= 10)
      val perSupp = li
        .join(smallParts.select($"p_partkey"), $"l_partkey" === $"p_partkey", "left_semi")
        .groupBy($"l_partkey", $"l_suppkey")
        .agg(min(floor($"l_extendedprice" * 1000 / $"l_quantity").cast("long")).as("cost_milli"))
      val w = Window.partitionBy($"l_partkey").orderBy($"cost_milli", $"l_suppkey")
      perSupp.withColumn("rk", row_number().over(w)).filter($"rk" === 1)
        .join(Tables.supplier(spark, dir), $"l_suppkey" === $"s_suppkey")
        .join(smallParts, $"l_partkey" === $"p_partkey")
        .select($"p_partkey", $"p_name", $"s_name", $"cost_milli")
        .orderBy("p_partkey")
    },

    "q8_share" -> { (spark, dir) =>
      // TPC-H Q8 shape (market share): per order-year, NATION_0's share
      // of ASIA-customer revenue — emitted as exact numerator/denominator
      // cents (the division would be the only non-portable float here).
      import spark.implicits._
      val asia = Tables.region(spark, dir).filter($"r_name" === "ASIA")
      val nat = Tables.nation(spark, dir)
      val cust = Tables.customer(spark, dir)
      Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(asia), $"n_regionkey" === $"r_regionkey")
        .groupBy(year($"o_orderdate").cast("long").as("o_year"))
        .agg(
          sum(when($"n_name" === "NATION_0",
            cents($"l_extendedprice" * (lit(1) - $"l_discount"))).otherwise(0L))
            .as("nation0_cents"),
          sum(cents($"l_extendedprice" * (lit(1) - $"l_discount"))).as("total_cents"))
        .orderBy("o_year")
    },

    "q10_returners" -> { (spark, dir) =>
      // TPC-H Q10 shape: revenue lost to returns per customer, top 20.
      // Shuffle join lineitem⋈orders does the heavy lifting; customer and
      // nation broadcast; TakeOrderedAndProject caps the result.
      import spark.implicits._
      Tables.lineitem(spark, dir).filter($"l_returnflag" === "R")
        .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
        .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.nation(spark, dir)), $"c_nationkey" === $"n_nationkey")
        .groupBy($"c_custkey", $"c_name", $"n_name")
        .agg(sum(cents($"l_extendedprice" * (lit(1) - $"l_discount"))).as("lost_cents"),
          count(lit(1)).as("n_returned"))
        .orderBy($"lost_cents".desc, $"c_custkey")
        .limit(20)
    },

    "basket_pair_support" -> { (spark, dir) =>
      // Market-basket pair supports: parts bought together in >= 2
      // orders, counted by ONE fact shuffle + in-row pair expansion
      // (never a two-sided self-join) — the coPurchaseEdges shape
      // promoted to a mining op with a LOUD basket-size cap.
      import spark.implicits._
      graft.ops.Associations.pairCounts(Tables.lineitem(spark, dir),
          "l_orderkey", "l_partkey")
        .filter($"n_both" >= 2)
        .orderBy($"item_a", $"item_b")
    },

    "basket_rules" -> { (spark, dir) =>
      // Directed association rules at support >= 3 with exact integer
      // confidence (milli) and lift (micro, decimal-formed so
      // 10^6·n_both·N cannot overflow at 10^9-basket scale): the
      // a-priori prune applies support BEFORE any per-rule statistics,
      // and the per-item support table broadcasts. Both engines run
      // the identical floor divisions, so even the lift ORDERING is
      // cross-engine exact.
      import spark.implicits._
      graft.ops.Associations.rules(Tables.lineitem(spark, dir),
          "l_orderkey", "l_partkey", minSupport = 3L)
        .orderBy($"lift_micro".desc, $"antecedent", $"consequent")
    },

    "approx_distinct_parts" -> { (spark, dir) =>
      // HLL sketch — approximate by design, so no DuckDB oracle (driver
      // records a rows-only check). The 100 TB answer to COUNT(DISTINCT).
      import spark.implicits._
      Tables.lineitem(spark, dir)
        .groupBy($"l_returnflag")
        .agg(approx_count_distinct($"l_partkey").as("approx_parts"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    },

    "approx_percentiles" -> { (spark, dir) =>
      // Quantile sketch (Greenwald-Khanna) — mergeable partial state, one
      // pass, bounded memory: the 100 TB answer to exact `percentiles`.
      // Approximate by design → rows-only check, like the HLL entry.
      import spark.implicits._
      Tables.lineitem(spark, dir)
        .groupBy($"l_returnflag")
        .agg(percentile_approx($"l_extendedprice",
            array(lit(0.5), lit(0.95), lit(0.99)), lit(10000)).as("pcts"),
          count(lit(1)).as("n_rows"))
        .select($"l_returnflag",
          $"pcts".getItem(0).as("p50"), $"pcts".getItem(1).as("p95"),
          $"pcts".getItem(2).as("p99"), $"n_rows")
        .orderBy("l_returnflag")
    },

    "q9_profit" -> { (spark, dir) =>
      // TPC-H Q9 shape (no partsupp at this SF): profit per supplier
      // nation per order year over parts named '%red%' — a 5-table
      // snowflake where the filtered dims shrink fast; join order is
      // left to stats + AQE, nation broadcasts.
      import spark.implicits._
      Tables.lineitem(spark, dir)
        .join(Tables.part(spark, dir).filter($"p_name".contains("red")),
          $"l_partkey" === $"p_partkey")
        .join(Tables.supplier(spark, dir), $"l_suppkey" === $"s_suppkey")
        .join(Tables.nation(spark, dir), $"s_nationkey" === $"n_nationkey")
        .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
        .groupBy($"n_name".as("nation"),
          year($"o_orderdate").cast("long").as("o_year"))
        .agg(sum(cents($"l_extendedprice" * (lit(1) - $"l_discount"))).as("profit_cents"))
        .orderBy($"nation", $"o_year".desc)
    },

    "full_outer_recon" -> { (spark, dir) =>
      // FULL OUTER reconciliation — the audit-join shape: align two
      // half-year per-customer aggregates and classify every key as
      // both / h1_only / h2_only. Shuffle join on the grouped keys.
      import spark.implicits._
      val ord = Tables.orders(spark, dir)
      def half(from: String, to: String, as: String) = ord
        .filter($"o_orderdate" >= from && $"o_orderdate" < to)
        .groupBy($"o_custkey").agg(count(lit(1)).as(as))
      half("2000-01-01", "2000-07-01", "n_h1")
        .join(half("2000-07-01", "2001-01-01", "n_h2"), Seq("o_custkey"), "full")
        .select($"o_custkey",
          coalesce($"n_h1", lit(0L)).as("n_h1"),
          coalesce($"n_h2", lit(0L)).as("n_h2"),
          when($"n_h1".isNotNull && $"n_h2".isNotNull, "both")
            .when($"n_h1".isNotNull, "h1_only").otherwise("h2_only").as("presence"))
        .orderBy("o_custkey")
    },

    "q13_custdist" -> { (spark, dir) =>
      // TPC-H Q13: orders-per-customer distribution INCLUDING the
      // zero-order customers — left outer join, count(non-null), then a
      // second aggregation over the counts.
      import spark.implicits._
      Tables.customer(spark, dir)
        .join(Tables.orders(spark, dir).filter($"o_orderstatus" =!= "P"),
          $"c_custkey" === $"o_custkey", "left")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("c_count"))
        .groupBy($"c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy($"custdist".desc, $"c_count".desc)
    },

    "q14_promo" -> { (spark, dir) =>
      // TPC-H Q14: conditional aggregation in one pass; the promo share
      // is a single float division of two exact integer sums, so it
      // compares bit-identically across engines.
      import spark.implicits._
      Tables.lineitem(spark, dir)
        .filter($"l_shipdate" >= "1998-01-01" && $"l_shipdate" < "1998-07-01")
        .join(Tables.part(spark, dir), $"l_partkey" === $"p_partkey")
        .agg(
          sum(when($"p_type".startsWith("PROMO"),
            cents($"l_extendedprice" * (lit(1) - $"l_discount"))).otherwise(0L))
            .as("promo_cents"),
          sum(cents($"l_extendedprice" * (lit(1) - $"l_discount"))).as("total_cents"))
        .select($"promo_cents", $"total_cents",
          ($"promo_cents".cast("double") / $"total_cents".cast("double")).as("promo_share"))
    },

    "q16_suppcnt" -> { (spark, dir) =>
      // TPC-H Q16 shape: the (part, supplier) relation comes from
      // lineitem distinct (no partsupp table at this SF); excludes one
      // brand, a size list, and "complained" suppliers via anti join.
      import spark.implicits._
      val ps = Tables.lineitem(spark, dir)
        .select($"l_partkey", $"l_suppkey").distinct()
      val bad = Tables.supplier(spark, dir)
        .filter($"s_acctbal" < 0).select($"s_suppkey")
      ps.join(Tables.part(spark, dir), $"l_partkey" === $"p_partkey")
        .filter($"p_brand" =!= "Brand#9" &&
          $"p_size".isin(1, 3, 9, 14, 23, 36, 45, 49))
        .join(bad, $"l_suppkey" === $"s_suppkey", "left_anti")
        .groupBy($"p_brand", $"p_type", $"p_size".cast("long").as("p_size"))
        .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
        .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
    },

    "q17_small_qty" -> { (spark, dir) =>
      // TPC-H Q17: per-part average-quantity threshold (correlated
      // scalar subquery, expressed as an aggregate + re-join). The
      // quantities are integer-valued doubles, so sum/avg are EXACT and
      // the 5·qty < avg comparison is portable.
      import spark.implicits._
      val li = Tables.lineitem(spark, dir)
        .join(Tables.part(spark, dir).filter($"p_brand" === "Brand#1"),
          $"l_partkey" === $"p_partkey")
      val avgq = li.groupBy($"l_partkey".as("ak"))
        .agg(avg($"l_quantity").as("avg_qty"))
      li.join(avgq, $"l_partkey" === $"ak")
        .filter($"l_quantity" * 5 < $"avg_qty")
        .agg(sum(cents($"l_extendedprice")).as("small_rev_cents"),
          count(lit(1)).as("n_rows"))
    },

    "q22_global" -> { (spark, dir) =>
      // TPC-H Q22 shape: global scalar threshold (average positive
      // balance, computed in exact cents) + anti join to customers with
      // no RECENT orders (every customer has some order at this SF, so
      // the lapsed-since-2000 variant keeps the result non-trivial).
      // The one-row threshold broadcasts.
      import spark.implicits._
      val cust = Tables.customer(spark, dir)
      val thr = cust.filter($"c_acctbal" > 0)
        .agg(avg(cents($"c_acctbal")).as("thr"))
      cust.join(broadcast(thr))
        .filter(cents($"c_acctbal") > $"thr")
        .join(Tables.orders(spark, dir)
            .filter($"o_orderdate" >= "2000-01-01").select($"o_custkey"),
          $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_cust"), sum(cents($"c_acctbal")).as("bal_cents"))
        .orderBy("c_mktsegment")
    },

    "q15_top_supplier" -> { (spark, dir) =>
      // TPC-H Q15 shape: a revenue "view" (half-year per-supplier
      // aggregate) consumed twice — once for the global max (one row,
      // broadcast back), once for the detail — the classic
      // aggregate-then-self-join-on-max pattern.
      import spark.implicits._
      val rev = Tables.lineitem(spark, dir)
        .filter($"l_shipdate" >= "1998-01-01" && $"l_shipdate" < "1998-07-01")
        .groupBy($"l_suppkey")
        .agg(sum(cents($"l_extendedprice" * (lit(1) - $"l_discount"))).as("total_rev_cents"))
      val top = rev.agg(max($"total_rev_cents").as("max_rev"))
      rev.join(broadcast(top), $"total_rev_cents" === $"max_rev")
        .join(Tables.supplier(spark, dir), $"l_suppkey" === $"s_suppkey")
        .select($"s_suppkey", $"s_name", $"total_rev_cents")
        .orderBy("s_suppkey")
    },

    "q20_excess_stock" -> { (spark, dir) =>
      // TPC-H Q20 shape (no partsupp): suppliers for whom 2000+
      // shipments are over a third of their all-time '%red%'-part
      // volume — nested semi-join chain: parts filter → per-supplier
      // conditional volumes (integer-valued doubles, exact) →
      // qualifying set → semi join suppliers → nation join.
      import spark.implicits._
      // No broadcast hint on redParts: '%red%' keeps a constant FRACTION
      // of part (SF-growing), not a bounded enum — per this file's
      // broadcast policy the planner's stats/AQE decide (and do
      // broadcast it at test SF, asserted in PlanSpec).
      val redParts = Tables.part(spark, dir)
        .filter($"p_name".contains("red")).select($"p_partkey")
      val vols = Tables.lineitem(spark, dir)
        .join(redParts, $"l_partkey" === $"p_partkey")
        .groupBy($"l_suppkey")
        .agg(sum($"l_quantity").as("qty_total"),
          sum(when($"l_shipdate" >= "2000-01-01", $"l_quantity")
            .otherwise(0.0)).as("qty_recent"))
      val qualifying = vols.filter($"qty_recent" * 3 > $"qty_total")
        .select($"l_suppkey").distinct()
      Tables.supplier(spark, dir)
        .join(qualifying, $"s_suppkey" === $"l_suppkey", "left_semi")
        .join(Tables.nation(spark, dir), $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", $"s_name", $"n_name")
        .orderBy("s_suppkey")
    },

    "q11_part_share" -> { (spark, dir) =>
      // TPC-H Q11 shape (no partsupp — lineitem value is the stock
      // proxy): per-part value HAVING-filtered against a FRACTION of
      // the global total. The distinctive plan: the same aggregate is
      // consumed twice — per-group detail and a one-row global sum that
      // broadcasts back as the group-level threshold. The threshold is
      // RELATIVE TO THE MEAN part value (keep parts above 1.5× mean):
      // a fixed share-of-total cutoff goes vacuous as |part| grows with
      // SF (TPC-H's own Q11 scales its fraction by 1/SF for the same
      // reason) — this form is non-empty and selective at every SF
      // (probed: 2 / 29 / 252 rows at sf0.001/0.01/0.1). The comparison
      // is exact decimal(38,0) ≡ DuckDB hugeint (value·n_parts·2 can
      // overflow int64 at 100 TB); at scale the per-part aggregate is
      // the only real shuffle and the threshold join broadcasts one row.
      import spark.implicits._
      val per = Tables.lineitem(spark, dir)
        .groupBy($"l_partkey")
        .agg(sum(cents($"l_extendedprice")).as("value_cents"))
      val tot = per.agg(sum($"value_cents").as("total_cents"),
        count(lit(1)).as("n_parts"))
      per.join(broadcast(tot))
        .filter($"value_cents".cast("decimal(38,0)") * $"n_parts" * 2 >
          $"total_cents".cast("decimal(38,0)") * 3)
        .select($"l_partkey", $"value_cents")
        .orderBy($"value_cents".desc, $"l_partkey")
    },

    "q21_waiting_supplier" -> { (spark, dir) =>
      // TPC-H Q21 shape: suppliers who were the ONLY late shipper in a
      // finished multi-supplier order — correlated EXISTS (another
      // supplier in the order) AND NOT EXISTS (another LATE supplier in
      // the order), both against the same fact. "Late" = shipped 90+
      // days after the order date (no receipt/commit dates at this SF).
      // The EXISTS/NOT EXISTS pair is computed in ONE pass over the
      // order's lines with order-partitioned windows (distinct-supplier
      // count, distinct-LATE-supplier count) instead of semi/anti
      // self-joins: the previous three-pass formulation planned 9
      // exchanges with no exchange reuse (renamed keys defeat
      // ReuseExchange — measured, not assumed); the windows reuse the
      // orders⋈lineitem join's hash partitioning on the order key, so
      // the fact shuffles ONCE. Per-order supplier sets are bounded
      // (~7 lines/order), so collect_set state is O(1) per row.
      import spark.implicits._
      val w = Window.partitionBy($"l_orderkey")
      Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir).filter($"o_orderstatus" === "F")
            .select($"o_orderkey", $"o_orderdate"),
          $"l_orderkey" === $"o_orderkey")
        .select($"l_orderkey", $"l_suppkey",
          ($"l_shipdate" >= $"o_orderdate" + expr("INTERVAL 90 DAYS")).as("late"))
        .withColumn("n_supp", size(collect_set($"l_suppkey").over(w)))
        .withColumn("n_late_supp",
          size(collect_set(when($"late", $"l_suppkey")).over(w)))
        .filter($"late" && $"n_supp" > 1 && $"n_late_supp" === 1)
        .join(Tables.supplier(spark, dir), $"l_suppkey" === $"s_suppkey")
        .groupBy($"s_suppkey", $"s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy($"numwait".desc, $"s_suppkey")
    },

    "orders_pareto" -> { (spark, dir) =>
      // Pareto/ABC analysis: customers ranked by revenue with their
      // cumulative share of the total — "what fraction of customers
      // drive 80% of revenue". Cumulative sums are exact integer cents;
      // the share is one float division per row (numerator and
      // denominator both exact), so it compares bit-identically.
      // Scale shape: the output is top-100, so the top-100 is taken
      // DISTRIBUTIVELY first (orderBy+limit → TakeOrderedAndProject:
      // per-partition heaps, driver merge of 100-row slices) and the
      // single-partition ranking window then runs over exactly 100
      // rows — never over the unbounded per-customer aggregate, which
      // at 100 TB is billions of rows. The global total is a separate
      // one-row aggregate broadcast back.
      import spark.implicits._
      val per = Tables.orders(spark, dir)
        .groupBy($"o_custkey")
        .agg(sum(cents($"o_totalprice")).as("rev_cents"))
      val tot = per.agg(sum($"rev_cents").as("total_cents"))
      val top = per.orderBy($"rev_cents".desc, $"o_custkey").limit(100)
      val w = Window.orderBy($"rev_cents".desc, $"o_custkey")
      top.join(broadcast(tot))
        .withColumn("rk", row_number().over(w))
        .withColumn("cum_cents",
          sum($"rev_cents").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .select($"rk".cast("long").as("rk"), $"o_custkey", $"rev_cents",
          ($"cum_cents".cast("double") / $"total_cents".cast("double")).as("cum_share"))
        .orderBy("rk")
    },

    "exact_moments" -> { (spark, dir) =>
      // Second moments the PORTABLE way: variance/covariance from exact
      // decimal sums (Spark decimal(38,0) ≡ DuckDB hugeint), with the
      // only float ops a final cast + divide in a fixed shape. The
      // built-in one-pass var_samp/covar_samp accumulate doubles in
      // partition order — not reproducible across engines or even
      // across runs at scale. Headroom: n·Σx² stays under 38 digits up
      // to ~10^11 rows of 10^7-cent values PER GROUP; beyond that,
      // pre-scale x or sum per sub-group and combine.
      import spark.implicits._
      val x = cents($"l_extendedprice").cast("decimal(38,0)")
      val q = $"l_quantity".cast("decimal(38,0)")
      Tables.lineitem(spark, dir)
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
          sum(x).as("sx"), sum(x * x).as("sxx"),
          sum(q).as("sq"), sum(x * q).as("sxq"))
        .select($"l_returnflag",
          $"n".cast("long").as("n_rows"),
          ($"sx".cast("double") / $"n".cast("double")).as("mean_cents"),
          (($"n" * $"sxx" - $"sx" * $"sx").cast("double") /
            ($"n" * ($"n" - lit(1).cast("decimal(38,0)"))).cast("double")).as("var_cents2"),
          (($"n" * $"sxq" - $"sx" * $"sq").cast("double") /
            ($"n" * ($"n" - lit(1).cast("decimal(38,0)"))).cast("double")).as("covar_cents_qty"))
        .orderBy("l_returnflag")
    },

    "rfm_segments" -> { (spark, dir) =>
      // RFM segmentation the way it survives 100 TB: quartile
      // thresholds come from the mergeable bucket histograms
      // (Sketches.bucketedQuantiles — nearest-rank hi bounds by pure
      // integer arithmetic), NEVER a global ntile sort; each
      // customer's (recency, frequency, monetary) then scores 1–4 by
      // three broadcast threshold comparisons. Threshold error < the
      // bucket width, documented per metric (frequency width 1 is
      // exact). Everything integer, so segments are cross-engine
      // exact.
      import spark.implicits._
      graft.ops.Commerce.rfmSegments(Tables.orders(spark, dir))
        .orderBy($"o_custkey")
    },

    "k_core" -> { (spark, dir) =>
      // Degeneracy peeling on the co-purchase graph: 3 synchronous
      // rounds of "remove nodes with current degree < 110", emitting
      // each node's PEEL DEPTH (0 = survives — the dense core; r =
      // round removed). Peeling is idempotent past convergence, so the
      // fixed round count stays oracle-unrollable with no
      // data-dependent early stop.
      // symmetric = true: coPurchaseEdges(ordered = false) emits both
      // ordered directions of every pair, deduped by its groupBy, and
      // bans self-pairs — the pre-canonicalized contract — so the peel
      // skips its symmetrize-union + full-edge distinct (the largest
      // constant in this query's wall-clock).
      import spark.implicits._
      graft.ops.Graph.kCorePeel(
          coPurchaseEdges(spark, dir, ordered = false), k = 110L, rounds = 3,
          symmetric = true)
        .orderBy("node")
    },

    "label_propagation" -> { (spark, dir) =>
      // Community detection over the co-purchase graph: 3 synchronous
      // label-propagation rounds made DETERMINISTIC (most-frequent
      // in-neighbor label, ties to the smallest), so the rounds unroll
      // exactly in the oracle. The per-round argmax is a min_by
      // aggregate over an order-embedding struct — map-side combined,
      // no window over a possibly-skewed node key.
      import spark.implicits._
      graft.ops.Graph.labelPropagation(
          coPurchaseEdges(spark, dir, ordered = false), rounds = 3)
        .orderBy("node")
    },

    "pagerank_parts" -> { (spark, dir) =>
      // Iterative graph analytics (beyond connected components):
      // 3 exact-integer PageRank rounds over the parts co-purchase
      // graph (parts sharing an order, both directions). Every round
      // is floor arithmetic — rank div outdeg, (x·17) div 20 damping,
      // 150000 teleport — so the oracle is a 3-round unrolled CTE, the
      // kmeans_train device applied to a graph algorithm.
      import spark.implicits._
      graft.ops.Graph.pageRank(
        coPurchaseEdges(spark, dir, ordered = false), iters = 3).orderBy("node")
    },

    "pagerank_weighted" -> { (spark, dir) =>
      // WEIGHTED PageRank: rank flows proportional to co-purchase
      // STRENGTH (number of orders sharing the pair) — contrib =
      // (rank · w) div Σ out-weights, the same floor arithmetic with
      // the weight in the cross-multiply, same unrolled-CTE oracle.
      import spark.implicits._
      graft.ops.Graph.pageRank(
        coPurchaseEdges(spark, dir, ordered = false), iters = 3,
        weightCol = "w").orderBy("node")
    },

    "triangle_parts" -> { (spark, dir) =>
      // Exact per-node triangle counts on the same co-purchase graph —
      // the non-iterative graph primitive next to PageRank: ordered
      // orientation a<b<c enumerates each triangle once (wedge join on
      // the middle vertex + closing probe on the (a, c) edge).
      import spark.implicits._
      graft.ops.Graph.triangleCounts(
        coPurchaseEdges(spark, dir, ordered = true)).orderBy("node")
    },

    "bfs_parts" -> { (spark, dir) =>
      // Reachability: exact hop distances from the 4 lowest part keys
      // across the co-purchase graph, 3 frontier expansions — the third
      // iterative graph primitive (min-fold instead of PageRank's
      // damped sum), same unrolled-CTE oracle device.
      import spark.implicits._
      import spark.implicits._
      val seeds = Tables.lineitem(spark, dir)
        .select($"l_partkey".as("node")).filter($"node" < 5)
      graft.ops.Graph.bfsHops(
        coPurchaseEdges(spark, dir, ordered = false), seeds, rounds = 3)
        .orderBy("node")
    })

  /** Parts co-purchase edges (parts sharing an order), built as ONE
    * groupBy shuffle + per-row pair expansion instead of a two-sided
    * self-join on l_orderkey: collect_set dedupes (order, part)
    * map-side, and the k≈4 parts per order expand to at most k²
    * in-row pairs — the shape that survives a 100× lineitem, where a
    * self-join would shuffle the fact table twice. Assumes bounded
    * basket size (carts are; TPC-H orders hold ≤7 parts) — a group
    * with k in the tens of thousands would expand k² in one row, and
    * such data should fall back to the self-join form. `ordered`
    * emits src < dst only (the triangle orientation); otherwise both
    * directions. Output: (src, dst, w) where w = number of orders
    * sharing the pair (a groupBy — the same shuffle a distinct would
    * cost); unweighted consumers simply ignore w.
    */
  private def coPurchaseEdges(spark: SparkSession, dir: String,
      ordered: Boolean): DataFrame = {
    import spark.implicits._
    val cond: (Column, Column) => Column =
      if (ordered) (a, b) => a < b else (a, b) => a =!= b
    Tables.lineitem(spark, dir)
      .groupBy($"l_orderkey")
      .agg(collect_set($"l_partkey").as("ps"))
      .select(explode(flatten(transform($"ps", a =>
        transform(filter($"ps", b => cond(a, b)),
          b => struct(a.as("src"), b.as("dst")))))).as("e"))
      .select($"e.src".as("src"), $"e.dst".as("dst"))
      .groupBy($"src", $"dst").agg(count(lit(1)).as("w"))
  }

  /** Quartile-threshold CTEs for one RFM metric over the `m` CTE —
    * the DuckDB twin of `Sketches.bucketHistogram` +
    * `bucketedQuantiles` (floor-div buckets, cumulative rank walk,
    * nearest-rank hi bound), pivoted to one row p<tag>(25, 50, 75).
    */
  private def rfmThresholdCte(metric: String, width: Long, tag: String): String =
    s"""h$tag AS (SELECT $metric // $width AS bucket, count(*) AS cnt
       |          FROM m GROUP BY 1),
       |c$tag AS (SELECT bucket, cnt, sum(cnt) OVER (ORDER BY bucket) AS cum
       |          FROM h$tag),
       |n$tag AS (SELECT sum(cnt) AS nt FROM h$tag),
       |t$tag AS (SELECT q_num, q_den, min(bucket * $width + ${width - 1}) AS hi
       |          FROM (VALUES (1, 4), (1, 2), (3, 4)) v(q_num, q_den)
       |          CROSS JOIN n$tag JOIN c$tag
       |            ON (cum - cnt) < ((q_num * nt + q_den - 1) // q_den)
       |           AND ((q_num * nt + q_den - 1) // q_den) <= cum
       |          GROUP BY q_num, q_den),
       |p$tag AS (SELECT max(CASE WHEN q_num = 1 AND q_den = 4 THEN hi END) AS ${tag}25,
       |                 max(CASE WHEN q_num = 1 AND q_den = 2 THEN hi END) AS ${tag}50,
       |                 max(CASE WHEN q_num = 3 AND q_den = 4 THEN hi END) AS ${tag}75
       |          FROM t$tag)""".stripMargin

  /** One k-core peel round for the `k_core` oracle: degree within the
    * round-(i−1) alive set, keep deg ≥ k (nodes with NO alive
    * neighbors vanish from the degree table and are peeled by the
    * inner join).
    */
  private def kcoreRoundCte(i: Int, k: Long): String = {
    val prev = s"a${i - 1}"
    s"""d$i AS (SELECT e.src AS node, count(*) AS deg
       |      FROM e JOIN $prev x ON x.node = e.src
       |             JOIN $prev y ON y.node = e.dst
       |      GROUP BY 1),
       |a$i AS (SELECT p.node FROM $prev p JOIN d$i USING (node)
       |      WHERE deg >= $k)""".stripMargin
  }

  /** One deterministic label-propagation round for the
    * `label_propagation` oracle: votes = in-neighbors' round-(i−1)
    * labels, adopt the most frequent (ties to smallest), keep the old
    * label when no in-edges.
    */
  private def lpaRoundCte(i: Int): String = {
    val prev = s"l${i - 1}"
    s"""v$i AS (SELECT e.dst AS node, l.label, count(*) AS c
       |      FROM e JOIN $prev l ON l.node = e.src GROUP BY 1, 2),
       |a$i AS (SELECT node, label FROM (
       |        SELECT node, label,
       |               row_number() OVER (PARTITION BY node
       |                 ORDER BY c DESC, label) AS rk FROM v$i)
       |      WHERE rk = 1),
       |l$i AS (SELECT p.node, coalesce(a$i.label, p.label) AS label
       |      FROM $prev p LEFT JOIN a$i ON a$i.node = p.node)""".stripMargin
  }

  /** One integer PageRank round for the pagerank_parts oracle. */
  private def pagerankRoundCte(i: Int): String = {
    val prev = s"r${i - 1}"
    s"""r$i AS (SELECT n.node,
       |             150000 + (coalesce(s.inc, 0) * 17) // 20 AS rank
       |      FROM n LEFT JOIN (
       |        SELECT e.dst AS node, sum(r.rank // d.outdeg) AS inc
       |        FROM e JOIN $prev r ON r.node = e.src JOIN d ON d.node = e.src
       |        GROUP BY e.dst) s ON s.node = n.node)""".stripMargin
  }

  /** One WEIGHTED integer PageRank round: (rank · w) // Σ out-weights. */
  private def pagerankWeightedRoundCte(i: Int): String = {
    val prev = s"r${i - 1}"
    s"""r$i AS (SELECT n.node,
       |             150000 + (coalesce(s.inc, 0) * 17) // 20 AS rank
       |      FROM n LEFT JOIN (
       |        SELECT e.dst AS node, sum((r.rank * e.w) // d.wsum) AS inc
       |        FROM e JOIN $prev r ON r.node = e.src JOIN d ON d.node = e.src
       |        GROUP BY e.dst) s ON s.node = n.node)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "basket_pair_support" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS i FROM lineitem),
        |p AS (SELECT a.i AS item_a, bb.i AS item_b, count(*) AS n_both
        |      FROM b a JOIN b bb ON a.o = bb.o AND a.i < bb.i
        |      GROUP BY 1, 2)
        |SELECT item_a, item_b, n_both FROM p
        |WHERE n_both >= 2
        |ORDER BY item_a, item_b""".stripMargin,

    "basket_rules" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS i FROM lineitem),
        |p AS (SELECT a.i AS item_a, bb.i AS item_b, count(*) AS n_both
        |      FROM b a JOIN b bb ON a.o = bb.o AND a.i < bb.i
        |      GROUP BY 1, 2 HAVING count(*) >= 3),
        |s AS (SELECT i, count(DISTINCT o) AS n_item FROM b GROUP BY 1),
        |n AS (SELECT count(DISTINCT o) AS n_baskets FROM b),
        |d AS (SELECT item_a AS antecedent, item_b AS consequent, n_both FROM p
        |      UNION ALL
        |      SELECT item_b, item_a, n_both FROM p)
        |SELECT antecedent, consequent, n_both,
        |       sa.n_item AS n_ante, sc.n_item AS n_cons, n_baskets,
        |       ((1000 * n_both) // sa.n_item)::BIGINT AS confidence_milli,
        |       ((1000000::HUGEINT * n_both * n_baskets) //
        |        (sa.n_item::HUGEINT * sc.n_item))::BIGINT AS lift_micro
        |FROM d JOIN s sa ON sa.i = d.antecedent
        |       JOIN s sc ON sc.i = d.consequent
        |       CROSS JOIN n
        |ORDER BY lift_micro DESC, antecedent, consequent""".stripMargin,

    "rfm_segments" ->
      s"""WITH m AS (
         |  SELECT o_custkey,
         |         (SELECT max(epoch_us(o_orderdate) // 86400000000) FROM orders) -
         |           max(epoch_us(o_orderdate) // 86400000000) AS recency_days,
         |         count(*) AS n_orders,
         |         sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS monetary_cents
         |  FROM orders GROUP BY o_custkey),
         |${rfmThresholdCte("recency_days", 30L, "r")},
         |${rfmThresholdCte("n_orders", 1L, "f")},
         |${rfmThresholdCte("monetary_cents", 1000000L, "y")}
         |SELECT *, (recency_q * 100 + frequency_q * 10 + monetary_q)::BIGINT AS segment
         |FROM (
         |  SELECT o_custkey, recency_days, n_orders, monetary_cents,
         |         (1 + (recency_days > r25)::BIGINT + (recency_days > r50)::BIGINT +
         |              (recency_days > r75)::BIGINT)::BIGINT AS recency_q,
         |         (1 + (n_orders > f25)::BIGINT + (n_orders > f50)::BIGINT +
         |              (n_orders > f75)::BIGINT)::BIGINT AS frequency_q,
         |         (1 + (monetary_cents > y25)::BIGINT + (monetary_cents > y50)::BIGINT +
         |              (monetary_cents > y75)::BIGINT)::BIGINT AS monetary_q
         |  FROM m CROSS JOIN pr CROSS JOIN pf CROSS JOIN py)
         |ORDER BY o_custkey""".stripMargin,

    "k_core" ->
      s"""WITH e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
         |           FROM lineitem a JOIN lineitem b
         |             ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
         |a0 AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |${kcoreRoundCte(1, 110L)},
         |${kcoreRoundCte(2, 110L)},
         |${kcoreRoundCte(3, 110L)}
         |SELECT n.node,
         |       (CASE WHEN n.node NOT IN (SELECT node FROM a1) THEN 1
         |             WHEN n.node NOT IN (SELECT node FROM a2) THEN 2
         |             WHEN n.node NOT IN (SELECT node FROM a3) THEN 3
         |             ELSE 0 END)::BIGINT AS peeled_round
         |FROM a0 n ORDER BY n.node""".stripMargin,

    "label_propagation" ->
      s"""WITH e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
         |           FROM lineitem a JOIN lineitem b
         |             ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
         |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |l0 AS (SELECT node, node AS label FROM n),
         |${lpaRoundCte(1)},
         |${lpaRoundCte(2)},
         |${lpaRoundCte(3)}
         |SELECT node, label FROM l3 ORDER BY node""".stripMargin,

    "pagerank_parts" ->
      s"""WITH e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
         |           FROM lineitem a JOIN lineitem b
         |             ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
         |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |d AS (SELECT src AS node, count(*)::BIGINT AS outdeg FROM e GROUP BY 1),
         |r0 AS (SELECT node, 1000000::BIGINT AS rank FROM n),
         |${pagerankRoundCte(1)},
         |${pagerankRoundCte(2)},
         |${pagerankRoundCte(3)}
         |SELECT node, rank::BIGINT AS rank_micros FROM r3 ORDER BY node""".stripMargin,

    // rank flows proportional to co-purchase strength (orders sharing
    // the pair); weights enter via (rank * w) // wsum
    "pagerank_weighted" ->
      s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |e AS (SELECT a.l_partkey AS src, b.l_partkey AS dst, count(*)::BIGINT AS w
         |      FROM li a JOIN li b
         |        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
         |      GROUP BY 1, 2),
         |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |d AS (SELECT src AS node, sum(w)::BIGINT AS wsum FROM e GROUP BY 1),
         |r0 AS (SELECT node, 1000000::BIGINT AS rank FROM n),
         |${pagerankWeightedRoundCte(1)},
         |${pagerankWeightedRoundCte(2)},
         |${pagerankWeightedRoundCte(3)}
         |SELECT node, rank::BIGINT AS rank_micros FROM r3 ORDER BY node""".stripMargin,

    // 3 unrolled frontier expansions, min-fold per round
    "bfs_parts" ->
      """WITH e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        |           FROM lineitem a JOIN lineitem b
        |             ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        |d0 AS (SELECT DISTINCT l_partkey AS node, 0 AS hops
        |       FROM lineitem WHERE l_partkey < 5),
        |d1 AS (SELECT node, min(hops) AS hops FROM (
        |         SELECT node, hops FROM d0
        |         UNION ALL SELECT e.dst, d.hops + 1 FROM e JOIN d0 d ON d.node = e.src)
        |       GROUP BY node),
        |d2 AS (SELECT node, min(hops) AS hops FROM (
        |         SELECT node, hops FROM d1
        |         UNION ALL SELECT e.dst, d.hops + 1 FROM e JOIN d1 d ON d.node = e.src)
        |       GROUP BY node),
        |d3 AS (SELECT node, min(hops) AS hops FROM (
        |         SELECT node, hops FROM d2
        |         UNION ALL SELECT e.dst, d.hops + 1 FROM e JOIN d2 d ON d.node = e.src)
        |       GROUP BY node)
        |SELECT node, hops::BIGINT AS hops FROM d3 ORDER BY node""".stripMargin,

    // ordered a<b<c enumeration — each triangle exactly once
    "triangle_parts" ->
      """WITH e AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
        |           FROM lineitem a JOIN lineitem b
        |             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |t AS (SELECT w.a, w.b, w.c FROM
        |        (SELECT e1.a, e1.b, e2.b AS c FROM e e1 JOIN e e2 ON e1.b = e2.a) w
        |      JOIN e e3 ON e3.a = w.a AND e3.b = w.c)
        |SELECT node, count(*)::BIGINT AS n_triangles FROM (
        |  SELECT a AS node FROM t UNION ALL SELECT b FROM t UNION ALL SELECT c FROM t)
        |GROUP BY node ORDER BY node""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       SUM(l_quantity::BIGINT)::BIGINT AS sum_qty,
        |       SUM(round(l_extendedprice * 100)::BIGINT)::BIGINT AS sum_base_cents,
        |       SUM(round(l_extendedprice * (1 - l_discount) * 100)::BIGINT)::BIGINT AS sum_disc_cents,
        |       count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_top_orders" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |       SUM(round(l_extendedprice * (1 - l_discount) * 100)::BIGINT)::BIGINT AS revenue_cents,
        |       count(*) AS n_items
        |FROM customer JOIN orders ON o_custkey = c_custkey
        |              JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey, order_date
        |ORDER BY revenue_cents DESC, l_orderkey LIMIT 10""".stripMargin,

    "q5_region_revenue" ->
      """SELECT n_name,
        |       SUM(round(l_extendedprice * (1 - l_discount) * 100)::BIGINT)::BIGINT AS revenue_cents,
        |       count(*) AS n_rows
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |              JOIN customer ON o_custkey = c_custkey
        |              JOIN nation ON c_nationkey = n_nationkey
        |              JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "brand_join" ->
      """SELECT p_brand,
        |       SUM(l_quantity::BIGINT)::BIGINT AS sum_qty,
        |       SUM(round(l_extendedprice * 100)::BIGINT)::BIGINT AS sum_base_cents,
        |       count(*) AS n_rows
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "semi_join_parts" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_partkey = p_partkey AND l_shipdate >= TIMESTAMP '2000-01-01')
        |ORDER BY p_partkey""".stripMargin,

    "anti_join_customers" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "set_ops_custkeys" ->
      """(SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        | INTERSECT
        | SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
        |ORDER BY o_custkey""".stripMargin,

    "distinct_counts" ->
      """SELECT o_orderpriority,
        |       count(DISTINCT o_custkey) AS n_custs,
        |       count(*) AS n_orders,
        |       SUM(round(o_totalprice * 100)::BIGINT)::BIGINT AS total_cents
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "rollup_lineitem" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |       coalesce(l_linestatus, 'ALL') AS linestatus,
        |       count(*) AS n_rows, SUM(l_quantity::BIGINT)::BIGINT AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,

    "range_join_ship" ->
      """SELECT o_orderpriority, count(*) AS n_rows,
        |       SUM(round(l_extendedprice * 100)::BIGINT)::BIGINT AS sum_base_cents
        |FROM orders JOIN lineitem
        |  ON l_orderkey = o_orderkey
        | AND l_shipdate >= o_orderdate
        | AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "topk_per_group" ->
      """SELECT p_type, rk, p_partkey, price_cents FROM (
        |  SELECT p_type, p_partkey, round(p_retailprice * 100)::BIGINT AS price_cents,
        |         row_number() OVER (PARTITION BY p_type ORDER BY p_retailprice DESC, p_partkey) AS rk
        |  FROM part) WHERE rk <= 3
        |ORDER BY p_type, rk""".stripMargin,

    "topk_per_group_agg" ->
      """SELECT p_type, rk, p_partkey, price_cents FROM (
        |  SELECT p_type, p_partkey, round(p_retailprice * 100)::BIGINT AS price_cents,
        |         row_number() OVER (PARTITION BY p_type ORDER BY p_retailprice DESC, p_partkey) AS rk
        |  FROM part) WHERE rk <= 3
        |ORDER BY p_type, rk""".stripMargin,

    "window_funcs" ->
      """SELECT c_mktsegment, c_custkey,
        |       rank() OVER w AS rnk,
        |       dense_rank() OVER w AS drnk,
        |       ntile(4) OVER w AS quartile,
        |       lag(c_custkey, 1) OVER w AS prev_cust,
        |       lead(c_custkey, 1) OVER w AS next_cust
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_mktsegment, rnk, c_custkey""".stripMargin,

    "rolling_sum" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |       (SUM(round(l_extendedprice * 100)::BIGINT) OVER (
        |         PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
        |         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW))::BIGINT AS rolling_cents
        |FROM lineitem ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,

    "global_sort_limit" ->
      """SELECT l_orderkey, l_linenumber, round(l_extendedprice * 100)::BIGINT AS price_cents
        |FROM lineitem ORDER BY price_cents DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin,

    "unpivot_events" ->
      """WITH p AS (
        |  SELECT user_id,
        |         count(*) FILTER (event_type = 'view') AS view,
        |         count(*) FILTER (event_type = 'click') AS click,
        |         count(*) FILTER (event_type = 'purchase') AS purchase
        |  FROM events GROUP BY user_id)
        |SELECT user_id, kind, n_events FROM (
        |  SELECT user_id, 'view' AS kind, view AS n_events FROM p
        |  UNION ALL SELECT user_id, 'click', click FROM p
        |  UNION ALL SELECT user_id, 'purchase', purchase FROM p)
        |ORDER BY user_id, kind""".stripMargin,

    "percentiles" ->
      """SELECT o_orderpriority,
        |       quantile_cont(round(o_totalprice * 100)::BIGINT, 0.5) AS p50,
        |       quantile_cont(round(o_totalprice * 100)::BIGINT, 0.9) AS p90,
        |       count(*) AS n_rows
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q7_nation_volume" ->
      """SELECT s_nationkey::BIGINT AS supp_nation, c_nationkey::BIGINT AS cust_nation,
        |       year(l_shipdate)::BIGINT AS ship_year,
        |       SUM(round(l_extendedprice * (1 - l_discount) * 100)::BIGINT)::BIGINT AS volume_cents,
        |       count(*) AS n_rows
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |              JOIN orders ON l_orderkey = o_orderkey
        |              JOIN customer ON o_custkey = c_custkey
        |WHERE (s_nationkey = 0 AND c_nationkey = 1)
        |   OR (s_nationkey = 1 AND c_nationkey = 0)
        |GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, ship_year""".stripMargin,

    "monthly_revenue" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
        |       SUM(round(l_extendedprice * (1 - l_discount) * 100)::BIGINT)::BIGINT AS revenue_cents,
        |       count(DISTINCT o_orderkey) AS n_orders
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY order_month""".stripMargin,

    "sql_correlated" ->
      """SELECT p_type, p_partkey, round(p_retailprice * 100)::BIGINT AS price_cents
        |FROM part p
        |WHERE p_retailprice = (SELECT min(p2.p_retailprice) FROM part p2
        |                       WHERE p2.p_type = p.p_type)
        |ORDER BY p_type, p_partkey""".stripMargin,

    "lateral_recent_orders" ->
      """SELECT c_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date
        |FROM customer,
        |LATERAL (SELECT o_orderkey, o_orderdate FROM orders
        |         WHERE o_custkey = c_custkey
        |         ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 2) t
        |ORDER BY c_custkey, o_orderkey""".stripMargin,

    "session_duration_histogram" ->
      """WITH d AS (
        |  SELECT event_id, user_id, ts,
        |         epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |  FROM events),
        |s AS (
        |  SELECT *, SUM(CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END)
        |            OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_no
        |  FROM d),
        |dur AS (
        |  SELECT user_id, session_no,
        |         (max(epoch_us(ts)) - min(epoch_us(ts))) / 1000000 AS dur_sec
        |  FROM s GROUP BY user_id, session_no)
        |SELECT floor(dur_sec / 600)::BIGINT AS bucket_10min, count(*) AS n_sessions,
        |       floor(min(dur_sec))::BIGINT AS min_sec, floor(max(dur_sec))::BIGINT AS max_sec
        |FROM dur GROUP BY 1 ORDER BY bucket_10min""".stripMargin,

    "pivot_events" ->
      """SELECT user_id,
        |       count(*) FILTER (event_type = 'view') AS view,
        |       count(*) FILTER (event_type = 'click') AS click,
        |       count(*) FILTER (event_type = 'purchase') AS purchase,
        |       count(*) FILTER (event_type = 'signup') AS signup,
        |       count(*) FILTER (event_type = 'error') AS error
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "latest_order_per_cust" ->
      """SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date
        |FROM orders
        |QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
        |ORDER BY o_custkey""".stripMargin,

    // SCD2 condense: change-filter lag then run lead, both over
    // (custkey | ts, orderkey) — zero-length intervals on same-date
    // changes are the honest representation in both engines
    "scd2_history" ->
      """WITH o AS (SELECT o_custkey, o_orderpriority,
        |                  epoch_us(o_orderdate) AS ts_us, o_orderkey FROM orders),
        |c AS (SELECT *, lag(o_orderpriority) OVER
        |        (PARTITION BY o_custkey ORDER BY ts_us, o_orderkey) AS prev FROM o),
        |chg AS (SELECT * FROM c WHERE prev IS NULL OR prev <> o_orderpriority)
        |SELECT o_custkey, o_orderpriority, ts_us AS valid_from,
        |       lead(ts_us) OVER (PARTITION BY o_custkey ORDER BY ts_us, o_orderkey) AS valid_to
        |FROM chg ORDER BY o_custkey, valid_from, o_orderpriority""".stripMargin,

    // snapshot read: the interval containing the probe instant,
    // half-open [from, to), open current row matches everything later
    "scd2_snapshot" ->
      """WITH o AS (SELECT o_custkey, o_orderpriority,
        |                  epoch_us(o_orderdate) AS ts_us, o_orderkey FROM orders),
        |c AS (SELECT *, lag(o_orderpriority) OVER
        |        (PARTITION BY o_custkey ORDER BY ts_us, o_orderkey) AS prev FROM o),
        |chg AS (SELECT * FROM c WHERE prev IS NULL OR prev <> o_orderpriority),
        |hist AS (SELECT o_custkey, o_orderpriority, ts_us AS valid_from,
        |                lead(ts_us) OVER (PARTITION BY o_custkey ORDER BY ts_us, o_orderkey) AS valid_to
        |         FROM chg)
        |SELECT o_custkey, o_orderpriority FROM hist
        |WHERE valid_from <= 891388800000000
        |  AND (valid_to IS NULL OR valid_to > 891388800000000)
        |ORDER BY o_custkey""".stripMargin,

    "rolling_range_sum" ->
      """SELECT event_id, user_id,
        |       SUM(round(value * 100)::BIGINT) OVER (
        |         PARTITION BY user_id ORDER BY epoch_us(ts)
        |         RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)::BIGINT AS hour_cents
        |FROM events ORDER BY event_id""".stripMargin,

    "bool_aggs" ->
      """SELECT l_returnflag,
        |       count(*) FILTER (l_quantity > 25) AS n_bulk,
        |       bool_and(l_discount >= 0) AS all_nonneg_disc,
        |       bool_or(l_tax > 0.07) AS any_high_tax
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "window_value_funcs" ->
      """SELECT o_custkey, o_orderkey,
        |       first_value(o_orderkey) OVER w AS first_order,
        |       last_value(o_orderkey) OVER w AS last_order,
        |       nth_value(o_orderkey, 2) OVER w AS second_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "grouping_sets_explicit" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |       SUM(l_quantity::BIGINT)::BIGINT AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "salted_agg" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |       SUM(round(l_extendedprice * 100)::BIGINT)::BIGINT AS sum_cents
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q12_shipmode" ->
      """SELECT l_returnflag,
        |       SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
        |       SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, SUM(l_quantity::BIGINT)::BIGINT AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity::BIGINT) > 150)
        |SELECT c_custkey, c_name, o_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d') AS order_date, sum_qty
        |FROM orders JOIN big ON o_orderkey = l_orderkey
        |            JOIN customer ON o_custkey = c_custkey
        |ORDER BY sum_qty DESC, o_orderkey""".stripMargin,

    "q19_disjunctive" ->
      """SELECT SUM(round(l_extendedprice * (1 - l_discount) * 100)::BIGINT)::BIGINT AS revenue_cents,
        |       count(*) AS n_rows
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity < 20)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 20)""".stripMargin,

    "q4_priority" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q6_scan_revenue" ->
      """SELECT SUM(round(l_extendedprice * l_discount * 100)::BIGINT)::BIGINT AS revenue_cents,
        |       count(*) AS n_rows
        |FROM lineitem
        |WHERE l_discount >= 0.02 AND l_discount <= 0.06 AND l_quantity < 10""".stripMargin,

    "window_dist_funcs" ->
      """SELECT o_custkey, o_orderkey,
        |       percent_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS pr,
        |       cume_dist() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS cd
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q2_min_cost_supp" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |         min(floor(l_extendedprice * 1000 / l_quantity)::BIGINT) AS cost_milli
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_size <= 10
        |  GROUP BY l_partkey, l_suppkey),
        |best AS (
        |  SELECT * FROM ps
        |  QUALIFY row_number() OVER (PARTITION BY l_partkey ORDER BY cost_milli, l_suppkey) = 1)
        |SELECT p_partkey, p_name, s_name, cost_milli
        |FROM best JOIN supplier ON l_suppkey = s_suppkey
        |          JOIN part ON l_partkey = p_partkey
        |ORDER BY p_partkey""".stripMargin,

    "q8_share" ->
      """SELECT year(o_orderdate)::BIGINT AS o_year,
        |       SUM(CASE WHEN n_name = 'NATION_0'
        |                THEN round(l_extendedprice * (1 - l_discount) * 100)::BIGINT
        |                ELSE 0 END)::BIGINT AS nation0_cents,
        |       SUM(round(l_extendedprice * (1 - l_discount) * 100)::BIGINT)::BIGINT AS total_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |              JOIN customer ON o_custkey = c_custkey
        |              JOIN nation ON c_nationkey = n_nationkey
        |              JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY 1 ORDER BY o_year""".stripMargin,

    "q10_returners" ->
      """SELECT c_custkey, c_name, n_name,
        |       SUM(round(l_extendedprice * (1 - l_discount) * 100)::BIGINT)::BIGINT AS lost_cents,
        |       count(*) AS n_returned
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |              JOIN customer ON o_custkey = c_custkey
        |              JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY 1, 2, 3
        |ORDER BY lost_cents DESC, c_custkey LIMIT 20""".stripMargin,

    "q9_profit" ->
      """SELECT n_name AS nation, year(o_orderdate)::BIGINT AS o_year,
        |       SUM(round(l_extendedprice * (1 - l_discount) * 100)::BIGINT)::BIGINT AS profit_cents
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |              JOIN supplier ON l_suppkey = s_suppkey
        |              JOIN nation ON s_nationkey = n_nationkey
        |              JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,

    "full_outer_recon" ->
      """WITH h1 AS (SELECT o_custkey, count(*) AS n_h1 FROM orders
        |            WHERE o_orderdate >= '2000-01-01' AND o_orderdate < '2000-07-01'
        |            GROUP BY 1),
        |h2 AS (SELECT o_custkey, count(*) AS n_h2 FROM orders
        |       WHERE o_orderdate >= '2000-07-01' AND o_orderdate < '2001-01-01'
        |       GROUP BY 1)
        |SELECT coalesce(h1.o_custkey, h2.o_custkey) AS o_custkey,
        |       coalesce(n_h1, 0)::BIGINT AS n_h1, coalesce(n_h2, 0)::BIGINT AS n_h2,
        |       CASE WHEN n_h1 IS NOT NULL AND n_h2 IS NOT NULL THEN 'both'
        |            WHEN n_h1 IS NOT NULL THEN 'h1_only' ELSE 'h2_only' END AS presence
        |FROM h1 FULL OUTER JOIN h2 ON h1.o_custkey = h2.o_custkey
        |ORDER BY o_custkey""".stripMargin,

    "q13_custdist" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderstatus != 'P'
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q14_promo" ->
      """SELECT
        |  SUM(CASE WHEN p_type LIKE 'PROMO%'
        |           THEN round(l_extendedprice * (1 - l_discount) * 100)::BIGINT
        |           ELSE 0 END)::BIGINT AS promo_cents,
        |  SUM(round(l_extendedprice * (1 - l_discount) * 100)::BIGINT)::BIGINT AS total_cents,
        |  SUM(CASE WHEN p_type LIKE 'PROMO%'
        |           THEN round(l_extendedprice * (1 - l_discount) * 100)::BIGINT
        |           ELSE 0 END)::DOUBLE
        |    / SUM(round(l_extendedprice * (1 - l_discount) * 100)::BIGINT)::DOUBLE AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= '1998-01-01' AND l_shipdate < '1998-07-01'""".stripMargin,

    "q16_suppcnt" ->
      """SELECT p_brand, p_type, p_size::BIGINT AS p_size,
        |       count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand != 'Brand#9'
        |  AND p_size IN (1, 3, 9, 14, 23, 36, 45, 49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q17_small_qty" ->
      """SELECT SUM(round(l_extendedprice * 100)::BIGINT)::BIGINT AS small_rev_cents,
        |       count(*) AS n_rows
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#1'
        |  AND l_quantity * 5 < (SELECT avg(l2.l_quantity) FROM lineitem l2
        |                        WHERE l2.l_partkey = lineitem.l_partkey)""".stripMargin,

    "q22_global" ->
      """SELECT c_mktsegment, count(*) AS n_cust,
        |       SUM(round(c_acctbal * 100)::BIGINT)::BIGINT AS bal_cents
        |FROM customer
        |WHERE round(c_acctbal * 100)::BIGINT >
        |      (SELECT avg(round(c_acctbal * 100)::BIGINT) FROM customer WHERE c_acctbal > 0)
        |  AND c_custkey NOT IN (SELECT o_custkey FROM orders
        |                        WHERE o_orderdate >= '2000-01-01')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |         SUM(round(l_extendedprice * (1 - l_discount) * 100)::BIGINT)::BIGINT AS total_rev_cents
        |  FROM lineitem
        |  WHERE l_shipdate >= '1998-01-01' AND l_shipdate < '1998-07-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_rev_cents
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_rev_cents = (SELECT max(total_rev_cents) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q20_excess_stock" ->
      """WITH vols AS (
        |  SELECT l_suppkey,
        |         SUM(l_quantity) AS qty_total,
        |         SUM(CASE WHEN l_shipdate >= '2000-01-01' THEN l_quantity ELSE 0 END) AS qty_recent
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE '%red%'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, n_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_suppkey IN (SELECT l_suppkey FROM vols WHERE qty_recent * 3 > qty_total)
        |ORDER BY s_suppkey""".stripMargin,

    "q11_part_share" ->
      """WITH per AS (
        |  SELECT l_partkey,
        |         SUM(round(l_extendedprice * 100)::BIGINT)::BIGINT AS value_cents
        |  FROM lineitem GROUP BY l_partkey),
        |tot AS (SELECT SUM(value_cents)::HUGEINT AS total_cents,
        |               COUNT(*)::HUGEINT AS n_parts FROM per)
        |SELECT l_partkey, value_cents
        |FROM per, tot
        |WHERE value_cents::HUGEINT * n_parts * 2 > total_cents * 3
        |ORDER BY value_cents DESC, l_partkey""".stripMargin,

    "q21_waiting_supplier" ->
      """SELECT s_suppkey, s_name, count(*) AS numwait
        |FROM lineitem l1
        |JOIN orders ON l1.l_orderkey = o_orderkey
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_shipdate >= o_orderdate + INTERVAL 90 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey != l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey != l1.l_suppkey
        |                    AND o3.o_orderstatus = 'F'
        |                    AND l3.l_shipdate >= o3.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY s_suppkey, s_name
        |ORDER BY numwait DESC, s_suppkey""".stripMargin,

    "orders_pareto" ->
      """WITH per AS (
        |  SELECT o_custkey, SUM(round(o_totalprice * 100)::BIGINT)::BIGINT AS rev_cents
        |  FROM orders GROUP BY o_custkey),
        |ranked AS (
        |  SELECT o_custkey, rev_cents,
        |         row_number() OVER (ORDER BY rev_cents DESC, o_custkey) AS rk,
        |         SUM(rev_cents) OVER (ORDER BY rev_cents DESC, o_custkey
        |                              ROWS UNBOUNDED PRECEDING) AS cum_cents,
        |         SUM(rev_cents) OVER () AS total_cents
        |  FROM per)
        |SELECT rk, o_custkey, rev_cents,
        |       cum_cents::DOUBLE / total_cents::DOUBLE AS cum_share
        |FROM ranked WHERE rk <= 100 ORDER BY rk""".stripMargin,

    "exact_moments" ->
      """WITH s AS (
        |  SELECT l_returnflag, count(*)::HUGEINT AS n,
        |         sum(round(l_extendedprice * 100)::BIGINT)::HUGEINT AS sx,
        |         sum(round(l_extendedprice * 100)::BIGINT
        |             * round(l_extendedprice * 100)::BIGINT)::HUGEINT AS sxx,
        |         sum(l_quantity::BIGINT)::HUGEINT AS sq,
        |         sum(round(l_extendedprice * 100)::BIGINT * l_quantity::BIGINT)::HUGEINT AS sxq
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n::BIGINT AS n_rows,
        |       sx::DOUBLE / n::DOUBLE AS mean_cents,
        |       (n * sxx - sx * sx)::DOUBLE / (n * (n - 1))::DOUBLE AS var_cents2,
        |       (n * sxq - sx * sq)::DOUBLE / (n * (n - 1))::DOUBLE AS covar_cents_qty
        |FROM s ORDER BY l_returnflag""".stripMargin)
}
