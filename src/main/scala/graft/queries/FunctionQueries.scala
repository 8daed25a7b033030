package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Scalar/collection function breadth (SURVEY §2.8 extensions): array
  * higher-order functions, MapType construction and lookup, datetime
  * arithmetic, and the common string-function set — each oracled
  * against the DuckDB spelling of the same computation. Everything is
  * per-row codegen'd scalar work except the map build (one aggregate).
  */
object FunctionQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "zorder_key" -> { (spark, dir) =>
      // The Morton-interleave clustering key behind Layout.zOrderBy,
      // oracled bit-for-bit: five shift/mask steps per dimension, all
      // codegen'd integer ops (no UDF).
      import spark.implicits._
      Tables.lineitem(spark, dir)
        .select($"l_orderkey", $"l_linenumber".cast("long").as("l_linenumber"),
          graft.ops.Layout.zValue2($"l_partkey" % 256, $"l_suppkey" % 256).as("z"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    "hof_array_ops" -> { (spark, dir) =>
      // transform/filter/aggregate over the token array, all integer
      // outputs (HOF lambdas are interpreted — fine for scalar surface
      // coverage; hot paths use the explode route, see Dedup scaladoc).
      import spark.implicits._
      val toks = split($"text", " ")
      Tables.documents(spark, dir).select(
        $"doc_id",
        size(toks).cast("long").as("n_tokens"),
        aggregate(transform(toks, t => length(t)), lit(0),
          (acc, x) => acc + x).cast("long").as("total_chars"),
        size(filter(toks, t => length(t) > 4)).cast("long").as("n_long"),
        array_max(transform(toks, t => length(t))).cast("long").as("max_len"))
        .orderBy("doc_id")
    },

    "map_lookup" -> { (spark, dir) =>
      // MapType surface: per-user event_type→count map built with
      // map_from_entries, then key lookups and map cardinality. Scalars
      // out, so the oracle needs no map type. try_element_at, NOT
      // element_at: under ANSI mode (Spark 4's default) element_at
      // THROWS on a missing map key — try_element_at returns the NULL
      // the oracle's NULLIF encodes, whatever the data distribution.
      import spark.implicits._
      Tables.events(spark, dir)
        .groupBy($"user_id", $"event_type").count()
        .groupBy($"user_id")
        .agg(map_from_entries(collect_list(struct($"event_type", $"count"))).as("m"))
        .select($"user_id",
          try_element_at($"m", lit("view")).as("n_view"),
          try_element_at($"m", lit("purchase")).as("n_purchase"),
          size($"m").cast("long").as("n_types"))
        .orderBy("user_id")
    },

    "datetime_funcs" -> { (spark, dir) =>
      // date_trunc (month/week), datediff, last_day, add_months — with
      // month arithmetic clamping (Jan 31 + 1 month = Feb 29) matching
      // DuckDB's INTERVAL addition.
      import spark.implicits._
      Tables.orders(spark, dir).select(
        $"o_orderkey",
        date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM-dd").as("month_start"),
        date_format(date_trunc("week", $"o_orderdate"), "yyyy-MM-dd").as("week_start"),
        datediff($"o_orderdate", lit("1995-01-01")).cast("long").as("days_since"),
        date_format(last_day($"o_orderdate"), "yyyy-MM-dd").as("month_end"),
        date_format(add_months($"o_orderdate", 1), "yyyy-MM-dd").as("next_month"))
        .orderBy("o_orderkey")
    },

    "try_cast_safety" -> { (spark, dir) =>
      // ANSI-mode-safe parsing: try_cast yields NULL for malformed input
      // where a plain cast would throw (Spark 4 runs ANSI by default).
      // A third of the constructed strings are valid numbers, a third
      // carry a junk prefix, a third are empty.
      import spark.implicits._
      val k = get_json_object($"props", "$.k").cast("long")
      Tables.events(spark, dir)
        .withColumn("raw",
          when(k % 3 === 0, k.cast("string"))
            .when(k % 3 === 1, concat(lit("x"), k.cast("string")))
            .otherwise(lit("")))
        .select($"event_id", expr("try_cast(raw AS BIGINT)").as("parsed"))
        .agg(count(lit(1)).as("n_rows"),
          count($"parsed").as("n_parsed"),
          sum($"parsed").as("sum_parsed"))
    },

    "edit_distance_pairs" -> { (spark, dir) =>
      // Exact Levenshtein between consecutive documents — the fuzzy-match
      // primitive (identical DP algorithm in both engines). Bounded to
      // 99 pairs; at scale this would sit behind a blocking stage like
      // the other dedup verifiers.
      import spark.implicits._
      val d = Tables.documents(spark, dir).filter($"doc_id" < 100)
        .select($"doc_id", $"text")
      val a = d.select($"doc_id".as("id_a"), $"text".as("ta"))
      val b = d.select(($"doc_id" - 1).as("id_a"), $"doc_id".as("id_b"), $"text".as("tb"))
      a.join(b, "id_a")
        .select($"id_a", $"id_b", levenshtein($"ta", $"tb").cast("long").as("lev"))
        .orderBy("id_a")
    },

    "string_funcs" -> { (spark, dir) =>
      import spark.implicits._
      Tables.part(spark, dir).select(
        $"p_partkey",
        upper($"p_name").as("up"),
        lpad($"p_partkey".cast("string"), 8, "0").as("padded"),
        reverse($"p_name").as("rev"),
        translate($"p_name", "ae", "XY").as("trans"),
        instr($"p_name", "a").cast("long").as("pos_a"),
        regexp_replace($"p_name", " ", "_").as("joined"),
        element_at(split($"p_name", " "), 1).as("first_word"),
        substring($"p_name", 2, 3).as("sub"),
        repeat($"p_brand", 2).as("brand2x"))
        .orderBy("p_partkey")
    })

  val oracles: Map[String, String] = Map(
    "zorder_key" ->
      """WITH t AS (SELECT l_orderkey, l_linenumber::BIGINT AS l_linenumber,
        |                  l_partkey % 256 AS a, l_suppkey % 256 AS b FROM lineitem),
        |s1 AS (SELECT *, (a | (a << 8)) & 16711935 AS xa,
        |                 (b | (b << 8)) & 16711935 AS xb FROM t),
        |s2 AS (SELECT * REPLACE (((xa | (xa << 4)) & 252645135) AS xa,
        |                         ((xb | (xb << 4)) & 252645135) AS xb) FROM s1),
        |s3 AS (SELECT * REPLACE (((xa | (xa << 2)) & 858993459) AS xa,
        |                         ((xb | (xb << 2)) & 858993459) AS xb) FROM s2),
        |s4 AS (SELECT * REPLACE (((xa | (xa << 1)) & 1431655765) AS xa,
        |                         ((xb | (xb << 1)) & 1431655765) AS xb) FROM s3)
        |SELECT l_orderkey, l_linenumber, (xa | (xb << 1))::BIGINT AS z
        |FROM s4 ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "hof_array_ops" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        |       len(toks)::BIGINT AS n_tokens,
        |       list_sum(list_transform(toks, t -> len(t)))::BIGINT AS total_chars,
        |       len(list_filter(toks, t -> len(t) > 4))::BIGINT AS n_long,
        |       list_max(list_transform(toks, t -> len(t)))::BIGINT AS max_len
        |FROM t ORDER BY doc_id""".stripMargin,

    "map_lookup" ->
      """SELECT user_id,
        |       NULLIF(count(*) FILTER (event_type = 'view'), 0) AS n_view,
        |       NULLIF(count(*) FILTER (event_type = 'purchase'), 0) AS n_purchase,
        |       count(DISTINCT event_type) AS n_types
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "datetime_funcs" ->
      """SELECT o_orderkey,
        |       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |       strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS week_start,
        |       date_diff('day', DATE '1995-01-01', o_orderdate::DATE)::BIGINT AS days_since,
        |       strftime(last_day(o_orderdate::DATE), '%Y-%m-%d') AS month_end,
        |       strftime(o_orderdate::DATE + INTERVAL 1 MONTH, '%Y-%m-%d') AS next_month
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "try_cast_safety" ->
      """WITH x AS (
        |  SELECT event_id,
        |         CASE WHEN k % 3 = 0 THEN k::VARCHAR
        |              WHEN k % 3 = 1 THEN 'x' || k::VARCHAR
        |              ELSE '' END AS raw
        |  FROM (SELECT event_id, json_extract_string(props, '$.k')::BIGINT AS k FROM events))
        |SELECT count(*) AS n_rows,
        |       count(TRY_CAST(raw AS BIGINT)) AS n_parsed,
        |       SUM(TRY_CAST(raw AS BIGINT))::BIGINT AS sum_parsed
        |FROM x""".stripMargin,

    "edit_distance_pairs" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 100)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       levenshtein(a.text, b.text)::BIGINT AS lev
        |FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
        |ORDER BY id_a""".stripMargin,

    "string_funcs" ->
      """SELECT p_partkey,
        |       upper(p_name) AS up,
        |       lpad(p_partkey::VARCHAR, 8, '0') AS padded,
        |       reverse(p_name) AS rev,
        |       translate(p_name, 'ae', 'XY') AS trans,
        |       strpos(p_name, 'a')::BIGINT AS pos_a,
        |       replace(p_name, ' ', '_') AS joined,
        |       split_part(p_name, ' ', 1) AS first_word,
        |       substr(p_name, 2, 3) AS sub,
        |       repeat(p_brand, 2) AS brand2x
        |FROM part ORDER BY p_partkey""".stripMargin)
}
