package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational operator surface over the TPC-H-ish tables (SURVEY.md §2.3
  * joins, §2.5 aggregations, §2.7 sorts/limits). The reference's pipeline
  * never joins (SURVEY.md §2.3) but the engine must expose the full join
  * surface; these queries exercise it against the DuckDB oracle.
  *
  * Money → integer cents before SUM (exact in both engines); see
  * SessionQueries for the portability rules.
  */
object RelationalQueries {

  private def cents(c: org.apache.spark.sql.Column) = round(c * 100).cast("long")

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
    })

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       SUM(l_quantity::BIGINT)::BIGINT AS sum_qty,
        |       SUM(round(l_extendedprice * 100)::BIGINT)::BIGINT AS sum_base_cents,
        |       SUM(round(l_extendedprice * (1 - l_discount) * 100)::BIGINT)::BIGINT AS sum_disc_cents,
        |       count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
}
