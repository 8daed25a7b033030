package graft

import org.apache.spark.sql.SparkSession

import graft.expressions.{DotProduct, HammingDist, IntL2, IntersectSize}

/** SQL-surface registration: exposes the engine's custom expression(s)
  * to `spark.sql` so the SQL entry point is as complete as the Column
  * API. Idempotent.
  */
object Functions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_native", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hamming_native", exprs => HammingDist(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "intl2_native", exprs => IntL2(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "intersect_size", exprs => IntersectSize(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "union_size", exprs => graft.expressions.UnionSize(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "distinct_size", exprs => graft.expressions.DistinctSize(exprs(0)), "built-in")
  }
}
