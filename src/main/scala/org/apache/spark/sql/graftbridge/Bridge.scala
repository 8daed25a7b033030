package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for Spark 4.x, where the conversion
  * utilities are private[sql]. Standard pattern for libraries shipping
  * custom Catalyst expressions: a minimal shim inside the sql package
  * namespace, nothing else.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Apply a SparkSessionExtensions' injected functions to a registry
    * (private[sql] in Spark; exposed for extension tests).
    */
  def registerFunctions(ext: org.apache.spark.sql.SparkSessionExtensions,
      registry: org.apache.spark.sql.catalyst.analysis.FunctionRegistry): Unit =
    ext.registerFunctions(registry)

  /** Checked long arithmetic that throws Spark's SparkArithmeticException
    * (error class ARITHMETIC_OVERFLOW) — the same MathUtils Spark's own
    * ANSI Add/Subtract/Multiply route through, so SparkThrowable-based
    * handlers observe the identical failure from graft's native
    * expressions (MathUtils is private[sql]; exposed here for IntL2's
    * interpreted eval — codegen references it directly).
    */
  def subtractExact(a: Long, b: Long): Long =
    org.apache.spark.sql.catalyst.util.MathUtils.subtractExact(a, b)
  def multiplyExact(a: Long, b: Long): Long =
    org.apache.spark.sql.catalyst.util.MathUtils.multiplyExact(a, b)
  def addExact(a: Long, b: Long): Long =
    org.apache.spark.sql.catalyst.util.MathUtils.addExact(a, b)

  /** DataFrame over an arbitrary logical plan (Dataset.ofRows is
    * private[sql]; exposed so optimizer-rule tests can execute the plan
    * a rule produced).
    */
  def dataFrame(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
