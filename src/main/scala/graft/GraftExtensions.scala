package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{DotProduct, HammingDist, IntL2, IntersectSize}

/** SparkSessionExtensions entry point — the deployment route for the
  * engine's custom expressions on an unmodified cluster:
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * or
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  *
  * Injected functions are then available to every session created from
  * that context, SQL and Column API alike. For an already-running
  * session, [[graft.Functions.register]] does the same per-session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction(GraftExtensions.dotNativeDescriptor)
    extensions.injectFunction(GraftExtensions.hammingNativeDescriptor)
    extensions.injectFunction(GraftExtensions.intL2NativeDescriptor)
    extensions.injectFunction(GraftExtensions.intersectSizeDescriptor)
    extensions.injectFunction(GraftExtensions.unionSizeDescriptor)
    extensions.injectFunction(GraftExtensions.distinctSizeDescriptor)
    extensions.injectOptimizerRule(_ =>
      graft.expressions.DotProductStrengthReduction)
    // overlap BEFORE intersect-size: `size(...) > 0` becomes the
    // short-circuiting ArraysOverlap first; the count rewrite takes
    // whatever is still counting afterwards
    extensions.injectOptimizerRule(_ =>
      graft.expressions.OverlapStrengthReduction)
    extensions.injectOptimizerRule(_ =>
      graft.expressions.IntersectSizeStrengthReduction)
    extensions.injectOptimizerRule(_ =>
      graft.expressions.IntL2StrengthReduction)
  }
}

object GraftExtensions {
  val dotNativeDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dot_native"),
    new ExpressionInfo(classOf[DotProduct].getCanonicalName, "dot_native"),
    (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1)))

  val hammingNativeDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hamming_native"),
    new ExpressionInfo(classOf[HammingDist].getCanonicalName, "hamming_native"),
    (exprs: Seq[Expression]) => HammingDist(exprs(0), exprs(1)))

  val intL2NativeDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("intl2_native"),
    new ExpressionInfo(classOf[IntL2].getCanonicalName, "intl2_native"),
    (exprs: Seq[Expression]) => IntL2(exprs(0), exprs(1)))

  val intersectSizeDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("intersect_size"),
    new ExpressionInfo(classOf[IntersectSize].getCanonicalName, "intersect_size"),
    (exprs: Seq[Expression]) => IntersectSize(exprs(0), exprs(1)))

  val unionSizeDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("union_size"),
    new ExpressionInfo(classOf[graft.expressions.UnionSize].getCanonicalName, "union_size"),
    (exprs: Seq[Expression]) => graft.expressions.UnionSize(exprs(0), exprs(1)))

  val distinctSizeDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("distinct_size"),
    new ExpressionInfo(classOf[graft.expressions.DistinctSize].getCanonicalName, "distinct_size"),
    (exprs: Seq[Expression]) => graft.expressions.DistinctSize(exprs(0)))
}
