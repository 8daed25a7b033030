package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Hamming distance between two 64-bit fingerprints (SimHash near-dup
  * verification): popcount of the XOR. A single hardware instruction pair
  * inside whole-stage codegen — the verify filter over LSH candidate
  * pairs stays in the generated loop, no boxing, no function dispatch.
  *
  * The built-in route (`bit_count(a ^ b)` via expr) is equivalent; this
  * native form exists as the engine's minimal example of a scalar
  * comparison expression and is what `hamming_native` resolves to in SQL.
  */
case class HammingDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == LongType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hamming_native requires two BIGINT arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = java.lang.Long.bitCount($a ^ $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDist =
    copy(left = newLeft, right = newRight)
}

object HammingDist {
  /** Column API: `hamming_native(a, b)` over BIGINT fingerprint columns. */
  def hammingNative(a: Column, b: Column): Column =
    Bridge.column(HammingDist(Bridge.expression(a), Bridge.expression(b)))
}
