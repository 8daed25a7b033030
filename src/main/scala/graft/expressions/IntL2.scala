package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native integer squared-L2 distance over two ARRAY<BIGINT> columns —
  * the hot inner loop of PQ encode, IVF-PQ ADC lookup tables, and the
  * k-means assignment step, where the portable route
  * `aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0L, +)` is an
  * interpreted lambda per element. Generates the same tight primitive
  * loop shape as [[DotProduct]].
  *
  * Semantics match the HOF fold exactly:
  *   - either array NULL → NULL; unequal lengths → NULL (zip_with's
  *     null padding propagates); any NULL element → NULL;
  *   - `exact = false` (legacy eval mode) wraps on int64 overflow like
  *     the legacy arithmetic expressions;
  *   - `exact = true` (ANSI eval mode, the Spark 4 default) throws on
  *     overflow via Math.*Exact, like ANSI arithmetic does.
  * The element null branch compiles out when both array types carry
  * containsNull=false.
  */
case class IntL2(left: Expression, right: Expression, exact: Boolean = true)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  private def elementsNullable: Boolean =
    Seq(left, right).exists(_.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => false
    })

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"intl2_native requires two ARRAY<BIGINT> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val checkNulls = elementsNullable
    var acc = 0L
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      if (exact) {
        val d = Math.subtractExact(x.getLong(i), y.getLong(i))
        acc = Math.addExact(acc, Math.multiplyExact(d, d))
      } else {
        val d = x.getLong(i) - y.getLong(i)
        acc += d * d
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val nullCheck = if (elementsNullable) {
        s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
      } else ""
      val step = if (exact) {
        s"""long $d = java.lang.Math.subtractExact($a.getLong($i), $b.getLong($i));
           |    $acc = java.lang.Math.addExact($acc, java.lang.Math.multiplyExact($d, $d));""".stripMargin
      } else {
        s"""long $d = $a.getLong($i) - $b.getLong($i);
           |    $acc += $d * $d;""".stripMargin
      }
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $step
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntL2 =
    copy(left = newLeft, right = newRight)
}

object IntL2 {
  /** Column API: `intl2_native(a, b)` over ARRAY<BIGINT> columns. */
  def intL2Native(a: Column, b: Column): Column =
    Bridge.column(IntL2(Bridge.expression(a), Bridge.expression(b)))
}
