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
  *     the legacy arithmetic expressions, and short-circuits out on the
  *     first NULL element (wrap-around can't throw, so the skipped
  *     arithmetic is unobservable);
  *   - `exact = true` (ANSI eval mode, the Spark 4 default) replays the
  *     HOF's element order faithfully: zip_with evaluates its lambda for
  *     EVERY in-range pair before the fold sees anything, so a NULL
  *     element (or a length mismatch) poisons the RESULT but must not
  *     suppress a later pair's overflow. The exact loop therefore keeps
  *     doing checked subtract/multiply after a null is seen and only
  *     stops accumulating, and it throws through Spark's MathUtils —
  *     SparkArithmeticException, error class ARITHMETIC_OVERFLOW — the
  *     identical failure ANSI Add/Subtract/Multiply raise, so
  *     SparkThrowable handlers and error-message tests can't tell the
  *     native path from the HOF. (Sole remaining nuance, documented and
  *     accepted: with ≥2 independent overflows in one row the HOF
  *     surfaces the first MULTIPLY overflow before any ADD overflow —
  *     zip_with materializes all products first — while the fused loop
  *     interleaves; the exception type and error class are identical
  *     either way.)
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
    val m = y.numElements()
    val checkNulls = elementsNullable
    if (exact) {
      // HOF-faithful: checked arithmetic for every in-range pair (a
      // later overflow must throw even after a null), accumulate only
      // until the first null position (the fold is poisoned from there).
      val common = math.min(n, m)
      var nullSeen = n != m
      var acc = 0L
      var i = 0
      while (i < common) {
        if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) nullSeen = true
        else {
          val d = Bridge.subtractExact(x.getLong(i), y.getLong(i))
          val p = Bridge.multiplyExact(d, d)
          if (!nullSeen) acc = Bridge.addExact(acc, p)
        }
        i += 1
      }
      if (nullSeen) null else acc
    } else {
      if (n != m) return null
      var acc = 0L
      var i = 0
      while (i < n) {
        if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
        val d = x.getLong(i) - y.getLong(i)
        acc += d * d
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val p = ctx.freshName("p")
      val nullSeen = ctx.freshName("nullSeen")
      if (exact) {
        // Same MathUtils Spark's ANSI arithmetic codegen calls —
        // SparkArithmeticException / ARITHMETIC_OVERFLOW, not a bare
        // java.lang.ArithmeticException.
        val mu = "org.apache.spark.sql.catalyst.util.MathUtils"
        val nullCheck = if (elementsNullable) {
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { $nullSeen = true; } else"
        } else ""
        s"""
           |int $n = $a.numElements();
           |int $m = $b.numElements();
           |boolean $nullSeen = ($n != $m);
           |long $acc = 0L;
           |int $i = 0;
           |for (int common = java.lang.Math.min($n, $m); $i < common; $i++) {
           |  $nullCheck {
           |    long $d = $mu.subtractExact($a.getLong($i), $b.getLong($i));
           |    long $p = $mu.multiplyExact($d, $d);
           |    if (!$nullSeen) $acc = $mu.addExact($acc, $p);
           |  }
           |}
           |if ($nullSeen) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         """.stripMargin
      } else {
        val nullCheck = if (elementsNullable) {
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        } else ""
        s"""
           |int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  long $acc = 0L;
           |  for (int $i = 0; $i < $n; $i++) {
           |    $nullCheck
           |    long $d = $a.getLong($i) - $b.getLong($i);
           |    $acc += $d * $d;
           |  }
           |  if (!${ev.isNull}) ${ev.value} = $acc;
           |}
         """.stripMargin
      }
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
