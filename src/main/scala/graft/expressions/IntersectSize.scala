package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared implementation of the distinct-intersection COUNT — a plain
  * top-level object so interpreted eval and generated code call the
  * same bytes (Scala emits a static forwarder the codegen string can
  * reference directly).
  */
object IntersectSizeUtil {

  /** |distinct(a) ∩ distinct(b)| over string arrays, with a NULL
    * element counting as one intersectable value iff BOTH sides contain
    * one — exactly `size(array_intersect(a, b))` semantics (the
    * intersection is duplicate-free, and array_intersect keeps a single
    * null when both sides have one). The hash set holds the SMALLER
    * side; matches are removed as they count, which both dedupes the
    * probe side and lets the loop exit early once the set drains.
    */
  def count(a: ArrayData, b: ArrayData): Int = {
    val (s, t) = if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val set = new java.util.HashSet[UTF8String]()
    var setHasNull = false
    val ns = s.numElements()
    var i = 0
    while (i < ns) {
      if (s.isNullAt(i)) setHasNull = true
      else set.add(s.getUTF8String(i)): Unit
      i += 1
    }
    var cnt = 0
    val nt = t.numElements()
    var j = 0
    while (j < nt && (!set.isEmpty || setHasNull)) {
      if (t.isNullAt(j)) {
        if (setHasNull) { cnt += 1; setHasNull = false }
      } else if (set.remove(t.getUTF8String(j))) {
        cnt += 1
      }
      j += 1
    }
    cnt
  }
}

/** Native `size(array_intersect(a, b))` over two ARRAY<STRING> columns —
  * the verification inner loop of every set-similarity stage (MinHash /
  * n-gram / prefix-filter Jaccard verify, containment, entity
  * resolution), where the built-in chain MATERIALIZES the whole
  * intersection array (hash-set build, probe, copy every matching
  * UTF8String into a fresh array) only for Size to collapse it to one
  * int. This computes the count directly: one hash set over the SMALLER
  * side, remove-on-match (dedupes the probe and drains to an early
  * exit), zero result allocation.
  *
  * Restricted to string elements deliberately: Spark's set operations
  * give NaN=NaN and normalize -0.0 for float/double elements via a
  * specialized hash set, a subtlety a generic rewrite must not re-derive.
  * Binary UTF8String equality has no such cases. Null semantics match
  * the built-in chain exactly: either ARRAY null → null (BinaryExpression
  * contract = non-legacy size(null)); a null ELEMENT on both sides
  * counts once ([[IntersectSizeUtil.count]]), so the rewrite needs no
  * containsNull restriction — unlike [[OverlapStrengthReduction]],
  * whose boolean target genuinely diverges under element nulls.
  */
case class IntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"intersect_size requires two ARRAY<STRING> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    IntersectSizeUtil.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.IntersectSizeUtil.count($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectSize =
    copy(left = newLeft, right = newRight)
}

object IntersectSize {
  /** Column API: `intersect_size(a, b)` over ARRAY<STRING> columns. */
  def intersectSizeNative(a: Column, b: Column): Column =
    Bridge.column(IntersectSize(Bridge.expression(a), Bridge.expression(b)))
}

object UnionSizeUtil {

  /** |distinct(a) ∪ distinct(b)| over string arrays, null counting once
    * if EITHER side carries one — exactly `size(array_union(a, b))`
    * (array_union dedupes and keeps a single null from whichever side).
    * One hash set over both inputs, no union array materialized.
    */
  def count(a: ArrayData, b: ArrayData): Int = {
    val set = new java.util.HashSet[UTF8String]()
    var hasNull = false
    var i = 0
    val na = a.numElements()
    while (i < na) {
      if (a.isNullAt(i)) hasNull = true
      else set.add(a.getUTF8String(i)): Unit
      i += 1
    }
    var j = 0
    val nb = b.numElements()
    while (j < nb) {
      if (b.isNullAt(j)) hasNull = true
      else set.add(b.getUTF8String(j)): Unit
      j += 1
    }
    set.size + (if (hasNull) 1 else 0)
  }
}

/** Native `size(array_union(a, b))` over two ARRAY<STRING> columns — the
  * union half of the Jaccard verify (`inter·den > uni·num`), with the
  * same no-materialization argument as [[IntersectSize]] and the same
  * string-only restriction (float set ops have NaN/-0.0 special cases).
  */
case class UnionSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"union_size requires two ARRAY<STRING> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    UnionSizeUtil.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.UnionSizeUtil.count($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): UnionSize =
    copy(left = newLeft, right = newRight)
}

object UnionSize {
  /** Column API: `union_size(a, b)` over ARRAY<STRING> columns. */
  def unionSizeNative(a: Column, b: Column): Column =
    Bridge.column(UnionSize(Bridge.expression(a), Bridge.expression(b)))
}

object DistinctSizeUtil {

  /** |distinct(a)| over a string array, null counting once if present —
    * exactly `size(array_distinct(a))` (array_distinct keeps one null).
    */
  def count(a: ArrayData): Int = {
    val set = new java.util.HashSet[UTF8String]()
    var hasNull = false
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (a.isNullAt(i)) hasNull = true
      else set.add(a.getUTF8String(i)): Unit
      i += 1
    }
    set.size + (if (hasNull) 1 else 0)
  }
}

/** Native `size(array_distinct(a))` over an ARRAY<STRING> column — the
  * unary member of the counting family ([[IntersectSize]] /
  * [[UnionSize]]): distinct-ratio and duplicate-gram statistics
  * (qualityMetrics, repetitionStats, gopherRules) collapse the
  * materialized distinct array to one int per row; the native count
  * never builds it. Same string-only restriction.
  */
case class DistinctSize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = IntegerType

  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"distinct_size requires an ARRAY<STRING> argument, got ${other.sql}")
    }

  override def nullSafeEval(a: Any): Any =
    DistinctSizeUtil.count(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.DistinctSizeUtil.count($a);")

  override protected def withNewChildInternal(newChild: Expression): DistinctSize =
    copy(child = newChild)
}

object DistinctSize {
  /** Column API: `distinct_size(a)` over an ARRAY<STRING> column. */
  def distinctSizeNative(a: Column): Column =
    Bridge.column(DistinctSize(Bridge.expression(a)))
}
