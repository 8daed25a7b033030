package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact top-k as a typed `Aggregator[IN, BUF, OUT]` — the engine's one
  * custom aggregation site (SURVEY.md §2.10: everything else is Spark
  * built-ins, the reference's own architectural lesson).
  *
  * Versus the window row_number() pattern, this keeps a bounded k-sized
  * buffer per group on the MAP side (partial aggregation), so the shuffle
  * carries k rows per group instead of every row — the difference between
  * a 100 TB shuffle and a k×groups one when only the top k matter and
  * WindowGroupLimit cannot kick in (e.g. top-k feeding further aggregation).
  */
object TopK {

  /** Per-group top-k of (score, payload) pairs, descending by score with
    * ascending payload tie-break (deterministic).
    *
    * The buffer is a k-bounded Seq kept sorted best-first, encoded with
    * an ExpressionEncoder (ARRAY<STRUCT<double,bigint>> in Tungsten
    * format) — the partial-merge state stays columnar and comparable,
    * unlike an opaque kryo blob that re-serializes a JVM PriorityQueue
    * on every partial merge. Insertion is O(k) with an O(1) early reject
    * of rows worse than the current k-th (the overwhelmingly common case
    * once the buffer warms), merge is a sorted-merge truncated at k.
    */
  class TopKAggregator(k: Int)
      extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

    // "least" in this ordering = best = highest score, lowest payload.
    private val ord: Ordering[(Double, Long)] =
      Ordering.by[(Double, Long), (Double, Long)] { case (s, p) => (-s, p) }

    override def zero: Seq[(Double, Long)] = Vector.empty

    override def reduce(buf: Seq[(Double, Long)],
        in: (Double, Long)): Seq[(Double, Long)] =
      if (buf.length >= k && ord.lteq(buf(k - 1), in)) buf // worse than k-th
      else {
        val i = buf.indexWhere(ord.gt(_, in)) // first element worse than in
        val inserted =
          if (i < 0) buf :+ in
          else (buf.take(i) :+ in) ++ buf.drop(i)
        if (inserted.length > k) inserted.take(k) else inserted
      }

    override def merge(a: Seq[(Double, Long)],
        b: Seq[(Double, Long)]): Seq[(Double, Long)] = {
      val out = mutable.ArrayBuffer.empty[(Double, Long)]
      var i = 0
      var j = 0
      while (out.length < k && (i < a.length || j < b.length)) {
        if (j >= b.length || (i < a.length && ord.lteq(a(i), b(j)))) {
          out += a(i); i += 1
        } else {
          out += b(j); j += 1
        }
      }
      out.toSeq
    }

    override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

    override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

    override def outputEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Untyped column form for DataFrame groupBy:
    * `df.groupBy(g).agg(topKUdaf(5)(col("score"), col("id")))`.
    */
  def topKUdaf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKAggregator(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Long)]())
}
