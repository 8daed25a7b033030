package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder, Encoders}
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
    */
  class TopKAggregator(k: Int)
      extends Aggregator[(Double, Long), mutable.PriorityQueue[(Double, Long)], Seq[(Double, Long)]] {

    // min-heap so the worst survivor is on top and eviction is O(log k);
    // ordering inverted: "least" = lowest score, highest payload.
    private val heapOrd: Ordering[(Double, Long)] =
      Ordering.by[(Double, Long), (Double, Long)] { case (s, p) => (-s, p) }

    override def zero: mutable.PriorityQueue[(Double, Long)] =
      mutable.PriorityQueue.empty(heapOrd)

    override def reduce(buf: mutable.PriorityQueue[(Double, Long)],
        in: (Double, Long)): mutable.PriorityQueue[(Double, Long)] = {
      buf.enqueue(in)
      while (buf.size > k) buf.dequeue()
      buf
    }

    override def merge(a: mutable.PriorityQueue[(Double, Long)],
        b: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
      b.foreach(a.enqueue(_))
      while (a.size > k) a.dequeue()
      a
    }

    override def finish(buf: mutable.PriorityQueue[(Double, Long)]): Seq[(Double, Long)] =
      buf.toSeq.sortBy { case (s, p) => (-s, p) }

    override def bufferEncoder: Encoder[mutable.PriorityQueue[(Double, Long)]] =
      Encoders.kryo[mutable.PriorityQueue[(Double, Long)]]

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
