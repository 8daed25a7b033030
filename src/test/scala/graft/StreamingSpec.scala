package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Sessionize
import graft.streaming.StreamingSessionize
import graft.streaming.StreamingSessionize.{Ev, Labeled}

/** Streaming sessionization vs the batch core: the batch output is the
  * oracle (SURVEY.md §7.6).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def evs(n: Int): Seq[Ev] = {
    // sf0.001 events, shrunk: first n rows as typed Ev.
    Tables.events(spark, Sf0001)
      .select($"user_id", $"ts", $"event_id")
      .orderBy("event_id").limit(n).as[Ev].collect().toSeq
  }

  test("session_window agg on stream equals batch session_window agg") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingSessionize.sessionWindowAgg(input.toDF())
      .writeStream.outputMode("complete")
      .format("memory").queryName("sw_out").start()
    val data = evs(300)
    // two micro-batches split mid-stream (event-time order preserved)
    input.addData(data.take(150)); q.processAllAvailable()
    input.addData(data.drop(150)); q.processAllAvailable()
    val got = spark.table("sw_out")
      .select("user_id", "session_start", "n_events", "first_event", "last_event")
      .collect().map(_.toSeq).toSet
    q.stop()

    val batch = StreamingSessionize.sessionWindowAgg(
      data.toDF(), withWatermarkCol = None)
      .select("user_id", "session_start", "n_events", "first_event", "last_event")
      .collect().map(_.toSeq).toSet
    assert(got == batch)

    // and the session boundaries agree with the gap-rule core
    val core = Sessionize.withSessionNo(data.toDF())
      .groupBy("user_id", "session_no").agg(count(lit(1)).as("n"))
      .select(sum("n")).head.getLong(0)
    assert(batch.toSeq.map(_(2).asInstanceOf[Long]).sum == core)
  }

  test("flatMapGroupsWithState labeler matches batch session ids for closed sessions") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingSessionize.labelSessions(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("lbl_out").start()
    val data = evs(300)
    input.addData(data.take(100)); q.processAllAvailable()
    input.addData(data.slice(100, 200)); q.processAllAvailable()
    input.addData(data.drop(200)); q.processAllAvailable()
    // advance the watermark far past everything so all sessions close:
    val maxTs = data.map(_.ts.getTime).max
    input.addData(Ev(999999L, new Timestamp(maxTs + 7200 * 1000L), 999999L))
    q.processAllAvailable()
    input.addData(Ev(999999L, new Timestamp(maxTs + 14400 * 1000L), 999998L))
    q.processAllAvailable()
    val got = spark.table("lbl_out").as[Labeled].collect()
      .filter(_.user_id != 999999L)
      .map(l => l.event_id -> l.session_id).toMap
    q.stop()

    val batch = Sessionize.withSessionId(data.toDF())
      .select("event_id", "session_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == batch.size)
    assert(got == batch)
  }
}
