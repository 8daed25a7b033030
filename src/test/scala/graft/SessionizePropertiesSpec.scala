package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.Sessionize

/** ScalaCheck-generated properties over random event streams
  * (SURVEY.md §7.7): gap invariants, row preservation, non-null ids,
  * and input-permutation invariance. Uses raw Gen with fixed seeds (the
  * scalatestplus bridge isn't available offline) so runs are
  * reproducible.
  */
class SessionizePropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val GapUs = 1800L * 1000000L

  // (user, offsetSeconds, eventId) streams: few users, gaps straddling
  // the 30-min boundary on purpose (including exactly 1800s).
  private val eventsGen: Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.choose(1, 60)
    rows <- Gen.listOfN(n, for {
      user <- Gen.choose(1L, 4L)
      off <- Gen.oneOf(Gen.choose(0L, 7200L), Gen.oneOf(0L, 1799L, 1800L, 1801L, 3600L))
    } yield (user, off))
  } yield rows.zipWithIndex.map { case ((u, o), i) => (u, o, i.toLong) }

  private def toDf(rows: List[(Long, Long, Long)]) =
    rows.toDF("user_id", "off", "event_id")
      .withColumn("ts", timestamp_micros(lit(1700000000000000L) + $"off" * 1000000L))
      .drop("off")

  test("properties: gap rule invariants and permutation invariance on random streams") {
    val samples = (1 to 15).flatMap { i =>
      eventsGen.apply(Gen.Parameters.default, Seed(42L + i))
    }
    assert(samples.size >= 12) // generator should essentially never fail
    samples.foreach { rows =>
      {
        val df = toDf(rows)
        val out = Sessionize.withSessionId(df).cache()

        // row preservation + non-null unique-per-(user,session_no) ids
        assert(out.count() == rows.size)
        assert(out.filter($"session_id".isNull).count() == 0)

        // gap invariants per consecutive pair within a user timeline
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
        val gaps = out
          .withColumn("gap", unix_micros($"ts") - lag(unix_micros($"ts"), 1).over(w))
          .withColumn("sameSession", $"session_id" === lag($"session_id", 1).over(w))
        assert(gaps.filter($"sameSession" && $"gap" > GapUs).count() == 0)
        assert(gaps.filter(!$"sameSession" && $"gap" <= GapUs).count() == 0)

        // permutation invariance: shuffled input yields identical labels
        val shuffled = toDf(scala.util.Random.shuffle(rows))
        val a = out.select("event_id", "session_id").collect()
          .map(r => r.getLong(0) -> r.getString(1)).toMap
        val b = Sessionize.withSessionId(shuffled).select("event_id", "session_id")
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
        assert(a == b)
        out.unpersist()
      }
    }
  }
}
