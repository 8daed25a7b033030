package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.Skew

/** Scale-mechanics specs: salted aggregation equivalence and bucketed
  * co-located joins (the pre-shuffled join layout for repeated fact-fact
  * joins at scale).
  */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals plain aggregation") {
    val li = Tables.lineitem(spark, Sf0001)
    val salted = Skew.saltedSumCount(li, Seq("l_returnflag"), "l_quantity")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val plain = li.groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"), sum($"l_quantity").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    // doubles: per-group sums of the same values; salting changes add
    // order, so compare with tolerance on the sum
    val saltedMap = salted.map(t => t._1 -> (t._2, t._3)).toMap
    val plainMap = plain.map(t => t._1 -> (t._2, t._3)).toMap
    assert(saltedMap.keySet == plainMap.keySet)
    saltedMap.foreach { case (k, (n, s)) =>
      assert(n == plainMap(k)._1)
      assert(math.abs(s - plainMap(k)._2) < 1e-6 * math.abs(s))
    }
  }

  test("bucketed tables join without a shuffle exchange") {
    // runtime conf on the shared session (a second builder.getOrCreate in
    // the same JVM would silently ignore static confs)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      Tables.lineitem(spark, Sf0001).write
        .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("li_bucketed")
      Tables.orders(spark, Sf0001).write
        .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("ord_bucketed")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected no shuffle, got:\n$plan")
      // co-located join still returns the right row count
      val expected = Tables.lineitem(spark, Sf0001)
        .join(Tables.orders(spark, Sf0001), col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(joined.count() == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("range-partitioned sorted write produces non-overlapping sorted files") {
    // The data-skipping layout: repartitionByRange gives files with
    // disjoint key ranges, sortWithinPartitions orders rows inside each —
    // parquet min/max stats then prune row groups on key predicates.
    val base = Files.createTempDirectory("graft-range").toString
    Tables.orders(spark, Sf0001)
      .repartitionByRange(4, col("o_custkey"))
      .sortWithinPartitions("o_custkey")
      .write.parquet(s"$base/orders_ranged")
    val files = new java.io.File(s"$base/orders_ranged").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(files.length >= 2)
    val ranges = files.map { f =>
      val keys = spark.read.parquet(f).select("o_custkey")
        .collect().map(_.getLong(0))
      assert(keys.sameElements(keys.sorted), s"unsorted within $f")
      (keys.min, keys.max)
    }
    // files' [min,max] ranges must not overlap pairwise
    val sortedR = ranges.sortBy(_._1)
    sortedR.sliding(2).foreach {
      case Array((_, aMax), (bMin, _)) => assert(aMax <= bMin, sortedR.mkString(","))
      case _ =>
    }
  }
}
