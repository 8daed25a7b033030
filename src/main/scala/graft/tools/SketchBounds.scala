package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** Error-band evidence for the two approximate-by-design queries
  * (`approx_distinct_parts`, `approx_percentiles`) — the only
  * CORRECTNESS entries with no DuckDB hash oracle. OpsSpec asserts the
  * same bounds in-suite; this emits the observed-vs-bound numbers as a
  * per-round JSON artifact (`SKETCH_BOUNDS.json`, archived as
  * `SKETCH_BOUNDS_r{N}.json`) so the verification record carries the
  * sketch contract, not just a rows-only check (r7 verdict item 5).
  *
  * Bounds restated:
  *  - HLL++ (`approx_count_distinct`, default rsd 0.05): each group's
  *    estimate within 3 standard deviations = 15% relative error.
  *  - Quantile sketch (`percentile_approx`, accuracy 10000): the value
  *    is an actual element whose RANK is within n/accuracy of the
  *    target, so it must sit between the exact order statistics at
  *    rank ± (n/accuracy + 1).
  */
object SketchBounds {

  def reportJson(spark: SparkSession, sfDir: String): String = {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)

    // --- HLL distinct counts per l_returnflag
    val exactD = li.groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("ex")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approxD = li.groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_partkey").as("ap")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val hllGroups = exactD.toSeq.sortBy(_._1).map { case (k, ex) =>
      val ap = approxD(k)
      val rel = if (ex == 0) 0.0 else math.abs(ap - ex).toDouble / ex
      (k, ex, ap, rel, rel <= 0.15)
    }

    // --- quantile sketch per l_returnflag; the exact order statistics
    // come from a DISTRIBUTED per-group rank window (driver holds only
    // groups × quantiles rows, never lineitem rows — this stays
    // runnable at any SF)
    val qs = Seq(0.5, 0.95, 0.99)
    val apx = li.groupBy($"l_returnflag")
      .agg(percentile_approx($"l_extendedprice",
        array(qs.map(lit): _*), lit(10000)).as("apx"),
        count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> (r.getSeq[Double](1), r.getLong(2))).toMap
    val boundRows = apx.toSeq.flatMap { case (k, (vals, n)) =>
      val slack = n.toDouble / 10000.0 + 1
      qs.zipWithIndex.map { case (q, i) =>
        val target = math.ceil(q * n)
        (k, q, math.max(1L, (target - slack).toLong),
          math.min(n, (target + slack).toLong), vals(i))
      }
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"l_returnflag").orderBy($"l_extendedprice")
    val ranked = li.select($"l_returnflag", $"l_extendedprice")
      .withColumn("rk", row_number().over(w))
    val pctGroups = ranked
      .join(broadcast(boundRows.toDF("k", "q", "rlo", "rhi", "apxv")),
        $"l_returnflag" === $"k" && ($"rk" === $"rlo" || $"rk" === $"rhi"))
      .groupBy($"k", $"q", $"apxv")
      .agg(min(when($"rk" === $"rlo", $"l_extendedprice")).as("lo"),
        min(when($"rk" === $"rhi", $"l_extendedprice")).as("hi"))
      .collect()
      .map { r =>
        val (k, q, got) = (r.getString(0), r.getDouble(1), r.getDouble(2))
        val (lo, hi) = (r.getDouble(3), r.getDouble(4))
        (k, q, got, lo, hi, got >= lo && got <= hi)
      }.sortBy(r => (r._1, r._2)).toSeq

    // --- the repo's OWN deterministic HLL (graft.ops.Hll, p = 8) on the
    // same column, beside its exact counts. Unlike the two entries
    // above this family IS hash-oracled (the estimate is exact integer
    // arithmetic) — these rows document its ACCURACY, which no oracle
    // can: bound 3σ = 3·1.04/√256 ≈ 19.5%, applicable only in the raw
    // estimator's design regime (exact ≥ 5/2·m; below it the raw form
    // over-corrects by design and consumers apply linear counting on
    // the emitted n_zero_regs).
    val detEst = graft.ops.Hll.distinctEstimate(li, "l_partkey",
        groupCols = Seq("l_returnflag")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val detGroups = exactD.toSeq.sortBy(_._1).map { case (k, ex) =>
      val est = detEst(k)
      val rel = if (ex == 0) 0.0 else math.abs(est - ex).toDouble / ex
      val inRegime = ex >= 640L // 5/2 · 256
      (k, ex, est, rel, inRegime, !inRegime || rel <= 0.195)
    }

    val fmt = (d: Double) =>
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toString
    val hllJson = hllGroups.map { case (k, ex, ap, rel, ok) =>
      s"""{"key":"$k","exact":$ex,"approx":$ap,"rel_err":${fmt(rel)},"ok":$ok}"""
    }.mkString("[", ",", "]")
    val pctJson = pctGroups.map { case (k, q, got, lo, hi, ok) =>
      s"""{"key":"$k","q":$q,"approx":${fmt(got)},"rank_lo":${fmt(lo)},"rank_hi":${fmt(hi)},"ok":$ok}"""
    }.mkString("[", ",", "]")
    val detJson = detGroups.map { case (k, ex, est, rel, inRegime, ok) =>
      s"""{"key":"$k","exact":$ex,"est":$est,"rel_err":${fmt(rel)},"in_design_regime":$inRegime,"ok":$ok}"""
    }.mkString("[", ",", "]")
    val allOk = hllGroups.forall(_._5) && pctGroups.forall(_._6) &&
      detGroups.forall(_._6)
    s"""{"sf":"$sfDir","all_within_bounds":$allOk,""" +
      s""""approx_distinct_parts":{"sketch":"HLL++","rsd":0.05,"bound":"rel_err <= 0.15 (3*rsd)","groups":$hllJson},""" +
      s""""approx_percentiles":{"sketch":"percentile_approx","accuracy":10000,"bound":"value between exact order stats at rank +/- (n/accuracy+1)","groups":$pctJson},""" +
      s""""hll_deterministic":{"sketch":"graft.ops.Hll raw estimator","p":8,"bound":"rel_err <= 0.195 (3*1.04/sqrt(256)) when exact >= 640","groups":$detJson}}"""
  }
}
