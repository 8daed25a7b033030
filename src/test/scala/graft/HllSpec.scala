package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Hll

/** Deterministic HyperLogLog ([[graft.ops.Hll]]): device pinned against
  * a from-scratch JVM recompute, the merge laws, the exact-integer
  * estimator against BigInt arithmetic, and the accuracy band the raw
  * estimator promises in its design regime.
  */
class HllSpec extends SparkSpec {
  import spark.implicits._

  /** From-scratch JVM twin of the md5 device — java.security digest,
    * not Spark functions, so a Spark-side expression bug cannot hide.
    */
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def h60(salt: String, item: String): Long =
    java.lang.Long.parseLong(md5hex(salt + item).take(15), 16)

  private def regOf(item: String, p: Int): Long =
    h60("hllreg:", item) % (1L << p)

  private def rhoOf(item: String): Long = {
    val h = h60("hllrho:", item)
    if (h == 0L) 61L else 61L - (64 - java.lang.Long.numberOfLeadingZeros(h))
  }

  /** BigInt twin of [[Hll.estimate]]'s rational arithmetic. */
  private def estimateBig(regs: Map[Long, Long], p: Int): (Long, Long) = {
    val m = 1L << p
    val s = regs.values.map(r => BigInt(1) << (61 - r.toInt)).sum +
      BigInt(m - regs.size) * (BigInt(1) << 61)
    val num = BigInt(7213) * BigInt(m).pow(3) * (BigInt(1) << 61)
    val den = BigInt(10) * (BigInt(1000) * m + 1079) * s
    ((num / den).toLong, m - regs.size)
  }

  private def items(n: Int, tag: String = "it"): DataFrame =
    spark.range(n.toLong).select(concat(lit(tag), col("id")).as("item"))

  test("register fold matches the from-scratch JVM device") {
    val names = (0 until 500).map(i => s"it$i")
    val expected = names.groupBy(n => regOf(n, 8))
      .map { case (r, grp) => (r, grp.map(rhoOf).max) }
    val got = Hll.registers(items(500), "item", p = 8)
      .as[(Long, Long)].collect().toMap
    assert(got === expected)
  }

  test("rho is 1 + leading zeros: hand-checked magnitudes") {
    // the device is fixed, so specific items have fixed rho; verify the
    // RELATION (not just equality with another implementation): rho = k
    // iff the 60-bit hash is in [2^(61-k-1), 2^(61-k)) for k < 61
    (0 until 200).map(i => s"x$i").foreach { it =>
      val h = h60("hllrho:", it)
      val rho = rhoOf(it)
      assert(h < (1L << (61 - rho)) &&
        (rho == 61L || h >= (1L << (60 - rho))),
        s"item $it: h=$h rho=$rho")
    }
    val got = Hll.registers(items(200, "x"), "item", p = 8)
      .agg(sum($"rho")).as[Long].head()
    val want = (0 until 200).map(i => s"x$i").groupBy(n => regOf(n, 8))
      .map { case (_, g) => g.map(rhoOf).max }.sum
    assert(got === want)
  }

  test("merge of disjoint slices equals the fold of the union") {
    val whole = items(3000)
    val slices = (0 until 3).map(k =>
      Hll.registers(whole.filter(pmod(crc32($"item"), lit(3)) === k), "item"))
    val merged = Hll.mergeRegisters(slices).as[(Long, Long)].collect().toMap
    val direct = Hll.registers(whole, "item").as[(Long, Long)].collect().toMap
    assert(merged === direct)
  }

  test("merge is idempotent: overlapping batches cannot skew the sketch") {
    val r = Hll.registers(items(1000), "item")
    val overlapA = Hll.registers(items(700), "item")       // it0..699
    val merged = Hll.mergeRegisters(Seq(r, r, overlapA))
      .as[(Long, Long)].collect().toMap
    assert(merged === r.as[(Long, Long)].collect().toMap)
  }

  test("estimate matches BigInt arithmetic exactly") {
    for (p <- Seq(8, 12)) {
      val regs = Hll.registers(items(2500), "item", p = p)
      val (wantEst, wantZero) = estimateBig(
        regs.as[(Long, Long)].collect().toMap, p)
      val got = Hll.estimate(regs, p = p).as[(Long, Long)].head()
      assert(got === ((wantEst, wantZero)), s"p=$p")
    }
  }

  test("raw estimator lands within its error band in the design regime") {
    // n >> 5/2·m so the raw estimator is in its unbiased regime; the
    // device is fixed, so these are deterministic pins of REAL accuracy,
    // red if the sketch math (not the data) ever changes.
    // p=8: sigma = 1.04/16 = 6.5%; assert 3 sigma.
    val est8 = Hll.distinctEstimate(items(20000), "item", p = 8)
      .select($"est_distinct").as[Long].head()
    assert(math.abs(est8 - 20000L) < 20000L * 0.195, s"p=8 est=$est8")
    // p=12: sigma = 1.04/64 = 1.6%; assert 3 sigma.
    val est12 = Hll.distinctEstimate(items(50000), "item", p = 12)
      .select($"est_distinct").as[Long].head()
    assert(math.abs(est12 - 50000L) < 50000L * 0.049, s"p=12 est=$est12")
  }

  test("the empty sketch estimates to floor(alpha_m * m), never NULL") {
    // a fresh store before any fold: S = m·2^61, est = ⌊alpha_m·m⌋ =
    // ⌊7213·m²/(10·(1000·m+1079))⌋ = 183 at m=256, with n_zero_regs = m
    // telling consumers they are in the linear-counting regime (LC on
    // V = m gives the true 0)
    val empty = Hll.registers(items(0), "item")
    val got = Hll.estimate(empty).as[(Long, Long)].head()
    assert(got === ((183L, 256L)))
    assert(got === estimateBig(Map.empty, 8))
  }

  test("null items are dropped, not folded") {
    val withNulls = items(300).unionAll(
      spark.range(5).select(lit(null: String).as("item")))
    val a = Hll.registers(withNulls, "item").as[(Long, Long)].collect().toSet
    val b = Hll.registers(items(300), "item").as[(Long, Long)].collect().toSet
    assert(a === b)
  }

  test("grouped registers and estimates stay per-group") {
    val df = items(2000).withColumn("grp", pmod(crc32($"item"), lit(2)))
    val est = Hll.distinctEstimate(df, "item", groupCols = Seq("grp"))
      .orderBy($"grp").as[(Long, Long, Long)].collect()
    assert(est.length === 2)
    // per-group estimate equals the estimate of that group alone
    val solo = Hll.distinctEstimate(
      df.filter($"grp" === 0).select($"item"), "item")
      .as[(Long, Long)].head()
    assert((est(0)._2, est(0)._3) === solo)
  }

  test("a wider-p register table refuses to merge at a narrower p") {
    val wide = Hll.registers(items(5000), "item", p = 12)
    // in-row guard: fires at execution, riding the merge (no second
    // evaluation of the input folds). It lives on the rho column, so
    // the read must MATERIALIZE rho — which every production consumer
    // does (estimates, probes, store writes); a bare count() would
    // prune it away, the documented caveat
    val e = intercept[Exception] {
      Hll.mergeRegisters(Seq(wide), p = 8).collect()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("falls outside"))
    // the documented caveat closed for ad-hoc merges: eagerCheck=true
    // refuses at CALL time, even when the consumer would prune rho
    // (a bare count skips the in-row guard)
    val e2 = intercept[IllegalArgumentException] {
      Hll.mergeRegisters(Seq(wide), p = 8, eagerCheck = true)
    }
    assert(e2.getMessage.contains("fall outside"))
    // and a legal eager merge is unchanged
    val ok = Hll.registers(items(100), "item", p = 8)
    assert(Hll.mergeRegisters(Seq(ok, ok), p = 8, eagerCheck = true)
      .count() == ok.count())
  }

  test("p outside the exact-arithmetic window refuses loudly") {
    val df = items(10)
    intercept[IllegalArgumentException] { Hll.registers(df, "item", p = 3) }
    intercept[IllegalArgumentException] { Hll.registers(df, "item", p = 15) }
    intercept[IllegalArgumentException] {
      Hll.estimate(Hll.registers(df, "item"), p = 15)
    }
  }

  test("per-row cells compose to the register fold (streaming restatement)") {
    val cells = Hll.perRowRegisterCells(items(400), "item")
    val folded = cells.groupBy($"reg").agg(max($"rho").as("rho"))
      .as[(Long, Long)].collect().toMap
    val direct = Hll.registers(items(400), "item")
      .as[(Long, Long)].collect().toMap
    assert(folded === direct)
  }

  // ---- the persisted store ----

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def write(df: DataFrame, p: String): String = {
    df.write.mode("overwrite").parquet(p); p
  }

  private def storeRegs(out: String): Map[Long, Long] =
    graft.jobs.BuildHllStore.mergedRegisters(spark, out)
      .as[(Long, Long)].collect().toMap

  test("store lifecycle: run + overlapping appends ≡ one fold of the union") {
    val base = tmp("hll-store")
    val out = s"$base/store"
    // overlapping slices — max-fold idempotence means union semantics
    graft.jobs.BuildHllStore.run(spark, write(items(600), s"$base/a"), out)
    graft.jobs.BuildHllStore.append(spark, write(items(900), s"$base/b"), out, "b")
    graft.jobs.BuildHllStore.append(spark, write(items(1200), s"$base/c"), out, "c")
    val direct = Hll.registers(items(1200), "item")
      .as[(Long, Long)].collect().toMap
    assert(storeRegs(out) === direct)
    val (est, zero) = graft.jobs.BuildHllStore.estimate(spark, out)
      .as[(Long, Long)].head()
    val (wantEst, wantZero) = estimateBig(direct, 8)
    assert((est, zero) === ((wantEst, wantZero)))
  }

  test("store: append takes p from the store — a caller cannot diverge") {
    val base = tmp("hll-storep")
    val out = s"$base/store"
    graft.jobs.BuildHllStore.run(spark, write(items(300), s"$base/a"), out, p = 12)
    graft.jobs.BuildHllStore.append(spark, write(items(500), s"$base/b"), out, "b")
    assert(graft.jobs.BuildHllStore.storeP(spark, out) === 12)
    assert(storeRegs(out) ===
      Hll.registers(items(500), "item", p = 12).as[(Long, Long)].collect().toMap)
  }

  test("store: a batch claiming a different p refuses by id at merge") {
    val base = tmp("hll-geom")
    val out = s"$base/store"
    graft.jobs.BuildHllStore.run(spark, write(items(300), s"$base/a"), out)
    // smuggle in a SMALLER-p fold: cells all in range — only the meta
    // row can catch it
    Hll.registers(items(200), "item", p = 4)
      .write.mode("overwrite").parquet(s"$out/registers/batch=rogue")
    Seq((4, graft.jobs.BuildHllStore.HashDevice)).toDF("p", "hash_device")
      .write.mode("overwrite").parquet(s"$out/meta/batch=rogue")
    val e = intercept[IllegalStateException] { storeRegs(out) }
    assert(e.getMessage.contains("rogue") &&
      e.getMessage.contains("different geometry"))
  }

  test("store: orphan register dirs and meta-only ghosts refuse loudly") {
    val base = tmp("hll-orphan")
    val out = s"$base/store"
    graft.jobs.BuildHllStore.run(spark, write(items(300), s"$base/a"), out)
    Hll.registers(items(100), "item")
      .write.mode("overwrite").parquet(s"$out/registers/batch=orphan")
    val e1 = intercept[IllegalStateException] { storeRegs(out) }
    assert(e1.getMessage.contains("orphan") && e1.getMessage.contains("no meta row"))
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$out/registers/batch=orphan"), true)
    Seq((8, graft.jobs.BuildHllStore.HashDevice)).toDF("p", "hash_device")
      .write.mode("overwrite").parquet(s"$out/meta/batch=ghost")
    val e2 = intercept[IllegalStateException] { storeRegs(out) }
    assert(e2.getMessage.contains("ghost") && e2.getMessage.contains("UNDER-count"))
  }

  test("store consolidation: fan-in, crash-window reads identical, base kept") {
    val base = tmp("hll-consol")
    val out = s"$base/store"
    graft.jobs.BuildHllStore.run(spark, write(items(400), s"$base/a"), out)
    graft.jobs.BuildHllStore.append(spark, write(items(800), s"$base/b"), out, "b")
    graft.jobs.BuildHllStore.append(spark, write(items(1100), s"$base/c"), out, "c")
    val before = storeRegs(out)
    // simulate the crash window: copy sources aside, consolidate,
    // restore the copies — consolidated AND sources readable together
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val conf = spark.sparkContext.hadoopConfiguration
    Seq("b", "c").foreach { b =>
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(s"$out/registers/batch=$b"), fs,
        new org.apache.hadoop.fs.Path(s"$base/save-reg-$b"), false, conf)
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(s"$out/meta/batch=$b"), fs,
        new org.apache.hadoop.fs.Path(s"$base/save-meta-$b"), false, conf)
    }
    graft.jobs.BuildHllStore.consolidate(spark, out, Seq("b", "c"))
    assert(storeRegs(out) === before, "post-consolidation merge changed")
    Seq("b", "c").foreach { b =>
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(s"$base/save-reg-$b"), fs,
        new org.apache.hadoop.fs.Path(s"$out/registers/batch=$b"), false, conf)
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(s"$base/save-meta-$b"), fs,
        new org.apache.hadoop.fs.Path(s"$out/meta/batch=$b"), false, conf)
    }
    assert(storeRegs(out) === before,
      "sources + consolidated readable together must merge identically " +
        "(the idempotence property that makes a manifest unnecessary)")
    // the crash-during-deletion re-run: c deleted again, b still present
    // — exactly the half-deleted state. Consolidate must FINISH the
    // deletions (the committed merged id proves the fold landed), not
    // refuse on the absent source.
    fs.delete(new org.apache.hadoop.fs.Path(s"$out/registers/batch=c"), true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$out/meta/batch=c"), true)
    graft.jobs.BuildHllStore.consolidate(spark, out, Seq("b", "c"))
    assert(storeRegs(out) === before, "re-run heal changed the merge")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$out/registers/batch=b")),
      "the re-run must finish the interrupted source deletions")
    // absent sources withOUT a committed merge stay a loud caller error
    val e = intercept[IllegalArgumentException] {
      graft.jobs.BuildHllStore.consolidate(spark, out, Seq("never-existed"))
    }
    assert(e.getMessage.contains("do not exist"))
    intercept[IllegalArgumentException] {
      graft.jobs.BuildHllStore.consolidate(spark, out, Seq("base", "b"))
    }
  }

  test("store: dropBatches is the takedown verb; base is undroppable") {
    val base = tmp("hll-drop")
    val out = s"$base/store"
    graft.jobs.BuildHllStore.run(spark, write(items(400), s"$base/a"), out)
    graft.jobs.BuildHllStore.append(spark,
      write(items(900, "zz"), s"$base/b"), out, "takedown-me")
    graft.jobs.BuildHllStore.dropBatches(spark, out, Seq("takedown-me"))
    assert(storeRegs(out) ===
      Hll.registers(items(400), "item").as[(Long, Long)].collect().toMap)
    intercept[IllegalArgumentException] {
      graft.jobs.BuildHllStore.dropBatches(spark, out, Seq("base"))
    }
  }

  test("store: duplicated appends under two ids cannot skew the estimate") {
    val base = tmp("hll-dup")
    val out = s"$base/store"
    graft.jobs.BuildHllStore.run(spark, write(items(500), s"$base/a"), out)
    graft.jobs.BuildHllStore.append(spark, write(items(500), s"$base/b"), out, "retry1")
    graft.jobs.BuildHllStore.append(spark, write(items(500), s"$base/c"), out, "retry2")
    assert(storeRegs(out) ===
      Hll.registers(items(500), "item").as[(Long, Long)].collect().toMap)
  }
}
