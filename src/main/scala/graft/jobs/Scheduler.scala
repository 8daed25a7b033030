package graft.jobs

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Runnable analogue of the reference DAG's scheduling contract
  * (airflow/dags/sessionization_batch.py:12,36-39) — the one reference
  * behavior that previously existed only as CLI mains:
  *
  *  - `catchup=True`        → every CLOSED hour between the durable
  *    last-completed marker and `now` is due (the hour containing
  *    `now` is still open — its events may still be arriving — and
  *    runs on the next launch, exactly as Airflow's `10 * * * *` runs
  *    hour H at H+1:10); a fresh deployment starts from `start`.
  *  - `depends_on_past=True`→ hours run strictly in order, and the
  *    marker advances only AFTER an hour commits — a failure stops the
  *    catch-up with the marker still at the last success, so the next
  *    launch resumes exactly there (hour H+1 reads H's output as carry
  *    state, so running past a failure would corrupt sessions).
  *  - `max_active_runs=1`   → an atomic create-if-absent lock file;
  *    a second concurrent launch refuses loudly instead of racing the
  *    dynamic-overwrite writes.
  *  - `retries=3`           → Airflow semantics: 1 attempt + `retries`
  *    re-attempts (4 total) before the catch-up aborts. Only
  *    non-fatal failures retry — an interrupt or OOM propagates.
  *
  * State lives under `stateDir` on a Hadoop filesystem WITH ATOMIC
  * CREATE/RENAME semantics (HDFS; local FS for tests) — on an object
  * store like S3A neither `create(overwrite = false)` nor `rename` is
  * atomic, so run the scheduler against HDFS-class storage (or an
  * external lock) there. The marker is written temp-file-then-rename;
  * `readMarker` falls back to the temp file when a crash landed between
  * the delete and the rename, so no crash point loses the resume state
  * (the worst case re-runs one idempotent hour). The hourly work itself
  * is [[SessionizeHour.run]], idempotent per hour (dynamic partition
  * overwrite), so a retry after a mid-write crash is safe — the
  * scheduler only sequences it.
  */
object Scheduler {

  private val Fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH")

  /** Hours due strictly after `lastCompleted` and strictly BEFORE
    * `now` — the catchup window over CLOSED intervals only. The hour
    * containing `now` is still open (its events may still be
    * arriving), so it is excluded and runs on the next launch — the
    * Airflow contract this mirrors (`schedule "10 * * * *"`: hour H
    * executes at H+1:10, after H has closed). Running the open hour
    * and advancing the marker past it would permanently drop that
    * hour's late events. `lastCompleted = None` means a fresh
    * deployment: due hours start AT `start`.
    */
  def dueHours(start: String, lastCompleted: Option[String],
      now: String): Seq[String] = {
    val first = lastCompleted match {
      case Some(lc) => LocalDateTime.parse(lc, Fmt).plusHours(1)
      case None => LocalDateTime.parse(start, Fmt)
    }
    val end = LocalDateTime.parse(now, Fmt)
    Iterator.iterate(first)(_.plusHours(1)).takeWhile(_.isBefore(end))
      .map(_.format(Fmt)).toSeq
  }

  def readMarker(spark: SparkSession, stateDir: String): Option[String] = {
    def read(p: Path): Option[String] = {
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        try {
          val buf = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
          in.readFully(buf)
          Some(new String(buf, "UTF-8").trim)
        } finally in.close()
      }
    }
    // the temp file is a complete, newer marker: a crash between
    // writeMarker's delete and rename must not lose the resume point
    read(new Path(s"$stateDir/last_completed"))
      .orElse(read(new Path(s"$stateDir/last_completed.tmp")))
  }

  private def writeMarker(spark: SparkSession, stateDir: String,
      hour: String): Unit = {
    val tmp = new Path(s"$stateDir/last_completed.tmp")
    val dst = new Path(s"$stateDir/last_completed")
    val fs = tmp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(tmp, true)
    try out.write(hour.getBytes("UTF-8")) finally out.close()
    if (fs.exists(dst)) fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      throw new IllegalStateException(s"Scheduler: marker rename failed at $dst")
  }

  /** Acquire the single-run lock, or throw if another run holds it.
    *
    * Atomicity is per-scheme: on HDFS `create(overwrite = false)` is a
    * single atomic NameNode op, but Hadoop's LOCAL filesystem
    * implements it as exists-then-create — two schedulers racing the
    * same stateDir (the real deployment hazard `max_active_runs=1`
    * exists to prevent) could BOTH pass through that window. For
    * `file:` URIs we therefore go through NIO's `Files.createFile`,
    * which is O_CREAT|O_EXCL — atomic at the kernel across processes.
    * JobsSpec red-tests the double-launch twice: same-JVM (two
    * SparkSessions, deterministic overlap + an 8-way acquisition
    * hammer) and against a genuinely SPAWNED second JVM racing
    * [[main]] on the same state dir.
    */
  private def lock(spark: SparkSession, stateDir: String): Path = {
    val raw = new Path(s"$stateDir/running.lock")
    val fs = raw.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // qualify ONCE before the scheme branch: for a relative stateDir
    // the NIO acquire below resolves against the JVM cwd while
    // Hadoop's delete resolves against the FS working directory —
    // if a caller ever moves the latter, the created and deleted
    // paths diverge and the lock wedges permanently. makeQualified
    // pins both to the same absolute URI.
    val p = fs.makeQualified(raw)
    fs.mkdirs(p.getParent)
    def refuse() = {
      val held = try {
        val in = fs.open(p)
        try {
          val buf = new Array[Byte](math.min(
            fs.getFileStatus(p).getLen, 512L).toInt)
          in.readFully(buf); new String(buf, "UTF-8").trim
        } finally in.close()
        // NonFatal only: an interrupt mid-read must cancel the
        // scheduler, not degrade into an ordinary lock refusal
      } catch { case scala.util.control.NonFatal(_) =>
        "(holder info unreadable)" }
      throw new IllegalStateException(
        s"Scheduler: another run holds $p (max_active_runs=1) [$held]; " +
          "remove the lock only if that run is known dead")
    }
    // ACQUIRE first, with nothing but the atomic create in the try:
    // only an ALREADY-EXISTS outcome may map to refuse() — routing any
    // other failure there would misreport our own fresh lock (or an
    // infrastructure error) as another run's and, because lock() runs
    // before the caller's try/finally, leak the file forever
    if (fs.getUri.getScheme == "file")
      // O_CREAT|O_EXCL via NIO — atomic at the kernel (Hadoop's local
      // create(overwrite=false) is exists-then-create, a race window)
      try java.nio.file.Files.createFile(java.nio.file.Paths.get(
        p.toUri.getPath)): Unit
      catch { case _: java.nio.file.FileAlreadyExistsException => refuse() }
    else {
      // HDFS: create(overwrite = false) is one atomic NameNode op and
      // signals contention with the TYPED already-exists exception; a
      // generic IOException is an infrastructure error and propagates.
      // A close() failure after a successful create means the lock
      // file exists and is OURS — best-effort delete before rethrowing
      // so the failed launch doesn't wedge every later one
      val out = try fs.create(p, false)
        catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
          refuse() }
      try out.close()
      catch { case e: java.io.IOException =>
        try fs.delete(p, false): Unit
        catch { case scala.util.control.NonFatal(_) => () }
        throw e
      }
    }
    // the lock is OURS from here; the holder line (pid/host/since — the
    // refusal tells the operator whose run to check before deciding the
    // holder is dead) is best-effort DIAGNOSTICS into our own file
    // (overwrite is safe — we hold it). Built only now: on a
    // misconfigured-DNS host getLocalHost can stall, and the acquire /
    // refuse paths must stay minimal. A failed write degrades the
    // refusal message to an empty holder, never the lock's correctness
    try {
      val holder = s"pid=${ProcessHandle.current().pid()} " +
        s"host=${java.net.InetAddress.getLocalHost.getHostName} " +
        s"since=${java.time.Instant.now()}"
      val out = fs.create(p, true)
      try out.write(holder.getBytes("UTF-8")) finally out.close()
    } catch { case scala.util.control.NonFatal(_) => () }
    p
  }

  /** Run every due hour in order; returns the hours actually committed.
    * Throws after `retries + 1` failed attempts of one hour (Airflow
    * retry semantics) — with the marker still at the last committed
    * hour, so the next launch resumes there.
    */
  def catchup(spark: SparkSession, logsPath: String, sessionsPath: String,
      stateDir: String, start: String, now: String,
      retries: Int = 3): Seq[String] =
    catchupWith(spark, stateDir, start, now, retries) { (d, hh) =>
      SessionizeHour.run(spark, logsPath, sessionsPath, d, hh)
    }

  /** The scheduling contract over an ARBITRARY per-hour job chain:
    * `work(date, hour)` is the whole DAG body for one hour (e.g.
    * sessionize → curate/classify that hour's output). The marker
    * advances only after `work` returns — so a failure ANYWHERE in the
    * chain (first stage, mid-chain, last write) leaves the marker at
    * the previous hour and the next launch re-runs the whole chain for
    * the failed hour. `work` therefore must be idempotent per hour
    * end-to-end (each stage a dynamic-partition overwrite or
    * equivalent), the same contract Airflow puts on a DAG run.
    */
  def catchupWith(spark: SparkSession, stateDir: String, start: String,
      now: String, retries: Int = 3)(
      work: (String, String) => Unit): Seq[String] = {
    val lockPath = lock(spark, stateDir)
    val fs = lockPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      val due = dueHours(start, readMarker(spark, stateDir), now)
      val done = scala.collection.mutable.ArrayBuffer.empty[String]
      due.foreach { h =>
        val Array(d, hh) = h.split(" ")
        // Airflow semantics: retries = RE-attempts, so retries + 1 total.
        // Only NonFatal failures retry — an interrupt or OOM must
        // propagate, not relaunch a full Spark job in a dying JVM.
        val maxAttempts = retries + 1
        var attempt = 0
        var committed = false
        var lastErr: Throwable = null
        while (!committed && attempt < maxAttempts) {
          attempt += 1
          try {
            work(d, hh)
            committed = true
          } catch { case scala.util.control.NonFatal(e) => lastErr = e }
        }
        if (!committed)
          throw new IllegalStateException(
            s"Scheduler: hour $h failed after $maxAttempts attempts " +
              s"(1 + $retries retries); marker remains at " +
              s"${readMarker(spark, stateDir).getOrElse("(none)")}",
            lastErr)
        writeMarker(spark, stateDir, h)
        done += h
      }
      done.toSeq
    } finally fs.delete(lockPath, false): Unit
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 5,
      "usage: Scheduler <logsPath> <sessionsPath> <stateDir> " +
        "<start 'yyyy-MM-dd HH'> <now 'yyyy-MM-dd HH'> [retries]; " +
        "`now` is the current wall-clock hour — the hour containing it " +
        "is still open and is NOT run (closed intervals only, like " +
        "Airflow's '10 * * * *' which runs hour H at H+1:10)")
    val spark = SparkSession.builder()
      .appName("graft-scheduler")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val ran = catchup(spark, args(0), args(1), args(2), args(3), args(4),
      if (args.length > 5) args(5).toInt else 3)
    println(s"[scheduler] committed ${ran.size} hours: ${ran.mkString(", ")}")
    spark.stop()
  }
}
