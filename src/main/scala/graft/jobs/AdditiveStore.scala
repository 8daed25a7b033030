package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Consolidation for ADDITIVE stores ([[BuildSketchStore]] counters,
  * [[BuildProfileStore]] histograms) — the fan-in maintenance step
  * (~10⁴ hourly batch directories) that the dedup/text protocol
  * ([[BuildDedupIndex.consolidateBatches]]) CANNOT serve: that
  * protocol's crash window leaves sources + consolidated readable
  * together and relies on the read paths' DISTINCT to absorb the
  * duplicates, but additive cells SUM — the same window would
  * double-count every consolidated cell. So this protocol has a single
  * atomic COMMIT POINT instead:
  *
  *   1. (skip if the manifest already exists) require every source
  *      batch present, write the merged table + one meta row under
  *      `batch=consol-<md5(sources)>` via plain Spark overwrite —
  *      these directories are INERT: readers ignore a consol batch
  *      with no manifest;
  *   2. create `consolidated/<label>` listing the source ids — ONE
  *      atomic file create. From this instant readers count the
  *      consolidated batch and ignore the sources (present or not);
  *   3. delete the source table + meta directories (any order — they
  *      are already invisible).
  *
  * Every crash window reads correctly: before 2 the sources count once
  * and the half-written consol dirs are ignored; after 2 the consol
  * batch counts once and partially-deleted sources are ignored. A
  * re-run skips to the missing step. The one loud state is a manifest
  * whose consol table is GONE (only manual tampering can produce it —
  * the manifest is written strictly after the data): readers refuse
  * rather than silently resurrect the excluded sources.
  *
  * Batches carrying a live fold sidecar (`folded/<id>`) REFUSE: a
  * later superset re-fold retires a fold by batch id, which cannot
  * reach cells blended into a consolidated batch — the double-count
  * supersession exists to prevent. Retire the streamed dir, then
  * [[seal]] the fold (drops its sidecar, making it a normal batch).
  */
private[jobs] object AdditiveStore {

  private def manifestDir(outPath: String) =
    new org.apache.hadoop.fs.Path(s"$outPath/consolidated")

  /** Order-independent digest of a batch table's CONTENT: md5 over
    * (row count, decimal sum of per-row xxhash64 across all columns).
    * The decimal(38,0) sum is overflow-proof under ANSI mode and
    * multiset-sensitive (unlike a bit_xor fold, duplicate rows cannot
    * cancel), and summation commutes — the same rows in any partition
    * order digest identically, so a crash-retry of a deterministic
    * fold always reproduces its digest — and the observed form inside
    * [[guardedWrite]] (same aggregates riding the write) produces the
    * same string as this standalone pass.
    */
  private def finishDigest(n: Long, s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"$n:$s".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)

  // the two digest aggregates; hash columns in NAME order, not
  // projection order, so a fold read back from disk (partition columns
  // re-ordered last) digests identically to the in-memory fold
  private def digestAggs(df: DataFrame) = {
    import org.apache.spark.sql.functions.{col, count, lit, sum, xxhash64}
    Seq(count(lit(1)).as("__dg_n"),
      sum(xxhash64(df.columns.sorted.toSeq.map(c => col(c)): _*)
        .cast("decimal(38,0)")).as("__dg_s"))
  }

  def contentDigest(df: DataFrame): String = {
    val aggs = digestAggs(df)
    val agg = df.agg(aggs.head, aggs.tail: _*).head()
    val s = if (agg.isNullAt(1)) "0" else agg.getDecimal(1).toBigInteger.toString
    finishDigest(agg.getLong(0), s)
  }

  /** Write one batch fold under the collision guard, paying for the
    * digest in the cheapest way the situation allows. `committed` is
    * the digest already recorded for this batch id (None = fresh id,
    * or a pre-digest batch whose content is unknowable):
    *
    *  - fresh: nothing to collide with — the digest aggregates RIDE
    *    the caller's write via `Dataset.observe` (zero extra pass over
    *    a corpus-slice-sized fold; [[contentDigest]] and the observed
    *    form share one aggregate definition so they cannot drift);
    *  - committed: the new fold persists, digests, and compares
    *    BEFORE the overwrite — a mismatch refuses with the committed
    *    batch untouched, a match proceeds as the idempotent retry.
    *
    * Returns the digest for the caller's meta row / sidecar.
    */
  def guardedWrite(outPath: String, id: String, fold: DataFrame,
      committed: Option[String], op: String)(
      write: DataFrame => Unit): String = committed match {
    case Some(old) =>
      val p = fold.persist()
      try {
        val digest = contentDigest(p)
        if (digest != old)
          throw new IllegalStateException(
            s"$op: batch id '$id' is already committed with content digest " +
              s"$old, but this fold digests to $digest — re-using an id " +
              "with DIFFERENT content would silently replace the earlier " +
              "batch. Pick a fresh batch id (or drop/retract the old batch " +
              "first); an identical-content retry is accepted as the " +
              "idempotent re-run it is.")
        write(p)
        digest
      } finally { p.unpersist(); () }
    case None =>
      val obs = org.apache.spark.sql.Observation()
      val aggs = digestAggs(fold)
      write(fold.observe(obs, aggs.head, aggs.tail: _*))
      val row = obs.get
      val s = Option(row("__dg_s"))
        .map(_.asInstanceOf[java.math.BigDecimal].toBigInteger.toString)
        .getOrElse("0")
      finishDigest(row("__dg_n").asInstanceOf[Long], s)
  }

  /** The digest committed for a batch id in its meta row, if any. */
  def committedMetaDigest(spark: SparkSession, outPath: String,
      id: String): Option[String] = {
    val metaP = new org.apache.hadoop.fs.Path(s"$outPath/meta/batch=$id")
    val fs = metaP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(metaP)) return None
    val meta = spark.read.parquet(metaP.toString)
    if (!meta.columns.contains("content_digest")) None
    else meta.select(meta("content_digest"))
      .head(1).headOption.map(_.getString(0)).filter(_ != null)
  }

  /** The digest committed for a batch id in a `digests/<id>` sidecar
    * (stores whose batches carry no meta row), if any.
    */
  def committedFileDigest(fs: org.apache.hadoop.fs.FileSystem,
      outPath: String, id: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$outPath/digests/$id")
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    Some(s).filter(_.nonEmpty)
  }

  def writeDigestFile(fs: org.apache.hadoop.fs.FileSystem,
      outPath: String, id: String, digest: String): Unit = {
    val out = fs.create(
      new org.apache.hadoop.fs.Path(s"$outPath/digests/$id"), true)
    try out.write((digest + "\n").getBytes("UTF-8")) finally out.close()
  }

  /** (label, sources) for every committed consolidation manifest. */
  def manifests(fs: org.apache.hadoop.fs.FileSystem,
      outPath: String): Seq[(String, Set[String])] = {
    val root = manifestDir(outPath)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.filter(_.isFile).map { s =>
      s.getPath.getName -> Folds.readSidecar(fs, s.getPath)
    }
  }

  /** The batch ids a reader must COUNT, given what is on disk: all
    * table-dir ids, minus manifest-covered sources, minus uncommitted
    * consol leftovers; refuses loudly if a committed manifest's table
    * is gone (the only silently-wrong state this protocol could have —
    * made loud instead).
    */
  def activeBatchIds(fs: org.apache.hadoop.fs.FileSystem, outPath: String,
      tableDir: String, op: String): Set[String] = {
    val root = new org.apache.hadoop.fs.Path(s"$outPath/$tableDir")
    val present = (if (fs.exists(root)) fs.listStatus(root).toSeq
      else Seq.empty)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .map(_.getPath.getName.stripPrefix("batch=")).toSet
    val ms = manifests(fs, outPath)
    // coverage persists across GENERATIONS: a committed consol batch
    // may itself be consolidated later (consol-of-consols — the
    // compounding fan-in shape), which makes the older manifest
    // OBSOLETE: its sources stay invisible, but its own table is gone
    // by design and must not trip the missing-table refusal
    val covered = ms.flatMap(_._2).toSet
    val missing = ms.collect {
      case (l, _) if !present(l) && !covered(l) => l
    }
    if (missing.nonEmpty)
      throw new IllegalStateException(
        s"$op: consolidation manifests ${missing.mkString(", ")} are " +
          "committed but their consolidated tables are gone — the " +
          "sources were already retired, so their cells live nowhere; " +
          "restore the consolidated directories or rebuild the store")
    val committed = ms.map(_._1).toSet
    // uncommitted consol leftovers (crash before the manifest) are
    // inert — the re-run overwrites them
    present -- covered -- (present.filter(_.startsWith("consol-")) -- committed)
  }

  private def snapshotDir(outPath: String) =
    new org.apache.hadoop.fs.Path(s"$outPath/snapshots")

  /** Pin the store's CURRENT active batch frontier under a name — the
    * reproducibility verb: a training run records `snapshot("run-42")`
    * once, and [[resolveAsOf]] re-reads exactly that corpus state
    * months later, surviving any consolidations in between. The pin is
    * IMMUTABLE: re-pinning the same name is a no-op when the frontier
    * is unchanged (crash-retry idempotence) and refuses when it moved —
    * silently redefining a snapshot would rewrite what "the data my
    * model trained on" means. Cost: one `snapshots/<name>` file listing
    * the ids — no data is copied; the pin is only as durable as the
    * batches behind it (see [[resolveAsOf]] for the expiry contract).
    */
  def writeSnapshot(spark: SparkSession, outPath: String, tableDir: String,
      name: String, op: String): Set[String] = {
    require(name.nonEmpty && !name.contains("/") && !name.contains("="),
      s"$op: snapshot name '$name' must be a plain file name")
    val fs = snapshotDir(outPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ids = activeBatchIds(fs, outPath, tableDir, op)
    val p = new org.apache.hadoop.fs.Path(snapshotDir(outPath), name)
    if (fs.exists(p)) {
      val old = Folds.readSidecar(fs, p)
      if (old != ids)
        throw new IllegalStateException(
          s"$op: snapshot '$name' already pins batches " +
            s"${old.toSeq.sorted.mkString(", ")} but the store's frontier " +
            s"is now ${ids.toSeq.sorted.mkString(", ")} — a snapshot is an " +
            "immutable pin; pick a fresh name for the new frontier")
      return ids
    }
    fs.mkdirs(snapshotDir(outPath)): Unit
    // temp + rename, not a direct create: a direct create exposes a
    // half-written pin to a concurrent reader as an EMPTY frontier,
    // while rename makes the complete content visible atomically.
    // No-clobber: sequential redefinition is caught by the exists
    // branch above on every FS; for two CONCURRENT pins of one name,
    // HDFS rename refuses an existing destination (handled below) but
    // local rename(2) is last-writer-wins — acceptable for an
    // operator-action verb where the racing contents are the same
    // frontier unless an append interleaved the two pins
    val tmp = new org.apache.hadoop.fs.Path(snapshotDir(outPath),
      s".$name.tmp.${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, false)
    try out.write((ids.toSeq.sorted.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    if (!fs.rename(tmp, p)) {
      fs.delete(tmp, false): Unit
      val old = Folds.readSidecar(fs, p)
      if (old != ids)
        throw new IllegalStateException(
          s"$op: snapshot '$name' was pinned concurrently with batches " +
            s"${old.toSeq.sorted.mkString(", ")}, not this frontier " +
            s"${ids.toSeq.sorted.mkString(", ")} — pick a fresh name")
    } else {
      // local rename(2) CLOBBERS and returns true, so a successful
      // rename is not yet proof this caller's frontier is the one on
      // disk — two concurrent pins of one name are last-writer-wins on
      // a local FS (r13 advice). One extra readSidecar makes the check
      // filesystem-independent: re-read and raise the same refusal if
      // another writer's content won.
      val won = Folds.readSidecar(fs, p)
      if (won != ids)
        throw new IllegalStateException(
          s"$op: snapshot '$name' was pinned concurrently with batches " +
            s"${won.toSeq.sorted.mkString(", ")}, not this frontier " +
            s"${ids.toSeq.sorted.mkString(", ")} — pick a fresh name")
    }
    ids
  }

  /** Names of snapshots whose pinned frontier contains `id`. */
  def snapshotsPinning(fs: org.apache.hadoop.fs.FileSystem,
      outPath: String, id: String): Seq[String] = {
    val dir = snapshotDir(outPath)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.filter(_.isFile)
      .filterNot(_.getPath.getName.startsWith("."))
      .collect { case s if Folds.readSidecar(fs, s.getPath)(id) =>
        s.getPath.getName }
  }

  /** Refuse an in-place SAME-ID re-fold that would rewrite content a
    * snapshot pins (r13 advice, medium): snapshots pin batch IDS, not
    * content, and a grown-stream `compactStreamed` under the same
    * explicit label overwrites the pinned batch directory in place —
    * `Folds.superseded` skips b == id, so nothing else guards the path
    * and `resolveAsOf` would silently return different content than at
    * pin time, breaking the "re-reads exactly that corpus state"
    * contract. The identical-file-set crash retry stays allowed (the
    * fold sidecar, written before the table, records the set); any
    * other same-id re-fold of a pinned batch refuses loudly.
    */
  def refusePinnedRefold(fs: org.apache.hadoop.fs.FileSystem,
      outPath: String, tableDir: String, id: String, files: Set[String],
      op: String): Unit = {
    val pinned = snapshotsPinning(fs, outPath, id)
    if (pinned.isEmpty) return
    val prior = Folds.sidecarPath(outPath, id)
    val sameRetry = fs.exists(prior) && Folds.readSidecar(fs, prior) == files
    val tableExists =
      fs.exists(new org.apache.hadoop.fs.Path(s"$outPath/$tableDir/batch=$id"))
    if (!sameRetry && tableExists)
      throw new IllegalStateException(
        s"$op: batch '$id' is pinned by snapshot(s) " +
          s"${pinned.sorted.mkString(", ")} and this fold covers a " +
          "DIFFERENT streamed file set than the committed one — " +
          "re-folding in place would silently change what the snapshot " +
          "re-reads. Fold under a fresh label (supersession will retire " +
          "this one only if unpinned), or re-pin the new frontier under " +
          "a new snapshot name first")
  }

  /** Resolve a pinned snapshot against the CURRENT store: the returned
    * ids are PRESENT batch directories whose cells sum to exactly the
    * pinned frontier's content. Consolidation is transparent — a
    * committed manifest substitutes for its sources whenever its FULL
    * source set lies inside the frontier (cells sum, so the merged
    * table IS the sources; applies generation over generation for
    * consol-of-consols). Two states refuse, both loudly: a pinned
    * batch was dropped (its cells are gone — takedown outranks
    * reproducibility by design), or a consolidation BLENDED pinned and
    * unpinned batches (the merged cells cannot be split back apart).
    * That second refusal is the snapshot-expiry contract: maintenance
    * that consolidates across a live snapshot's frontier expires it —
    * consolidate either whole snapshots or batches newer than every
    * pin that must stay readable.
    */
  def resolveAsOf(fs: org.apache.hadoop.fs.FileSystem, outPath: String,
      tableDir: String, name: String, op: String): Set[String] = {
    val p = new org.apache.hadoop.fs.Path(snapshotDir(outPath), name)
    if (!fs.exists(p))
      throw new IllegalStateException(
        s"$op: no snapshot named '$name' under $outPath/snapshots")
    val pinned = Folds.readSidecar(fs, p)
    val root = new org.apache.hadoop.fs.Path(s"$outPath/$tableDir")
    val present = (if (fs.exists(root)) fs.listStatus(root).toSeq
      else Seq.empty)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .map(_.getPath.getName.stripPrefix("batch=")).toSet
    val ms = manifests(fs, outPath)
    // fixed point: each manifest fires at most once (its sources leave
    // `need` when it fires, and no two committed manifests share a
    // source — consolidate refuses covered-elsewhere batches), so the
    // loop is linear in manifests and confluent whatever the order
    var need = pinned
    var progress = true
    while (progress) {
      progress = false
      ms.foreach { case (label, sources) =>
        if (!need(label) && sources.nonEmpty && sources.subsetOf(need)) {
          need = need -- sources + label
          progress = true
        }
      }
    }
    val missing = need -- present
    if (missing.nonEmpty)
      throw new IllegalStateException(
        s"$op: snapshot '$name' is no longer reconstructible — batches " +
          s"${missing.toSeq.sorted.mkString(", ")} are not on disk and no " +
          "committed consolidation covers them from INSIDE the snapshot. " +
          "Either they were dropped (their cells are gone), or a " +
          "consolidation blended them with batches outside the snapshot " +
          "(merged cells cannot be split back apart). The pin has " +
          "expired; re-pin the current frontier under a new name")
    need
  }

  /** Drop a fold's supersession sidecar, turning it into a normal
    * batch eligible for consolidation. ONLY after the streamed
    * directory that produced it has been retired — with the sidecar
    * gone, a grown-stream re-fold can no longer retire this fold and
    * would double-count every shared file.
    */
  def seal(spark: SparkSession, outPath: String, id: String,
      op: String): Unit = {
    val fs = manifestDir(outPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = Folds.sidecarPath(outPath, id)
    require(fs.exists(p),
      s"$op: batch $id carries no fold sidecar — nothing to seal")
    fs.delete(p, false)
  }

  def consolidate(spark: SparkSession, outPath: String, tableDir: String,
      op: String, batches: Seq[String], metaRow: DataFrame)(
      merge: Seq[String] => DataFrame): Unit = {
    require(batches.nonEmpty && batches.distinct == batches,
      s"$op: batches must be non-empty and distinct")
    require(!batches.contains("base"),
      s"$op: 'base' is the store's convention anchor (its meta row is " +
        "where every reader gets the pinned geometry) and one directory " +
        "never contributes to the fan-in problem — consolidate the " +
        "appended batches around it")
    val fs = manifestDir(outPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = batches.filter(b => fs.exists(Folds.sidecarPath(outPath, b)))
    if (live.nonEmpty)
      throw new IllegalStateException(
        s"$op: batches ${live.mkString(", ")} carry live fold sidecars — " +
          "consolidating them would blend cells a superset re-fold can " +
          "only retire by batch id, double-counting every shared file. " +
          "Retire the streamed dir, then seal the fold first.")
    val label = "consol-" + java.security.MessageDigest.getInstance("MD5")
      .digest(batches.sorted.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    require(!batches.contains(label), s"$op: label $label collides with a source")
    val manifest = new org.apache.hadoop.fs.Path(manifestDir(outPath), label)
    // a batch covered by a DIFFERENT committed manifest is a leftover
    // awaiting deletion, not a countable source; THIS consolidation's
    // own manifest means the crash-mid-deletion retry shape — skip
    // straight to the deletions below
    val coveredElsewhere = manifests(fs, outPath)
      .filterNot(_._1 == label).flatMap(_._2).toSet
    val covered = batches.filter(coveredElsewhere)
    if (covered.nonEmpty)
      throw new IllegalStateException(
        s"$op: batches ${covered.mkString(", ")} are already covered by a " +
          "committed consolidation — their directories are leftovers " +
          "awaiting deletion, not countable sources")
    def tablePath(b: String) =
      new org.apache.hadoop.fs.Path(s"$outPath/$tableDir/batch=$b")
    def metaPath(b: String) =
      new org.apache.hadoop.fs.Path(s"$outPath/meta/batch=$b")
    if (!fs.exists(manifest)) {
      val gone = batches.filterNot(b => fs.exists(tablePath(b)))
      if (gone.nonEmpty)
        throw new IllegalStateException(
          s"$op: source batches ${gone.mkString(",")} are gone and no " +
            s"manifest commits $label — their cells live nowhere; restore " +
            "the sources or rebuild")
      // inert until the manifest lands — readers ignore an uncommitted
      // consol batch, so these overwrites are safe to crash anywhere
      val merged = merge(batches.map(b => tablePath(b).toString)).persist()
      try {
        val digest = contentDigest(merged)
        merged.write.mode("overwrite").parquet(tablePath(label).toString)
        metaRow
          .withColumn("content_digest",
            org.apache.spark.sql.functions.lit(digest))
          .write.mode("overwrite").parquet(metaPath(label).toString)
      } finally { merged.unpersist(); () }
      // THE commit point
      val out = fs.create(manifest, true)
      try out.write((batches.mkString("\n") + "\n").getBytes("UTF-8"))
      finally out.close()
    }
    batches.foreach { b =>
      fs.delete(tablePath(b), true)
      fs.delete(metaPath(b), true)
    }
  }
}
