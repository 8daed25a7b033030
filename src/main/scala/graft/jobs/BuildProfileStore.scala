package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Sketches

/** Persisted bucket-histogram store — the numeric-profile member of
  * the stored-summary family ([[BuildSketchStore]] is its counting
  * sibling; both exist because a 100 TB pipeline cannot re-scan
  * history to answer "what is the p99 now"). Each batch of a numeric
  * column folds ONCE into a tiny (bucket, cnt) histogram
  * ([[Sketches.bucketHistogram]]); histories merge at read by
  * cell-wise addition; any nearest-rank quantile falls out of the
  * merged table as a [lo, hi] bound with error < the bucket width
  * ([[Sketches.bucketedQuantiles]]) — no corpus sort, ever.
  *
  * Layout (the [[BuildSketchStore]] discipline verbatim):
  *
  *   hist/batch=<id>/   (bucket, cnt) — one fold per batch
  *   meta/batch=<id>/   (bucket_width, device) — one row
  *
  * Writers own their `batch=<id>` dirs (overwrite-on-retry ⇒
  * idempotent, Scheduler-safe; `base` reserved for [[run]]); batches
  * must cover DISJOINT row slices. The per-batch meta row is the
  * merge-soundness guard: bucket addition is only meaningful under ONE
  * width, and unlike CMS geometry a wrong-width table has no
  * detectable cell-range signature at all (the bucket space is
  * unbounded) — so [[mergedHistogram]] compares every batch's claimed
  * width and bucket device against the store convention EXACTLY and
  * refuses mismatches, orphan histogram dirs, and meta-only ghosts by
  * batch id.
  */
object BuildProfileStore {

  /** Bucket-definition fingerprint: [[Sketches.floorDiv]] (true floor
    * toward −∞ for either sign). A future bucketing change must bump
    * this so old stores refuse to merge with new folds.
    */
  val Device = "floor-div-v1"

  def run(spark: SparkSession, valuesPath: String, outPath: String,
      valueCol: String = "value", width: Long = 100L): Unit = {
    val root = new org.apache.hadoop.fs.Path(outPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root)) fs.delete(root, true)
    writeBatch(spark, spark.read.parquet(valuesPath), outPath, "base",
      valueCol, width)
  }

  /** Fold one NEW batch (disjoint rows) into its own histogram.
    * IDEMPOTENT per `batchId`; width comes from the STORE meta, never
    * the caller, so appended folds cannot diverge.
    */
  def append(spark: SparkSession, valuesPath: String, outPath: String,
      batchId: String = "", valueCol: String = "value"): Unit = {
    val width = storeWidth(spark, outPath, "append")
    val id = if (batchId.nonEmpty) batchId
      else java.security.MessageDigest.getInstance("MD5")
        .digest(valuesPath.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
    require(!id.contains("/") && !id.contains("="),
      s"BuildProfileStore.append: batchId '$id' must be a plain partition value")
    require(id != "base",
      "BuildProfileStore.append: batchId 'base' is reserved for the initial " +
        "build (appending under it would overwrite the base histogram)")
    require(!id.startsWith("consol-"),
      "BuildProfileStore.append: batchId prefix 'consol-' is reserved for committed " +
        "consolidations — the manifest-aware readers would treat this " +
        "batch as an uncommitted leftover and silently IGNORE it")
    writeBatch(spark, spark.read.parquet(valuesPath), outPath, id,
      valueCol, width)
  }

  private def writeBatch(spark: SparkSession, values: DataFrame,
      outPath: String, id: String, valueCol: String, width: Long,
      negate: Boolean = false): Unit = {
    import spark.implicits._
    // histogram before meta — same ordering argument as the sketch
    // store: a histogram dir without a meta row refuses LOUDLY at
    // merge, a meta row without its fold would under-count silently
    val base = Sketches.bucketHistogram(values, valueCol, width)
    val hist = if (negate) base.withColumn("cnt", -col("cnt")) else base
    // batch-id collision guard ([[AdditiveStore.guardedWrite]]): fresh
    // ids ride the digest on the write itself, a committed id compares
    // BEFORE any overwrite
    val digest = AdditiveStore.guardedWrite(outPath, id, hist,
        AdditiveStore.committedMetaDigest(spark, outPath, id),
        "BuildProfileStore") { df =>
      df.write.mode("overwrite").parquet(s"$outPath/hist/batch=$id")
    }
    Seq((width, Device)).toDF("bucket_width", "device")
      .withColumn("content_digest", lit(digest))
      .write.mode("overwrite").parquet(s"$outPath/meta/batch=$id")
  }

  /** The takedown verb: RETRACT a previously-folded slice by appending
    * its NEGATED histogram — bucket counts are linear, so
    * `hist(all) − hist(deleted) = hist(remaining)` exactly and every
    * quantile bound is thereafter derived from the remaining rows as
    * if the deleted ones had never been folded. Costs one fold of the
    * DELETED values only; no history re-scan. Retracting values never
    * folded drives merged buckets negative, which [[mergedHistogram]]
    * refuses loudly (a negative count would corrupt the cumulative
    * rank walk silently). IDEMPOTENT per `batchId`.
    */
  def retract(spark: SparkSession, valuesPath: String, outPath: String,
      batchId: String = "", valueCol: String = "value"): Unit = {
    val width = storeWidth(spark, outPath, "retract")
    val id = if (batchId.nonEmpty) batchId
      else "retract-" + java.security.MessageDigest.getInstance("MD5")
        .digest(valuesPath.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
    require(!id.contains("/") && !id.contains("="),
      s"BuildProfileStore.retract: batchId '$id' must be a plain partition value")
    require(id != "base", "BuildProfileStore.retract: batchId 'base' is reserved")
    require(!id.startsWith("consol-"),
      "BuildProfileStore.retract: batchId prefix 'consol-' is reserved for committed " +
        "consolidations — the manifest-aware readers would treat this " +
        "batch as an uncommitted leftover and silently IGNORE it")
    writeBatch(spark, spark.read.parquet(valuesPath), outPath, id,
      valueCol, width, negate = true)
  }

  /** Fold a streaming bucket-ingest directory
    * ([[graft.streaming.StreamingJob.runProfileIngest]]'s per-row
    * (bucket, cnt=1) cells) into one summed batch — the stream → store
    * loop for profiling, under the SHARED fold-sidecar supersession
    * protocol ([[Folds]]): histograms are additive like counters, so a
    * grown-stream re-fold must retire the stale fold or every shared
    * file's values count twice. Crash window between the new write and
    * the stale deletion transiently over-counts — quantile bounds
    * shift at most one rank-walk step until the retirement retries.
    *
    * Geometry is ENTIRELY meta discipline here: a wrong-width ingest
    * has no detectable range signature at all (the bucket space is
    * unbounded in both directions), so `runProfileIngest`'s width MUST
    * be the store's pinned value — the fold writes the batch meta with
    * the STORE width it cannot verify.
    */
  def compactStreamed(spark: SparkSession, streamedPath: String,
      outPath: String, label: String = ""): Unit = {
    val width = storeWidth(spark, outPath, "compactStreamed")
    val metaP = new org.apache.hadoop.fs.Path(s"$outPath/meta")
    val fs = metaP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = BuildDedupIndex.streamedFileList(spark, streamedPath)
    val id = if (label.nonEmpty) label
      else BuildDedupIndex.contentLabel(spark, streamedPath)
    require(!id.contains("/") && !id.contains("="),
      s"BuildProfileStore.compactStreamed: label '$id' must be a plain partition value")
    require(id != "base",
      "BuildProfileStore.compactStreamed: label 'base' is reserved")
    require(!id.startsWith("consol-"),
      "BuildProfileStore.compactStreamed: batchId prefix 'consol-' is reserved for committed " +
        "consolidations — the manifest-aware readers would treat this " +
        "batch as an uncommitted leftover and silently IGNORE it")
    AdditiveStore.refusePinnedRefold(fs, outPath, "hist", id,
      files.toSet, "BuildProfileStore.compactStreamed")
    val superseded = Folds.superseded(fs, outPath, id, files.toSet,
      "BuildProfileStore.compactStreamed")
    Folds.writeSidecar(fs, outPath, id, files)
    import spark.implicits._
    spark.read.parquet(streamedPath)
      .select(col("bucket"), col("cnt"))
      .groupBy(col("bucket")).agg(sum(col("cnt")).as("cnt"))
      .write.mode("overwrite").parquet(s"$outPath/hist/batch=$id")
    Seq((width, Device)).toDF("bucket_width", "device")
      .write.mode("overwrite").parquet(s"$outPath/meta/batch=$id")
    superseded.foreach { b =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$outPath/hist/batch=$b"), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$outPath/meta/batch=$b"), true)
      fs.delete(Folds.sidecarPath(outPath, b), false)
    }
  }

  /** The store's pinned bucket width, from the base meta row. */
  def storeWidth(spark: SparkSession, outPath: String,
      op: String = "storeWidth"): Long = {
    val metaP = new org.apache.hadoop.fs.Path(s"$outPath/meta")
    val fs = metaP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(metaP),
      s"BuildProfileStore.$op: no profile store at $outPath — run " +
        "BuildProfileStore.run first")
    val base = spark.read.parquet(s"$outPath/meta")
      .filter(col("batch").cast("string") === "base")
      .select(col("bucket_width"), col("device")).head(1).headOption
      .getOrElse(throw new IllegalStateException(
        s"BuildProfileStore.$op: store at $outPath has no base meta row — " +
          "rebuild with BuildProfileStore.run"))
    require(base.getString(1) == Device,
      s"BuildProfileStore.$op: store at $outPath uses bucket device " +
        s"'${base.getString(1)}', this build uses '$Device' — rebuild")
    base.getLong(0)
  }

  /** Every persisted batch merged to one histogram, behind the loud
    * per-batch width/device gate (scaladoc above).
    */
  def mergedHistogram(spark: SparkSession, outPath: String,
      asOf: Option[String] = None): DataFrame = {
    val op = "BuildProfileStore.mergedHistogram"
    val width = storeWidth(spark, outPath, "mergedHistogram")
    val fs = new org.apache.hadoop.fs.Path(s"$outPath/meta")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // manifest-aware activity ([[AdditiveStore]]) — see the sketch
    // store's mergedCounters for the single-counted-window argument.
    // `asOf` reads a [[snapshot]]-pinned frontier instead of the live one
    val (histIds, metaIds) = asOf match {
      case None =>
        (AdditiveStore.activeBatchIds(fs, outPath, "hist", op),
          AdditiveStore.activeBatchIds(fs, outPath, "meta", op))
      case Some(name) =>
        val ids = AdditiveStore.resolveAsOf(fs, outPath, "hist", name, op)
        (ids, ids.filter(b => fs.exists(
          new org.apache.hadoop.fs.Path(s"$outPath/meta/batch=$b"))))
    }
    val meta = spark.read.option("basePath", s"$outPath/meta")
      .parquet(metaIds.toSeq.map(b => s"$outPath/meta/batch=$b"): _*)
      .select(col("batch").cast("string").as("batch"),
        col("bucket_width"), col("device"))
      .collect()
    val mismatched = meta.filter(r =>
      r.getLong(1) != width || r.getString(2) != Device)
    if (mismatched.nonEmpty)
      throw new IllegalStateException(
        "BuildProfileStore.mergedHistogram: batches " +
          mismatched.map(r => s"${r.getString(0)} (width ${r.getLong(1)}, " +
            s"${r.getString(2)})").mkString(", ") +
          s" were folded with a different bucketing than the store's " +
          s"width $width/$Device — bucket addition would silently " +
          "corrupt every quantile; re-fold them with append")
    val orphans = histIds -- metaIds
    if (orphans.nonEmpty)
      throw new IllegalStateException(
        s"BuildProfileStore.mergedHistogram: histogram batches " +
          s"${orphans.mkString(", ")} carry no meta row — a raw table was " +
          "dropped in (its width is unknowable) or a fold crashed between " +
          "its histogram and meta writes; re-run the append or delete them")
    val missing = metaIds -- histIds
    if (missing.nonEmpty)
      throw new IllegalStateException(
        s"BuildProfileStore.mergedHistogram: batches ${missing.mkString(", ")} " +
          "have meta rows but no histogram — re-run the append for those ids")
    val merged = Sketches.mergeHistograms(Seq(
      spark.read.option("basePath", s"$outPath/hist")
        .parquet(histIds.toSeq.map(b => s"$outPath/hist/batch=$b"): _*)
        .select(col("bucket"), col("cnt"))))
    // retraction sanity (see [[BuildSketchStore.mergedCounters]]): a
    // negative merged bucket proves a retract removed values never
    // folded — the cumulative rank walk would corrupt silently
    val negs = merged.filter(col("cnt") < 0).count()
    if (negs > 0)
      throw new IllegalStateException(
        s"BuildProfileStore.mergedHistogram: $negs merged buckets are " +
          "negative — a retract batch removed values that were never " +
          "folded (or was applied twice under different ids); delete the " +
          "offending retract batch or re-fold the missing appends")
    // drop exactly-cancelled buckets: a fully-retracted bucket must not
    // survive as a zero row (it would be a no-op for ranks but a
    // spurious row for cell-compare consumers and bucket counts)
    merged.filter(col("cnt") > 0)
  }

  /** Fold many histogram batch directories into ONE — the fan-in step,
    * under [[AdditiveStore]]'s manifest-commit protocol (histograms
    * SUM; see [[BuildSketchStore.consolidate]]). Live folds refuse
    * until [[sealFold]].
    */
  def consolidate(spark: SparkSession, outPath: String,
      batches: Seq[String]): Unit = {
    import spark.implicits._
    val width = storeWidth(spark, outPath, "consolidate")
    AdditiveStore.consolidate(spark, outPath, "hist",
        "BuildProfileStore.consolidate", batches,
        Seq((width, Device)).toDF("bucket_width", "device")) { srcDirs =>
      spark.read.parquet(srcDirs: _*)
        .select(col("bucket"), col("cnt"))
        .groupBy(col("bucket")).agg(sum(col("cnt")).as("cnt"))
    }
  }

  /** Pin the current batch frontier under `name` for later
    * [[mergedHistogram]] `asOf` reads ([[AdditiveStore.writeSnapshot]]).
    */
  def snapshot(spark: SparkSession, outPath: String,
      name: String): Set[String] =
    AdditiveStore.writeSnapshot(spark, outPath, "hist", name,
      "BuildProfileStore.snapshot")

  /** Drop a fold's supersession sidecar so it can consolidate — ONLY
    * after its streamed directory is retired ([[AdditiveStore.seal]]).
    */
  def sealFold(spark: SparkSession, outPath: String, id: String): Unit =
    AdditiveStore.seal(spark, outPath, id, "BuildProfileStore.sealFold")

  /** Nearest-rank quantile bounds over everything the store's batches
    * cover — [[Sketches.bucketedQuantiles]] over [[mergedHistogram]],
    * error < the store's bucket width, no source re-scan.
    */
  def quantiles(spark: SparkSession, outPath: String,
      qs: Seq[(Int, Int)]): DataFrame =
    Sketches.bucketedQuantiles(mergedHistogram(spark, outPath),
      storeWidth(spark, outPath, "quantiles"), qs)

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: BuildProfileStore <valuesParquet> <outPath> [width]")
    val spark = SparkSession.builder()
      .appName("graft-build-profile-store")
      .config("spark.sql.shuffle.partitions", 32)
      .getOrCreate()
    run(spark, args(0), args(1), "value",
      if (args.length > 2) args(2).toLong else 100L)
    spark.stop()
  }
}
