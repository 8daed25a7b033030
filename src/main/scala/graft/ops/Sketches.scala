package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min-Sketch-accelerated EXACT heavy hitters (Cormode &
  * Muthukrishnan 2005) — the "sketch to prune, exact to verify" shape
  * the dedup stack uses for Bloom filters, applied to frequency
  * counting. The naive exact heavy-hitter query shuffles the entire
  * item universe (every n-gram of a 100 TB corpus) through one hash
  * aggregate; the sketch path instead:
  *
  *   pass 1: fold every occurrence into a d×w counter table — the
  *           shuffle after map-side combine is at most d·w rows per
  *           task, regardless of universe size;
  *   pass 2: re-hash each item against the broadcast counters; its
  *           estimate min_i(counter[i][h_i(item)]) NEVER undercounts
  *           (every occurrence of the item hit those d cells), so
  *           `estimate < threshold` is a PROOF of lightness — only the
  *           surviving occurrences (true heavies + hash-collision
  *           false positives) enter the exact hash aggregate, which
  *           trims the false positives.
  *
  * The output is therefore EXACT — identical to the naive GROUP BY
  * HAVING — while the full-universe shuffle is replaced by one bounded
  * counter fold plus an aggregate over survivors. All hashing is the
  * repo's portable md5 device, so the sketch itself (not just the
  * final answer) reproduces bit-for-bit in the DuckDB oracle.
  */
object Sketches {

  /** Default sketch geometry: ε ≈ e/w ≈ 1% of total count, δ ≈ e^−d. */
  val DefaultWidth = 256
  val DefaultDepth = 3

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Saturation alarm threshold (r14 verdict #5, measurement-only): a
    * probe warns when, in EVERY sketch row, more than this fraction of
    * the width carries a count at or past the prune threshold — an
    * item passes the prune only when all d of its cells do, so the
    * smallest per-row saturated fraction bounds the prune's best case.
    * Past ~50 % the sketch can no longer prove most items light and
    * the exact verify absorbs the stream (the 10×-soak collapse:
    * 56× shuffle records at heavy_hitters_stored). Answers stay exact
    * at ANY saturation — the verify trims — this only flags the lost
    * prune efficiency, loudly, without touching stored content or any
    * estimate an oracle sees.
    */
  val SaturationWarnFraction = 0.5

  /** The alarm's statistic: the SMALLEST per-row fraction of `width`
    * buckets whose count is at or past `threshold`. An item survives
    * the prune only when all d of its cells pass, so this is an upper
    * bound on how saturated the prune's best case is; package-visible
    * for the unit test.
    */
  private[graft] def saturatedFraction(pulled: Seq[(Int, Long, Long)],
      width: Int, depth: Int, threshold: Long): Double =
    (0 until depth).map { i =>
      pulled.count(c => c._1 == i && c._3 >= threshold).toDouble / width
    }.foldLeft(1.0)(math.min)

  /** Row-i bucket of an item: first 15 md5 nibbles (sign bit clear in
    * both engines) of `i:item`, mod the width. The ONE definition the
    * counter fold, the estimate probe, and every oracle share.
    */
  private def bucket(item: Column, row: Int, width: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"cms$row:"), item)), 1, 15),
      16, 10).cast("long"), lit(width.toLong))

  /** Pass 1: the d×w counter table of an item column — (row, bucket,
    * cnt), at most d·w rows. The posexplode fans each occurrence into
    * its d cells BEFORE the partial aggregate, so the map-side combine
    * caps every task's shuffle contribution at d·w counter rows.
    */
  def cmsCounters(items: DataFrame, itemCol: String = "item",
      width: Int = DefaultWidth, depth: Int = DefaultDepth): DataFrame =
    perRowCells(items, itemCol, width, depth)
      .groupBy(col("row"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Per-occurrence sketch cells — the STATELESS restatement of
    * [[cmsCounters]]' pre-aggregate fan-out: each occurrence emits its
    * d (row, bucket, cnt=1) cells and nothing else, so the projection
    * is append-legal for Structured Streaming with no watermark (the
    * `perRowPostings` device applied to counting). The batch fold is
    * exactly `groupBy(row, bucket).sum(cnt)` over these rows —
    * [[cmsCounters]] IS that composition, so the streamed and batch
    * paths share one cell definition and cannot drift.
    */
  def perRowCells(items: DataFrame, itemCol: String = "item",
      width: Int = DefaultWidth, depth: Int = DefaultDepth): DataFrame = {
    require(width > 0 && depth > 0, "perRowCells: width and depth must be positive")
    // NULL occurrences are dropped, explicitly: md5(null) buckets to
    // null, which would ride the counter table as null cells that pass
    // the range guard (null comparisons filter false) while the
    // estimate probe can never match them — count non-null or nothing
    val nonNull = items.filter(col(itemCol).isNotNull)
    // the counter table is the BROADCAST side of every estimate probe —
    // a geometry that cannot broadcast defeats the design, so refuse
    // loudly instead of OOMing the driver later
    require(width.toLong * depth <= 16000000L,
      s"perRowCells: ${width}x$depth = ${width.toLong * depth} cells — " +
        "the counter table must stay broadcastable (<= 16M cells); " +
        "CMS error is e/width of the TOTAL count, not the universe " +
        "size, so width rarely needs to grow past tens of thousands")
    nonNull.select(posexplode(array(
        (0 until depth).map(i => bucket(col(itemCol), i, width)): _*))
        .as(Seq("row", "bucket")))
      .withColumn("cnt", lit(1L))
  }

  /** Merge counter tables built over disjoint slices of one stream —
    * the defining sketch property: count-min is mergeable by CELL-WISE
    * ADDITION when every table shares one geometry and hash family
    * (both fixed here: the md5 bucket definition is the module's one
    * constant). Enables incremental heavy hitters: fold each hourly
    * batch once, persist its tiny counter table, merge at read, probe
    * — no historical batch is ever re-scanned. The merged table is
    * bit-identical to folding the concatenated stream directly
    * (red-tested). Geometry is validated against `width`/`depth`: a
    * WIDER or DEEPER table carries out-of-range cells and refuses
    * loudly (one aggregate over ≤ tables·d·w counter rows). A
    * NARROWER table is indistinguishable by range — callers persisting
    * counter tables own geometry discipline (store (width, depth)
    * beside them, as [[graft.jobs.BuildDedupIndex]] stores its band
    * convention in meta for exactly this reason).
    */
  def mergeCounters(tables: Seq[DataFrame], width: Int = DefaultWidth,
      depth: Int = DefaultDepth, eagerCheck: Boolean = false): DataFrame = {
    require(tables.nonEmpty, "mergeCounters: no counter tables")
    val all = tables.map(_.select(col("row"), col("bucket"), col("cnt")))
      .reduce(_ unionByName _)
    // the ONE range predicate both guards share — eager and in-row
    // forms must never drift apart on what "out of range" means
    val outOfRange = col("row") >= depth || col("row") < 0 ||
      col("bucket") >= width || col("bucket") < 0
    // opt-in EAGER geometry check for ad-hoc merges whose consumer may
    // prune cnt (the one path the in-row guard below cannot cover —
    // r11 advice): one aggregate over the unioned cells, executed now.
    // Leave false on hot paths — it evaluates every input an extra
    // time, the cost the in-row form exists to avoid; store meta gates
    // remain the primary guard for persisted tables.
    if (eagerCheck) {
      val bad = all.filter(outOfRange).count()
      require(bad == 0L,
        s"mergeCounters: $bad counter cells fall outside ${depth}x$width " +
          "— the tables were built with a different geometry and cannot merge")
    }
    // IN-ROW range guard (was an eager count): the eager form EXECUTED
    // every input once for the guard and again for the merge — when the
    // inputs are freshly-computed folds (heavy_hitters_merged's two
    // per-batch folds) that doubled the fold cost. The in-row raise
    // rides the merge itself: zero extra evaluation, still loud at
    // first touch of an out-of-range cell. It lives on the AGGREGATED
    // column (cnt), never a grouping key — a when()-wrapped key is a
    // computed column the optimizer can't prove partition-preserving,
    // which costs an extra exchange. Caveat: a consumer that PRUNES
    // cnt (a bare row count of the merged table) skips the check —
    // every production path materializes it (probes read counts,
    // store writes materialize all columns), and the stored form's
    // meta gates are the primary guard.
    val guardedCnt = when(outOfRange,
      raise_error(concat(lit("mergeCounters: counter cell (row="),
        col("row").cast("string"), lit(", bucket="),
        col("bucket").cast("string"),
        lit(s") falls outside ${depth}x$width — the tables were built " +
          "with a different geometry and cannot merge"))))
      .otherwise(col("cnt"))
    all.select(col("row"), col("bucket"), guardedCnt.as("cnt"))
      .groupBy(col("row"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** [[cmsHeavyHitters]] against PREBUILT counters (stored per-batch
    * tables folded by [[mergeCounters]]): `items` must be the full
    * occurrence stream the counters cover — the exact verify needs
    * every occurrence of a surviving item, and the sketch estimates
    * are only ≥-bounds for counts within the covered stream.
    */
  def cmsHeavyHittersWithCounters(items: DataFrame, counters: DataFrame,
      threshold: Long, itemCol: String = "item",
      width: Int = DefaultWidth, depth: Int = DefaultDepth): DataFrame = {
    require(threshold > 0,
      "cmsHeavyHittersWithCounters: threshold must be positive")
    // Defensive cell re-aggregation: the estimate probe joins each item
    // row to its d cells, so a DUPLICATE (row, bucket) cell — a caller
    // passing a raw union of per-batch tables instead of
    // [[mergeCounters]] — would multiply occurrence rows and silently
    // inflate the exact counts this API documents as byte-identical to
    // GROUP BY HAVING. One aggregate over ≤ d·w rows makes the probe
    // side canonical regardless of what the caller supplied; note it
    // also SUMS the duplicates (the mergeCounters semantics), so a raw
    // union degrades to the merged answer instead of a corrupted one.
    val canonical = counters.groupBy(col("row"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
    pruneAndVerify(items, canonical, threshold, itemCol, width, depth)
  }

  /** Equi-join SIZE estimation from two counter tables — the CMS inner
    * product (Cormode & Muthukrishnan 2005 §4.2, after AMS): the true
    * join cardinality |A ⋈ₖ B| = Σ_k fA(k)·fB(k), and each sketch
    * row's dot product Σ_b cA[i][b]·cB[i][b] NEVER undercounts it
    * (hash collisions only ADD cross terms), so the min over the d
    * rows is an always-≥ estimate with expected overshoot
    * F1(A)·F1(B)/width per row. This is the optimizer-statistics move
    * at 100 TB: two single-pass d·w summaries — already persisted
    * per-batch by [[graft.jobs.BuildSketchStore]] and mergeable by
    * [[mergeCounters]] — answer "how big is this join" without
    * scanning either table again. Both inputs MUST share the module's
    * geometry and hash device (the stored form pins them in meta).
    *
    * Exactness discipline: cell products are formed in decimal(38)
    * (two 10¹²-count cells already overflow int64); the result returns
    * as a long with a LOUD guard — an estimate past 2^63 is not a
    * number an optimizer needs, it is the "do not run this join"
    * verdict, and truncating it silently would report the opposite.
    * Output: one row (est_join_size). Missing cells contribute zero —
    * a sketch row with NO overlapping buckets correctly estimates 0.
    */
  def cmsJoinSize(countersA: DataFrame, countersB: DataFrame,
      width: Int = DefaultWidth, depth: Int = DefaultDepth): DataFrame = {
    val dec = "decimal(38,0)"
    // canonicalize both sides (the cmsHeavyHittersWithCounters rule: a
    // raw per-batch union would multiply joined cells)
    def canon(c: DataFrame, side: String): DataFrame = {
      val g = c.groupBy(col("row"), col("bucket"))
        .agg(sum(col("cnt")).as("cnt"))
      val bad = g.filter(col("row") >= depth || col("row") < 0 ||
        col("bucket") >= width || col("bucket") < 0).count()
      require(bad == 0L,
        s"cmsJoinSize: $bad $side cells fall outside ${depth}x$width — " +
          "the sketch was built with a different geometry; the inner " +
          "product would be meaningless")
      g
    }
    val a = canon(countersA, "left")
    val b = canon(countersB, "right")
    val dots = a.join(b.withColumnRenamed("cnt", "cntB"),
        Seq("row", "bucket"))
      .groupBy(col("row"))
      .agg(sum(col("cnt").cast(dec) * col("cntB").cast(dec)).as("dot"))
    // every row index must vote — a row with zero overlapping buckets
    // is the estimate 0, not an absent vote
    val spine = countersA.sparkSession.range(depth)
      .select(col("id").cast("int").as("row"))
    spine.join(dots, Seq("row"), "left")
      .agg(min(coalesce(col("dot"), lit(0L).cast(dec))).as("est"))
      .select(when(col("est") > lit(Long.MaxValue).cast(dec),
          raise_error(lit("cmsJoinSize: estimate exceeds 2^63 — the " +
            "join is astronomically large; treat this refusal as the " +
            "optimizer verdict rather than truncating it")))
        .otherwise(col("est").cast("long")).as("est_join_size"))
  }

  /** Pass 2 probe: each distinct item of `items` with its sketch
    * estimate — min over the d broadcast-joined counter cells. The
    * estimate is ≥ the item's true count, always. Exposed mostly for
    * audit queries; [[cmsHeavyHitters]] is the production composition.
    * NOTE this does aggregate the full universe (it reports every
    * distinct item) — use it on bounded-cardinality audits, not as the
    * pruning path. Construction is EAGER: the counter subplan executes
    * once at call time (the r14 driver-pull — see [[estimated]]), so
    * merely building this DataFrame runs the fold/merge jobs.
    */
  def cmsEstimates(items: DataFrame, counters: DataFrame,
      itemCol: String = "item", width: Int = DefaultWidth,
      depth: Int = DefaultDepth): DataFrame = {
    val exact = items.groupBy(col(itemCol)).agg(count(lit(1)).as("n_true"))
    estimated(exact, counters, itemCol, width, depth)
      .select(col(itemCol), col("est"), col("n_true"))
  }

  /** Join `rows`' item column to the d counter cells and append the
    * min-estimate. Counters broadcast (≤ d·w rows); missing cells —
    * impossible when the counters were built over a superset of
    * `rows`' items, possible on a fresh item against stale counters —
    * estimate as 0 (a never-seen item's true historical count).
    */
  private def estimated(rows: DataFrame, counters: DataFrame,
      itemCol: String, width: Int, depth: Int,
      pruneThreshold: Option[Long] = None): DataFrame = {
    // Execute the counter subplan ONCE (guide §2.4): each of the d
    // per-row probe joins broadcasts a filtered view of `counters`, and
    // a LAZY counter plan — a store merge, or a whole-corpus fold —
    // re-executes under every one of those broadcasts (the stored
    // heavy-hitter plans carried d identical merge subtrees; the
    // merged form re-FOLDED the corpus d times). A broadcast build
    // pulls its rows to the driver anyway, and counters are bounded
    // broadcastable (≤ 16M cells, the perRowCells guard), so one
    // explicit pull re-planted as a local relation costs exactly what
    // one broadcast build already cost and drops d−1 executions of
    // the fold/merge. AtFraction's driver-pull precedent, generalized
    // to every probe path.
    // NOTE: the pull makes every probe-path DataFrame construction
    // EAGER — building a cmsEstimates/cmsHeavyHitters query executes
    // the counter fold/merge as Spark jobs at call time (documented
    // trade: d−1 fewer executions of the fold per probe). A null cell
    // is impossible from this module's folds (perRowCells drops null
    // occurrences); refuse loudly instead of NPEing on a tampered
    // counter table.
    val spark = rows.sparkSession
    import spark.implicits._
    val pulled = counters
      .select(col("row").cast("int"), col("bucket").cast("long"),
        col("cnt").cast("long"))
      .collect().map { r =>
        if (r.isNullAt(0) || r.isNullAt(1) || r.isNullAt(2))
          throw new IllegalStateException(
            "Sketches.estimated: a counter cell has a NULL " +
              "row/bucket/cnt — no sketch fold produces null cells; the " +
              "counter table was built outside this module or tampered")
        (r.getInt(0), r.getLong(1), r.getLong(2))
      }.toSeq
    // saturation alarm (r14 verdict #5) — free on the pulled rows: the
    // per-row fraction of buckets at/past the threshold bounds what the
    // prune can still prove light. Measurement-only: no stored content,
    // no estimate, no query result changes; the warning names the
    // geometry fix (width growth) that IS a semantic store change.
    pruneThreshold.foreach { th =>
      val minSat = saturatedFraction(pulled, width, depth, th)
      if (minSat > SaturationWarnFraction)
        log.warn(f"CMS sketch is SATURATED for threshold $th: even the " +
          f"emptiest of the $depth rows has ${minSat * 100}%.1f%% of its " +
          f"$width buckets at or past the threshold, so the prune can " +
          "prove almost nothing light and the exact verify absorbs the " +
          "stream. Answers remain exact; to restore prune efficiency " +
          "grow the sketch width (a stored-geometry change — re-fold " +
          "the store) or raise the threshold.")
    }
    val b = broadcast(pulled.toDF("row", "bucket", "cnt"))
    val joined = (0 until depth).foldLeft(rows) { (acc, i) =>
      acc.join(b.filter(col("row") === i)
          .select(col("bucket").as(s"__b$i"), col("cnt").as(s"__c$i")),
        bucket(col(itemCol), i, width) === col(s"__b$i"), "left")
        .drop(s"__b$i")
    }
    joined.withColumn("est",
      least((0 until depth).map(i => coalesce(col(s"__c$i"), lit(0L))): _*))
      .drop((0 until depth).map(i => s"__c$i"): _*)
  }

  /** EXACT heavy hitters via CMS pruning: every item occurring at
    * least `threshold` times, with its exact count — byte-identical to
    * `GROUP BY item HAVING count(*) >= threshold`, but the only items
    * that pay the exact aggregate's shuffle are those the sketch could
    * not prove light. Two passes over the occurrence stream (the
    * sketch fold, then the probe+filter) — at 100 TB that trade, two
    * scans for no universe-wide shuffle, is the entire point.
    * Construction is EAGER: the fold executes at call time (the
    * driver-pull in [[estimated]] that keeps the probe to one pass).
    */
  def cmsHeavyHitters(items: DataFrame, threshold: Long,
      itemCol: String = "item", width: Int = DefaultWidth,
      depth: Int = DefaultDepth): DataFrame = {
    require(threshold > 0, "cmsHeavyHitters: threshold must be positive")
    val counters = cmsCounters(items, itemCol, width, depth)
    pruneAndVerify(items, counters, threshold, itemCol, width, depth)
  }

  /** [[cmsHeavyHitters]] with the threshold RELATIVE to the stream:
    * every item at or above `1/divisor` of the total count. The total
    * falls out of the counter table itself (any one sketch row sums
    * every occurrence), so unlike `items.count()` + absolute-threshold
    * this costs NO extra pass over the occurrence stream — two corpus
    * passes total (the fold, then the probe+exact-verify). The counter
    * pull is the driver-side model-pull pattern: ≤ d·w rows, bounded
    * by [[cmsCounters]]' broadcastability guard, re-planted as a local
    * relation so the probe's d joins never recompute the fold.
    */
  def cmsHeavyHittersAtFraction(items: DataFrame, divisor: Long,
      itemCol: String = "item", width: Int = DefaultWidth,
      depth: Int = DefaultDepth): DataFrame = {
    require(divisor > 0, "cmsHeavyHittersAtFraction: divisor must be positive")
    val spark = items.sparkSession
    val counterRows = cmsCounters(items, itemCol, width, depth).collect()
    val total = counterRows.filter(_.getInt(0) == 0).map(_.getLong(2)).sum
    val threshold = math.max(1L, total / divisor)
    import spark.implicits._
    val counters = counterRows
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
      .toDF("row", "bucket", "cnt")
    pruneAndVerify(items, counters, threshold, itemCol, width, depth)
  }

  private def pruneAndVerify(items: DataFrame, counters: DataFrame,
      threshold: Long, itemCol: String, width: Int, depth: Int): DataFrame =
    estimated(items, counters, itemCol, width, depth, Some(threshold))
      .filter(col("est") >= threshold)
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") >= threshold)

  // ── Mergeable bucket histograms: quantiles without a corpus sort ──
  //
  // The exact nearest-rank percentile (winsorized_stats' device) costs
  // a full sort of the column — at 100 TB, a corpus-wide exchange per
  // profile run. The histogram path is the mergeable-summary answer:
  // ONE map-side-combining aggregate folds the column into (bucket,
  // cnt) rows at fixed `width` resolution, per-batch histograms merge
  // by cell-wise addition (the [[mergeCounters]] property, same
  // discipline: one width everywhere — [[graft.jobs.BuildProfileStore]]
  // pins it in per-batch meta), and any nearest-rank quantile falls
  // out of the merged table as a BOUND pair [lo, hi] with error < width
  // — deterministic integer arithmetic end-to-end, so the whole
  // derivation hash-matches a DuckDB oracle.

  /** True floor division for longs of either sign: `pmod` is
    * non-negative, so subtracting it always rounds toward −∞, and
    * [[Search.idiv]]'s decimal form keeps the division exact
    * unconditionally (a double `/` drifts past 2^53). The ONE bucket
    * definition the fold, the merge, the quantile derivation, and
    * every oracle share.
    */
  private[graft] def floorDiv(v: Column, w: Long): Column =
    Search.idiv(v, lit(w))

  /** Fold a numeric column into its fixed-width bucket histogram:
    * (bucket, cnt), bucket = floor(value / width). Map-side combine
    * caps every task's shuffle contribution at the bucket-range size;
    * callers own width sanity (range/width buckets must stay a small
    * table — the quantile window below is single-partition by design).
    */
  def bucketHistogram(df: DataFrame, valueCol: String,
      width: Long): DataFrame =
    perRowBuckets(df, valueCol, width)
      .groupBy(col("bucket")).agg(sum(col("cnt")).as("cnt"))

  /** Per-row histogram cells — the STATELESS restatement of
    * [[bucketHistogram]]'s projection: each value emits its
    * (bucket, cnt=1) cell, append-legal for Structured Streaming; the
    * batch fold is exactly the grouped sum over these rows, so the
    * streamed and batch paths share one bucket definition.
    */
  def perRowBuckets(df: DataFrame, valueCol: String,
      width: Long): DataFrame = {
    require(width > 0, "perRowBuckets: width must be positive")
    // NULL values are dropped, explicitly: a null bucket would sort
    // engine-differently in the cumulative rank walk (Spark nulls
    // first, DuckDB nulls last) — histograms count non-null or nothing
    df.filter(col(valueCol).isNotNull)
      .select(floorDiv(col(valueCol).cast("long"), width).as("bucket"))
      .withColumn("cnt", lit(1L))
  }

  /** Merge histograms built over disjoint slices of one column —
    * cell-wise addition, bit-identical to folding the concatenated
    * column directly (red-tested). All tables MUST share one bucket
    * width: unlike CMS geometry there is no in-range check even
    * possible (the bucket space is unbounded), so width discipline is
    * entirely the caller's — persist width beside stored histograms,
    * as [[graft.jobs.BuildProfileStore]] does with a loud exact guard.
    */
  def mergeHistograms(tables: Seq[DataFrame]): DataFrame = {
    require(tables.nonEmpty, "mergeHistograms: no histograms")
    tables.map(_.select(col("bucket"), col("cnt")))
      .reduce(_ unionByName _)
      .groupBy(col("bucket")).agg(sum(col("cnt")).as("cnt"))
  }

  /** Nearest-rank quantile BOUNDS from a bucket histogram: for each
    * q = num/den the row
    * (q_num, q_den, n_total, rank, bucket, lo, hi) where
    * rank = ⌈q·N⌉ (1-based nearest-rank, the winsorized_stats
    * convention) and [lo, hi] is the value span of the bucket holding
    * that rank — the true nearest-rank value provably lies inside
    * (OpsSpec red-tests containment against the exact sort), so the
    * error is < `width` by construction. All arithmetic is integer
    * (DIV, not double division), so the answer hash-matches
    * cross-engine. The cumulative window is single-partition over the
    * histogram — ≤ range/width rows by the fold's contract, never the
    * corpus.
    */
  /** Per-GROUP histogram: (groupCols…, bucket, cnt) — the grouped form
    * of [[bucketHistogram]], one map-side-combining fold whatever the
    * group count. Feeds [[groupedBucketedQuantiles]].
    */
  def groupedBucketHistogram(df: DataFrame, valueCol: String,
      width: Long, groupCols: Seq[String]): DataFrame = {
    require(width > 0, "groupedBucketHistogram: width must be positive")
    require(groupCols.nonEmpty,
      "groupedBucketHistogram: no group columns — use bucketHistogram")
    df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+
        floorDiv(col(valueCol).cast("long"), width).as("bucket"): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Per-GROUP nearest-rank quantile BOUNDS — [[bucketedQuantiles]]
    * partitioned by the group columns: for every (group, q = num/den)
    * the row (groupCols…, q_num, q_den, n_total, rank, bucket, lo, hi)
    * with the same integer-exact nearest-rank convention and
    * error < `width`. The cumulative walk windows over each GROUP's
    * histogram — ≤ range/width rows per group, so the sort is
    * per-group histogram-sized, never corpus-sized, and groups spread
    * across tasks (the global form's single-partition window is the
    * one thing this lifts). The per-domain/per-language quantile
    * budget read a curation pipeline wants.
    */
  def groupedBucketedQuantiles(hist: DataFrame, width: Long,
      qs: Seq[(Int, Int)], groupCols: Seq[String]): DataFrame = {
    require(width > 0, "groupedBucketedQuantiles: width must be positive")
    require(groupCols.nonEmpty,
      "groupedBucketedQuantiles: no group columns — use bucketedQuantiles")
    require(qs.nonEmpty && qs.forall { case (n, d) => d > 0 && n > 0 && n <= d },
      "groupedBucketedQuantiles: quantiles must be fractions in (0, 1]")
    val spark = hist.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("prev", col("cum") - col("cnt"))
    val totals = hist.groupBy(groupCols.map(col): _*)
      .agg(sum(col("cnt")).as("n_total"))
    // aliased join: targets and cum share hist's lineage, so the group
    // keys must be matched through qualified names, not raw attributes
    val targets = totals
      .crossJoin(broadcast(qs.toDF("q_num", "q_den")))
      .withColumn("rank",
        expr("(q_num * n_total + q_den - 1) DIV q_den"))
      .alias("t")
    val c = cum.alias("c")
    targets
      .join(c, groupCols.map(g =>
          col(s"t.$g") === col(s"c.$g")).reduce(_ && _) &&
        col("c.prev") < col("t.rank") && col("t.rank") <= col("c.cum"))
      .select(groupCols.map(g => col(s"t.$g")) ++ Seq(
        col("t.q_num"), col("t.q_den"), col("t.n_total"), col("t.rank"),
        col("c.bucket"),
        (col("c.bucket") * width).as("lo"),
        (col("c.bucket") * width + width - 1).as("hi")): _*)
  }

  def bucketedQuantiles(hist: DataFrame, width: Long,
      qs: Seq[(Int, Int)]): DataFrame = {
    require(width > 0, "bucketedQuantiles: width must be positive")
    require(qs.nonEmpty && qs.forall { case (n, d) => d > 0 && n > 0 && n <= d },
      "bucketedQuantiles: quantiles must be fractions in (0, 1]")
    val spark = hist.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("prev", col("cum") - col("cnt"))
    val total = hist.agg(sum(col("cnt")).as("n_total"))
    val targets = qs.toDF("q_num", "q_den")
      .crossJoin(broadcast(total))
      // ⌈q·N⌉ = (q_num·N + q_den − 1) DIV q_den — integer, exact
      .withColumn("rank",
        expr("(q_num * n_total + q_den - 1) DIV q_den"))
    broadcast(targets)
      .join(cum, col("prev") < col("rank") && col("rank") <= col("cum"))
      .select(col("q_num"), col("q_den"), col("n_total"), col("rank"),
        col("bucket"),
        (col("bucket") * width).as("lo"),
        (col("bucket") * width + width - 1).as("hi"))
  }
}
