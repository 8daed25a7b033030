package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic HyperLogLog (Flajolet et al. 2007) — distinct counting
  * with a FIXED, portable hash device, so the sketch itself (registers
  * AND the estimate) reproduces bit-for-bit in the DuckDB oracle. This
  * closes the one capability the engine could previously only ship
  * rows-only: `approx_count_distinct` is Spark-internal xxhash + float
  * harmonic means, so its answers can never cross-engine hash-match;
  * this family's register folds and the integer-rational estimator do.
  *
  * Shape at 100 TB:
  *
  *   - the register fold is a groupBy(reg).max(rho) — map-side combine
  *     caps every task's shuffle contribution at m = 2^p rows
  *     regardless of input size (the CMS counter-fold property, with
  *     MAX in place of SUM);
  *   - register tables MERGE by cell-wise max, so per-hour/per-shard
  *     folds combine at read without rescanning history
  *     ([[mergeRegisters]]), and the fold is IDEMPOTENT: overlapping
  *     batches, duplicated folds, and crash-retried writes are all
  *     harmless — max(a, a) = a. Contrast the additive CMS store,
  *     which needs supersession sidecars and a consolidation manifest
  *     precisely because its cells SUM ([[graft.jobs.BuildSketchStore]]);
  *   - the flip side of idempotence: max is not invertible, so there is
  *     NO retraction verb — a takedown that must stop counting deleted
  *     items' registers re-folds the surviving stream (bounded by the
  *     batch granularity of the store, never the full history if the
  *     deleted slice is confined to known batches).
  *
  * Exactness discipline: every quantity here is integer — the register
  * index and rho come from the repo's md5 device, the harmonic sum is
  * scaled by 2^61 so each register contributes an exact integer
  * 2^(61−rho), and the alpha_m bias constant is the exact rational
  * 7213·m / (10·(1000·m + 1079)) (= 0.7213/(1 + 1.079/m) with the
  * published decimals taken literally). The estimate is one exact
  * floor division ([[graft.ops.Search.idiv]]'s decimal device), so
  * Spark and DuckDB agree to the last bit at any magnitude.
  *
  * Estimator regime: this is the RAW HLL estimator. Below ≈ 5/2·m
  * distinct values it over-corrects (the published small-range fix is
  * linear counting, m·ln(m/V) — a transcendental no exact-integer
  * oracle can express), so [[estimate]] also emits `n_zero_regs`: a
  * consumer needing small-range accuracy applies linear counting on
  * (m, n_zero_regs) driver-side, or uses an exact distinct — the
  * sketch exists for the regime where exact distinct is the thing you
  * cannot afford. Standard error of the raw estimator is
  * 1.04/sqrt(m) ≈ 6.5% at the default p = 8.
  */
object Hll {

  /** Default precision: m = 2^8 = 256 registers, σ ≈ 1.04/16 ≈ 6.5%.
    * Cross-engine arithmetic stays exact through p = 14 (the guard
    * below); past that the decimal(38) numerator would overflow.
    */
  val DefaultP = 8

  /** Register count for precision p. */
  def m(p: Int): Int = 1 << p

  private def requireP(p: Int, op: String): Unit =
    require(p >= 4 && p <= 14,
      s"Hll.$op: p = $p out of range [4, 14] — below 4 the alpha_m " +
        "rational is for m >= 128-ish regimes and the error is useless; " +
        "above 14 the 7213·m^3·2^61 estimator numerator no longer fits " +
        "decimal(38)/HUGEINT exactly")

  /** 60-bit md5 value of `salt:item` — the repo's portable hash device
    * (first 15 nibbles; sign bit clear in both engines).
    */
  private def h60(salt: String, item: Column): Column =
    conv(substring(md5(concat(lit(salt), item.cast("string"))), 1, 15),
      16, 10).cast("long")

  /** Register index of an item: an INDEPENDENT md5 from the rho hash
    * (two salts, the CMS per-row device), mod m — not a bit-split of
    * one hash, so index and rank never share entropy.
    */
  private[graft] def regOf(item: Column, p: Int): Column =
    pmod(h60("hllreg:", item), lit(m(p).toLong))

  /** Rank rho of an item: 1 + the number of leading zero bits of its
    * 60-bit rho-hash. Portable without bit tricks: the minimal binary
    * rendering's length IS the highest-set-bit position (Spark
    * `conv(h, 10, 2)`, DuckDB `bin(h)` — both minimal-width), so
    * rho = 61 − length(bin(h)), with the measure-zero h = 0 mapped to
    * the all-zeros rank 61.
    */
  private[graft] def rhoOf(item: Column, p: Int): Column = {
    val h = h60("hllrho:", item)
    when(h === 0L, lit(61L))
      .otherwise(lit(61L) - length(conv(h, 10, 2)).cast("long"))
  }

  /** Per-occurrence register cells — (groupCols…, reg, rho), one row
    * per NON-NULL occurrence. The stateless restatement of the register
    * fold (the `perRowPostings` / `perRowCells` device): append-legal
    * for Structured Streaming with no watermark, and the batch fold is
    * exactly `groupBy(reg).max(rho)` over these rows, so streamed and
    * batch paths share one cell definition and cannot drift. NULL
    * occurrences are dropped, explicitly: a null item hashes to null,
    * which would ride the fold as a null register no probe can match.
    */
  def perRowRegisterCells(df: DataFrame, itemCol: String,
      p: Int = DefaultP, groupCols: Seq[String] = Nil): DataFrame = {
    requireP(p, "perRowRegisterCells")
    val item = col(itemCol)
    df.filter(item.isNotNull)
      .select(groupCols.map(col) ++
        Seq(regOf(item, p).as("reg"), rhoOf(item, p).as("rho")): _*)
  }

  /** The register table of an item column: (groupCols…, reg, rho) with
    * rho the MAX rank seen in the register — at most m = 2^p rows per
    * group, whatever the input size (map-side combine collapses each
    * task to ≤ m rows before the exchange). This is the mergeable,
    * persistable sketch state.
    */
  def registers(df: DataFrame, itemCol: String, p: Int = DefaultP,
      groupCols: Seq[String] = Nil): DataFrame = {
    requireP(p, "registers")
    perRowRegisterCells(df, itemCol, p, groupCols)
      .groupBy((groupCols :+ "reg").map(col): _*)
      .agg(max(col("rho")).as("rho"))
  }

  /** Merge register tables by cell-wise MAX — union-of-streams
    * semantics: merge(registers(A), registers(B)) = registers(A ∪ B)
    * exactly, because per-register max is associative, commutative and
    * IDEMPOTENT (overlap between A and B cannot skew anything — the
    * property the additive CMS merge does not have). Range-guards every
    * cell against the claimed p eagerly: a WIDER table (reg ≥ m, or a
    * rho outside [1, 61]) refuses here; a NARROWER table's cells are
    * all in range and therefore UNDETECTABLE in the data — persisted
    * register tables must pin p in store meta exactly like the CMS
    * store pins (width, depth) ([[graft.jobs.BuildHllStore]]).
    */
  def mergeRegisters(tables: Seq[DataFrame], p: Int = DefaultP,
      groupCols: Seq[String] = Nil, eagerCheck: Boolean = false): DataFrame = {
    requireP(p, "mergeRegisters")
    require(tables.nonEmpty, "Hll.mergeRegisters: no register tables")
    val cols = (groupCols ++ Seq("reg", "rho")).map(col)
    val all = tables.map(_.select(cols: _*)).reduce(_.unionAll(_))
    // the ONE range predicate both guards share — eager and in-row
    // forms must never drift apart on what "out of range" means
    val outOfRange = col("reg") < 0 || col("reg") >= m(p).toLong ||
      col("rho") < 1L || col("rho") > 61L
    // opt-in EAGER geometry check (the mergeCounters rule): for ad-hoc
    // merges whose consumer may prune rho — the one path the in-row
    // guard below cannot cover. Costs one extra evaluation of every
    // input; leave false on hot paths, store meta is the primary guard.
    if (eagerCheck) {
      val bad = all.filter(outOfRange).count()
      require(bad == 0L,
        s"Hll.mergeRegisters: $bad register cells fall outside " +
          s"reg ∈ [0, ${m(p)}) × rho ∈ [1, 61] at p = $p — a table built " +
          "with a different p (or corrupt rows) is being merged")
    }
    // IN-ROW range guard (the mergeCounters rule): an eager count would
    // execute every input fold twice — once for the guard, once for
    // the merge. The raise rides the merge; zero extra evaluation.
    // the raise rides rho (aggregated), never reg (a grouping key —
    // wrapping it would defeat partitioning reuse; the mergeCounters
    // rule). Caveat shared with mergeCounters: a consumer that PRUNES
    // the guarded column (a bare count of merged rows) skips the
    // check — every production path materializes it (estimates read
    // rho, probes read cnt, and store writes materialize all columns),
    // and the stored form's meta gates are the primary guard anyway.
    val guardedRho = when(outOfRange,
      raise_error(concat(lit("Hll.mergeRegisters: register cell (reg="),
        col("reg").cast("string"), lit(", rho="), col("rho").cast("string"),
        lit(s") falls outside reg ∈ [0, ${m(p)}) × rho ∈ [1, 61] — a " +
          s"table built with a LARGER p (or corrupt rows) is being merged " +
          s"at p = $p; note a SMALLER-p table is undetectable here — pin " +
          "p in store meta (BuildHllStore) to guard that direction"))))
      .otherwise(col("rho"))
    all.select(groupCols.map(col) ++
        Seq(col("reg"), guardedRho.as("rho")): _*)
      .groupBy((groupCols :+ "reg").map(col): _*)
      .agg(max(col("rho")).as("rho"))
  }

  /** The raw-HLL estimate of a register table:
    * (groupCols…, est_distinct, n_zero_regs). Exact integer rational:
    *
    *   S = Σ_j 2^(61−M_j)  over all m registers (absent ⇒ M_j = 0
    *       contributes 2^61) — each term an exact int64, the sum
    *       carried in decimal(38);
    *   est = ⌊ 7213·m^3·2^61 / (10·(1000·m + 1079) · S) ⌋
    *       — alpha_m · m^2 / Σ 2^−M_j with every constant rational,
    *       one exact floor division.
    *
    * `n_zero_regs` (V in the paper) rides along so small-range
    * consumers can apply linear counting m·ln(m/V) themselves.
    */
  def estimate(registerTable: DataFrame, p: Int = DefaultP,
      groupCols: Seq[String] = Nil): DataFrame = {
    requireP(p, "estimate")
    val mm = m(p).toLong
    val dec = "decimal(38,0)"
    // 2^(61-rho) fits int64 for rho >= 1; the SUM is what needs decimal
    val term = expr("shiftleft(cast(1 as bigint), cast(61 - rho as int))")
    // coalesce: a global estimate over an EMPTY register table (a
    // fresh store before any fold) aggregates zero rows into one row
    // whose sum is NULL — the coalesce makes S = m·2^61 and the
    // estimate the raw form's genuine all-registers-empty value
    // (⌊alpha_m·m⌋, with n_zero_regs = m flagging the linear-counting
    // regime where LC gives the true 0), never a silent NULL
    val perGroup = registerTable
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_regs"),
        coalesce(sum(term.cast(dec)), lit(0L).cast(dec)).as("s_present"))
    val two61 = lit(1L << 61).cast(dec)
    val s = col("s_present") +
      (lit(mm).cast(dec) - col("n_regs").cast(dec)) * two61
    val num = lit(7213L * mm * mm * mm).cast(dec) * two61
    val den = lit(10L * (1000L * mm + 1079L)).cast(dec) * s
    perGroup.select(groupCols.map(col) ++ Seq(
      Search.idiv(num, den).as("est_distinct"),
      (lit(mm) - col("n_regs")).as("n_zero_regs")): _*)
  }

  /** End-to-end grouped distinct estimate — fold then estimate. */
  def distinctEstimate(df: DataFrame, itemCol: String, p: Int = DefaultP,
      groupCols: Seq[String] = Nil): DataFrame =
    estimate(registers(df, itemCol, p, groupCols), p, groupCols)
}
