package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity resolution (record linkage): which rows of a dimension refer
  * to the same real-world thing. The classic three-stage shape —
  * blocking (cheap attribute equality bounds the candidate space),
  * pairwise similarity over name tokens (exact integer Jaccard
  * comparison, no floats), transitive closure into entities (the same
  * contraction + pointer-jump connected components the dedup stack
  * uses, Dedup.scala) — each stage re-expressed declaratively so
  * Catalyst keeps the scan pruned and the self-join shuffles on the
  * block key.
  */
object Entity {

  /** Candidate match pairs: rows sharing every `blockCols` value whose
    * distinct `nameCol` token sets overlap with Jaccard >
    * thresholdNum/thresholdDen (compared as an integer cross-product —
    * bit-identical across engines). Output (id_a, id_b, inter, uni),
    * id_a < id_b.
    *
    * Scale shape: the self-join shuffles BOTH sides on the block key
    * once; cost is Σ_blocks n_b², so the block key must bound block
    * size — at dimension scale pick attributes with ~uniform fan-out
    * (brand × size here: TPC-H-ish parts spread evenly) or add a
    * length bucket the way ngramJaccardPairs does. Token arrays ride
    * the shuffle, so bytes ∝ dimension size — fine for dimensions,
    * never for facts.
    *
    * Sub-block salting: a LOW-cardinality block key caps parallelism at
    * the number of blocks (25 brands → at most 25 join tasks, whatever
    * the cluster) because a sort-merge equal-key group cannot be split
    * by AQE. The left side therefore carries salt = id mod `subSplits`
    * and the right side replicates `subSplits`× (an explode before the
    * exchange), so each block's n² comparison work spreads over
    * `subSplits` tasks while every (a, b) pair still meets exactly once
    * — in the partition keyed by a's salt. The trade is right-side
    * shuffle bytes × `subSplits` for comparison parallelism ×
    * `subSplits`; dimension tables are small, the n² verify is the
    * bottleneck, so the trade is one-sided (measured ~9 s → ~2 s at
    * sf0.1's 25×800-row blocks on local[32]). Result-invariant:
    * `subSplits = 1` degenerates to the plain block join.
    */
  def matchPairs(df: DataFrame, idCol: String, nameCol: String,
      blockCols: Seq[String], thresholdNum: Int = 1,
      thresholdDen: Int = 2, subSplits: Int = 8): DataFrame = {
    require(subSplits >= 1, s"matchPairs: subSplits must be >= 1, got $subSplits")
    // sizes are precomputed per SIDE (one size() per row, not per pair)
    // and the union is derived as |a| + |b| − |a∩b| — the token arrays
    // are distinct by construction, so this is exact and halves the
    // per-pair array work vs an explicit array_union
    val toks = df.select((col(idCol) +: blockCols.map(col)) :+
      array_distinct(split(col(nameCol), " ")).as("__toks"): _*)
      .withColumn("__n", size(col("__toks")))
    val a = toks.select(col(idCol).as("id_a") +: blockCols.map(col) :+
      col("__toks").as("__toks_a") :+ col("__n").as("__n_a"): _*)
      // salt on a type-agnostic hash, NOT a numeric cast: cast("long")
      // yields NULL for string ids ('cust_123'), a NULL salt never
      // equi-joins, and every pair with that row on the left would be
      // silently dropped. xxhash64 is total over any type, so the
      // exactly-once pair guarantee holds for arbitrary id columns.
      .withColumn("__salt", pmod(xxhash64(col("id_a")), lit(subSplits.toLong)))
    val b = toks.select(col(idCol).as("id_b") +: blockCols.map(col) :+
      col("__toks").as("__toks_b") :+ col("__n").as("__n_b"): _*)
      .withColumn("__salt", explode(sequence(lit(0L), lit((subSplits - 1).toLong))))
    // SHUFFLE hash join, not broadcast: with a broadcast build the n²
    // probe work lands on the STREAM side's input partitioning — a
    // dimension-sized parquet scan is one or two partitions, so one
    // task evaluates every candidate pair and the salt never matters
    // (measured: the whole 16M-pair probe single-threaded). Shuffling
    // both sides on (block, salt) spreads the probe over
    // blocks × subSplits hash groups, and is also the shape that
    // survives a dimension too big to broadcast.
    a.hint("shuffle_hash").join(b, blockCols :+ "__salt")
      .filter(col("id_a") < col("id_b"))
      .withColumn("inter", size(array_intersect(col("__toks_a"), col("__toks_b"))))
      .withColumn("uni", col("__n_a") + col("__n_b") - col("inter"))
      .filter(col("inter") * thresholdDen > col("uni") * thresholdNum)
      .select(col("id_a"), col("id_b"), col("inter"), col("uni"))
  }

  /** Resolve the dimension into entities: [[matchPairs]] →
    * connectedComponents → every row labeled with its entity id
    * (min member id; unmatched rows are their own entity), plus the
    * entity's member count. The canonical-record choice (which member
    * represents the entity) is a per-entity top-1 — callers compose
    * [[TopK]] or a quality window over this output, the same way
    * keep-best dedup does.
    */
  def resolve(df: DataFrame, idCol: String, nameCol: String,
      blockCols: Seq[String], thresholdNum: Int = 1,
      thresholdDen: Int = 2): DataFrame = {
    val pairs = matchPairs(df, idCol, nameCol, blockCols, thresholdNum, thresholdDen)
    val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
    val labeled = df.select(col(idCol))
      .join(cc.withColumnRenamed("id", idCol), Seq(idCol), "left_outer")
      .select(col(idCol), coalesce(col("cluster_id"), col(idCol)).as("entity_id"))
    val sizes = labeled.groupBy(col("entity_id")).agg(count(lit(1)).as("n_members"))
    labeled.join(sizes, Seq("entity_id"))
      .select(col(idCol), col("entity_id"), col("n_members"))
  }
}
