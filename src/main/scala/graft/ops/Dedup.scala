package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines:
  * exact, MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Portability design: every hash is derived from md5 (bit-identical in
  * Spark and DuckDB) rather than Spark's murmur3 `hash`, so each operator
  * has an exact cross-engine oracle. MinHash uses the string-min of
  * per-permutation md5s (a keyed random permutation); SimHash extracts a
  * 32-bit integer from the md5 hex prefix.
  *
  * Scale posture: everything is explode → hash-aggregate → band-key
  * self-join. The only shuffles are on (doc_id) and (band_key); candidate
  * verification joins shingle arrays by doc_id. No driver-side state, no
  * O(n²) stage — the quadratic is confined to rows sharing an LSH bucket.
  */
object Dedup {

  /** `shingles`: distinct n-token shingles of a whitespace-tokenized text.
    * Guarded so texts shorter than n tokens get an empty array (Spark's
    * `sequence(1,0)` would count DOWN, not return empty).
    */
  def withShingles(df: DataFrame, textCol: String = "text", n: Int = 3,
      out: String = "shingles"): DataFrame = {
    val toks = split(col(textCol), " ")
    val nToks = size(toks)
    val idx = sequence(lit(1), nToks - (n - 1))
    val mk = transform(idx, i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*))
    df.withColumn(out, when(nToks >= n, array_distinct(mk)).otherwise(array().cast("array<string>")))
  }

  /** Exact dedup: keep the lowest id per identical text (hash-groupBy —
    * one shuffle on the text hash; at 100 TB group on md5(text) instead of
    * the full text to keep shuffle rows narrow).
    */
  def exact(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_md5"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** MinHash signature columns h0..h{numHashes-1}: per permutation i, the
    * minimum md5("i|shingle") over the doc's shingle set.
    */
  def minhashSignature(shingled: DataFrame, idCol: String = "doc_id",
      shinglesCol: String = "shingles", numHashes: Int = 32): DataFrame = {
    val exploded = shingled.select(col(idCol), explode(col(shinglesCol)).as("__sh"))
    val aggs = (0 until numHashes).map(i =>
      min(md5(concat_ws("|", lit(i), col("__sh")))).as(s"h$i"))
    exploded.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH candidate pairs: band key = md5(band_index | its r signature
    * mins); docs sharing any band key become candidates. Returns
    * (doc_a, doc_b) with doc_a < doc_b, distinct.
    */
  def lshCandidates(sig: DataFrame, idCol: String = "doc_id",
      bands: Int = 16, rowsPerBand: Int = 2): DataFrame = {
    val bandCols = (0 until bands).map { b =>
      val ins = lit(b) +: (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"h$i"))
      md5(concat_ws("|", ins: _*))
    }
    val long = sig.select(col(idCol), explode(array(bandCols: _*)).as("band"))
    val a = long.as("a"); val b = long.as("b")
    a.join(b, col("a.band") === col("b.band") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"))
      .distinct()
  }

  /** Exact-Jaccard verification of candidate pairs against the shingle
    * sets; keeps pairs with jaccard > threshold using the integer form
    * `inter * den > num * union` (no floating point).
    */
  def verifyJaccard(candidates: DataFrame, shingled: DataFrame,
      idCol: String = "doc_id", shinglesCol: String = "shingles",
      thresholdNum: Int = 1, thresholdDen: Int = 2): DataFrame = {
    val s = shingled.select(col(idCol), col(shinglesCol))
    val withA = candidates.join(s.withColumnRenamed(idCol, "doc_a")
      .withColumnRenamed(shinglesCol, "sh_a"), "doc_a")
    val withB = withA.join(s.withColumnRenamed(idCol, "doc_b")
      .withColumnRenamed(shinglesCol, "sh_b"), "doc_b")
    withB
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("inter") * thresholdDen > col("uni") * thresholdNum)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("uni"))
  }

  /** Full MinHash+LSH near-dup pipeline. */
  def minhashPairs(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val shingled = withShingles(df, textCol)
    val sig = minhashSignature(shingled, idCol)
    val cand = lshCandidates(sig, idCol)
    verifyJaccard(cand, shingled, idCol)
  }

  /** 32-bit SimHash over the distinct-token set: token hash = first 8 md5
    * hex digits as an integer; bit j of the simhash is 1 iff a strict
    * majority of token hashes have bit j set. One explode + one aggregate.
    */
  def simhash(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", bits: Int = 32): DataFrame = {
    val toks = df.select(col(idCol),
      explode(array_distinct(split(col(textCol), " "))).as("__tok"))
    val h = conv(substring(md5(col("__tok")), 1, 8), 16, 10).cast("long")
    val bitSums = (0 until bits).map(j =>
      sum(shiftright(h, j).bitwiseAND(lit(1L)) * 2 - 1).as(s"__b$j"))
    val agg = toks.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val sh = (0 until bits).map(j =>
      when(col(s"__b$j") > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
    agg.select(col(idCol), sh.as("simhash"))
  }
}
