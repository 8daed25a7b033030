package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.ops.Dedup

/** Dev utility: stage-by-stage timing of the heavy pipelines. */
object Probe {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
  }

  /** `runMain graft.tools.Probe explain <query> [sfDir]` prints the
    * formatted physical plan; default mode times the heavy pipelines.
    */
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("explain")) return explainMain(args.drop(1))
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, sfDir)
    val spread = docs.repartition(spark.sparkContext.defaultParallelism)
    // warm the JVM/codegen once
    time("warmup")(spread.count())

    val rows = Dedup.shingleRows(spread).cache()
    time("shingleRows count")(println(rows.count()))
    val sig = Dedup.minhashSignatureRows(rows).cache()
    time("signature count")(println(sig.count()))
    val cand = Dedup.lshCandidates(sig).cache()
    time("candidates count")(println(cand.count()))
    val candDocs = cand.select(org.apache.spark.sql.functions.col("doc_a").as("doc_id"))
      .union(cand.select(org.apache.spark.sql.functions.col("doc_b").as("doc_id"))).distinct()
    val arrays = rows.join(org.apache.spark.sql.functions.broadcast(candDocs), Seq("doc_id"), "left_semi")
      .groupBy("doc_id").agg(org.apache.spark.sql.functions.collect_set("shingle").as("shingles"))
    time("verify")(println(Dedup.verifyJaccard(cand, arrays).count()))
    time("minhash full")(println(Dedup.minhashPairs(docs).count()))

    time("fingerprint op")(println(graft.ops.TextOps.fingerprint(docs).count()))
    time("fingerprint query")(println(
      graft.queries.TextQueries.queries("doc_fingerprint")(spark, sfDir).count()))
    time("fingerprint query 2nd")(println(
      graft.queries.TextQueries.queries("doc_fingerprint")(spark, sfDir).count()))
    time("ngram query")(println(
      graft.queries.DedupQueries.queries("dedup_ngram_jaccard")(spark, sfDir).count()))
    time("active_sessions")(println(
      graft.queries.SessionQueries.queries("active_sessions")(spark, sfDir).count()))
    spark.stop()
  }

  def explainMain(args: Array[String]): Unit = {
    val q = args.head
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries(q)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
