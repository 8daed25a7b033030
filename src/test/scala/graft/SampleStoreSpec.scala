package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.jobs.BuildSampleStore
import graft.ops.TextOps

/** The persisted priority sample ([[graft.jobs.BuildSampleStore]]):
  * the order-statistic fold law (per-batch top-(k+1) candidates merge
  * to the union's exact sample), idempotence, every refusal state, the
  * manifest-free consolidation windows, and the batch-granular
  * takedown.
  */
class SampleStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  /** n docs with deterministic weights (w = 1 + (7·i mod 97), spread
    * enough that ranks are informative) under ids `tag<i>`.
    */
  private def docs(n: Int, tag: String = "d"): DataFrame =
    spark.range(n.toLong).select(
      concat(lit(tag), col("id")).as("doc_id"),
      (lit(1L) + pmod(col("id") * 7, lit(97))).as("n_chars"))

  private def write(df: DataFrame, p: String): String = {
    df.write.mode("overwrite").parquet(p); p
  }

  private def sampleRows(out: String): Seq[(String, Long, Double, Double, Long)] =
    BuildSampleStore.sample(spark, out)
      .as[(String, Long, Double, Double, Long)].collect().toSeq.sortBy(_._5)

  private def directRows(df: DataFrame, k: Int): Seq[(String, Long, Double, Double, Long)] =
    TextOps.prioritySample(df, k)
      .as[(String, Long, Double, Double, Long)].collect().toSeq.sortBy(_._5)

  test("fold law: three batches (one overlapping) ≡ one-shot sample of the union") {
    val base = tmp("samp-store")
    val out = s"$base/store"
    val all = docs(500)
    BuildSampleStore.run(spark,
      write(all.filter(pmod(crc32($"doc_id"), lit(3)) === 0), s"$base/a"), out, k = 20)
    BuildSampleStore.append(spark,
      write(all.filter(pmod(crc32($"doc_id"), lit(3)) <= 1), s"$base/b"), out, "b")
    BuildSampleStore.append(spark,
      write(all.filter(pmod(crc32($"doc_id"), lit(3)) === 2), s"$base/c"), out, "c")
    assert(sampleRows(out) === directRows(all, 20))
    // every batch kept at most k+1 candidate rows
    val perBatch = spark.read.parquet(s"$out/candidates")
      .groupBy($"batch").count().as[(String, Long)].collect()
    assert(perBatch.forall(_._2 <= 21), perBatch.mkString(", "))
  }

  test("τ derives from the merged (k+1)-th; small stores get τ=0 and est_w=w") {
    val base = tmp("samp-tau")
    val out = s"$base/store"
    BuildSampleStore.run(spark, write(docs(8), s"$base/a"), out, k = 20)
    val got = sampleRows(out)
    assert(got.length === 8)
    assert(got.forall(r => r._4 === r._2.toDouble), "est_w must equal w when τ=0")
    assert(got === directRows(docs(8), 20))
  }

  test("idempotence: re-appending folded content under new ids changes nothing") {
    val base = tmp("samp-idem")
    val out = s"$base/store"
    BuildSampleStore.run(spark, write(docs(300), s"$base/a"), out, k = 15)
    val before = sampleRows(out)
    BuildSampleStore.append(spark, write(docs(300), s"$base/b"), out, "retry1")
    BuildSampleStore.append(spark, write(docs(120), s"$base/c"), out, "retry2")
    assert(sampleRows(out) === before)
  }

  test("a batch claiming a different k refuses by id (the smaller-k under-coverage hole)") {
    val base = tmp("samp-geom")
    val out = s"$base/store"
    BuildSampleStore.run(spark, write(docs(300), s"$base/a"), out, k = 20)
    // a smaller-k fold: its candidate rows look perfectly normal — only
    // the meta claim can catch it
    TextOps.priorityCandidates(docs(300, "x"), 5)
      .select($"doc_id", $"w")
      .write.parquet(s"$out/candidates/batch=rogue")
    Seq((5, BuildSampleStore.HashDevice)).toDF("k", "hash_device")
      .write.parquet(s"$out/meta/batch=rogue")
    val e = intercept[IllegalStateException] { sampleRows(out) }
    assert(e.getMessage.contains("rogue") &&
      e.getMessage.contains("different convention"))
  }

  test("orphan candidate dirs, meta ghosts, and weight conflicts refuse loudly") {
    val base = tmp("samp-orphan")
    val out = s"$base/store"
    BuildSampleStore.run(spark, write(docs(200), s"$base/a"), out, k = 10)
    TextOps.priorityCandidates(docs(50, "o"), 10).select($"doc_id", $"w")
      .write.parquet(s"$out/candidates/batch=orphan")
    val e1 = intercept[IllegalStateException] { sampleRows(out) }
    assert(e1.getMessage.contains("orphan") && e1.getMessage.contains("no meta row"))
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$out/candidates/batch=orphan"), true)
    Seq((10, BuildSampleStore.HashDevice)).toDF("k", "hash_device")
      .write.parquet(s"$out/meta/batch=ghost")
    val e2 = intercept[IllegalStateException] { sampleRows(out) }
    assert(e2.getMessage.contains("ghost") && e2.getMessage.contains("under-cover"))
    fs.delete(new org.apache.hadoop.fs.Path(s"$out/meta/batch=ghost"), true)
    // same doc id, DIFFERENT weight: two claims about one document
    BuildSampleStore.append(spark,
      write(docs(200).withColumn("n_chars", $"n_chars" + 1), s"$base/conf"),
      out, "conflict")
    val e3 = intercept[IllegalStateException] { sampleRows(out) }
    assert(e3.getMessage.contains("DIFFERENT weights"))
  }

  test("consolidation: fan-in truncates to k+1, crash-window reads identical") {
    val base = tmp("samp-consol")
    val out = s"$base/store"
    val all = docs(400)
    BuildSampleStore.run(spark, write(docs(150), s"$base/a"), out, k = 12)
    BuildSampleStore.append(spark, write(docs(300), s"$base/b"), out, "b")
    BuildSampleStore.append(spark, write(all, s"$base/c"), out, "c")
    val before = sampleRows(out)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val conf = spark.sparkContext.hadoopConfiguration
    Seq("b", "c").foreach { b =>
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(s"$out/candidates/batch=$b"), fs,
        new org.apache.hadoop.fs.Path(s"$base/save-c-$b"), false, conf)
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(s"$out/meta/batch=$b"), fs,
        new org.apache.hadoop.fs.Path(s"$base/save-m-$b"), false, conf)
    }
    BuildSampleStore.consolidate(spark, out, Seq("b", "c"))
    assert(sampleRows(out) === before, "post-consolidation sample changed")
    val merged = spark.read.parquet(s"$out/candidates")
      .filter($"batch".cast("string").startsWith("merged-"))
    assert(merged.count() <= 13, "consolidated batch must hold ≤ k+1 rows")
    // the crash window: sources AND consolidated both readable
    Seq("b", "c").foreach { b =>
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(s"$base/save-c-$b"), fs,
        new org.apache.hadoop.fs.Path(s"$out/candidates/batch=$b"), false, conf)
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(s"$base/save-m-$b"), fs,
        new org.apache.hadoop.fs.Path(s"$out/meta/batch=$b"), false, conf)
    }
    assert(sampleRows(out) === before,
      "sources + consolidated together must read identically (order-" +
        "statistic idempotence — the property that makes a manifest unnecessary)")
    // crash-during-deletion re-run: half-deleted sources + committed
    // merge must finish the deletions, not refuse forever
    fs.delete(new org.apache.hadoop.fs.Path(s"$out/candidates/batch=c"), true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$out/meta/batch=c"), true)
    BuildSampleStore.consolidate(spark, out, Seq("b", "c"))
    assert(sampleRows(out) === before, "re-run heal changed the sample")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$out/candidates/batch=b")),
      "the re-run must finish the interrupted source deletions")
    intercept[IllegalArgumentException] {
      BuildSampleStore.consolidate(spark, out, Seq("never-existed"))
    }
    intercept[IllegalArgumentException] {
      BuildSampleStore.consolidate(spark, out, Seq("base"))
    }
  }

  test("dropBatches is the takedown verb; base undroppable; k from store") {
    val base = tmp("samp-drop")
    val out = s"$base/store"
    BuildSampleStore.run(spark, write(docs(250), s"$base/a"), out, k = 10)
    BuildSampleStore.append(spark, write(docs(100, "zz"), s"$base/b"), out, "gone")
    BuildSampleStore.dropBatches(spark, out, Seq("gone"))
    assert(sampleRows(out) === directRows(docs(250), 10))
    intercept[IllegalArgumentException] {
      BuildSampleStore.dropBatches(spark, out, Seq("base"))
    }
    assert(BuildSampleStore.storeK(spark, out) === 10)
  }

  test("streamed cells fold ≡ batch fold; bad streamed weights refuse eagerly") {
    val base = tmp("samp-stream")
    val out = s"$base/store"
    val all = docs(350)
    BuildSampleStore.run(spark, write(all.limit(0), s"$base/e"), out, k = 15)
    // the rank-free cell restatement, folded by compactStreamed
    write(TextOps.sampleCells(all), s"$base/cells")
    BuildSampleStore.compactStreamed(spark, s"$base/cells", out, "fold-1")
    assert(sampleRows(out) === directRows(all, 15))
    // a poisoned cell directory must refuse before the batch lands
    write(Seq(("bad1", -5L)).toDF("doc_id", "w"), s"$base/badcells")
    val e = intercept[IllegalArgumentException] {
      BuildSampleStore.compactStreamed(spark, s"$base/badcells", out, "fold-2")
    }
    assert(e.getMessage.contains("negative"))
  }

  test("duplicated streamed rows (at-least-once ingest) fold ≡ one-shot sample") {
    val base = tmp("samp-dupstream")
    val out = s"$base/store"
    val all = docs(350)
    BuildSampleStore.run(spark, write(all.limit(0), s"$base/e"), out, k = 15)
    // the same cells landed twice — a re-ingested file under at-least-
    // once delivery. Without the pre-cut distinct, each duplicated
    // high-priority doc occupies two of the k+1 slots and evicts the
    // genuine (k+1)-th candidate, so τ (and every est_w) diverges from
    // the one-shot sample.
    val cells = TextOps.sampleCells(all)
    write(cells.unionAll(cells), s"$base/cells2x")
    BuildSampleStore.compactStreamed(spark, s"$base/cells2x", out, "fold-dup")
    assert(sampleRows(out) === directRows(all, 15),
      "duplicated streamed rows must not distort the top-(k+1) cut")
    // and the landed batch itself carries no duplicate candidates
    val batch = spark.read.parquet(s"$out/candidates")
      .filter($"batch".cast("string") === "fold-dup")
    assert(batch.count() === batch.distinct().count())
  }
}
