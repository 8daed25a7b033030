package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema.Schemas

/** Monthly-CSV → hour-partitioned parquet ingest (reference
  * DailyFileDivider.scala:18–51 parity).
  *
  * Scale posture: deriving the partition columns is a codegen'd
  * projection; `repartition(event_date, event_hour)` hash-exchanges once
  * so each output partition is written by one task (one-file-per-
  * partition-ish layout, DFD:43); dynamic partition overwrite makes
  * re-ingesting a month idempotent (DFD:13).
  */
object Ingest {

  def derivePartitions(df: DataFrame): DataFrame = {
    val ts = to_timestamp(col("event_time"), Schemas.EventTimeFormat)
    df.withColumn("event_date", date_format(ts, "yyyy-MM-dd"))
      .withColumn("event_hour", date_format(ts, "HH"))
  }

  /** `filesPerPartition` = 1 reproduces the reference's one-file-per-hour
    * layout (one writer task per hour — fine at 55k events/hour). For a
    * hot hour at real scale, raise it: the repartition key gains a
    * user-hash salt so N tasks share the hour's write, still landing in
    * the same Hive partition.
    */
  def run(spark: SparkSession, csvPath: String, outPath: String,
      filesPerPartition: Int = 1): Unit = {
    val raw = spark.read
      .option("header", "true")
      .schema(Schemas.behavior)
      .csv(csvPath)
      // CSV carries no partition columns yet; they are derived below.
      .drop("event_date", "event_hour")
    val derived = derivePartitions(raw)
    val parted =
      if (filesPerPartition <= 1)
        derived.repartition(col("event_date"), col("event_hour"))
      else
        derived.repartition(col("event_date"), col("event_hour"),
          pmod(hash(col("user_id")), lit(filesPerPartition)))
    parted.write
      .partitionBy("event_date", "event_hour")
      // per-write, not session conf: run() must not leak dynamic
      // overwrite semantics into a long-lived caller session
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(outPath)
  }

  /** JSONL corpus ingest — the interchange format LLM-pipeline corpora
    * actually arrive in (one JSON object per line; crawl dumps,
    * annotation exports, HF dataset drops). The schema is IMPOSED,
    * never inferred: at 100 TB `inferSchema` is a full extra pass over
    * the corpus before the real one, and a late malformed line would
    * silently widen a column for every earlier file. Malformed lines
    * follow `mode` (default PERMISSIVE: nulls + `_corrupt_record` when
    * the caller's schema carries that column; FAILFAST to refuse
    * loudly). Output is plain repartitioned parquet — downstream
    * curation re-layouts as it needs.
    */
  def runJsonl(spark: SparkSession, jsonlPath: String, outPath: String,
      schema: org.apache.spark.sql.types.StructType, numFiles: Int = 32,
      mode: String = "PERMISSIVE"): Unit =
    spark.read
      .schema(schema)
      .option("mode", mode)
      .json(jsonlPath)
      .repartition(numFiles)
      .write.mode("overwrite").parquet(outPath)

  /** The inverse: export any DataFrame as a JSONL directory (one JSON
    * object per line, Spark's json sink). Round-trip fidelity —
    * unicode, quotes, newlines-in-strings, nulls — is oracled by the
    * `jsonl_roundtrip` query (md5 text digests survive the trip).
    */
  def exportJsonl(df: DataFrame, outPath: String, numFiles: Int = 32): Unit =
    df.repartition(numFiles).write.mode("overwrite").json(outPath)

  def main(args: Array[String]): Unit = {
    val Array(csvPath, outPath) = args
    val spark = SparkSession.builder()
      .appName("graft-ingest")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    run(spark, csvPath, outPath)
    spark.stop()
  }
}
