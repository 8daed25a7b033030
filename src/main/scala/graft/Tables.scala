package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Mirrors the reference's imposed-schema scans (SessionizationBuiltIn.scala:41–52)
  * in spirit: the schema is whatever the parquet footer declares — fixed,
  * never inferred from data. At 100 TB these would be partition-pruned
  * reads over a Hive layout; here each table is a single parquet file.
  */
object Tables {
  /** The driver writes timestamps as plain `timestamp[us]`
    * (isAdjustedToUTC=false). Spark 4 infers those as TIMESTAMP_NTZ by
    * default, which breaks instant functions (`unix_micros` et al.) and
    * diverges from DuckDB's naive-read-as-UTC oracle semantics under our
    * UTC session timezone. Reading them as TIMESTAMP (LTZ) keeps both
    * engines on the same instants, so the conf is pinned off here — the
    * single choke point every testdata read goes through.
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Some generations of the testdata wrote `events.ts` as
    * TIMESTAMP(NANOS) parquet, which Spark 4.x refuses to read as a
    * timestamp ([PARQUET_TYPE_ILLEGAL]). We read it as raw nanos
    * (legacy conf) and truncate to µs with integer division — NOT double
    * division, which would lose precision at ~1.7e18 ns — matching DuckDB's
    * own ns→µs truncation so oracle timestamps agree exactly (SURVEY §7.5).
    * Current testdata is already µs, which falls through untouched.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case _ => raw
    }
  }
  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "customer")
  def part(spark: SparkSession, sfDir: String): DataFrame       = load(spark, sfDir, "part")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "supplier")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
