package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators for scan pruning at scale.
  *
  * Z-ORDER (Morton) clustering: interleaving the bits of two sort keys
  * yields a 1-D sort order that preserves locality in BOTH dimensions,
  * so parquet row-group min/max statistics prune scans on EITHER
  * predicate — the standard answer to "we filter this 100 TB table by
  * user_id on some queries and by date on others" where a single-column
  * sort only ever prunes one of them. Everything here is codegen'd
  * shift/mask arithmetic (no UDF), and the write path is
  * repartitionByRange + sortWithinPartitions on the z-value, which is
  * exactly the planned-file-boundary shape a table format's OPTIMIZE
  * ZORDER produces.
  */
object Layout {

  /** Spread the low 16 bits of x so a zero sits between consecutive
    * bits (0b1011 → 0b1000101). Classic parallel-prefix magic masks;
    * five codegen'd shift/mask ops, no branching.
    */
  private def spread16(x: Column): Column = {
    val m = x.bitwiseAND(lit(0xFFFFL))
    val s1 = m.bitwiseOR(shiftleft(m, 8)).bitwiseAND(lit(0x00FF00FFL))
    val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(0x33333333L))
    s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton/Z-value of two keys truncated to their low 16 bits: bit i of
    * `a` lands at position 2i, bit i of `b` at 2i+1. Monotone in the
    * interleaved bit prefix, so a z-range corresponds to a rectangle
    * stack in (a, b) space.
    */
  def zValue2(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Cluster a DataFrame for two-dimensional data skipping: range
    * partition by z-value (planned, sampled boundaries — balanced
    * files) and sort within each partition so row groups inside a file
    * are tight too. Writers downstream inherit one file per partition.
    */
  def zOrderBy(df: DataFrame, a: Column, b: Column, numFiles: Int): DataFrame = {
    val z = zValue2(a, b)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
