package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned warehouse writes with dynamic partition overwrite
  * — the write path that replaces the reference's whole-table
  * overwrite (pattern_2.py:99-105) once the table no longer fits a
  * rewrite. At 100 TB a daily recompute must replace ONLY the date
  * partitions present in its output; static overwrite mode would
  * truncate the other ~3650 days first.
  *
  * `spark.sql.sources.partitionOverwriteMode=dynamic` scopes the
  * overwrite to partitions the job actually writes — set per-write
  * here (not session-wide) so unrelated writes keep static semantics.
  * Readers prune on the partition column for free
  * (`PartitionFilters` in the scan), which is the other half of the
  * contract: a day-range query touches only its directories.
  */
object PartitionedWrite {

  /** Append or overwrite `df` into `dir` partitioned by a derived
    * date column. `overwriteDynamic = true` replaces exactly the
    * partitions present in `df`.
    */
  def byDate(
      df: DataFrame,
      tsCol: String,
      dir: String,
      overwriteDynamic: Boolean = true): Unit = {
    val out = df.withColumn("p_date", to_date(col(tsCol)))
    val writer = out
      .repartition(col("p_date")) // one shuffle → one file set per partition
      .write
      .partitionBy("p_date")
    (if (overwriteDynamic)
       writer.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
     else writer.mode("append"))
      .parquet(dir)
  }

  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Morton spread of the low 16 bits of a non-negative integer
    * column: bit i moves to bit 2i (the standard 4-step magic-mask
    * interleave). Pure long shifts/masks — codegen arithmetic in
    * Spark, bit-identical `&`/`|`/`<<` in any SQL engine.
    */
  private[graft] def spread16(c: Column): Column = {
    val b = c.bitwiseAND(lit(0xFFFFL))
    val s8 = b.bitwiseOR(shiftleft(b, 8)).bitwiseAND(lit(0x00FF00FFL))
    val s4 = s8.bitwiseOR(shiftleft(s8, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val s2 = s4.bitwiseOR(shiftleft(s4, 2)).bitwiseAND(lit(0x33333333L))
    s2.bitwiseOR(shiftleft(s2, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit z-value (Morton code) of two 16-bit keys: x in the even
    * bits, y in the odd bits, so sorting by `z` clusters rows that are
    * close in BOTH dimensions.
    */
  private[graft] def zValue(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Z-order-clustered write — the multi-dimensional data-layout half
    * of the warehouse story (partition pruning above cuts whole
    * directories; THIS cuts files and row groups inside a partition):
    * rows are range-partitioned and sorted by the Morton code of
    * (xCol, yCol), so every output file covers a compact rectangle of
    * the key plane and parquet min/max stats become selective on BOTH
    * columns at once. A single-column sort makes the second column's
    * per-file span the full domain — every file survives a y-predicate
    * — which is exactly what z-ordering fixes; at 100 TB that is the
    * difference between scanning one file stripe and the whole
    * partition. `repartitionByRange` samples the z distribution, so
    * file rectangles stay balanced under skew.
    */
  def zOrdered(
      df: DataFrame, xCol: String, yCol: String, dir: String,
      numFiles: Int): Unit =
    df.withColumn("zv", zValue(col(xCol), col(yCol)))
      .repartitionByRange(numFiles, col("zv"))
      .sortWithinPartitions("zv")
      .drop("zv")
      .write.mode("overwrite").parquet(dir)
}
