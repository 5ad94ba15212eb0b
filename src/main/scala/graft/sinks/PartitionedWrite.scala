package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
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
}
