package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All queries in this library take `(spark, sfDir)` and resolve tables
  * through here, so the same code runs at any scale factor — and, on a
  * real cluster, against any warehouse path. Reads are plain columnar
  * parquet scans: Catalyst pushes filters and prunes columns into the
  * scan, which is the 100 TB-scale behavior we design for (a query that
  * touches 2 columns must read 2 columns).
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** The test parquet files are single-row-group, so Spark's scan
    * yields ONE input partition regardless of `maxPartitionBytes` —
    * and every downstream per-row computation would run on one core.
    * Tables whose pipelines do heavy per-row compute (hashing,
    * vector math) therefore get an explicit round-robin repartition
    * to the session's parallelism; light scan→aggregate pipelines
    * stay un-repartitioned because the extra exchange/stage costs
    * more than one core saves at this size. On a real deployment the
    * input is thousands of files and this is a no-op concern. Safe
    * because every query in this library is partitioning-order
    * independent by construction (exact integer aggregation,
    * total-order ranks).
    */
  private def parallel(spark: SparkSession, df: DataFrame): DataFrame =
    df.repartition(spark.sparkContext.defaultParallelism)

  /** The events table stores `ts` as parquet TIMESTAMP(NANOS), which
    * Spark's parquet reader rejects (PARQUET_TYPE_ILLEGAL). We read the
    * nanos as a raw long (`spark.sql.legacy.parquet.nanosAsLong`) and
    * truncate to microseconds with integer division — the same
    * truncation DuckDB applies when it reads the column as TIMESTAMP,
    * so oracle values agree. (Plain `/` would go through double and
    * lose precision above 2^53; `div` stays integral.)
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, sfDir, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame =
    parallel(spark, table(spark, sfDir, "documents"))
  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    parallel(spark, table(spark, sfDir, "embeddings"))

  /** Register every table as a temp view so `spark.sql` queries (and the
    * bonus-pattern "streaming view" semantics — reference
    * bonus_pattern.py:17-41) can name them.
    */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    All.foreach(n => table(spark, sfDir, n).createOrReplaceTempView(n))
}
