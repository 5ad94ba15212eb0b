package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dynamic partition overwrite: a re-run replaces only the date
  * partitions it writes, leaves the rest untouched, and readers prune
  * partitions from the scan.
  */
class PartitionedWriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dynamic overwrite replaces only touched date partitions; reads prune") {
    val dir = TestSpark.tmpDir("pwrite")
    val day1 = Seq(
      ("2024-01-01 10:00:00", "u1", 1.0),
      ("2024-01-01 11:00:00", "u2", 2.0))
    val day2 = Seq(
      ("2024-01-02 10:00:00", "u3", 3.0))
    def df(rows: Seq[(String, String, Double)]) =
      rows.toDF("ts", "user_id", "value")
        .withColumn("ts", col("ts").cast("timestamp"))

    sinks.PartitionedWrite.byDate(df(day1 ++ day2), "ts", dir)
    assert(sinks.PartitionedWrite.read(spark, dir).count() === 3)

    // recompute ONLY day 2 with different contents: day 1 must survive
    val day2Fixed = Seq(
      ("2024-01-02 10:00:00", "u3", 30.0),
      ("2024-01-02 12:00:00", "u4", 40.0))
    sinks.PartitionedWrite.byDate(df(day2Fixed), "ts", dir)
    val after = sinks.PartitionedWrite.read(spark, dir)
    assert(after.count() === 4)
    assert(after.filter(col("p_date") === "2024-01-01").count() === 2)
    assert(after.agg(sum("value")).head.getDouble(0) === 73.0)

    // partition pruning: a day filter reaches the scan as a
    // PartitionFilter, not a post-scan Filter over all days
    val pruned = after.filter(col("p_date") === "2024-01-02")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(p_date"))
    assert(pruned.count() === 2)
  }

  test("zValue interleaves bits exactly; z-ordered files bound BOTH key spans") {
    // bit-interleave ground truth against a reference implementation
    val probe = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 0L), (0L, 65535L),
      (12345L, 54321L), (65535L, 65535L))
    def mortonRef(x: Long, y: Long): Long =
      (0 until 16).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.sum
    val got = probe.toDF("x", "y")
      .select(sinks.PartitionedWrite.zValue(col("x"), col("y")))
      .collect().map(_.getLong(0)).toSeq
    assert(got === probe.map((mortonRef _).tupled))

    // layout claim: on a 64x64 grid written as 16 files, a z-ordered
    // layout bounds the per-file span of BOTH dimensions, while an
    // x-sorted layout leaves y's per-file span at the full domain
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)).toDF("x", "y")
    val zDir = TestSpark.tmpDir("zorder")
    val linDir = TestSpark.tmpDir("linorder")
    sinks.PartitionedWrite.zOrdered(grid, "x", "y", zDir, 16)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(linDir)
    def meanYSpan(dir: String): Double = {
      val spans = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map { f =>
          val r = spark.read.parquet(f.getAbsolutePath)
            .agg(min("y"), max("y")).head
          (r.getLong(1) - r.getLong(0)).toDouble
        }
      spans.sum / spans.length
    }
    val (zSpan, linSpan) = (meanYSpan(zDir), meanYSpan(linDir))
    assert(linSpan === 63.0) // x-sort: every file spans all of y
    assert(zSpan < linSpan / 2, s"z-order y-span $zSpan vs linear $linSpan")
  }
}
