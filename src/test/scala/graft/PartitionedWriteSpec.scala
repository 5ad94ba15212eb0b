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
}
