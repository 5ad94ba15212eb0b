package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join handling — the runtime re-plan the 100 TB story
  * leans on for join-key skew the engine does NOT pre-salt: an
  * adversarial fixture with one key carrying ~all the probe-side mass
  * must come out of a sort-merge join with the hot partition SPLIT
  * (the `isSkew` flag on the final adaptive plan), and the join
  * result must be exactly the unskewed answer. Thresholds are dropped
  * to test scale; production runs the same mechanism at its defaults.
  */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("adversarial hot key is split by AQE skew-join and the result is exact") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8k",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prior = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 50k probe rows on ONE key + a sprinkle of cold keys, against a
      // small dim side — payload padding makes the hot partition
      // exceed the lowered skew threshold
      val probe = spark.range(0, 50000)
        .select((col("id") % 100 < 98).cast("int").as("flag"), col("id"))
        .select(when(col("flag") === 1, 7L).otherwise(col("id") % 37).as("k"),
          concat(lit("x"), col("id").cast("string"),
            lit("p" * 64)).as("payload"))
      val dim = (0L until 40L).map(k => (k, s"dim_$k")).toDF("k", "name")
      val joined = probe.join(dim, "k")
      // collect() drives THIS queryExecution, so the adaptive plan
      // below is the one that actually ran (count() would plan anew)
      val n = joined.collect().length.toLong
      // ground truth: every probe row with k in [0, 40) matches exactly once
      val expected = probe.filter(col("k") < 40).count()
      assert(n === expected)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"))
      assert(plan.contains("skew=true"), s"\n$plan")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
