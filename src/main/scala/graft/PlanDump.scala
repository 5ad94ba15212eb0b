package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the physical BUILD plan of the index builders that
  * are not declared queries (the df-attach shingle/winnow builds), so
  * plan evidence for the train-once phase can be committed next to
  * the query plans `graft.Explain` dumps.
  *
  * Usage: `sbt "runMain graft.PlanDump <sfDir>"` — prints each
  * builder's fallback-path (no IndexStore) executed plan; the
  * warehouse write wraps the same frame with the bucketed sink.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.expressions.GraftFunctions.register(spark)
    Seq(
      "shingle_hashes_build" -> (() => ext.Dedup.explodedShingleHashes(spark, sfDir)),
      "winnow_fp_build" -> (() => ext.Dedup.winnowFingerprints(spark, sfDir))
    ).foreach { case (name, f) =>
      val df = f()
      println(s"========== $name ==========")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
