package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the optimized physical plan of one or more declared
  * queries under the SAME session configuration Bench uses, so plan
  * shape (broadcast vs SMJ, exchange count, codegen spans, pushed
  * filters) can be audited before trusting a timing.
  *
  * Usage: `sbt "runMain graft.Explain <sfDir> <query>[,query...]"`
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args(1).split(",").toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.expressions.GraftFunctions.register(spark)
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save() // finalize AQE plan
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
