package graft
import org.apache.spark.sql.SparkSession
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val aqe = sys.env.getOrElse("PROFILE_AQE", "true")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("PROFILE_SHUF", "32"))
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.execution.sortBeforeRepartition", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.expressions.GraftFunctions.register(spark)
    def pass(): Double = {
      var tot = 0.0
      for (name <- SparkEntry.queries.keys.toSeq.sorted) {
        val t0 = System.nanoTime()
        try SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => println(s"$name FAILED ${e.getMessage.take(100)}") }
        tot += (System.nanoTime()-t0)/1e9
      }
      tot
    }
    println(f"warmup ${pass()}%.2f")
    println(f"steady ${pass()}%.2f  (aqe=$aqe)")
    spark.stop()
  }
}
