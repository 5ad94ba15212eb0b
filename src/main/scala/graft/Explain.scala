package graft
import org.apache.spark.sql.SparkSession
/** Dev utility: dump formatted plans for selected queries. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.expressions.GraftFunctions.register(spark)
    val names = if (args.nonEmpty) args.toSeq else Seq("q1_pricing_summary", "p11_click_agg")
    names.foreach { n =>
      println(s"===== $n")
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.01").explain("formatted")
    }
    spark.stop()
  }
}
