package graft

import org.scalatest.funsuite.AnyFunSuite

/** ATTACH / USE / cleanup lifecycle (reference pattern_1_2.py:138,
  * :23, scripts/cleanup.py) mapped to the session catalog.
  */
class WarehouseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("attach + use + saveAsTable + teardown round-trip") {
    val loc = TestSpark.tmpDir("attach-db")
    Warehouse.attach(spark, "graft_lake", loc)
    Warehouse.use(spark, "graft_lake")
    try {
      Seq((1L, "a"), (2L, "b")).toDF("id", "v")
        .write.mode("overwrite").saveAsTable("user_clicks")
      // unqualified resolution via USE
      assert(spark.table("user_clicks").count() === 2)
      // the table's data lives under the attached location
      val tableDir = new java.io.File(loc, "user_clicks")
      assert(tableDir.exists() && tableDir.listFiles().nonEmpty)

      val aux = TestSpark.tmpDir("attach-ckpt")
      Warehouse.cleanup(spark, "graft_lake", Seq(aux))
      assert(!spark.catalog.databaseExists("graft_lake"))
      assert(!tableDir.exists(), "CASCADE must delete managed table data")
      assert(!new java.io.File(aux).exists())
    } finally {
      spark.sql("USE default")
      spark.sql("DROP DATABASE IF EXISTS graft_lake CASCADE")
      ()
    }
  }
}
