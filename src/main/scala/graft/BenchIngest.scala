package graft

import org.apache.spark.sql.SparkSession

/** The bench's engine-owned-storage ingest, factored so dev tooling
  * ([[Explain]]) can reproduce or ADOPT the exact layout [[Bench]]
  * queries run against — bucketed fact catalog tables + repartitioned
  * plain parquet — instead of silently auditing raw single-file scan
  * plans that the bench never executes.
  */
object BenchIngest {

  /** Bucketed fact tables: table → (bucket key, bucket count). Hot
    * queries join/aggregate on these keys, so a scan already satisfies
    * the clustered distribution and Catalyst drops the exchange — the
    * co-located layout every 100 TB warehouse maintains.
    */
  val Bucketed: Map[String, (String, Int)] = Map(
    "events" -> ("user_id", 16),
    "orders" -> ("o_custkey", 16),
    "lineitem" -> ("l_orderkey", 32))

  /** File count per plain table — tracks the DOWNSTREAM per-row work,
    * not just bytes (documents/embeddings feed hash/vector pipelines,
    * dims feed broadcasts).
    */
  val FilesPerTable: Map[String, Int] = Map(
    "documents" -> 32, "embeddings" -> 32,
    "customer" -> 2, "part" -> 2, "supplier" -> 1,
    "nation" -> 1, "region" -> 1)

  private[graft] def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmTree)
    f.delete(); ()
  }

  /** Fresh ingest (what [[Bench]] runs): clear any previous process's
    * managed locations, load the raw driver parquet into bucketed
    * catalog tables / repartitioned parquet, point [[Tables]] and
    * [[IndexStore]] at the result. All ten loads run as concurrent
    * jobs — ingest is bounded by total work, not per-job latency.
    */
  def ingest(spark: SparkSession, sfDir: String, warehouse: String): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // a previous process's managed-table locations are unknown to this
    // session's fresh in-memory catalog — clear them or saveAsTable
    // fails with LOCATION_ALREADY_EXISTS
    rmTree(new java.io.File(s"$warehouse/catalog"))
    rmTree(new java.io.File(s"$warehouse/index"))
    spark.conf.set(IndexStore.IndexDirKey, s"$warehouse/index")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    Await.result(Future.traverse(Tables.All) { t => Future {
      val src = spark.read.parquet(s"$sfDir/$t.parquet")
      Bucketed.get(t) match {
        case Some((key, n)) =>
          // repartition on the bucket key first → one file per bucket,
          // so sorted-bucket metadata also eliminates downstream sorts
          src.repartition(n, org.apache.spark.sql.functions.col(key))
            .write.mode("overwrite")
            .bucketBy(n, key).sortBy(key)
            .format("parquet").saveAsTable(t)
        case None =>
          src.repartition(FilesPerTable(t))
            .write.mode("overwrite").parquet(s"$warehouse/$t.parquet")
      }
    }}, Duration.Inf)
    spark.conf.set(Tables.CatalogDirKey, warehouse)
  }

  /** Adopt a PREVIOUS bench process's warehouse without rewriting it:
    * register the bucketed fact locations as external bucketed tables
    * (identical scan plans — catalog bucketing metadata drives the
    * planner the same way for managed and external tables) and point
    * [[IndexStore]] at the existing index dir with orphan adoption on,
    * so a later session resolves the already-built index tables
    * scan-only instead of rebuilding them. Dev tooling only — the
    * bench itself always re-ingests (no cross-run precomputation).
    */
  def adopt(spark: SparkSession, sfDir: String, warehouse: String): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.All.foreach { t =>
      Bucketed.get(t).foreach { case (key, n) =>
        val loc = s"$warehouse/catalog/$t"
        require(new java.io.File(loc).isDirectory,
          s"adopt: missing bucketed table dir $loc — run Bench first")
        // bucketed DDL requires an explicit column list — infer it
        // from the parquet files at the location
        val ddl = spark.read.parquet(loc).schema.toDDL
        spark.sql(s"""CREATE TABLE IF NOT EXISTS `$t` ($ddl) USING parquet
          CLUSTERED BY (`$key`) SORTED BY (`$key`) INTO $n BUCKETS
          LOCATION '$loc'""")
      }
    }
    spark.conf.set(IndexStore.IndexDirKey, s"$warehouse/index")
    spark.conf.set(IndexStore.AdoptOrphansKey, "true")
    spark.conf.set(Tables.CatalogDirKey, warehouse)
  }
}
