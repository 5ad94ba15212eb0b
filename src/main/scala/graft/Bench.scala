package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: runs every declared query against
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line with per-query and
  * total seconds.
  *
  * Each query is forced through the `noop` sink — a full computation
  * of every output column with zero sink cost. (`.count()` would let
  * Catalyst prune the projections of row-returning queries and
  * measure an empty scan.)
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // local mode has no task retries, so the determinism sort before
      // round-robin repartition is pure overhead
      .config("spark.sql.execution.sortBeforeRepartition", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.expressions.GraftFunctions.register(spark)

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // Warmup pass at the TARGET scale factor: generated code is
    // plan-shape specific (and AQE picks different shapes at different
    // input sizes), so only a same-sf pass gets Janino+JIT compilation
    // out of the measured numbers. Reported times are steady-state.
    SparkEntry.queries.keys.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }

    // min of the measured runs per query: suppresses shared-machine
    // noise (GC pauses, CPU contention) so reported numbers reflect
    // the query's actual steady-state cost; a third run settles the
    // cases where the first two disagree badly
    val results = SparkEntry.queries.keys.toSeq.sorted.map { n =>
      val a = runOnce(n); val b = runOnce(n)
      if (a < 0 || b < 0) n -> math.max(a, b)
      else {
        val m = math.min(a, b)
        n -> (if (math.max(a, b) > 1.5 * m) math.min(m, runOnce(n)) else m)
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(
      f"""{"metric":"total_query_seconds","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
