package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (measure-first discipline, not shipped surface): which
  * feature-family widening closes the REMAINING holdout
  * generalization gap? Shipped two-view census (r15): train 94.3 /
  * valid 92.0 / test 89.4 % at sf0.01 — the ~5-point train-test gap
  * suggests capacity may still bind. Candidates (the r15 verdict's
  * item #5): (a) 128 buckets per view (collisions ~V²/2B halve),
  * (b) a THIRD independently-salted 64-bucket view, measured against
  * the shipped 2×64 control under the identical trainer and split.
  *
  * Probe history: r15's two-view probe measured +14 points of valid
  * accuracy and shipped ([[graft.functions.TextAnalysis.ClassifierSalt]]);
  * the r14 bigram probe measured a REGRESSION and was rejected. Every
  * variant here rides the exact `docRates` shape (integer per-mille
  * rates, frozen train-split centering, exact-GD trainer) so an
  * accepted variant ships by changing only the view constants.
  *
  * Usage: sbt "Test/runMain graft.FeatureProbe [sfDir]"
  * Prints per-variant split censuses; delete-after-read like the r14
  * bigram probe, recording the verdict in COVERAGE.md.
  */
object FeatureProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = TestSpark.spark
    import graft.functions.TextAnalysis
    import TextAnalysis.{docRates, centerRates, docTeacher, ClassifierPasses}

    val docs = Tables.documents(spark, sf)
    val splits = ext.Dedup.splitByComponent(spark, sf)
      .select("doc_id", "split").persist()
    val trainIds = splits.filter(col("split") === "train").select("doc_id")
    val teach = docTeacher(docs).persist()
    val trainTeach = teach.join(trainIds, "doc_id").persist()

    // one independently-salted hashed view at [offset, offset+width) —
    // salt "" is the plain view; rides the SHIPPED hash/rate recipe
    def viewRates(d: DataFrame, salt: String, width: Long, offset: Long)
        : DataFrame = {
      val tok = d.select(col("doc_id"),
        explode(split(col("text"), " ")).as("tok"))
      val nt = tok.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val keyed = if (salt.isEmpty) col("tok")
                  else concat(col("tok"), lit(salt))
      tok.groupBy(col("doc_id"),
          (conv(substring(md5(keyed), 1, 15), 16, 10)
            .cast("long") % width + offset).as("f"))
        .agg(count(lit(1)).as("x"))
        .join(nt, "doc_id")
        .select(col("doc_id"), col("f"), expr("x * 1000 div n").as("xr"))
    }

    def evalVariant(name: String, rates: DataFrame, lrDen: Long): Unit = {
      val trainRates = rates.join(trainIds, "doc_id")
      val sums = trainRates.groupBy("f").agg(sum(col("xr")).as("s"))
      val nDf = trainIds.agg(count(lit(1)).as("n_docs"))
      val allDense = centerRates(docs.select("doc_id"), rates, sums, nDf)
        .persist()
      val trainDense = allDense.join(trainIds, "doc_id")
      val model = TextAnalysis.lsGradientTrain(
          spark, trainDense, trainTeach, ClassifierPasses, lrDen)
        .filter(col("pass") === ClassifierPasses).select("f", "w")
      val thrDf = broadcast(TextAnalysis.thrOf(trainTeach))
      val census = allDense.join(broadcast(model), "f")
        .groupBy("doc_id").agg(sum(col("w") * col("xc")).as("dot"))
        .join(teach, "doc_id").join(splits, "doc_id").crossJoin(thrDf)
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"),
          count_if((col("dot") >= col("thr")) === (col("y") === 1)).as("ok"))
        .withColumn("acc_pct", round(col("ok") * 100.0 / col("n"), 1))
        .orderBy("split")
        .collect()
      println(s"[probe] $name lrDen=$lrDen  " + census.map(r =>
        s"${r.getString(0)}=${r.getDouble(3)}% (${r.getLong(2)}/${r.getLong(1)})")
        .mkString("  "))
      allDense.unpersist()
    }

    val salt = TextAnalysis.ClassifierSalt
    val variants: Seq[(String, DataFrame)] = Seq(
      "2x64 (shipped control)" -> docRates(docs),
      "2x128" -> viewRates(docs, "", 128, 0)
        .unionAll(viewRates(docs, salt, 128, 128)),
      "3x64" -> viewRates(docs, "", 64, 0)
        .unionAll(viewRates(docs, salt, 64, 64))
        .unionAll(viewRates(docs, salt + "#2", 64, 128)),
      "2x256" -> viewRates(docs, "", 256, 0)
        .unionAll(viewRates(docs, salt, 256, 256)))
    for ((name, rates) <- variants; lrDen <- Seq(4000L, 8000L)) {
      val r = rates.persist()
      evalVariant(name, r, lrDen)
      r.unpersist()
    }
    spark.stop()
  }
}
