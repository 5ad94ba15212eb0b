package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (measure-first discipline, not shipped surface): does a
  * SECOND, independently-salted unigram hash family close any of the
  * holdout generalization gap (shipped: train 86.6 / valid 78.0 /
  * test 80.9 % at sf0.01)?
  *
  * Rationale: the teacher gate is exactly linear in EXACT per-token
  * rates, and 31 vocabulary words hashed into 64 buckets collide in
  * ~7 expected pairs — collided words are forced to share a weight,
  * which is a real capacity loss the (rejected, r14) bigram family
  * never addressed. A salted second view at f∈[64,128) disambiguates
  * every collision with positive probability while riding the exact
  * `docRates` shape (same integer per-mille rates, same frozen
  * centering, same trainer).
  *
  * Usage: sbt "Test/runMain graft.FeatureProbe [sfDir]"
  * Prints per-(variant, lrDen) split censuses; delete-after-read like
  * the r14 bigram probe, recording the verdict in COVERAGE.md.
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

    // the salted second unigram view, offset to f∈[B,2B) — rides the
    // SHIPPED salt/width constants so the probe measures the shipped
    // configuration (the collision set is salt-specific; r15's
    // exploratory "#salt1" run read a few points off the shipped
    // census for exactly that reason)
    val B = TextAnalysis.ClassifierBuckets
    def saltedRates(d: DataFrame): DataFrame = {
      val tok = d.select(col("doc_id"),
        explode(split(col("text"), " ")).as("tok"))
      val nt = tok.groupBy("doc_id").agg(count(lit(1)).as("n"))
      tok.groupBy(col("doc_id"),
          (conv(substring(md5(concat(col("tok"),
              lit(TextAnalysis.ClassifierSalt))), 1, 15), 16, 10)
            .cast("long") % B + B).as("f"))
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

    val uni = docRates(docs).persist()
    val both = uni.unionAll(saltedRates(docs)).persist()
    for (lrDen <- Seq(4000L, 8000L, 16000L)) {
      evalVariant("unigram64 (shipped shape)", uni, lrDen)
      evalVariant("unigram64+salted64", both, lrDen)
    }
    spark.stop()
  }
}
