package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe (the r16 verdict's item #5): does the remaining holdout
  * valid→test gap (96.0 → 91.5 at sf0.01) move with the GD pass
  * count, or is it sample noise at sf0.01 doc counts? Capacity
  * widening is exhausted (2×256 shipped; 512 and 3×64 measured
  * no-better on test), so the levers left are the optimizer schedule
  * and the split sizes themselves. Two censuses over the SHIPPED
  * 2×256 recipe and the leak-free component split:
  *
  *  (a) PASS SWEEP: one Gram fold trained out to 4× the shipped pass
  *      count, per-pass train/valid/test accuracy. The trainer emits
  *      every pass's weights from the one fold
  *      ([[graft.functions.TextAnalysis.lsGradientTrain]] iterates
  *      driver-side on the collected Gram), so the whole sweep costs
  *      one fold + a model-grain scoring join keyed by (doc, pass).
  *      Early-stop protocol: pick the pass on VALID, read TEST.
  *
  *  (b) TRAIN-SIZE CENSUS: retrain at 25/50/75/100 % of the train
  *      split (doc-hash subsample, so the subset is deterministic and
  *      cluster-atomicity is inherited from the component split),
  *      test accuracy per size. A gap that shrinks as train grows is
  *      sample-bound (more corpus closes it for free at real scale);
  *      a flat gap is a recipe ceiling.
  *
  * Usage: sbt "Test/runMain graft.GdSweepProbe [sfDir]"
  * Delete-after-read discipline like FeatureProbe: the verdict lands
  * in scaling_r17/ + COVERAGE.md, the probe file stays as the
  * reproducible measurement main.
  */
object GdSweepProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = TestSpark.spark
    import graft.functions.TextAnalysis
    import TextAnalysis.{docRates, centerRates, docTeacher, ClassifierPasses}

    val docs = Tables.documents(spark, sf)
    val splits = ext.Dedup.splitByComponent(spark, sf)
      .select("doc_id", "split").persist()
    val teach = docTeacher(docs).persist()
    val rates = docRates(docs).persist()
    val trainIdsAll = splits.filter(col("split") === "train").select("doc_id")

    /** Train on `trainIds` to `passes`, print per-pass split census. */
    def census(label: String, trainIds: DataFrame, passes: Int): Unit = {
      val trainRates = rates.join(trainIds, "doc_id")
      val sums = trainRates.groupBy("f").agg(sum(col("xr")).as("s"))
      val nDf = trainIds.agg(count(lit(1)).as("n_docs"))
      // frozen train-split centering, applied to ALL docs (the
      // shipped holdout discipline: the serving transform is frozen
      // with the model, no peeking)
      val allDense = centerRates(docs.select("doc_id"), rates, sums, nDf)
        .persist()
      val trainTeach = teach.join(trainIds, "doc_id")
      val model = TextAnalysis.lsGradientTrain(
        spark, allDense.join(trainIds, "doc_id"), trainTeach, passes)
      val thrDf = broadcast(TextAnalysis.thrOf(trainTeach))
      val rows = allDense.join(broadcast(model), "f")
        .groupBy(col("doc_id"), col("pass"))
        .agg(sum(col("w") * col("xc")).as("dot"))
        .join(teach, "doc_id").join(splits, "doc_id").crossJoin(thrDf)
        .groupBy(col("pass"), col("split"))
        .agg(count(lit(1)).as("n"),
          count_if((col("dot") >= col("thr")) === (col("y") === 1)).as("ok"))
        .withColumn("acc_pct", round(col("ok") * 100.0 / col("n"), 1))
        .select("pass", "split", "acc_pct")
        .orderBy("pass", "split")
        .collect()
      rows.groupBy(_.getLong(0)).toSeq.sortBy(_._1).foreach { case (p, rs) =>
        val cells = rs.sortBy(_.getString(1)).map(r =>
          s"${r.getString(1)}=${r.getDouble(2)}%").mkString("  ")
        println(s"[probe] $label pass=$p  $cells")
      }
      allDense.unpersist()
      ()
    }

    // (a) pass sweep on the full train split
    census("pass-sweep", trainIdsAll, passes = 4 * ClassifierPasses)

    // (b) train-size census at the shipped pass count — doc-hash
    // subsample of the train split (deterministic, split-atomic)
    for (pct <- Seq(25, 50, 75)) {
      val sub = trainIdsAll.filter(
        conv(substring(md5(concat(col("doc_id").cast("string"),
          lit("#gdsweep"))), 1, 15), 16, 10).cast("long") % 100 < pct)
      census(s"train-size $pct%", sub, ClassifierPasses)
    }
    println("[probe] train-size 100% == pass-sweep pass=" + ClassifierPasses)
    spark.stop()
  }
}
