package graft

import org.apache.spark.sql.functions._

/** Dev measurement (committed as a number, not shipped surface): the
  * batched-merge BPE trainer at a PRODUCTION merge count.
  *
  * The driver's corpora share a 31-word vocabulary, whose merge space
  * saturates at ~200 merges — so a 4k-merge wall cannot be measured
  * on them. The trainer consumes a word-frequency relation and
  * nothing else, so the production-shaped input is synthesized
  * directly: ~50k distinct words (the scale of a real tokenizer's
  * word-frequency table after pre-tokenization), Zipf-ranked counts,
  * deterministic seed.
  *
  * Usage: sbt "Test/runMain graft.BpeScaleProbe [merges] [batch] [nWords] [census]"
  * Prints the wall, rounds, and (census != 0, the default) a
  * divergence-vs-exact census over the first 160 merges (where exact
  * is cheap enough to run — ~13 min of sequential exact rounds; pass
  * census=0 when re-measuring only the batched wall).
  */
object BpeScaleProbe {
  def main(args: Array[String]): Unit = {
    val merges = args.headOption.map(_.toInt).getOrElse(4096)
    val batch = args.lift(1).map(_.toInt).getOrElse(8)
    val nWords = args.lift(2).map(_.toInt).getOrElse(50000)
    val census = args.lift(3).forall(_ != "0")
    val spark = TestSpark.spark
    import graft.functions.TextAnalysis

    // deterministic Zipf-ish word-frequency table: word i is an
    // md5-derived hex string (length 6..16 — BPE is alphabet-
    // agnostic), count ~ N·1000/(rank+1) — the shape a real
    // pre-tokenizer emits
    val wf = spark.range(nWords.toLong).selectExpr(
      "substring(md5(cast(id as string)), 1, 6 + cast(id % 11 as int)) AS t",
      s"(cast($nWords as bigint) * 1000) div (id + 1) AS n_w")
      .groupBy("t").agg(max(col("n_w")).as("n_w")) // md5-prefix collisions
      .persist()
    val distinct = wf.count()
    println(s"[probe] wf: $distinct distinct words")

    // divergence-vs-exact census at small N (exact is O(N) jobs)
    if (census) {
      val smallN = 160
      val exact = TextAnalysis.bpeVocabFromWf(spark, wf, smallN)
        .collect().map(r => (r.getString(1), r.getString(2)))
      val batched = TextAnalysis.bpeVocabBatchedFromWf(spark, wf, smallN, batch)
        .collect().map(r => (r.getString(1), r.getString(2)))
      val posDiff = exact.zip(batched).count { case (a, b) => a != b }
      val setDiff = exact.toSet.diff(batched.toSet).size
      println(s"[probe] divergence at N=$smallN batch=$batch: " +
        s"position-diff=$posDiff/${exact.length} set-diff=$setDiff")
    }

    val t0 = System.nanoTime()
    val learned = TextAnalysis.bpeVocabBatchedFromWf(spark, wf, merges, batch)
      .collect()
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"[probe] batched BPE: ${learned.length} merges " +
      f"(asked $merges, batch=$batch) in $wall%.1f s " +
      f"(${wall / math.max(1, learned.length) * 1000}%.1f ms/merge)")
    spark.stop()
  }
}
