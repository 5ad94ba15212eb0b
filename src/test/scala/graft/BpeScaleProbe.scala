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

    // full-depth gate (r16 verdict #4): run the driver loop directly
    // so the round count — and with it the number of every-64-round
    // scratch-rederive checksums that FIRED (each is a loud require)
    // — is part of the committed artifact, then rebuild the serving
    // (word → n_syms) relation from the learned merges through the
    // SAME chunked encoder bpeWordTokens ships
    val words0 = wf.select(col("t"), col("n_w")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    var rounds = 0
    val t0 = System.nanoTime()
    val learned = TextAnalysis.bpeDriverBatchedLoop(
      words0, merges, batch, onRound = r => rounds = r)
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"[probe] batched BPE: ${learned.length} merges " +
      f"(asked $merges, batch=$batch) in $wall%.1f s " +
      f"(${wall / math.max(1, learned.length) * 1000}%.1f ms/merge); " +
      f"$rounds rounds, ${rounds / TextAnalysis.BpeRederiveEvery} " +
      "rederive checksums fired (all required equal)")
    // serving rebuild through BOTH encoder forms: the driver replay
    // loop (what bpeWordTokens ships under the vocabulary-grain
    // bound) and, behind arg 5 != 0, the chunked distributed fold
    // chain (the >bound fallback — 2048 scheduler round-trips at 32k
    // merges, measured 1543 s on this table, so off by default)
    val mergeList = learned.map { case (_, s1, s2, _) => (s1, s2) }
    val t1 = System.nanoTime()
    val replayed = TextAnalysis.bpeDriverEncodeSyms(words0.map(_._1), mergeList)
    val drvWall = (System.nanoTime() - t1) / 1e9
    println(f"[probe] served rebuild (driver replay): ${replayed.length} " +
      f"words -> ${replayed.iterator.map(_.length.toLong).sum} total " +
      f"symbols in $drvWall%.1f s")
    if (args.lift(4).exists(_ != "0")) {
      val t2 = System.nanoTime()
      val vocab0 = wf.select(col("t"))
        .withColumn("syms", array_join(
          expr("transform(sequence(1, length(t)), i -> substring(t, i, 1))"),
          TextAnalysis.BpeSep))
      val served = TextAnalysis.bpeEncodeSyms(vocab0, mergeList)
        .select(col("t"),
          size(split(col("syms"), TextAnalysis.BpeSep)).cast("long").as("n_syms"))
        .agg(count(lit(1)).as("n_words"), sum(col("n_syms")).as("total_syms"))
        .collect()(0)
      val encWall = (System.nanoTime() - t2) / 1e9
      println(f"[probe] served rebuild (chunked encoder, chunk=" +
        f"${TextAnalysis.BpeEncodeChunk}): ${served.getLong(0)} words -> " +
        f"${served.getLong(1)} total symbols in $encWall%.1f s")
    }
    spark.stop()
  }
}
