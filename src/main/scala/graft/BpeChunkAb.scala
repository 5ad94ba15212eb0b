package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement main: A/B the chunk size of the >4M-word BPE
  * encode fallback ([[graft.functions.TextAnalysis.bpeEncodeSyms]]).
  *
  * The fallback's wall is SCHEDULER ROUND-TRIPS: every chunk ends in
  * one eager localCheckpoint job over the word table, so a 32k-merge
  * tokenizer pays merges/chunk jobs. r17 measured 32k/16 = 2048 jobs
  * ≈ 1543 s at full depth; r18 raised the chunk to 64 (4× fewer
  * jobs) but committed no artifact. This main measures both chunk
  * sizes on the same synthetic word table at a bounded merge depth
  * and writes `scaling_r19/bpe_fallback_chunk64.json`.
  *
  * Usage: `sbt "runMain graft.BpeChunkAb [nWords] [nMerges]"`
  * (defaults 200000 words, 1024 merges — 64 vs 16 checkpoint jobs;
  * the per-job cost is depth-independent, so the ratio transfers to
  * full 32k depth by job count).
  */
object BpeChunkAb {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val nWords = if (args.nonEmpty) args(0).toInt else 200000
    val nMerges = if (args.length > 1) args(1).toInt else 1024
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic synthetic word table: base-26 words, 8-24 chars —
    // the >4M-word fallback regime's shape at a bounded row count
    val words = spark.range(nWords.toLong)
      .select(concat(lit("w"),
        expr("conv(id * 2654435761, 10, 36)"),
        expr("repeat(substring(conv(id, 10, 36), 1, 1), " +
          "cast(pmod(id, 16) as int))")).as("t"))
    val vocab0 = words.withColumn("syms", array_join(
      expr("transform(sequence(1, length(t)), i -> substring(t, i, 1))"),
      graft.functions.TextAnalysis.BpeSep))
    // merges over the base-36 alphabet in training-list shape; whether
    // a given merge fires is irrelevant to the measured quantity (the
    // per-chunk checkpoint job over the word table)
    val alpha = "0123456789abcdefghijklmnopqrstuvwxyz"
    val merges = (0 until nMerges).map { i =>
      val a = alpha(i % 36).toString
      val b = alpha((i / 36) % 36).toString
      (a + ("'" * (i / (36 * 36))), b)
    }

    def run(chunk: Int): (Double, Long) = {
      val sc = spark.sparkContext
      val jobs0 = sc.statusTracker.getJobIdsForGroup(null).length
      var jobCounter = 0L
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobCounter += 1
      }
      sc.addSparkListener(listener)
      val t0 = System.nanoTime()
      val out = graft.functions.TextAnalysis
        .bpeEncodeSyms(vocab0, merges, chunkSize = chunk)
        .select(sum(length(col("syms"))))
      val checksum = out.first().getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      sc.removeSparkListener(listener)
      println(f"[bpe-ab] chunk=$chunk: $sec%.3f s, $jobCounter jobs, checksum=$checksum (jobs0=$jobs0)")
      (sec, jobCounter)
    }

    // warm once (codegen/JIT) at the production chunk size, then
    // interleave chunk sizes so an ambient burst cannot own one arm's
    // every sample. (A 256-deep warmup chunk was tried first and
    // StackOverflowed in task deserialization — the direct
    // demonstration of why the chunk bound exists.)
    run(64)
    val order = Seq(64, 16, 64, 16)
    val res = order.map(c => c -> run(c))
    val best = res.groupBy(_._1).map { case (c, xs) =>
      c -> (xs.map(_._2._1).min, xs.map(_._2._2).max) }
    val json =
      f"""{"n_words":$nWords,"n_merges":$nMerges,""" +
      f""""chunk64_sec":${best(64)._1}%.3f,"chunk64_jobs":${best(64)._2},""" +
      f""""chunk16_sec":${best(16)._1}%.3f,"chunk16_jobs":${best(16)._2},""" +
      f""""samples":${res.map { case (c, (s, j)) =>
        f"""{"chunk":$c,"sec":$s%.3f,"jobs":$j}""" }.mkString("[", ",", "]")}}"""
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("scaling_r19/bpe_fallback_chunk64.json"), json)
    spark.stop()
  }
}
