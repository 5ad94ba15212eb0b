package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Streaming corpus-prep semantics: the quality gate applies the batch
  * expression (stream-vs-batch equality on the same documents), exact
  * duplicates are suppressed across micro-batches, and the first
  * arrival wins.
  */
class CorpusPrepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")

  test("quality gate + cross-batch exact dedup; stream equals batch rule") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ingest_ts")
    val q = CorpusPrep.start(docs, "corpus_prep_stream_out", lateness = "1 minute")
    try {
      val good = (1 to 100).map(i => s"tok$i").mkString(" ") // score 100/256 ≥ 0.3
      val junk = "the the the the the the the the"          // all stopwords → score 0
      input.addData(Seq(
        (1L, good, ts(1)),
        (2L, junk, ts(2)),    // fails the gate
        (3L, good, ts(3))))   // same content as 1 → dropped in-batch
      q.processAllAvailable()
      input.addData(Seq(
        (4L, good, ts(4)),            // cross-batch duplicate → dropped
        (5L, good + " extra", ts(5))))  // novel content → kept
      q.processAllAvailable()
      val out = spark.table("corpus_prep_stream_out")
      val kept = out.select("doc_id").as[Long].collect().sorted
      assert(kept.toSeq === Seq(1L, 5L))

      // stream-vs-batch: the same rule expressed in batch (first
      // arrival per hash among gate-passers) gives the same doc set
      val batchDocs = Seq(
        (1L, good, ts(1)), (2L, junk, ts(2)), (3L, good, ts(3)),
        (4L, good, ts(4)), (5L, good + " extra", ts(5)))
        .toDF("doc_id", "text", "ingest_ts")
      val batchKept = batchDocs
        .withColumn("quality_score",
          graft.functions.TextAnalysis.qualityScore(col("text")))
        .filter(col("quality_score") >= CorpusPrep.QualityFloor)
        .groupBy(md5(col("text")).as("content_hash"))
        .agg(min(struct(col("ingest_ts"), col("doc_id"))).as("first"))
        .select(col("first.doc_id"))
        .as[Long].collect().sorted
      assert(batchKept.toSeq === kept.toSeq)

      // the emitted rows carry the batch-identical score
      val score1 = out.filter(col("doc_id") === 1L)
        .select("quality_score").as[Double].head()
      assert(math.abs(score1 - (100.0 / 256.0)) < 1e-12) // no stopwords → n/256
    } finally q.stop()
  }

  test("redacting ingest: stream output equals the batch redaction expression; zero residual PII") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ingest_ts")
    val q = CorpusPrep.startRedacted(docs, "corpus_redact_stream_out")
    try {
      val filler = (1 to 100).map(i => s"tok$i").mkString(" ")
      val pii = s"$filler contact bob@example.com ip 10.1.2.3 call 555-123-4567 id 900-12-3456"
      val clean = s"$filler nothing sensitive here"
      input.addData(Seq(
        (1L, pii, ts(1)),
        (2L, clean, ts(2)),
        (3L, pii, ts(3)))) // exact dup of the RAW text → suppressed
      q.processAllAvailable()
      input.addData(Seq((4L, pii, ts(4)))) // cross-batch raw replay → suppressed
      q.processAllAvailable()
      val out = spark.table("corpus_redact_stream_out")
      assert(out.select("doc_id").as[Long].collect().sorted.toSeq === Seq(1L, 2L))

      // bit-identical to the batch redaction expression on the same rows
      val streamed = out.select("doc_id", "redacted").as[(Long, String)]
        .collect().sortBy(_._1).toSeq
      val batch = Seq((1L, pii), (2L, clean)).toDF("doc_id", "text")
        .select(col("doc_id"),
          graft.functions.TextAnalysis.redactPii(col("text")).as("redacted"))
        .as[(Long, String)].collect().sortBy(_._1).toSeq
      assert(streamed === batch)

      // redaction actually fired and left zero residual matches
      val red1 = streamed.head._2
      assert(red1.contains("<EMAIL>") && red1.contains("<IP>") &&
        red1.contains("<PHONE>") && red1.contains("<SSN>"))
      Seq("[a-z0-9.]+@[a-z0-9.]+", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b",
        "\\b555-\\d{3}-\\d{4}\\b", "\\b\\d{3}-\\d{2}-\\d{4}\\b").foreach { re =>
        assert(!re.r.findFirstIn(red1).isDefined, s"residual match for $re")
      }
    } finally q.stop()
  }

  test("decontaminating ingest: benchmark-derived doc is stopped at the door, novel doc lands with zero hits") {
    implicit val ctx = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ingest_ts")
    val q = CorpusPrep.startDecontaminated(docs, sfDir, "corpus_decon_stream_out")
    try {
      // contaminated fixture: benchmark doc 0's text tripled — clears
      // the quality gate (3× word count) while nearly every shingle
      // stays a benchmark shingle (only junction 5-grams are novel)
      val bench0 = graft.Tables.documents(spark, sfDir)
        .filter(col("doc_id") === 0L).select("text").collect().head.getString(0)
      val contaminated = s"$bench0 $bench0 $bench0"
      val clean = (1 to 120).map(i => s"novelword$i").mkString(" ")
      input.addData(Seq(
        (1000L, contaminated, ts(1)),
        (1001L, clean, ts(2))))
      q.processAllAvailable()
      val out = spark.table("corpus_decon_stream_out")
      val landed = out.select("doc_id").as[Long].collect().toSeq
      assert(landed === Seq(1001L))
      // the landed doc exposes its audit columns; novel text has zero
      // bloom hits (deterministic given the fixed hash family)
      val row = out.filter(col("doc_id") === 1001L)
        .select("n_shingles", "n_bloom_hits").collect().head
      assert(row.getInt(0) === 116) // 120 tokens → n-4 shingles
      assert(row.getInt(1) === 0)
    } finally q.stop()
  }

  test("full ingest: each gate fires on its class; the survivor lands redacted with audit columns") {
    implicit val ctx = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ingest_ts")
    val q = CorpusPrep.startFullIngest(docs, sfDir, "corpus_full_ingest_out")
    try {
      val bench0 = graft.Tables.documents(spark, sfDir)
        .filter(col("doc_id") === 0L).select("text").collect().head.getString(0)
      val filler = (1 to 120).map(i => s"freshword$i").mkString(" ")
      val junk = "the the the the the the the the"
      val goodPii = s"$filler mail carol@example.org id 900-44-5555"
      input.addData(Seq(
        (1L, junk, ts(1)),                         // quality gate
        (2L, goodPii, ts(2)),                      // survivor
        (3L, goodPii, ts(3)),                      // exact dup of raw text
        (4L, s"$bench0 $bench0 $bench0", ts(4))))  // decontamination gate
      q.processAllAvailable()
      val out = spark.table("corpus_full_ingest_out")
      assert(out.select("doc_id").as[Long].collect().toSeq === Seq(2L))
      val row = out.filter(col("doc_id") === 2L)
        .select("redacted", "n_bloom_hits", "quality_score").collect().head
      val red = row.getString(0)
      assert(red.contains("<EMAIL>") && red.contains("<SSN>"))
      assert(!red.contains("carol@") && !red.contains("900-44-5555"))
      assert(row.getInt(1) === 0)
      assert(row.getDouble(2) >= CorpusPrep.QualityFloor)
    } finally q.stop()
  }

  test("streaming index refresh appends signatures bit-identical to the batch builder") {
    implicit val ctx = spark.sqlContext
    val sigDir = TestSpark.tmpDir("sig-refresh")
    val ckpt = TestSpark.tmpDir("sig-refresh-ckpt")
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ingest_ts")
    val q = CorpusPrep.startIndexRefresh(docs, sigDir, ckpt)
    try {
      // 100 tokens → quality 100/256, above the 0.3 gate
      def doc(seed: Int) =
        (1 to 100).map(i => s"w${(i * seed) % 17}_$i").mkString(" ")
      input.addData(Seq(
        (1L, doc(3), ts(1)),
        (2L, "the the the the the the", ts(2)),  // gated out → never indexed
        (3L, doc(5), ts(3))))
      q.processAllAvailable()
      input.addData(Seq(
        (4L, doc(3), ts(4)),   // cross-batch duplicate → suppressed, not re-indexed
        (5L, doc(7), ts(5))))
      q.processAllAvailable()
      val streamed = spark.read.parquet(sigDir).collect()
        .map(r => (r.getLong(0), r.getSeq[String](1).toList)).sortBy(_._1).toSeq
      // batch builder over the documents that should have landed
      val expected = graft.ext.Dedup.signaturesOf(
        Seq((1L, doc(3)), (3L, doc(5)), (5L, doc(7))).toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getSeq[String](1).toList))
        .sortBy(_._1).toSeq
      assert(streamed === expected)
    } finally q.stop()
  }

  /** The model-gated door: streaming the corpus through the FROZEN
    * distilled gate lands exactly the docs the batch gate keeps under
    * the same frozen artifacts (weight for weight and score for
    * score), with exact dedup suppressing replays BEFORE they are
    * scored. This is the stream≡batch law that closes the
    * filter-train loop: train (batch, FeatureRefresh-maintainable
    * stats) → freeze (model + centering + threshold) → gate at the
    * door (this twin) ≡ gate at release (`corpus_prep_gated`).
    */
  /** Fixture + frozen gate artifacts shared by the stream≡batch and
    * replay-idempotency laws: varied-vocab corpus (teacher splits, the
    * trained gate is nontrivial), centering stats, final-pass model,
    * centered-target threshold, and the batch keep-set under them.
    */
  private lazy val frozenGate: (
      Seq[(Long, String)], org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
      Long, Map[Long, Long]) = {
    import graft.functions.TextAnalysis
    def text(i: Int): String =
      (1 to 20).map(j => s"w${(i * j) % 37}").mkString(" ")
    val corpus = (1L to 30L).map(i => (i, text(i.toInt)))
    val docsDf = corpus.toDF("doc_id", "text")
    val rates = TextAnalysis.docRates(docsDf)
    val sums = rates.groupBy("f").agg(sum(col("xr")).as("s"))
    val nDf = docsDf.agg(count(lit(1)).as("n_docs"))
    val dense = TextAnalysis.centerRates(
      docsDf.select("doc_id"), rates, sums, nDf)
    val teach = TextAnalysis.docTeacher(docsDf)
    val model = TextAnalysis.lsGradientTrain(spark, dense, teach)
      .filter(col("pass") === TextAnalysis.ClassifierPasses).select("f", "w")
    val ag = teach.agg(count(lit(1)).as("n"), sum(col("y")).as("sy")).first()
    val thr = TextAnalysis.ClassifierYScale / 2 -
      ag.getLong(1) * TextAnalysis.ClassifierYScale / ag.getLong(0)
    val batchKept = dense.join(model, "f")
      .groupBy("doc_id").agg(sum(col("w") * col("xc")).as("dot"))
      .filter(col("dot") >= thr)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (corpus, model, sums, nDf, thr, batchKept)
  }

  test("model-gated ingest: stream keep-set equals the batch gate under the frozen model") {
    implicit val ctx = spark.sqlContext
    val (corpus, model, sums, nDf, thr, batchKept) = frozenGate
    def text(i: Int): String = corpus(i - 1)._2
    assert(batchKept.nonEmpty && batchKept.size < corpus.size,
      s"fixture gate is trivial: ${batchKept.size}/${corpus.size} kept")

    val outDir = TestSpark.tmpDir("gated-out") + "/docs"
    val ckpt = TestSpark.tmpDir("gated-ckpt")
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ingest_ts")
    val q = CorpusPrep.startModelGated(
      docs, outDir, ckpt, model, sums, nDf, thr)
    try {
      val (batch1, batch2) = corpus.splitAt(17)
      input.addData(batch1.zipWithIndex.map { case ((i, t), k) =>
        (i, t, ts(k + 1)) })
      q.processAllAvailable()
      // cross-batch exact replay of doc 1 (would pass the gate) must
      // be suppressed by the dedup door before it is ever scored
      input.addData((1000L, text(1), ts(40)) +:
        batch2.zipWithIndex.map { case ((i, t), k) => (i, t, ts(20 + k)) })
      q.processAllAvailable()
      val streamed = spark.read.parquet(outDir)
        .select("doc_id", "dot").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(streamed === batchKept) // ids AND scores, weight for weight
    } finally q.stop()
  }

  /** Exactly-once landing: a crash between the parquet write and the
    * checkpoint commit replays the batch; the batch_id dynamic-
    * partition overwrite must REWRITE its own partition, never append
    * a duplicate copy — duplicate documents in a release stream are a
    * real corpus defect (unlike the duplicate-tolerant signature
    * appends of the index refresh).
    */
  test("model-gated landing is replay-idempotent; other batches untouched") {
    val (corpus, model, sums, nDf, thr, batchKept) = frozenGate
    val outDir = TestSpark.tmpDir("gated-replay") + "/docs"
    val land = CorpusPrep.landModelGated(outDir, model, sums, nDf, thr) _
    val (b1, b2) = corpus.splitAt(17)
    land(b1.toDF("doc_id", "text"), 0L)
    land(b2.toDF("doc_id", "text"), 1L)
    def landed(): Map[Long, (Long, Long)] = spark.read.parquet(outDir)
      // the partition column round-trips as its directory-inferred
      // type — pin it back to long for the compare
      .select(col("doc_id"), col("dot"), col("batch_id").cast("long"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val before = landed()
    assert(before.view.mapValues(_._1).toMap === batchKept)
    // crash replay of batch 0: same rows land in the same partition
    land(b1.toDF("doc_id", "text"), 0L)
    assert(landed() === before)
    // no row duplicated anywhere
    val n = spark.read.parquet(outDir).count()
    assert(n === batchKept.size.toLong)

    // a replayed batch that keeps ZERO documents must still clear its
    // partition: dynamic overwrite rewrites only partitions the frame
    // emits, so partial files from a crashed earlier attempt would
    // otherwise survive the replay untouched
    val dropped = corpus.filter(c => !batchKept.contains(c._1))
    assert(dropped.nonEmpty, "fixture gate drops nothing")
    land(dropped.toDF("doc_id", "text"), 2L)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val p0 = fs.globStatus(new org.apache.hadoop.fs.Path(
      outDir + "/batch_id=0/part-*"))(0).getPath
    val stray = new org.apache.hadoop.fs.Path(
      outDir + "/batch_id=2/" + p0.getName)
    org.apache.hadoop.fs.FileUtil.copy(fs, p0, fs, stray, false,
      spark.sparkContext.hadoopConfiguration)
    // the partial attempt is visible (stray rows share batch-0 doc_ids,
    // so count the partition directly rather than through the map)
    assert(spark.read.parquet(outDir).where("batch_id = 2").count() > 0)
    land(dropped.toDF("doc_id", "text"), 2L) // crash replay, still zero kept
    assert(spark.read.parquet(outDir).where("batch_id = 2").count() === 0L)
    assert(landed() === before) // partial files cleared, other batches intact
  }
}
