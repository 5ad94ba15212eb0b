package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ext.{Dedup, Similarity}

/** Warehouse-persisted index tables ([[IndexStore]]): with
  * `spark.graft.indexDir` set, the amortizable index builds (unigram
  * model, IVF index, shingle/minhash frames, LSH-bucketed corpus)
  * write ONCE as bucketed catalog tables, and a SECOND session
  * resolves them scan-only — reuse that survives the building
  * session, the deployment lifecycle each index's scaladoc describes.
  */
class IndexStoreSpec extends AnyFunSuite {
  private lazy val root = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def sessionWithIndexDir(dir: String) = {
    val s = root.newSession()
    s.conf.set(IndexStore.IndexDirKey, dir)
    s
  }

  test("minhash signatures: second session reuses the persisted table scan-only") {
    val dir = TestSpark.tmpDir("graft-index-mh")
    val s1 = sessionWithIndexDir(dir)
    val built = Dedup.minhashSignatures(s1, sf)
    val n = built.count()
    assert(n > 0)
    // a NEW session (fresh memoization) must resolve to the catalog
    // table — a scan, not a rebuild
    val s2 = sessionWithIndexDir(dir)
    val reused = Dedup.minhashSignatures(s2, sf)
    assert(reused.count() === n)
    val plan = reused.queryExecution.executedPlan.toString
    assert(plan.contains("FileScan parquet"), s"\n$plan")
    assert(!plan.contains("HashAggregate"), s"rebuild detected:\n$plan")
    assert(!plan.contains("Exchange"), s"rebuild detected:\n$plan")
    // and the dedup results through the persisted index stay identical
    val viaIndex = Dedup.minhashLsh(s2, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = Dedup.minhashLsh(root, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaIndex === direct)
  }

  test("unigram model: persisted once, rescored scan-only, same scores") {
    val dir = TestSpark.tmpDir("graft-index-lm")
    val s1 = sessionWithIndexDir(dir)
    graft.functions.TextAnalysis.unigramModel(s1, sf).count()
    val s2 = sessionWithIndexDir(dir)
    val model = graft.functions.TextAnalysis.unigramModel(s2, sf)
    val plan = model.queryExecution.executedPlan.toString
    assert(plan.contains("FileScan parquet"), s"\n$plan")
    assert(!plan.contains("HashAggregate"), s"rebuild detected:\n$plan")
    val viaIndex = graft.functions.TextAnalysis.unigramLogprob(s2, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    val direct = graft.functions.TextAnalysis.unigramLogprob(root, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(viaIndex === direct)
  }

  test("bigram scoring: persisted-model path and hash-trained path score identically") {
    // without indexDir the scoring model trains directly on kernel
    // hashes (no strings in any aggregate); with indexDir it derives
    // from the persisted string model — the two paths must agree
    val dir = TestSpark.tmpDir("graft-index-bg")
    val s1 = sessionWithIndexDir(dir)
    graft.functions.TextAnalysis.bigramModel(s1, sf).count()
    val s2 = sessionWithIndexDir(dir)
    val viaIndex = graft.functions.TextAnalysis.bigramLogprob(s2, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    val direct = graft.functions.TextAnalysis.bigramLogprob(root, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    assert(viaIndex === direct)
  }

  test("round-9 artifacts (ngram_sources, bigram_counts, allpairs, mutual_edges): persisted once, results unchanged") {
    val dir = TestSpark.tmpDir("graft-index-r9")
    val s1 = sessionWithIndexDir(dir)
    graft.functions.TextAnalysis.ngramSourceSets(s1, sf).count()
    graft.functions.TextAnalysis.bigramCounts(s1, sf).count()
    Dedup.allPairsIndex(s1, sf)._1.count()
    Similarity.mutualEdges(s1, sf).count()
    val s2 = sessionWithIndexDir(dir)
    // the resolved vocabulary table is a scan, not a rebuild
    val vocabPlan = graft.functions.TextAnalysis.ngramSourceSets(s2, sf)
      .queryExecution.executedPlan.toString
    assert(vocabPlan.contains("FileScan parquet"), s"\n$vocabPlan")
    assert(!vocabPlan.contains("ObjectHashAggregate"), s"rebuild detected:\n$vocabPlan")
    // every consumer answers identically through the persisted indexes
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toString).toSet
    assert(rows(graft.functions.TextAnalysis.hllOverlap(s2, sf)) ===
      rows(graft.functions.TextAnalysis.hllOverlap(root, sf)))
    assert(rows(graft.functions.TextAnalysis.pmiCollocations(s2, sf)) ===
      rows(graft.functions.TextAnalysis.pmiCollocations(root, sf)))
    assert(rows(Dedup.allPairsExact(s2, sf)) ===
      rows(Dedup.allPairsExact(root, sf)))
    assert(rows(Similarity.triangleCensus(s2, sf)) ===
      rows(Similarity.triangleCensus(root, sf)))
  }

  test("IVF index: quantizer + inverted file persist; search results unchanged") {
    val dir = TestSpark.tmpDir("graft-index-ivf")
    val s1 = sessionWithIndexDir(dir)
    Similarity.ivfIndex(s1, sf)._2.count()
    val s2 = sessionWithIndexDir(dir)
    val (quant, assigned) = Similarity.ivfIndex(s2, sf)
    for (df <- Seq(quant, assigned)) {
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("FileScan parquet"), s"\n$plan")
      assert(!plan.contains("ObjectHashAggregate"), s"rebuild detected:\n$plan")
    }
    val viaIndex = Similarity.ivfTopK(s2, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val direct = Similarity.ivfTopK(root, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaIndex === direct)
  }

  test("bpe vocab + word tokens: trained once, second session serves scan-only") {
    val dir = TestSpark.tmpDir("graft-index-bpe")
    val s1 = sessionWithIndexDir(dir)
    val trained = graft.functions.TextAnalysis.bpeVocab(s1, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(trained.nonEmpty)
    graft.functions.TextAnalysis.bpeWordTokens(s1, sf).count()
    // a NEW session must resolve BOTH artifacts from the catalog — a
    // FileScan, never a re-run of the 10-round training loop (which
    // would show up as aggregates/exchanges in the plan)
    val s2 = sessionWithIndexDir(dir)
    val vocab2 = graft.functions.TextAnalysis.bpeVocab(s2, sf)
    val plan = vocab2.queryExecution.executedPlan.toString
    assert(plan.contains("FileScan parquet"), s"\n$plan")
    assert(!plan.contains("HashAggregate"), s"retrain detected:\n$plan")
    assert(vocab2.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet === trained)
    val wt2 = graft.functions.TextAnalysis.bpeWordTokens(s2, sf)
    val wtPlan = wt2.queryExecution.executedPlan.toString
    assert(wtPlan.contains("FileScan parquet"), s"\n$wtPlan")
    assert(!wtPlan.contains("HashAggregate"), s"re-encode detected:\n$wtPlan")
    // and the downstream compression stats through the persisted
    // tables equal the memoized-session path
    val viaIndex = graft.functions.TextAnalysis.bpeEncode(s2, sf).collect()
      .map(r => (r.getString(0), r.getLong(3))).toSet
    val direct = graft.functions.TextAnalysis.bpeEncode(root, sf).collect()
      .map(r => (r.getString(0), r.getLong(3))).toSet
    assert(viaIndex === direct)
  }

  test("bpe trainer's first merge == the one-step bpeStep ranking's top pair") {
    // cross-law: at step 1 every symbol is a single char, so the loop's
    // argmax must be exactly the standalone distributed merge-counting
    // step's (count desc, pair asc) winner
    val top = graft.functions.TextAnalysis.bpeStep(root, sf).collect().head
    val first = graft.functions.TextAnalysis.bpeVocab(root, sf)
      .orderBy(org.apache.spark.sql.functions.col("step")).collect().head
    assert(first.getString(1) + first.getString(2) === top.getString(0))
    assert(first.getLong(4) === top.getLong(1))
  }
}
