package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TopK.topK
import graft.functions.expressions.GraftFunctions

/** Per-operator unit tests (SURVEY.md §5.1/§5.4) on sf0.001 data and
  * tiny in-memory frames.
  */
class OperatorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query executes at sf0.001 and every oracle key exists") {
    val qs = SparkEntry.queries
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
    qs.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      withClue(name)(assert(n >= 0))
    }
  }

  test("merge-upsert (incremental) equals full recompute — the MERGE monoid law") {
    val full = operators.EventPatterns.clickAgg(spark, sf).collect().toSet
    val merged = operators.EventPatterns.mergeUpsert(spark, sf).collect().toSet
    assert(merged === full)
  }

  test("native cosine expression equals the built-in zip_with/aggregate fold") {
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, sf).limit(200)
    val pairs = emb.toDF("id_a", "emb_a", "l_a")
      .crossJoin(emb.toDF("id_b", "emb_b", "l_b").limit(20))
    val builtin = aggregate(
      zip_with(col("emb_a"), col("emb_b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v) /
      (sqrt(aggregate(zip_with(col("emb_a"), col("emb_a"), (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)) *
        sqrt(aggregate(zip_with(col("emb_b"), col("emb_b"), (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, v) => acc + v)))
    val diff = pairs.select(
      abs(GraftFunctions.cosineSim(col("emb_a"), col("emb_b")) - builtin).as("d"))
      .agg(max("d")).first().getDouble(0)
    assert(diff === 0.0) // identical accumulation order ⇒ bit-for-bit equal
  }

  test("native cosine returns null for zero vectors") {
    GraftFunctions.register(spark)
    val df = Seq((Array(0f, 0f, 0f), Array(1f, 2f, 3f))).toDF("a", "b")
    assert(df.select(GraftFunctions.cosineSim(col("a"), col("b"))).first().isNullAt(0))
  }

  test("top-K aggregator equals window row_number formulation") {
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val scored = emb.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        GraftFunctions.cosineSim(col("embedding"), col("qe")).as("score"))
      .cache()
    try {
      val viaAgg = scored.groupBy("qid")
        .agg(topK(7)(col("vec_id"), col("score")).as("hits"))
        .select(col("qid"), posexplode(col("hits")))
        .select(col("qid"), (col("pos") + 1).as("rank"), col("col._1").as("id"), col("col._2").as("score"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      val w = Window.partitionBy("qid").orderBy(col("score").desc, col("vec_id").asc)
      val viaWindow = scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 7)
        .select(col("qid"), col("rank"), col("vec_id"), col("score"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      assert(viaAgg === viaWindow)
    } finally { scored.unpersist(); () }
  }

  test("dedup: minhash-LSH candidates cover all high-jaccard pairs at sf0.001") {
    val exact = ext.Dedup.ngramJaccard(spark, sf)
      .filter(col("jaccard") >= 0.8)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = ext.Dedup.minhashLsh(spark, sf)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.subsetOf(lsh))
  }

  test("multimodal decode is deterministic and complete") {
    val meta = ext.Multimodal.decodeMeta(spark, sf)
    assert(meta.count() === Tables.documents(spark, sf).count())
    assert(meta.filter(col("format").isin("jpeg", "png", "webp")).count() === meta.count())
  }
}
