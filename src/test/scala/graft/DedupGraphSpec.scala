package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Dedup

/** Connected-component resolution on crafted graphs: the star
  * contraction's O(log n) round bound on chains (the adversarial shape
  * templated/spam near-dups produce), equivalence with min-label
  * propagation, and the raise-on-cap contract (a silently
  * non-converged fixpoint would return WRONG components).
  */
class DedupGraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def labelSet(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  /** Path graph v0—v1—…—v(n−1): diameter n−1, the worst case for
    * per-round min-label propagation.
    */
  private def chain(n: Int): DataFrame =
    (0L until n - 1L).map(i => (i, i + 1)).toDF("src", "dst")

  test("star contraction: a 64-vertex chain converges in <= 2*log2(n) rounds") {
    val n = 64
    val (labels, rounds) = Dedup.starComponents(chain(n))
    assert(rounds <= 2 * 6, s"took $rounds rounds") // 2*log2(64)
    assert(labelSet(labels) === (0L until n.toLong).map(v => (v, 0L)).toSet)
  }

  test("star contraction handles multi-component graphs with arbitrary edge orientation") {
    // two components {0,1,2,3} (a triangle + pendant) and {10,11,12}
    // (a chain), edges given in mixed orientations and with duplicates
    val edges = Seq(
      (1L, 0L), (2L, 1L), (0L, 2L), (3L, 2L), (3L, 2L),
      (11L, 10L), (11L, 12L)).toDF("src", "dst")
    val (labels, _) = Dedup.starComponents(edges)
    assert(labelSet(labels) ===
      Set((0L, 0L), (1L, 0L), (2L, 0L), (3L, 0L),
        (10L, 10L), (11L, 10L), (12L, 10L)))
  }

  test("star contraction and min-label propagation agree") {
    // a denser mixed fixture: chain + star + triangle sharing vertices
    val edges = Seq(
      (5L, 6L), (6L, 7L), (7L, 8L), (8L, 9L), // chain
      (20L, 21L), (20L, 22L), (20L, 23L), // star
      (30L, 31L), (31L, 32L), (32L, 30L), // triangle
      (9L, 20L)) // bridge chain->star
      .toDF("src", "dst")
    val sym = edges.unionByName(edges.select($"dst".as("src"), $"src".as("dst")))
    val viaStar = labelSet(Dedup.starComponents(edges)._1)
    val viaProp = labelSet(Dedup.minLabelPropagate(sym))
    assert(viaStar === viaProp)
    assert(viaStar.filter(_._2 == 5L).map(_._1) ===
      Set(5L, 6L, 7L, 8L, 9L, 20L, 21L, 22L, 23L))
  }

  test("min-label propagation raises at the round cap instead of returning partial labels") {
    val edges = chain(16)
    val sym = edges.unionByName(edges.select($"dst".as("src"), $"src".as("dst")))
    val e = intercept[IllegalStateException](Dedup.minLabelPropagate(sym, maxRounds = 3))
    assert(e.getMessage.contains("did not converge"))
  }

  test("triangle census: K4 and a pendant vertex give closed-form wedge/triangle counts") {
    // K4 on {0,1,2,3}: 6 edges, C(3,2)*4 = 12 wedges, 4 triangles,
    // transitivity = 3*4/12 = 1.0
    val k4 = (for { u <- 0L to 3L; v <- (u + 1) to 3L } yield (u, v))
      .toDF("u", "v")
    val c1 = graft.ext.Similarity.triangleCensusOn(k4).collect().head
    assert((c1.getLong(0), c1.getLong(1), c1.getLong(2), c1.getLong(3),
      c1.getLong(4)) === ((4L, 6L, 12L, 4L, 1000000L)))

    // pendant vertex 5 attached to 0: degrees (4,3,3,3,1) →
    // wedges = C(4,2)+3*C(3,2) = 15, triangles unchanged,
    // transitivity = 12/15 = 0.8
    val pend = k4.unionByName(Seq((0L, 5L)).toDF("u", "v"))
    val c2 = graft.ext.Similarity.triangleCensusOn(pend).collect().head
    assert((c2.getLong(0), c2.getLong(1), c2.getLong(2), c2.getLong(3),
      c2.getLong(4)) === ((5L, 7L, 15L, 4L, 800000L)))

    // triangle-free star (hub 0, leaves 1..4): 6 wedges, 0 triangles,
    // transitivity 0 — the n_wedges>0 guard's live branch
    val star = (1L to 4L).map(v => (0L, v)).toDF("u", "v")
    val c3 = graft.ext.Similarity.triangleCensusOn(star).collect().head
    assert((c3.getLong(2), c3.getLong(3), c3.getLong(4)) === ((6L, 0L, 0L)))
  }

  test("triangle census matches a brute-force reference on random graphs (degree-tie coverage)") {
    // Fixed-seed G(n,p) sweep: small random graphs are dense in degree
    // TIES, exactly where the (degree, id) orientation order could go
    // wrong — every census column must equal the O(n^3) reference.
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 12) {
      val n = 4 + rnd.nextInt(6)
      val p = 0.25 + rnd.nextDouble() * 0.5
      val edges = for {
        u <- 0L until n; v <- (u + 1) until n if rnd.nextDouble() < p
      } yield (u, v)
      if (edges.nonEmpty) {
        val es = edges.toSet
        val deg = edges.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
        val wedges = deg.values.map(d => d * (d - 1) / 2).sum
        val tris = (for {
          u <- 0L until n; v <- (u + 1) until n; w <- (v + 1) until n
          if es((u, v)) && es((u, w)) && es((v, w))
        } yield 1).size.toLong
        val expTrans = if (wedges > 0) 3 * tris * 1000000L / wedges else 0L
        val row = graft.ext.Similarity
          .triangleCensusOn(edges.toDF("u", "v")).collect().head
        assert((row.getLong(0), row.getLong(1), row.getLong(2),
          row.getLong(3), row.getLong(4)) ===
          ((deg.size.toLong, edges.size.toLong, wedges, tris, expTrans)),
          s"trial $trial: n=$n edges=$edges")
      }
    }
  }

  test("component resolution leaks no persisted frames per invocation") {
    val before = spark.sparkContext.getPersistentRDDs.size
    Dedup.starComponents(chain(8))._1.count()
    Dedup.minLabelPropagate(
      chain(8).unionByName(chain(8).select($"dst".as("src"), $"src".as("dst")))).count()
    // localCheckpoint blocks are owned by the returned frames (GC'd with
    // them); no ITERATION state may remain registered after return
    val leaked = spark.sparkContext.getPersistentRDDs.size - before
    assert(leaked <= 2, s"$leaked new persistent RDDs remain registered")
  }

  test("split_by_component: zero cross-split near-dup pairs BY CONSTRUCTION") {
    val sf = "/root/testdata/sf0.001"
    val split = Dedup.splitByComponent(spark, sf)
    // the identical census that audits the doc-hash split: a component
    // can never straddle a boundary, so the leak table is EMPTY
    assert(Dedup.leakagePairsOn(spark, sf, split).count() === 0L)
    // ...and that zero is meaningful: the doc-hash split genuinely
    // leaks on the same corpus (7 pairs at sf0.001)
    assert(Dedup.splitLeakage(spark, sf).count() > 0L)
    // non-degenerate assignment: every split populated, every doc split
    assert(split.select("split").distinct().count() === 3L)
    assert(split.count() ===
      graft.Tables.documents(spark, sf).count())
  }
}
