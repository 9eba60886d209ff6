package graft

import graft.operators.{DupGraph, Sketches, TextDedup}
import org.apache.spark.sql.functions._

/** Round-5 additions: triangle counting / clustering coefficient,
  * n-gram novelty scoring, and the count-min sketch.
  */
class GraphSketchSpec extends SparkSpec {
  import spark.implicits._

  test("triangleCounts on a known graph, robust to direction and duplicate edges") {
    // triangle 1-2-3 plus pendant 4 off node 3; edge (2,1) repeats
    // (1,2) reversed and (3,1) repeats (1,3) — canonicalization must
    // collapse them
    val edges = Seq(
      (1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L), (3L, 1L), (3L, 4L)
    ).toDF("src", "dst")
    val r = DupGraph.triangleCounts(edges, "src", "dst")
      .orderBy($"node")
      .as[(Long, Long, Long, Double)].collect()
    assert(r(0) == ((1L, 2L, 1L, 1.0)))
    assert(r(1) == ((2L, 2L, 1L, 1.0)))
    assert(r(2) == ((3L, 3L, 1L, 0.333333)))
    assert(r(3) == ((4L, 1L, 0L, 0.0)))
  }

  test("triangleCounts: clique counts C(n-1,2) triangles per node") {
    val nodes = (0L until 5L)
    val edges = (for {
      a <- nodes; b <- nodes if a < b
    } yield (a, b)).toDF("src", "dst")
    val r = DupGraph.triangleCounts(edges, "src", "dst")
      .as[(Long, Long, Long, Double)].collect()
    assert(r.length == 5)
    // K5: every node has degree 4, sits in C(4,2) = 6 triangles,
    // coefficient exactly 1
    assert(r.forall { case (_, d, t, c) => d == 4L && t == 6L && c == 1.0 })
  }

  test("ngramNovelty: cross-doc shared grams lower novelty; in-doc repeats do not") {
    val shared = "a b c d e f g h"
    val docs = Seq(
      // doc 0 and 1 share one 8-gram window at position 0
      (0L, s"$shared i j k l m n o p"),
      (1L, s"$shared q r s t u v w x"),
      // doc 2 repeats ITS OWN 8-gram twice — distinct-doc freq stays 1
      (2L, s"z1 z2 z3 z4 z5 z6 z7 z8 z1 z2 z3 z4 z5 z6 z7 z8")
    ).toDF("doc_id", "text")
    val r = TextDedup.ngramNovelty(docs, "doc_id", "text", n = 8)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Double)].collect()
    // 16 tokens → 9 windows; docs 0/1 share exactly the window at pos 0
    assert(r(0) == ((0L, 9L, 1L, 0.888889)))
    assert(r(1) == ((1L, 9L, 1L, 0.888889)))
    assert(r(2) == ((2L, 9L, 0L, 1.0)))
  }

  test("labelPropagate spreads seeds by frontier round with smaller-label ties") {
    // path 1-2-3-4-5, seeds at the ends: round 1 labels 2 and 4;
    // round 2 reaches 3 with a 10-vs-20 tie -> smaller label wins
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val seeds = Seq((1L, 10L), (5L, 20L)).toDF("node", "lbl")
    val r = DupGraph.labelPropagate(edges, "src", "dst", seeds, "node", "lbl", iters = 2)
      .orderBy($"node").as[(Long, Long, Long)].collect()
    assert(r.toSeq == Seq(
      (1L, 10L, 0L), (2L, 10L, 1L), (3L, 10L, 2L), (4L, 20L, 1L), (5L, 20L, 0L)))
  }

  test("pageRank: driver-local and distributed paths agree bit-for-bit") {
    // ragged directed graph with a dangling node (6), a hub (1), and a
    // duplicate edge (0->1 twice) — exercises outdeg, dangling mass,
    // and edge multiplicity on both paths
    val edges = Seq(
      (0L, 1L), (0L, 1L), (0L, 2L), (2L, 1L), (1L, 3L), (3L, 0L),
      (4L, 1L), (5L, 6L)).toDF("src", "dst")
    val local = DupGraph.pageRank(edges, "src", "dst", iters = 4)
      .select($"node", $"pagerank_e9").as[(Long, Long)].collect().toMap
    val dist = DupGraph.pageRank(edges, "src", "dst", iters = 4,
      localEdgeThreshold = 0L)
      .select($"node", $"pagerank_e9").as[(Long, Long)].collect().toMap
    assert(local == dist, s"local=$local dist=$dist")
    assert(local.keySet == Set(0L, 1L, 2L, 3L, 4L, 5L, 6L))
  }

  test("labelPropagate and kCore: local and distributed paths agree") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (2L, 4L), (1L, 3L),
      (5L, 6L), (6L, 7L)).toDF("src", "dst")
    val seeds = Seq((1L, 10L), (1L, 10L), (7L, 20L)).toDF("node", "lbl")
    val lp = DupGraph
      .labelPropagate(edges, "src", "dst", seeds, "node", "lbl", iters = 3)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val lpDist = DupGraph
      .labelPropagate(edges, "src", "dst", seeds, "node", "lbl", iters = 3,
        localEdgeThreshold = 0L)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(lp == lpDist, s"local=$lp dist=$lpDist")
    val kc = DupGraph.kCore(edges, "src", "dst", k = 2)
      .as[(Long, Long)].collect().sorted.toSeq
    val kcDist = DupGraph.kCore(edges, "src", "dst", k = 2,
      localEdgeThreshold = -1L)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(kc == kcDist, s"local=$kc dist=$kcDist")
    assert(kc.nonEmpty)
  }

  test("kCore peels cascades to the stable core; empty when no core exists") {
    // triangle 1-2-3 with tail 3-4-5: 2-core must peel 5 THEN 4
    // (cascade needs a second round) and keep exactly the triangle
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val core2 = DupGraph.kCore(edges, "src", "dst", k = 2)
      .orderBy($"node").as[(Long, Long)].collect()
    assert(core2.toSeq == Seq((1L, 2L), (2L, 2L), (3L, 2L)))
    assert(DupGraph.kCore(edges, "src", "dst", k = 3).count() == 0)
  }

  test("count-min estimates never undercount and are exact without collisions") {
    val toks = Seq.fill(10)("alpha") ++ Seq.fill(7)("beta") ++
      Seq.fill(3)("gamma") ++ Seq("delta")
    val df = toks.toDF("tok")
    val items = Seq("alpha", "beta", "gamma", "delta").toDF("tok")
    // wide sketch: 4 distinct tokens cannot collide in 4096 buckets
    // with overwhelming margin — estimates are exact
    val wide = Sketches.countMinSketch(df, "tok", rows = 4, width = 4096)
    val exactEst = Sketches.cmsEstimate(wide, items, "tok", rows = 4, width = 4096)
      .as[(String, Long)].collect().toMap
    assert(exactEst == Map("alpha" -> 10L, "beta" -> 7L, "gamma" -> 3L, "delta" -> 1L))
    // brutal sketch: 2 buckets force collisions — estimates only inflate
    val tiny = Sketches.countMinSketch(df, "tok", rows = 2, width = 2)
    assert(tiny.count() <= 4) // bounded by rows x width
    val est = Sketches.cmsEstimate(tiny, items, "tok", rows = 2, width = 2)
      .as[(String, Long)].collect().toMap
    assert(est("alpha") >= 10L && est("beta") >= 7L &&
      est("gamma") >= 3L && est("delta") >= 1L)
  }

  test("count-min estimates a never-seen token as 0, not absent") {
    // the sketch frame only materializes touched cells; a query token
    // none of whose cells were incremented must still appear with the
    // canonical estimate 0 (left-join + coalesce, not inner join)
    val df = Seq.fill(5)("alpha").toDF("tok")
    val sk = Sketches.countMinSketch(df, "tok", rows = 4, width = 4096)
    val est = Sketches.cmsEstimate(
      sk, Seq("alpha", "never_seen").toDF("tok"), "tok", rows = 4, width = 4096)
      .as[(String, Long)].collect().toMap
    assert(est == Map("alpha" -> 5L, "never_seen" -> 0L))
  }
}
