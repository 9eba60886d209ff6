package graft

import graft.operators.{Clustering, Curation, DupGraph, Similarity, TextDedup}
import org.apache.spark.sql.functions._

/** Round-5 operators: relational Lloyd's k-means, duplicated-n-gram
  * span detection/scrubbing, and the deterministic epoch shuffle.
  */
class ClusteringSpanSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Double])*) =
    rows.toSeq.toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))

  test("kmeansLloyd separates two obvious clusters and lowers inertia") {
    // two tight blobs around (0,0) and (10,10); stride init (step 4)
    // seeds one centroid in each blob (ids 0 and 4)
    val df = vecs(
      0L -> Seq(0.0, 0.1), 1L -> Seq(0.1, 0.0), 2L -> Seq(-0.1, 0.1),
      3L -> Seq(0.2, 0.1), 4L -> Seq(10.0, 10.1), 5L -> Seq(10.1, 9.9),
      6L -> Seq(9.9, 10.0), 7L -> Seq(10.2, 10.1))

    def inertia(iters: Int): Double = {
      val cents = Clustering.kmeansLloyd(df, "vec_id", "embedding", 4, iters)
      Clustering.cellSummary(
        Clustering.assignCells(df, "vec_id", "embedding", cents))
        .agg(sum($"inertia")).as[Double].head()
    }

    val cents1 = Clustering.kmeansLloyd(df, "vec_id", "embedding", 4, 2)
    val asg = Clustering.assignCells(df, "vec_id", "embedding", cents1)
      .select($"vec_id", $"cell").as[(Long, Long)].collect().toMap
    assert(Set(0L, 1L, 2L, 3L).map(asg) == Set(0L))
    assert(Set(4L, 5L, 6L, 7L).map(asg) == Set(1L))
    // Lloyd's invariant: inertia never increases with more iterations
    assert(inertia(1) <= inertia(0) + 1e-9)
    assert(inertia(2) <= inertia(1) + 1e-9)
  }

  test("kmeansLloyd centroids are the rounded member means") {
    val df = vecs(0L -> Seq(1.0, 3.0), 1L -> Seq(3.0, 5.0), 2L -> Seq(1.2, 3.2))
    // step 10 → single centroid from id 0; one iteration → global mean
    val cents = Clustering.kmeansLloyd(df, "vec_id", "embedding", 10, 1)
      .as[(Long, Seq[Double])].collect()
    assert(cents.toSeq == Seq((0L, Seq(
      BigDecimal((1.0 + 3.0 + 1.2) / 3).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      BigDecimal((3.0 + 5.0 + 3.2) / 3).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))))
  }

  private def docs(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")

  test("duplicateNgramSpans finds shared 8-gram runs and merges overlaps") {
    val shared = "a b c d e f g h i" // 9 tokens → 8-grams at pos 0 and 1
    val df = docs(
      1L -> s"$shared x y z",
      2L -> s"p q $shared",
      3L -> "totally unique tokens here with no duplicate eight gram run at all")
    val spans = TextDedup.duplicateNgramSpans(df, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    // doc 1: positions 0..8 covered (two overlapping windows merge);
    // doc 2: offset by the "p q" prefix → 2..10; doc 3: nothing
    assert(spans == Set((1L, 0L, 8L), (2L, 2L, 10L)))
  }

  test("duplicateNgramSpans counts repeats inside one document") {
    val run = "one two three four five six seven eight"
    val df = docs(7L -> s"$run filler filler filler filler filler filler filler filler $run")
    val spans = TextDedup.duplicateNgramSpans(df, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    assert(spans == Set((7L, 0L, 7L), (7L, 16L, 23L)))
  }

  test("removeDuplicateSpans keeps only uncovered tokens; full-dup docs vanish") {
    val shared = "a b c d e f g h"
    val df = docs(1L -> s"$shared tail1 tail2", 2L -> shared)
    val out = TextDedup.removeDuplicateSpans(df, "doc_id", "text")
      .as[(Long, Long, String)].collect().toMap2
    assert(out == Map(1L -> (2L, "tail1 tail2")))
  }

  test("epochShuffle is a deterministic permutation; seeds reorder") {
    val df = (0L until 100L).toDF("doc_id")
    val e0 = Curation.epochShuffle(df, "doc_id", "ep0", 8)
    val again = Curation.epochShuffle(df, "doc_id", "ep0", 8)
    assert(e0.collect().toSet == again.collect().toSet)
    // permutation: every id exactly once, positions dense 1..n per shard
    assert(e0.select($"doc_id").distinct().count() == 100)
    val dense = e0.groupBy($"shard")
      .agg(count(lit(1)).as("n"), max($"pos").as("mx"), min($"pos").as("mn"))
      .filter($"mx" =!= $"n" || $"mn" =!= 1)
    assert(dense.isEmpty)
    // a different seed produces a different order
    val e1 = Curation.epochShuffle(df, "doc_id", "ep1", 8)
    val o0 = e0.orderBy($"shard", $"pos").select($"doc_id").as[Long].collect().toSeq
    val o1 = e1.orderBy($"shard", $"pos").select($"doc_id").as[Long].collect().toSeq
    assert(o0 != o1)
  }

  test("importanceSample: weight 1 keeps all, 0 keeps none, expectation ~ sum of weights") {
    val df = (0L until 1000L).toDF("doc_id")
    assert(Curation.importanceSample(df, "doc_id", lit(1.0), "s").count() == 1000)
    assert(Curation.importanceSample(df, "doc_id", lit(0.0), "s").count() == 0)
    val half = Curation.importanceSample(df, "doc_id", lit(0.5), "s").count()
    assert(half > 400 && half < 600, s"kept $half of expected ~500")
    // deterministic: same seed = same set; different seed = different set
    val a = Curation.importanceSample(df, "doc_id", lit(0.5), "s").as[Long].collect().toSet
    val b = Curation.importanceSample(df, "doc_id", lit(0.5), "s").as[Long].collect().toSet
    val c = Curation.importanceSample(df, "doc_id", lit(0.5), "t").as[Long].collect().toSet
    assert(a == b && a != c)
  }

  test("pageRank: uniform on a cycle, sink-heavy on a star, mass conserved") {
    import spark.implicits._
    // 4-cycle: perfectly symmetric → all ranks equal
    val cycle = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)).toDF("src", "dst")
    val cr = DupGraph.pageRank(cycle).select($"pagerank_e9").as[Long].collect()
    assert(cr.toSet.size == 1 && cr.length == 4)
    // star into node 9 (+ return edges so nothing dangles): center wins
    val star = (0L until 5L).flatMap(i => Seq((i, 9L), (9L, i))).toDF("src", "dst")
    val sr = DupGraph.pageRank(star)
      .select($"node", $"pagerank_e9").as[(Long, Long)].collect().toMap
    assert((0L until 5L).forall(i => sr(9L) > sr(i)))
    // fixed-point floor division only leaks mass downward: total within
    // iters * nodes ulps of the scale
    assert(math.abs(sr.values.sum - 1000000000L) <= 3 * 6)
    // dangling node: 0→1, 1 has no out-edges; mass must not vanish
    val dang = Seq((0L, 1L)).toDF("src", "dst")
    val dr = DupGraph.pageRank(dang).select($"pagerank_e9").as[Long].collect()
    assert(dr.sum > 900000000L, s"dangling mass lost: ${dr.toSeq}")
  }

  test("knnClassify: separable blobs classify perfectly; vote ties break low") {
    val blobA = (0L until 4L).map(i => (i, Seq(0.0 + i * 0.01, 0.0), 0L))
    val blobB = (4L until 8L).map(i => (i, Seq(5.0 + i * 0.01, 5.0), 1L))
    val df = (blobA ++ blobB).toDF("vec_id", "embedding", "label")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"), $"label")
    val out = Similarity.knnClassify(df, df, "vec_id", "embedding", "label", k = 3)
      .select($"query_id", $"pred_label").as[(Long, Long)].collect().toMap
    assert((0L until 4L).forall(out(_) == 0L))
    assert((4L until 8L).forall(out(_) == 1L))
  }

  test("nearestCentroidConfusion: separable labels give a diagonal matrix") {
    val rows = (0L until 4L).map(i => (i, Seq(0.0, 0.1 * i), 0L)) ++
      (4L until 8L).map(i => (i, Seq(9.0, 0.1 * i), 1L))
    val df = rows.toDF("vec_id", "embedding", "label")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"), $"label")
    val conf = Clustering.nearestCentroidConfusion(df, "vec_id", "embedding", "label")
      .as[(Long, Long, Long)].collect().toSet
    assert(conf == Set((0L, 0L, 4L), (1L, 1L, 4L)))
  }

  test("assignCells ranks a null distance (ragged centroid) last, like the old window") {
    // centroid 1 is 3-dim → sqDist against a 2-dim vector is null; the
    // pre-rewrite asc-nulls-last window made the real-distance centroid
    // win regardless of cell id — a null struct field would flip that
    val cents = Seq(
      (1L, Seq(0.0, 0.0, 0.0)), (2L, Seq(5.0, 5.0)))
      .toDF("cell", "cv")
    val df = Seq((10L, Seq(1.0f, 1.0f))).toDF("vec_id", "embedding")
    val out = Clustering.assignCells(df, "vec_id", "embedding", cents)
      .select("cell").as[Long].collect().toSeq
    assert(out == Seq(2L), s"null-distance centroid must rank last, got $out")
  }

  test("assignCells plans with no shuffle: the argmin is in-row over broadcast centroids") {
    val rows = (0L until 64L).map(i => (i, Seq(0.1 * i, 1.0)))
    val df = rows.toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val cents = Clustering.strideInit(df, "vec_id", "embedding", centroidStep = 16)
    val assigned = Clustering.assignCells(df, "vec_id", "embedding", cents)
    // the assignment pass itself must not exchange the corpus — the
    // only allowed movement is the broadcast of the 1-row centroid
    // array (this pinned the round-8 fix: a row_number window here
    // cost one full corpus shuffle-and-sort per Lloyd iteration)
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
      s"assignment plan re-introduced a shuffle:\n$plan")
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected a broadcast of the centroid array:\n$plan")
  }

  test("vocabCoverage: ranks by frequency, cum_share reaches 1 at full vocab") {
    val df = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val cov = Curation.vocabCoverage(df, "text", k = 10)
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(cov == Seq(
      (1L, "a", 3L, 0.5), (2L, "b", 2L, 0.833333), (3L, "c", 1L, 1.0)))
  }

  private implicit class TupleMap(rows: Array[(Long, Long, String)]) {
    def toMap2: Map[Long, (Long, String)] =
      rows.map { case (id, n, t) => id -> (n, t) }.toMap
  }
}
