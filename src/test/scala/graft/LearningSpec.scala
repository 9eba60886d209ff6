package graft

import graft.operators.{Curation, Learning, Sketches}
import org.apache.spark.sql.functions._

/** Invariants for the learned-scoring / membership / concentration
  * operators that the DuckDB oracles (q126-q132) certify numerically:
  * here we pin the MATH properties — GD separates separable data, AUC
  * hits its closed-form extremes, KS is 0 against itself, Bloom never
  * false-negatives, HRW moves only into the new shard, Gini and the
  * Pareto front match hand-computed answers.
  */
class LearningSpec extends SparkSpec {
  import spark.implicits._

  private def sep = {
    // linearly separable on dim 0: x0 = (2y-1) +/- 0.25
    val rows = (0 until 40).map { i =>
      val y = i % 2
      (i.toLong, Array((2 * y - 1) + (if (i % 4 < 2) 0.25f else -0.25f), 0.0f), y.toDouble)
    }
    rows.toDF("id", "vec", "y")
  }

  test("logisticRegressionGD separates separable data and improves accuracy") {
    val out = Learning.logisticRegressionGD(sep, "vec", "y", nDims = 2, iters = 5, lr = 1.0)
      .collect()
    assert(out.length == 3) // 2 dims + bias
    val acc = out.head.getAs[Double]("accuracy")
    assert(acc == 1.0, s"separable data must reach accuracy 1.0, got $acc")
    val w0 = out.find(_.getAs[Long]("dim") == 0).get.getAs[Double]("weight")
    assert(w0 > 0, "weight on the separating dim must be positive")
  }

  test("aucRankSum is 1 for perfect ranking, 0.5 under label-free scores") {
    val perfect = Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)).toDF("s", "y")
    assert(Learning.aucRankSum(perfect, "s", "y").collect().head
      .getAs[Double]("auc") == 1.0)
    // all scores tied -> every pair is a coin flip -> exactly 0.5
    val tied = Seq((0.5, 1), (0.5, 1), (0.5, 0), (0.5, 0)).toDF("s", "y")
    assert(Learning.aucRankSum(tied, "s", "y").collect().head
      .getAs[Double]("auc") == 0.5)
  }

  test("aucRankSum matches the pair-counting definition with ties") {
    val df = Seq((0.1, 0), (0.3, 0), (0.3, 1), (0.7, 1), (0.9, 0)).toDF("s", "y")
    // pairs (pos > neg): (0.3,1) beats 0.1; (0.7,1) beats 0.1,0.3; tie (0.3 vs 0.3) = 0.5
    // auc = (1 + 2 + 0.5) / (2*3)
    val got = Learning.aucRankSum(df, "s", "y").collect().head
    assert(got.getAs[Double]("auc") == math.rint(3.5 / 6.0 * 1e6) / 1e6)
    assert(got.getAs[Long]("n_pos") == 2 && got.getAs[Long]("n_neg") == 3)
  }

  test("ksTwoSample is 0 for identical samples, 1 for disjoint supports") {
    val same = Seq(("a", 1.0), ("b", 1.0), ("a", 2.0), ("b", 2.0)).toDF("g", "v")
    assert(Learning.ksTwoSample(same, "v", "g", "a", "b").collect().head
      .getAs[Double]("ks_stat") == 0.0)
    val disjoint = Seq(("a", 1.0), ("a", 2.0), ("b", 5.0), ("b", 6.0)).toDF("g", "v")
    assert(Learning.ksTwoSample(disjoint, "v", "g", "a", "b").collect().head
      .getAs[Double]("ks_stat") == 1.0)
  }

  test("bloomProbe has no false negatives and bounded false positives") {
    val members = (0L until 200L).toDF("key")
    val bloom = Sketches.bloomBuild(members, "key", k = 5, m = 4096)
    val probes = (0L until 1000L).toDF("key")
    val flags = Sketches.bloomProbe(bloom, probes, "key", k = 5, m = 4096)
    val fn = flags.filter($"key" < 200 && !$"bloom_pos").count()
    assert(fn == 0, "a Bloom filter must never reject a member")
    val fp = flags.filter($"key" >= 200 && $"bloom_pos").count()
    // m=4096, k=5, n=200 -> theoretical fp ~ (1-e^{-kn/m})^5 ~ 2e-4
    assert(fp <= 8, s"false-positive count $fp far above the 4096-bit design rate")
  }

  test("rendezvousShard moves keys ONLY into the new shard on grow") {
    val keys = (0L until 500L).toDF("k")
    val both = Curation.rendezvousShard(keys, "k", 8).withColumnRenamed("shard", "s8")
      .transform(Curation.rendezvousShard(_, "k", 9))
    val moved = both.filter($"s8" =!= $"shard")
    assert(moved.filter($"shard" =!= 8).count() == 0,
      "HRW growth may only move keys to the added shard")
    val movedN = moved.count()
    assert(movedN > 20 && movedN < 120, s"~1/9 of 500 keys should move, got $movedN")
    // every shard id in range and populated
    assert(both.select("shard").distinct().count() == 9)
  }

  test("giniBySource: equal sizes -> 0; one-holds-all is maximal") {
    val equal = Seq(("s", 10), ("s", 10), ("s", 10), ("s", 10)).toDF("src", "n")
    assert(Curation.giniBySource(equal, "src", "n").collect().head
      .getAs[Double]("gini") == 0.0)
    val skewed = Seq(("s", 0), ("s", 0), ("s", 0), ("s", 100)).toDF("src", "n")
    // G = 2*(4*100)/(4*100) - 5/4 = 0.75 (the n=4 maximum)
    assert(Curation.giniBySource(skewed, "src", "n").collect().head
      .getAs[Double]("gini") == 0.75)
  }

  test("calibrationBins partitions all predictions and clamps p = 1.0") {
    val preds = Seq((0.05, 0.0), (0.12, 0.0), (0.5, 1.0), (0.97, 1.0), (1.0, 1.0))
      .toDF("p", "y")
    val bins = Learning.calibrationBins(preds, "p", "y", bins = 10).collect()
    assert(bins.map(_.getAs[Long]("n")).sum == 5)
    // p = 1.0 must land in the top bin (9), not a phantom bin 10
    assert(bins.map(_.getAs[Long]("bin")).max == 9)
    val b0 = bins.find(_.getAs[Long]("bin") == 0).get
    assert(b0.getAs[Double]("frac_pos") == 0.0 && b0.getAs[Long]("n") == 1)
  }

  test("chi2Presence: independent item has chi2 0, perfect discriminator is maximal") {
    // 4 docs in cls a, 4 in cls b; "both" appears once per class pair,
    // "onlya" in every a-doc only, "alldocs" everywhere (degenerate)
    val pairs = Seq(
      ("both", "a"), ("both", "a"), ("both", "b"), ("both", "b"),
      ("onlya", "a"), ("onlya", "a"), ("onlya", "a"), ("onlya", "a")) ++
      Seq("a", "a", "a", "a", "b", "b", "b", "b").map(("alldocs", _))
    val tot = Seq(("a", 4L), ("b", 4L)).toDF("cls", "n_cls")
    val out = Learning.chi2Presence(pairs.toDF("item", "cls"), tot).collect()
    val byItem = out.map(r => r.getAs[String]("item") -> r.getAs[Double]("chi2")).toMap
    assert(byItem("both") == 0.0, "class-balanced item must have chi2 = 0")
    assert(byItem("onlya") == 8.0, "perfect 4/4-vs-0/4 discriminator: chi2 = N")
    assert(!byItem.contains("alldocs"), "degenerate everywhere-item excluded")
  }

  test("mutualInfo: independence gives 0; identical columns give MI = H") {
    val ind = Seq(("x", "u"), ("x", "v"), ("y", "u"), ("y", "v")).toDF("a", "b")
    val r1 = Learning.mutualInfo(ind, "a", "b").collect().head
    assert(r1.getAs[Double]("mi") == 0.0)
    val same = Seq(("x", "x"), ("x", "x"), ("y", "y"), ("z", "z")).toDF("a", "b")
    val r2 = Learning.mutualInfo(same, "a", "b").collect().head
    assert(r2.getAs[Double]("mi") == r2.getAs[Double]("h_a"))
    assert(r2.getAs[Double]("h_a") == r2.getAs[Double]("h_b"))
  }

  test("ndcg: ideal order gives 1, reversed relevance is scored below it") {
    import graft.operators.Retrieval
    val ideal = Seq((1L, 1L, 1.0), (1L, 2L, 1.0), (1L, 3L, 0.0)).toDF("query_id", "rank", "rel")
    assert(Retrieval.ndcg(ideal).collect().head.getAs[Double]("ndcg") == 1.0)
    val worst = Seq((1L, 1L, 0.0), (1L, 2L, 0.0), (1L, 3L, 1.0)).toDF("query_id", "rank", "rel")
    val w = Retrieval.ndcg(worst).collect().head
    assert(w.getAs[Double]("ndcg") == math.rint(1.0 / 2.0 * 1e6) / 1e6,
      "single hit at rank 3: dcg = 1/log2(4) = 0.5, idcg = 1")
    val none = Seq((1L, 1L, 0.0), (1L, 2L, 0.0)).toDF("query_id", "rank", "rel")
    assert(Retrieval.ndcg(none).collect().head.getAs[Double]("ndcg") == 0.0)
  }

  test("kCenterGreedy picks farthest-first with non-increasing radius") {
    import graft.operators.Clustering
    // 1-D line: 0, 1, 10, 11, 20 — greedy from min id (x=0):
    // next 20 (d=20), then 10 (d=10 -> min(10, |10-20|=10)=10), ...
    val pts = Seq((0L, Array(0.0f)), (1L, Array(1.0f)), (2L, Array(10.0f)),
      (3L, Array(11.0f)), (4L, Array(20.0f))).toDF("id", "v")
    val out = Clustering.kCenterGreedy(pts, "id", "v", k = 3)
      .orderBy("step").collect()
    assert(out.map(_.getAs[Long]("center_id")).toSeq == Seq(0L, 4L, 2L))
    val radii = out.map(_.getAs[Double]("radius")).toSeq
    assert(radii == Seq(20.0, 10.0, 1.0))
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a },
      "coverage radius must be non-increasing")
  }

  test("bestStumpSplits finds the perfect separator and its gain") {
    // dim 0 separates perfectly at 0.0 (x = -1 -> y=0, x = 1 -> y=1);
    // dim 1 is constant (no informative split survives the filter)
    val rows = (0 until 20).map { i =>
      val y = i % 2
      (Array((2 * y - 1).toFloat, 1.0f), y.toDouble)
    }
    val out = Learning.bestStumpSplits(rows.toDF("vec", "y"), "vec", "y", nDims = 2)
      .collect().map(r => r.getAs[Long]("dim") -> r).toMap
    val d0 = out(0L)
    assert(d0.getAs[Double]("threshold") == -1.0)
    // perfect split: gain = parent entropy = ln 2
    assert(d0.getAs[Double]("gain") == math.rint(math.log(2) * 1e6) / 1e6)
    assert(d0.getAs[Long]("n_left") == 10 && d0.getAs[Long]("n_right") == 10)
    assert(!out.contains(1L), "constant dim has no valid split (nl < n never holds)")
  }

  test("naiveBayesConfusion is diagonal on disjoint vocabularies") {
    val docs = Seq(
      (1L, "apple banana apple", "fruit"), (2L, "banana apple", "fruit"),
      (3L, "iron copper zinc", "metal"), (4L, "copper iron", "metal"))
      .toDF("id", "text", "cls")
    val cm = Learning.naiveBayesConfusion(docs, "id", "text", "cls")
      .collect().map(r => (r.getAs[String]("cls"), r.getAs[String]("pred")) ->
        r.getAs[Long]("n")).toMap
    assert(cm == Map(("fruit", "fruit") -> 2L, ("metal", "metal") -> 2L))
  }

  test("naiveBayesConfusion: vector, wide-grid, and distributed paths agree") {
    // overlapping vocabularies + a class imbalance so priors matter;
    // force each strategy through the guard parameters
    val docs = Seq(
      (1L, "red blue red green", "a"), (2L, "blue blue green", "a"),
      (3L, "red red yellow", "b"), (4L, "yellow green blue red", "b"),
      (5L, "green green red", "a"), (6L, "yellow yellow", "c"))
      .toDF("id", "text", "cls")
    def cm(maxNonzero: Int, maxVec: Int) =
      Learning.naiveBayesConfusion(docs, "id", "text", "cls",
        maxLocalNonzero = maxNonzero, maxVectorClasses = maxVec)
        .collect().map(r => (r.getAs[String]("cls"), r.getAs[String]("pred")) ->
          r.getAs[Long]("n")).toMap
    val vector = cm(300000, 64)   // token-ll-vector fast path
    val wideGrid = cm(300000, 0)  // closed model, grid join path
    val dist = cm(0, 64)          // distributed scale path
    assert(vector == wideGrid, s"vector=$vector wideGrid=$wideGrid")
    assert(vector == dist, s"vector=$vector dist=$dist")
    assert(vector.values.sum == 6L)
  }

  test("naiveBayesConfusion accepts a non-string class column") {
    // int labels: the driver-local model grid collects the class
    // column with getString — must be cast, not ClassCastException'd
    val docs = Seq(
      (1L, "apple banana apple", 0), (2L, "banana apple", 0),
      (3L, "iron copper zinc", 1), (4L, "copper iron", 1))
      .toDF("id", "text", "cls")
    val cm = Learning.naiveBayesConfusion(docs, "id", "text", "cls")
      .collect().map(r => (r.getAs[String]("cls"), r.getAs[String]("pred")) ->
        r.getAs[Long]("n")).toMap
    assert(cm == Map(("0", "0") -> 2L, ("1", "1") -> 2L))
  }

  test("splitConformal picks the right order statistic and scores coverage") {
    // cal scores 1..10, alpha=0.2 -> k = ceil(11*0.8) = 9 -> qhat = 9
    val cal = (1 to 10).map(_.toDouble).toDF("s")
    val test = Seq(0.5, 5.0, 9.0, 9.5, 20.0).toDF("s")
    val r = Learning.splitConformal(cal, test, "s", alpha = 0.2).collect().head
    assert(r.getAs[Double]("qhat") == 9.0)
    assert(r.getAs[Long]("n_cal") == 10 && r.getAs[Long]("n_test") == 5)
    assert(r.getAs[Double]("coverage") == 0.6) // 0.5, 5, 9 covered
    // alpha tiny -> qhat = max score
    val r2 = Learning.splitConformal(cal, test, "s", alpha = 0.01).collect().head
    assert(r2.getAs[Double]("qhat") == 10.0)
  }

  test("mmrSelect trades relevance for diversity") {
    import graft.operators.Retrieval
    // query 1: a(rel .9); b(rel .89) is a near-dup of a; c(rel .6) diverse
    val cand = Seq((1L, 10L, 0.9), (1L, 11L, 0.89), (1L, 12L, 0.6))
      .toDF("query_id", "cand_id", "rel")
    val sims = Seq(
      (1L, 10L, 11L, 0.99), (1L, 11L, 10L, 0.99),
      (1L, 10L, 12L, 0.1), (1L, 12L, 10L, 0.1),
      (1L, 11L, 12L, 0.1), (1L, 12L, 11L, 0.1))
      .toDF("query_id", "a", "b", "s")
    val picks = Retrieval.mmrSelect(cand, sims, k = 2)
      .orderBy("step").select("cand_id").as[Long].collect().toSeq
    // plain top-2 by relevance is (10, 11); MMR's step-2 scores:
    // b = 7*890000 - 3*990000 = 3,260,000 < c = 7*600000 - 3*100000 = 3,900,000
    assert(picks == Seq(10L, 12L))
  }

  test("mmrSelect treats missing pairSims rows as similarity 0") {
    import graft.operators.Retrieval
    // sparse sims: only the (a, b) near-dup pair is supplied; c has NO
    // similarity row to anything. c must still be eligible (sim 0), and
    // with zero diversity penalty it beats the penalized near-dup b.
    val cand = Seq((1L, 10L, 0.9), (1L, 11L, 0.89), (1L, 12L, 0.6))
      .toDF("query_id", "cand_id", "rel")
    val sparse = Seq((1L, 10L, 11L, 0.99), (1L, 11L, 10L, 0.99))
      .toDF("query_id", "a", "b", "s")
    val picks = Retrieval.mmrSelect(cand, sparse, k = 3)
      .orderBy("step").select("cand_id").as[Long].collect().toSeq
    // step2: b = 7*890000 - 3*990000 = 3.26e6 < c = 7*600000 - 0 = 4.2e6
    assert(picks == Seq(10L, 12L, 11L))
  }

  test("brierDecomposition hits its closed-form extremes") {
    // perfect confident predictions: brier 0, no miscalibration,
    // resolution equals the data uncertainty
    val perfect = Seq((1.0, 1.0), (1.0, 1.0), (0.0, 0.0), (0.0, 0.0)).toDF("p", "y")
    val r = Learning.brierDecomposition(perfect, "p", "y", bins = 10).collect().head
    assert(r.getAs[Double]("brier") == 0.0)
    assert(r.getAs[Double]("reliability") == 0.0)
    assert(r.getAs[Double]("resolution") == r.getAs[Double]("uncertainty"))
    assert(r.getAs[Double]("uncertainty") == 0.25)
    // constant base-rate prediction: calibrated but zero discrimination
    val flat = Seq((0.5, 1.0), (0.5, 0.0), (0.5, 1.0), (0.5, 0.0)).toDF("p", "y")
    val f = Learning.brierDecomposition(flat, "p", "y", bins = 10).collect().head
    assert(f.getAs[Double]("brier") == 0.25)
    assert(f.getAs[Double]("reliability") == 0.0 && f.getAs[Double]("resolution") == 0.0)
  }

  test("scalar evaluators exclude null scores instead of ranking them") {
    val auc = Seq((Some(0.9), 1), (None, 1), (Some(0.1), 0), (None, 0))
      .toDF("s", "y")
    val r = Learning.aucRankSum(auc, "s", "y").collect().head
    assert(r.getAs[Double]("auc") == 1.0 && r.getAs[Long]("n_pos") == 1)
    val ks = Seq(("a", Some(1.0)), ("a", None), ("b", Some(1.0)), ("b", None))
      .toDF("g", "v")
    assert(Learning.ksTwoSample(ks, "v", "g", "a", "b").collect().head
      .getAs[Double]("ks_stat") == 0.0)
    val gini = Seq(("s", Some(10)), ("s", Some(10)), ("s", None)).toDF("src", "n")
    val g = Curation.giniBySource(gini, "src", "n").collect().head
    assert(g.getAs[Double]("gini") == 0.0 && g.getAs[Long]("n_docs") == 2)
  }

  test("paretoFront2D keeps exactly the non-dominated points") {
    val pts = Seq((1L, 5.0, 5L), (2L, 4.0, 9L), (3L, 3.0, 1L), (4L, 5.0, 4L),
      (5L, 2.0, 9L)).toDF("id", "x", "y")
    val front = Curation.paretoFront2D(pts, "x", "y", Seq("id"))
      .select("id").as[Long].collect().toSet
    // (5,5) dominates (5,4); (4,9) dominates (3,1) and (2,9)
    assert(front == Set(1L, 2L))
  }
}
