package graft

import graft.operators.{Quantiles, SeriesStats, Similarity}
import org.apache.spark.sql.functions._

/** Round-5 additions: per-group quantile gating, trailing EWMA, and
  * dimension-truncation recall.
  */
class SeriesRecallSpec extends SparkSpec {
  import spark.implicits._

  test("quantileGate flags exactly the rows under their group's quantile") {
    val df = ((1 to 10).map(v => ("a", v.toLong)) ++
      Seq.fill(5)(("b", 7L))).toDF("grp", "v")
    val gated = Quantiles.quantileGate(df, "grp", "v", 0.1, "p10")
      .select($"grp", $"v", $"p10").as[(String, Long, Double)].collect()
    // group a: p10 of 1..10 = 1.9 → only v=1 flagged; group b: all
    // values equal the threshold → strictly-below flags nothing
    assert(gated.toSeq == Seq(("a", 1L, 1.9)))
  }

  test("ewmaTrailing matches hand computation and skips null values") {
    val df = Seq(
      (1L, 1L, Some(1.0)), (1L, 2L, Some(2.0)), (1L, 3L, Some(4.0)),
      (2L, 1L, Some(1.0)), (2L, 2L, None), (2L, 3L, Some(4.0))
    ).toDF("u", "seq", "value")
    val r = df.select($"u", $"seq",
      SeriesStats.ewmaTrailing(Seq("u"), Seq("seq"), "value").as("e"))
      .orderBy($"u", $"seq").as[(Long, Long, Double)].collect()
    // user 1: 1/1; (2+.5)/1.5; (4+1+.25)/1.75
    assert(r(0)._3 == 1.0 && r(1)._3 == 1.666667 && r(2)._3 == 3.0)
    // user 2: null row contributes to neither side; its own row
    // renormalizes over the surviving lags
    assert(r(3)._3 == 1.0 && r(4)._3 == 1.0 && r(5)._3 == 3.4)
  }

  private def vecs(rows: (Long, Seq[Double])*) =
    rows.toSeq.toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))

  test("truncationRecall is 1 at full dims and catches prefix-misled rankings") {
    // query 0: full-dim nearest is 1 (second dim dominates), but the
    // first dim alone inverts the ranking toward 2
    val emb = vecs(
      0L -> Seq(0.1, 10.0),
      1L -> Seq(-0.1, 10.0),
      2L -> Seq(0.1, -10.0))
    val q = emb.filter($"vec_id" === 0)
    val full = Similarity.truncationRecall(emb, q, "vec_id", "embedding",
      prefixDims = 2, k = 1).as[(Long, Long, Double)].head()
    assert(full == ((0L, 1L, 1.0)))
    val pre = Similarity.truncationRecall(emb, q, "vec_id", "embedding",
      prefixDims = 1, k = 1).as[(Long, Long, Double)].head()
    assert(pre == ((0L, 0L, 0.0)))
  }

  test("sampleQueriesByHashRank: deterministic fixed-K sample; K >= n is the identity; " +
    "sampled kNN == exact kNN restricted to the sample") {
    val emb = vecs((0L to 19L).map(i =>
      i -> Seq(math.cos(i * 0.7), math.sin(i * 0.7), (i % 5).toDouble)): _*)
      .withColumn("label", pmod($"vec_id", lit(3)))
    val s1 = Similarity.sampleQueriesByHashRank(emb, "vec_id", "t5", 6)
      .select($"vec_id").as[Long].collect().sorted.toSeq
    val s2 = Similarity.sampleQueriesByHashRank(emb, "vec_id", "t5", 6)
      .select($"vec_id").as[Long].collect().sorted.toSeq
    assert(s1 == s2 && s1.size == 6)
    // a different seed draws a different set (not a degenerate prefix)
    val s3 = Similarity.sampleQueriesByHashRank(emb, "vec_id", "other", 6)
      .select($"vec_id").as[Long].collect().sorted.toSeq
    assert(s1 != (0L until 6L).toSeq || s3 != s1)
    // K >= n keeps every row — the sampled formulation degrades to exact
    val all = Similarity.sampleQueriesByHashRank(emb, "vec_id", "t5", 100)
      .select($"vec_id").as[Long].collect().sorted.toSeq
    assert(all == (0L to 19L).toSeq)
    // exact-over-sampled-queries == the full run filtered to the sample
    val sampled = Similarity.knnClassify(
        emb, Similarity.sampleQueriesByHashRank(emb, "vec_id", "t5", 6),
        "vec_id", "embedding", "label", k = 3)
      .orderBy($"query_id").collect().toSeq
    val restricted = Similarity.knnClassify(emb, emb, "vec_id", "embedding", "label", k = 3)
      .filter($"query_id".isin(s1: _*))
      .orderBy($"query_id").collect().toSeq
    assert(sampled == restricted)
  }

  test("lshTopK refuses a corpus-sized query frame (broadcast contract guard)") {
    val emb = vecs((0L to 30L).map(i => i -> Seq(i.toDouble, 1.0)): _*)
    val e = intercept[IllegalArgumentException](
      Similarity.lshTopK(emb, emb, "vec_id", "embedding", k = 2,
        maxBroadcastQueries = 10))
    assert(e.getMessage.contains("maxBroadcastQueries"))
    // under the bound the guard is silent and results flow
    assert(Similarity.lshTopK(emb, emb.filter($"vec_id" < 3), "vec_id", "embedding",
      k = 2, maxBroadcastQueries = 10).count() >= 0L)
  }
}
