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
}
