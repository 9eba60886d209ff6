package graft

import org.apache.spark.sql.functions._

/** Approximate aggregates — the sketch-based scale path for
  * cardinality and quantiles. No cross-engine oracle (HLL++ and
  * t-digest internals differ per engine); verified against exact
  * results within their error bounds instead.
  */
class ApproxAggSpec extends SparkSpec {

  import spark.implicits._

  private lazy val li = Tables.lineitem(spark, "/root/testdata/sf0.01").cache()

  test("approx_count_distinct within 5% of exact") {
    val exact = li.select(countDistinct($"l_partkey")).as[Long].head()
    val approx = li.select(approx_count_distinct($"l_partkey", 0.02)).as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("approx_percentile within 2% of exact interpolated percentile") {
    val exact = li.select(expr("percentile(l_extendedprice, 0.5)")).as[Double].head()
    val approx = li.select(expr("approx_percentile(l_extendedprice, 0.5, 1000)")).as[Double].head()
    assert(math.abs(approx - exact) / exact < 0.02, s"approx=$approx exact=$exact")
  }
}
