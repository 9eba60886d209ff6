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

  test("HLL sketches build per shard and MERGE to the global estimate") {
    // the 100 TB pattern: per-partition/per-day sketch state persisted
    // as BINARY, unioned later without touching the raw data again —
    // Spark 4's Apache DataSketches HLL surface
    val exact = li.select(countDistinct($"l_partkey")).as[Long].head()
    val shards = li.withColumn("_shard", pmod($"l_orderkey", lit(8)))
      .groupBy($"_shard")
      .agg(expr("hll_sketch_agg(l_partkey, 14)").as("sk"))
    assert(shards.count() == 8)
    val merged = shards
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .as[Double].head()
    assert(math.abs(merged - exact) / exact < 0.03,
      s"merged=$merged exact=$exact")
    // sketch of a shard alone must estimate that shard's cardinality
    val shard0 = li.filter(pmod($"l_orderkey", lit(8)) === 0)
    val ex0 = shard0.select(countDistinct($"l_partkey")).as[Long].head()
    val est0 = shard0
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(l_partkey, 14))").as("e"))
      .as[Double].head()
    assert(math.abs(est0 - ex0) / ex0 < 0.03, s"est0=$est0 ex0=$ex0")
  }
}
