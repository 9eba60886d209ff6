package graft

import graft.operators.SkewTools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class SkewAndExtensionsSpec extends SparkSpec {

  import spark.implicits._

  test("saltedAggregate == direct groupBy on a skewed key") {
    val df = ((1 to 5000).map(i => ("hot", i.toDouble)) ++
      (1 to 100).map(i => (s"cold$i", i.toDouble))).toDF("k", "v")
    val direct = df.groupBy($"k")
      .agg(sum($"v").as("total"), count(lit(1)).as("cnt"))
      .as[(String, Double, Long)].collect().toSet
    val salted = SkewTools.saltedAggregate(df, Seq("k"), 16)(
      Seq(sum($"v").as("s"), count(lit(1)).as("c")),
      Seq(sum($"s").as("total"), sum($"c").as("cnt")))
      .as[(String, Double, Long)].collect().toSet
    assert(salted == direct)
  }

  test("saltedJoin == direct join, including rows per hot key") {
    val fact = ((1 to 3000).map(_ => 1L) ++ Seq(2L, 3L)).toDF("k")
    val dim = Seq((1L, "one"), (2L, "two"), (4L, "four")).toDF("k", "name")
    val direct = fact.join(dim, Seq("k")).groupBy($"k", $"name").count()
      .as[(Long, String, Long)].collect().toSet
    val salted = SkewTools.saltedJoin(fact, dim, Seq("k"), 8).groupBy($"k", $"name").count()
      .as[(Long, String, Long)].collect().toSet
    assert(salted == direct)
    assert(direct.contains((1L, "one", 3000L)))
  }

  test("runtime bloom-filter join pruning engages on selective shuffle joins") {
    // at 100 TB a selective dim-side filter should prune fact rows
    // BEFORE the shuffle via an injected runtime bloom filter; verify
    // the engine configuration supports it (thresholds lowered to
    // trigger at test scale, AQE's broadcast preference disabled for
    // the plan to keep the shuffle join the bloom filter needs)
    val dir = "/root/testdata/sf0.001"
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtimeFilter.number.threshold" -> "10",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = Tables.lineitem(spark, dir)
      val sel = Tables.orders(spark, dir).filter($"o_orderpriority" === "1-URGENT")
        .select($"o_orderkey")
      val joined = li.join(sel, li("l_orderkey") === sel("o_orderkey"))
        .groupBy().agg(sum($"l_quantity").as("q"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter") || plan.contains("BloomFilter"),
        s"runtime bloom filter not injected:\n$plan")
      assert(joined.head().getAs[Number](0).doubleValue > 0)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("GraftExtensions installs every native function builder") {
    // a fresh session cannot be built in a JVM that already has one
    // (getOrCreate would return it, silently skipping extensions), so
    // drive the injection hook directly with a real extensions object
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(ext) // must not throw
    // and the same builders are live in SQL via the imperative path
    graft.functions.GraftFunctions.register(spark)
    val n = spark.sql(
      "SELECT graft_simhash60(graft_hashed_shingles('a b c d e', 2)) AS h")
      .collect().head.getLong(0)
    assert(n != 0L)
  }
}
