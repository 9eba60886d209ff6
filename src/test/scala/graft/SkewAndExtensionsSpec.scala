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
