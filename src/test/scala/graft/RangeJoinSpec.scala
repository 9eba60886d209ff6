package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  test("binned range join == naive range predicate, across bin widths") {
    val rnd = new scala.util.Random(7)
    val pts = (1 to 400).map(i => (i.toLong, rnd.nextLong(10000) - 2000)).toDF("pid", "p")
    val ivs = (1 to 60).map { i =>
      val s = rnd.nextLong(10000) - 2000
      (i.toLong, s, s + rnd.nextLong(800))
    }.toDF("iid", "s", "e")
    val naive = ivs.join(pts, $"p" >= $"s" && $"p" < $"e")
      .select($"iid", $"pid").as[(Long, Long)].collect().toSet
    for (w <- Seq(1L, 7L, 100L, 1000L, 100000L)) {
      val got = RangeJoin.pointInInterval(pts, "p", ivs, "s", "e", w)
        .select($"iid", $"pid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"w=$w emitted duplicate matches")
      assert(got.toSet == naive, s"w=$w")
    }
  }

  test("interval overlap join == naive overlap predicate, exactly once") {
    val rnd = new scala.util.Random(11)
    def ivs(n: Int, idc: String, sc: String, ec: String) =
      (1 to n).map { i =>
        val s = rnd.nextLong(5000)
        (i.toLong, s, s + 1 + rnd.nextLong(600))
      }.toDF(idc, sc, ec)
    val a = ivs(80, "aid", "s1", "e1")
    val b = ivs(80, "bid", "s2", "e2")
    val naive = a.join(b, $"s1" < $"e2" && $"s2" < $"e1")
      .select($"aid", $"bid").as[(Long, Long)].collect().toSet
    for (w <- Seq(1L, 13L, 250L, 10000L)) {
      val got = RangeJoin.intervalOverlap(a, "s1", "e1", b, "s2", "e2", w)
        .select($"aid", $"bid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"w=$w emitted duplicate matches")
      assert(got.toSet == naive, s"w=$w")
    }
  }

  test("exact bins at epoch-nanosecond magnitudes (beyond double precision)") {
    // 1.7e18 is far past 2^53: a double-division bin id here is one
    // ulp from wrong, silently missing matches
    val base = 1700000000000000000L
    val rnd = new scala.util.Random(3)
    val pts = (1 to 300).map(i => (i.toLong, base + rnd.nextLong(500000))).toDF("pid", "p")
    val ivs = (1 to 40).map { i =>
      val s = base + rnd.nextLong(500000)
      (i.toLong, s, s + 1 + rnd.nextLong(40000))
    }.toDF("iid", "s", "e")
    val naive = ivs.join(pts, $"p" >= $"s" && $"p" < $"e")
      .select($"iid", $"pid").as[(Long, Long)].collect().toSet
    for (w <- Seq(7777L, 30000L, 1000000L)) {
      val got = RangeJoin.pointInInterval(pts, "p", ivs, "s", "e", w)
        .select($"iid", $"pid").as[(Long, Long)].collect().toSet
      assert(got == naive, s"w=$w")
    }
    val naiveOv = ivs.join(
      ivs.select($"iid".as("jid"), $"s".as("s2"), $"e".as("e2")),
      $"s" < $"e2" && $"s2" < $"e")
      .select($"iid", $"jid").as[(Long, Long)].collect().toSet
    val gotOv = RangeJoin.intervalOverlap(
      ivs, "s", "e", ivs.select($"iid".as("jid"), $"s".as("s2"), $"e".as("e2")),
      "s2", "e2", 30000L)
      .select($"iid", $"jid").as[(Long, Long)].collect()
    assert(gotOv.length == gotOv.toSet.size && gotOv.toSet == naiveOv)
  }

  test("degenerate and empty intervals match nothing; plan is a hash join") {
    val pts = Seq((1L, 5L), (2L, 10L)).toDF("pid", "p")
    val ivs = Seq((1L, 5L, 5L), (2L, 8L, 3L)).toDF("iid", "s", "e") // empty + inverted
    assert(RangeJoin.pointInInterval(pts, "p", ivs, "s", "e", 10L).count() == 0)
    // the scale contract: an equi-join on the bin, not a nested loop
    val plan = RangeJoin.pointInInterval(pts, "p", ivs, "s", "e", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }
}
