package graft

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  test("matches most recent prior right row per key; equal time matches; no match → null") {
    val left = Seq(
      (1L, 10L, 100L), // before any right row → null
      (2L, 10L, 250L), // after r@200 → matches 200
      (3L, 10L, 300L), // exactly at r@300 → matches 300 (inclusive)
      (4L, 20L, 500L), // other key, after r@450
      (5L, 30L, 500L)  // key with no right rows at all
    ).toDF("event_id", "k", "t")
    val right = Seq(
      (10L, 200L, "r200"),
      (10L, 300L, "r300"),
      (10L, 400L, "r400"), // later than every left → never matched
      (20L, 450L, "r450")
    ).toDF("k", "t", "rv")
    val got = AsOfJoin.asofJoin(left, right, Seq("k"), "t", Seq("rv"))
      .select($"event_id", $"rv").as[(Long, Option[String])].collect().toMap
    assert(got == Map(
      1L -> None, 2L -> Some("r200"), 3L -> Some("r300"),
      4L -> Some("r450"), 5L -> None))
  }

  test("null right values come from the matched row, not an older one (atomic fill)") {
    val left = Seq((1L, 1L, 600L)).toDF("id", "k", "t")
    val right = Seq(
      (1L, 300L, Some(7.0), "A"),
      (1L, 500L, None: Option[Double], "B") // newest match carries a null value
    ).toDF("k", "t", "rv", "rid")
    val got = AsOfJoin.asofJoin(left, right, Seq("k"), "t", Seq("rv", "rid"))
      .select($"id", $"rv", $"rid").as[(Long, Option[Double], String)].head()
    // ASOF semantics: the whole newest row (B) wins — rv is null, not 7.0
    assert(got == ((1L, None, "B")))
  }

  test("later right rows fill later left rows only (state advances per key)") {
    val left = Seq((1L, 1L, 100L), (2L, 1L, 200L), (3L, 1L, 300L)).toDF("id", "k", "t")
    val right = Seq((1L, 150L, 1.5), (1L, 250L, 2.5)).toDF("k", "t", "rv")
    val got = AsOfJoin.asofJoin(left, right, Seq("k"), "t", Seq("rv"))
      .select($"id", $"rv").as[(Long, Option[Double])].collect().toMap
    assert(got == Map(1L -> None, 2L -> Some(1.5), 3L -> Some(2.5)))
  }
}
