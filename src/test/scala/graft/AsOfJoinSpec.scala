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

  test("forward direction matches the earliest following right row") {
    val left = Seq(
      (1L, 1L, 100L), // next right is 150
      (2L, 1L, 250L), // exactly at 250 → inclusive
      (3L, 1L, 260L), // after the last right row → null
      (4L, 2L, 10L)   // key with no right rows
    ).toDF("id", "k", "t")
    val right = Seq((1L, 150L, "r150"), (1L, 250L, "r250")).toDF("k", "t", "rv")
    val got = AsOfJoin.asofJoin(left, right, Seq("k"), "t", Seq("rv"), "forward")
      .select($"id", $"rv").as[(Long, Option[String])].collect().toMap
    assert(got == Map(
      1L -> Some("r150"), 2L -> Some("r250"), 3L -> None, 4L -> None))
  }

  test("nearest direction picks the closer side; ties go backward") {
    val left = Seq(
      (1L, 1L, 10L),  // |10-8|=2 < |20-10| → backward 8
      (2L, 1L, 19L),  // |19-8|=11 > |20-19|=1 → forward 20
      (3L, 1L, 14L),  // equidistant (6 both ways) → backward, like pandas
      (4L, 1L, 5L),   // before all right rows → forward 8
      (5L, 1L, 99L)   // after all right rows → backward 20
    ).toDF("id", "k", "t")
    val right = Seq((1L, 8L, "r8"), (1L, 20L, "r20")).toDF("k", "t", "rv")
    val got = AsOfJoin.asofJoin(left, right, Seq("k"), "t", Seq("rv"), "nearest")
      .select($"id", $"rv").as[(Long, Option[String])].collect().toMap
    assert(got == Map(
      1L -> Some("r8"), 2L -> Some("r20"), 3L -> Some("r8"),
      4L -> Some("r8"), 5L -> Some("r20")))
    // rejects unknown directions
    intercept[IllegalArgumentException] {
      AsOfJoin.asofJoin(left, right, Seq("k"), "t", Seq("rv"), "sideways")
    }
  }
}
