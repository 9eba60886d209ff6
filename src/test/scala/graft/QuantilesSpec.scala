package graft

import graft.operators.Quantiles
import org.apache.spark.sql.functions._

class QuantilesSpec extends SparkSpec {

  import spark.implicits._

  test("distributed group percentiles == built-in percentile, bit-exact") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val builtin = li.groupBy($"l_returnflag").agg(
      expr("percentile(l_extendedprice, 0.05)").as("lo"),
      expr("percentile(l_extendedprice, 0.5)").as("mid"),
      expr("percentile(l_extendedprice, 0.95)").as("hi"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    val dist = Quantiles.groupPercentiles(li, "l_returnflag", "l_extendedprice",
      Seq("lo" -> 0.05, "mid" -> 0.5, "hi" -> 0.95))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(dist == builtin) // exact double equality, no rounding
  }

  test("edge cases: single row, duplicates, nulls ignored, p=0/1") {
    val df = Seq(
      ("a", Some(5.0)),
      ("b", Some(1.0)), ("b", Some(1.0)), ("b", Some(3.0)), ("b", None)
    ).toDF("g", "v")
    val got = Quantiles.groupPercentiles(df, "g", "v",
      Seq("p0" -> 0.0, "p50" -> 0.5, "p100" -> 1.0))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got("a") == ((5.0, 5.0, 5.0)))
    assert(got("b") == ((1.0, 1.0, 3.0))) // null excluded: values 1,1,3
    val builtin = df.groupBy($"g").agg(expr("percentile(v, 0.5)").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(builtin("b") == got("b")._2)
  }

  test("all-null group keeps its row with null percentiles, like builtin") {
    val df = Seq(("a", Some(1.0)), ("c", None), ("c", None)).toDF("g", "v")
    val got = Quantiles.groupPercentiles(df, "g", "v", Seq("p50" -> 0.5)).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got == Map("a" -> Some(1.0), "c" -> None))
  }

  test("winsorize clips many columns to per-group builtin-percentile bounds") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select($"l_orderkey", $"l_linenumber", $"l_returnflag", $"l_extendedprice", $"l_quantity")
    val got = Quantiles.winsorize(li, "l_returnflag", Seq("l_extendedprice", "l_quantity"))
    // same schema, same row count, non-value columns untouched
    assert(got.columns.toSeq == li.columns.toSeq)
    assert(got.count() == li.count())
    // expected: clip against the BUILT-IN percentile per column
    val bounds = li.groupBy($"l_returnflag").agg(
      expr("percentile(l_extendedprice, 0.05)").as("plo"),
      expr("percentile(l_extendedprice, 0.95)").as("phi"),
      expr("percentile(l_quantity, 0.05)").as("qlo"),
      expr("percentile(l_quantity, 0.95)").as("qhi"))
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
    // compare as sorted multisets of full rows, exact double equality
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue, r.getDouble(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2, t._3, t._4)).toSeq
    val expected = rows(li.join(bounds, "l_returnflag").select(
      $"l_orderkey", $"l_linenumber",
      least(greatest($"l_extendedprice", $"plo"), $"phi").as("p"),
      least(greatest($"l_quantity".cast("double"), $"qlo"), $"qhi").as("q")))
    val gotRows = rows(got.select($"l_orderkey", $"l_linenumber", $"l_extendedprice", $"l_quantity"))
    assert(gotRows == expected)
    // something was actually clipped (5% tails exist at this scale)
    val rawMax = li.agg(max($"l_extendedprice")).head().getDouble(0)
    val clippedMax = got.agg(max($"l_extendedprice")).head().getDouble(0)
    assert(clippedMax < rawMax)
  }

  test("winsorize preserves null values and null-group rows") {
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(100.0)), ("a", None),
      (null.asInstanceOf[String], Some(7.0))
    ).toDF("g", "v")
    val got = Quantiles.winsorize(df, "g", Seq("v"), 0.0, 0.5)
      .collect().map(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    // a null VALUE stays null — not fabricated as the lower bound
    assert(got.count(_._2.isEmpty) == 1)
    // a null GROUP row survives, unclipped (no bounds exist for it)
    assert(got.contains((null, Some(7.0))))
    assert(got.length == 5)
    // clipping did apply inside group a: p50 of (1,2,100) = 2
    assert(got.contains(("a", Some(2.0))) && !got.exists(_._2.contains(100.0)))
  }
}
