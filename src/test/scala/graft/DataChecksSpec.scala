package graft

import graft.operators.DataChecks
import graft.operators.DataChecks._
import org.apache.spark.sql.functions._

class DataChecksSpec extends SparkSpec {

  import spark.implicits._

  private def orders = Tables.orders(spark, "/root/testdata/sf0.001")

  test("all checks run in one scan and report correct pass/fail") {
    val checks = Seq(
      RowCountBetween(1, Long.MaxValue),
      MaxNullFraction("o_custkey", 0.0),
      MinDistinct("o_orderstatus", 2),
      NoRowWhere("non_positive_price", $"o_totalprice" <= 0),
      RowCountBetween(1, 10), // fails: far more rows than 10
      NoRowWhere("urgent_exists", $"o_orderpriority" === "1-URGENT") // fails
    )
    val report = DataChecks.validate(orders, checks)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(report("row_count_between(1,9223372036854775807)"))
    assert(report("max_null_fraction(o_custkey,0.0)"))
    assert(report("min_distinct(o_orderstatus,2)"))
    assert(report("no_row_where(non_positive_price)"))
    assert(!report("row_count_between(1,10)"))
    assert(!report("no_row_where(urgent_exists)"))
    // single scan for the whole gate
    val plan = DataChecks.validate(orders, checks).queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).size == 1, "checks must share one scan")
  }

  test("values_in flags out-of-domain values; nulls don't count") {
    val df = Seq(Some("F"), Some("O"), Some("X"), None).toDF("s")
    val r = DataChecks.validate(df, Seq(ValuesIn("s", Seq("F", "O"))))
      .head()
    assert(!r.getBoolean(1) && r.getDouble(2) == 1.0) // exactly the 'X'
    val ok = DataChecks.validate(df.filter($"s" =!= "X" || $"s".isNull),
      Seq(ValuesIn("s", Seq("F", "O")))).head()
    assert(ok.getBoolean(1))
  }

  test("enforce throws with the failing checks named; empty frames pass sane gates") {
    val ex = intercept[IllegalStateException] {
      DataChecks.enforce(orders, Seq(RowCountBetween(0, 5)))
    }
    assert(ex.getMessage.contains("row_count_between(0,5)"))
    // an EMPTY frame: count checks observe 0, fraction checks pass
    val empty = Seq.empty[(Long, String)].toDF("id", "s")
    val rep = DataChecks.validate(empty, Seq(
      RowCountBetween(0, 10), MaxNullFraction("s", 0.1), ValuesIn("s", Seq("a"))))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(rep.values.forall(identity), rep.toString)
  }
}
