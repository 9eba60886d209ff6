package graft

import graft.config.RuleSpec
import graft.rules.{CustomRules, ValidationStopException}
import java.time.LocalDate

class RulesSpec extends SparkSpec {

  import spark.implicits._

  // mirror of the reference's own unittest fixture shape
  // (test_main.py:33-47): 3 rows, one under-18 at the pinned date.
  private def stage = Seq(
    (1L, "2000-01-01"),
    (2L, "2010-01-01"),
    (3L, "1995-05-15")
  ).toDF("employee_id", "birthday_on")

  private val rule = Seq(RuleSpec("birthday_on", "age_gte", Map("min_age" -> 18)))
  private val asOf = LocalDate.parse("2025-01-01")

  test("stop mode raises with the reference's message (main.py:187)") {
    val ex = intercept[ValidationStopException] {
      CustomRules.execute(stage, rule, "stop", asOf)
    }
    assert(ex.getMessage.contains("Custom validation failed for field 'birthday_on'"))
  }

  test("skip mode filters failing rows and captures the issue set") {
    val r = CustomRules.execute(stage, rule, "skip", asOf)
    assert(r.survivors.select("employee_id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    assert(r.totalInvalidRows == 1)
    assert(r.issues.head.invalidRows.select("employee_id").as[Long].head() == 2L)
  }

  test("age boundary: exactly min_age passes (completed years)") {
    val df = Seq((1L, "2007-01-01"), (2L, "2007-01-02")).toDF("id", "birthday_on")
    val r = CustomRules.execute(df, rule, "skip", asOf)
    // 2007-01-01 → exactly 18 completed years on 2025-01-01 → passes;
    // 2007-01-02 → 17 years 364 days → fails
    assert(r.survivors.select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("no failing rows → no issues, nothing raised in stop mode") {
    val df = Seq((1L, "1990-01-01")).toDF("id", "birthday_on")
    val r = CustomRules.execute(df, rule, "stop", asOf)
    assert(r.issues.isEmpty && r.totalInvalidRows == 0)
    assert(r.survivors.count() == 1)
  }

  test("unknown rule names are ignored (reference if-chain behavior)") {
    val r = CustomRules.execute(stage, Seq(RuleSpec("x", "no_such_rule")), "stop", asOf)
    assert(r.survivors.count() == 3 && r.issues.isEmpty)
  }
  test("quality_gte rule: low-quality rows fail in skip mode, good ones survive") {
    val docs = Seq(
      (1L, "the cat sat on the mat and it was a good day in the sun"), // stopwordy, clean
      (2L, "!!! ### $$$ %%% ^^^ &&& *** ((( ))) @@@")                  // punctuation soup
    ).toDF("doc_id", "text")
    val qRule = Seq(RuleSpec("text", "quality_gte", Map("min_score" -> 0.5)))
    val res = CustomRules.execute(docs, qRule, "skip", asOf)
    assert(res.survivors.select("doc_id").as[Long].collect().toSeq == Seq(1L))
    assert(res.issues.head.validation == "quality_gte" && res.totalInvalidRows == 1)
  }
}
