package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality gate for pipeline boundaries: every check
  * compiles to an aggregate expression, ALL checks run in ONE scan
  * (one multi-aggregate pass, like [[DataProfiler]]), and the result
  * is a small report frame the caller can assert on, alert on, or
  * write next to the data.
  *
  * This is the "fail the batch before it poisons the corpus" surface:
  * row-count sanity, null-rate ceilings, cardinality floors, value
  * whitelists, and arbitrary row-level predicates.
  */
object DataChecks {

  sealed trait Check { def name: String }

  /** Total rows in [min, max]. */
  final case class RowCountBetween(min: Long, max: Long) extends Check {
    val name = s"row_count_between($min,$max)"
  }

  /** Null fraction of `column` at most `maxFraction`. */
  final case class MaxNullFraction(column: String, maxFraction: Double) extends Check {
    val name = s"max_null_fraction($column,$maxFraction)"
  }

  /** At least `min` distinct non-null values in `column`. */
  final case class MinDistinct(column: String, min: Long) extends Check {
    val name = s"min_distinct($column,$min)"
  }

  /** Every non-null value of `column` is in `allowed`. */
  final case class ValuesIn(column: String, allowed: Seq[String]) extends Check {
    val name = s"values_in($column)"
  }

  /** No row satisfies `failPredicate`. */
  final case class NoRowWhere(label: String, failPredicate: Column) extends Check {
    val name = s"no_row_where($label)"
  }

  /** Run all checks in one scan. Report schema:
    * (check STRING, passed BOOLEAN, observed DOUBLE) — `observed` is
    * the measured statistic (row count, null fraction, distinct count,
    * violating-row count).
    */
  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "validate needs at least one check")
    def quoted(c: String) = graft.plans.SqlIdent.quote(c)
    // one aggregate column per check: a struct of (observed, passed)
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      val (observed, passed): (Column, Column => Column) = c match {
        case RowCountBetween(mn, mx) =>
          (count(lit(1)).cast("double"), o => o >= mn && o <= mx)
        case MaxNullFraction(column, f) =>
          (coalesce(avg(when(col(quoted(column)).isNull, 1.0).otherwise(0.0)), lit(0.0)),
            o => o <= f)
        case MinDistinct(column, mn) =>
          (countDistinct(col(quoted(column))).cast("double"), o => o >= mn)
        case ValuesIn(column, allowed) =>
          (sum(when(col(quoted(column)).isNotNull &&
            !col(quoted(column)).isin(allowed: _*), 1L).otherwise(0L))
            .cast("double"), o => coalesce(o, lit(0.0)) === 0.0)
        case NoRowWhere(_, pred) =>
          (sum(when(pred, 1L).otherwise(0L)).cast("double"),
            o => coalesce(o, lit(0.0)) === 0.0)
      }
      val obs = coalesce(observed, lit(0.0))
      struct(obs.as("observed"), passed(obs).as("passed")).as(s"c_$i")
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    // check names go in as LITERAL columns, never interpolated into
    // SQL text — a quote or backslash in a user label must survive
    // verbatim into the report
    val reportRows = checks.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c.name).as("check"),
        col(s"c_$i.passed").as("passed"),
        col(s"c_$i.observed").cast("double").as("observed"))
    }
    row.select(explode(array(reportRows: _*)).as("r"))
      .select(col("r.check").as("check"), col("r.passed").as("passed"),
        col("r.observed").as("observed"))
  }

  /** Throwing form: raises with every failed check's name and observed
    * value when any check fails.
    */
  def enforce(df: DataFrame, checks: Seq[Check]): Unit = {
    val failed = validate(df, checks).filter(!col("passed"))
      .collect().map(r => s"${r.getString(0)} (observed ${r.getDouble(2)})")
    if (failed.nonEmpty)
      throw new IllegalStateException(
        s"data checks failed: ${failed.mkString("; ")}")
  }
}
