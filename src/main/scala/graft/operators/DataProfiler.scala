package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Schema-driven data profiling for the import surface: per-column
  * null and exact distinct counts in ONE scan (all aggregates computed
  * together with map-side partials, then unpivoted to long format with
  * `stack`) — versus the naive one-query-per-column profile that scans
  * the table N times.
  */
object DataProfiler {

  /** Long-format profile: one row per column with (column_name,
    * n_nulls, n_distinct). Column subset via `cols` (default: all).
    */
  def profile(df: DataFrame, cols: Seq[String] = Seq.empty): DataFrame = {
    val targets = if (cols.nonEmpty) cols else df.columns.toSeq
    require(targets.nonEmpty, "profile needs at least one column")
    val aggs = targets.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"),
        countDistinct(col(c)).as(s"dist_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = targets
      .map(c => s"'$c', CAST(nulls_$c AS BIGINT), CAST(dist_$c AS BIGINT)")
      .mkString(", ")
    row.selectExpr(
      s"stack(${targets.length}, $stackArgs) AS (column_name, n_nulls, n_distinct)")
  }
}
