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
    // internal aliases are INDEXED, and source refs backtick-escaped,
    // so imported column names with spaces/dots/quotes profile cleanly
    def quoted(c: String) = s"`${c.replace("`", "``")}`"
    val aggs = targets.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        sum(when(col(quoted(c)).isNull, 1L).otherwise(0L)).as(s"nulls_$i"),
        countDistinct(col(quoted(c))).as(s"dist_$i"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = targets.zipWithIndex
      .map { case (c, i) =>
        s"'${c.replace("'", "''")}', CAST(nulls_$i AS BIGINT), CAST(dist_$i AS BIGINT)"
      }
      .mkString(", ")
    row.selectExpr(
      s"stack(${targets.length}, $stackArgs) AS (column_name, n_nulls, n_distinct)")
  }
}
