package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-driven data profiling for the import surface: per-column
  * null and exact distinct counts in ONE scan (all aggregates computed
  * together with map-side partials, then unpivoted to long format with
  * `stack`) — versus the naive one-query-per-column profile that scans
  * the table N times.
  */
object DataProfiler {

  /** Long-format profile: one row per column with (column_name,
    * n_nulls, n_distinct). Column subset via `cols` (default: all).
    *
    * `minMax=true` adds typed min/max rendered as strings
    * (min_value/max_value): fixed-point for float/double (so the
    * rendering is engine-portable — raw double→string formatting is
    * not), native string casts for integral/decimal/string/date/
    * timestamp/boolean, null for non-orderable types (arrays, maps,
    * structs, binary).
    */
  def profile(df: DataFrame, cols: Seq[String] = Seq.empty,
      minMax: Boolean = false): DataFrame = {
    val targets = if (cols.nonEmpty) cols else df.columns.toSeq
    require(targets.nonEmpty, "profile needs at least one column")
    // internal aliases are INDEXED, and source refs backtick-escaped,
    // so imported column names with spaces/dots/quotes profile cleanly
    def quoted(c: String) = graft.plans.SqlIdent.quote(c)
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    def rendered(c: Column, dt: DataType): Column = dt match {
      case DoubleType | FloatType =>
        // ANSI mode: a decimal(24,4) cast THROWS on |x| too large (or
        // NaN/Inf), which would fail the whole single-scan profile —
        // out-of-range extremes fall back to the plain double rendering
        when(c.isNull, lit(null).cast("string"))
          .when(!isnan(c) && c.between(-1e15, 1e15), c.cast("decimal(24,4)").cast("string"))
          .otherwise(c.cast("string"))
      case _: DecimalType | ByteType | ShortType | IntegerType | LongType |
           StringType | DateType | TimestampType | TimestampNTZType |
           BooleanType => c.cast("string")
      case _ => lit(null).cast("string")
    }
    val countAggs = targets.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        sum(when(col(quoted(c)).isNull, 1L).otherwise(0L)).as(s"nulls_$i"),
        countDistinct(col(quoted(c))).as(s"dist_$i"))
    }
    val counts = df.agg(countAggs.head, countAggs.tail: _*)
    // min/max run as a SEPARATE narrow pass: a string min/max buffer is
    // variable-width, which would demote the whole multi-distinct
    // expand aggregation to SortAggregate (measured 4× slower). Both
    // passes produce ONE row; combining them is a 1×1 broadcast join.
    val row =
      if (!minMax) counts
      else {
        val mmAggs = targets.zipWithIndex.flatMap { case (c, i) =>
          Seq(
            rendered(min(col(quoted(c))), types(c)).as(s"min_$i"),
            rendered(max(col(quoted(c))), types(c)).as(s"max_$i"))
        }
        counts.crossJoin(broadcast(df.agg(mmAggs.head, mmAggs.tail: _*)))
      }
    val fields =
      if (minMax) "(column_name, n_nulls, n_distinct, min_value, max_value)"
      else "(column_name, n_nulls, n_distinct)"
    val stackArgs = targets.zipWithIndex
      .map { case (c, i) =>
        val base = s"'${c.replace("'", "''")}', CAST(nulls_$i AS BIGINT), CAST(dist_$i AS BIGINT)"
        if (minMax) s"$base, min_$i, max_$i" else base
      }
      .mkString(", ")
    row.selectExpr(s"stack(${targets.length}, $stackArgs) AS $fields")
  }
}
