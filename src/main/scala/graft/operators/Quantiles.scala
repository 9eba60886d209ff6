package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated per-group percentiles with a DISTRIBUTED plan.
  *
  * Spark's built-in `percentile` aggregate collects every group's
  * values into one reducer's memory — exact, but group size is capped
  * by executor heap, the wrong shape for billion-row groups. This
  * formulation is one in-partition sort window (plus a group-count
  * window on the SAME shuffle), then a single aggregate that picks the
  * two bracketing ranks per requested p and interpolates
  * `lower + (higher - lower) * frac` — the identical formula (and
  * double arithmetic) as `percentile` and DuckDB's `quantile_cont`,
  * verified value-identical in QuantilesSpec, with memory bounded per
  * ROW rather than per group.
  */
object Quantiles {

  /** One row per group; one output column per requested (name, p).
    * Nulls in `valCol` are ignored, matching `percentile` semantics —
    * including an all-null group, which keeps its output row with
    * null percentiles (nulls sort last and `_n` counts non-nulls, so
    * no rank ever matches and the interpolation nulls out).
    */
  def groupPercentiles(
      df: DataFrame,
      groupCol: String,
      valCol: String,
      ps: Seq[(String, Double)]): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (_, p) => p >= 0 && p <= 1 },
      "percentiles must be in [0, 1]")
    val sortW = Window.partitionBy(col(groupCol)).orderBy(col("_v").asc_nulls_last)
    val cntW = Window.partitionBy(col(groupCol))
    val ranked = df
      .select(col(groupCol), col(valCol).cast("double").as("_v"))
      .withColumn("_rn", row_number().over(sortW).cast("long"))
      .withColumn("_n", count(col("_v")).over(cntW))
    val aggs = ps.flatMap { case (name, p) =>
      val pos = lit(p) * (col("_n") - 1).cast("double")
      val loIdx = floor(pos).cast("long") + 1 // 0-based pos → 1-based rank
      val hiIdx = ceil(pos).cast("long") + 1
      Seq(
        max(when(col("_rn") === loIdx, col("_v"))).as(s"_lo_$name"),
        max(when(col("_rn") === hiIdx, col("_v"))).as(s"_hi_$name"),
        // the two interpolation weights, with the same double
        // arithmetic as Spark's Percentile.getPercentile:
        // (higher - position) and (position - lower)
        first(ceil(pos).cast("double") - pos).as(s"_wl_$name"),
        first(pos - floor(pos).cast("double")).as(s"_wh_$name"))
    }
    val agg = ranked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
    val out = col(groupCol) +: ps.map { case (name, _) =>
      when(col(s"_wh_$name") === 0.0, col(s"_lo_$name"))
        .otherwise(col(s"_wl_$name") * col(s"_lo_$name") +
          col(s"_wh_$name") * col(s"_hi_$name"))
        .as(name)
    }
    agg.select(out: _*)
  }
}
