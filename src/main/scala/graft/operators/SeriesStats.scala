package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series smoothing over event streams as pure window
  * expressions — one shuffle on the partition key, no sequential
  * recurrence (a true recursive EWMA needs per-partition state; the
  * trailing-window form below is the bounded-memory, exactly-
  * replayable variant used for drift/trend features).
  */
object SeriesStats {

  /** Exponentially-weighted moving average over the trailing `terms`
    * rows: ewma_i = Σ_j w^j · v_{i−j} / Σ_j w^j over the lags that
    * exist (so early rows renormalize over their shorter history
    * instead of decaying toward zero). Weight defaults to 1/2 — every
    * w^j is an exact dyadic double, so the arithmetic is bit-identical
    * on any engine that sums the terms in the written order.
    *
    * Null values (and rows before the partition start) contribute to
    * neither numerator nor denominator. Result rounded to 6.
    */
  def ewmaTrailing(
      partCols: Seq[String],
      orderCols: Seq[String],
      valCol: String,
      terms: Int = 8,
      weight: Double = 0.5): Column = {
    require(terms >= 1, "need at least one term")
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(orderCols.map(col): _*)
    val lags = (0 until terms).map { j =>
      val v = lag(col(valCol).cast("double"), j).over(w)
      (when(v.isNotNull, v * lit(math.pow(weight, j))).otherwise(lit(0.0)),
        when(v.isNotNull, lit(math.pow(weight, j))).otherwise(lit(0.0)))
    }
    // an all-null trailing window (own value null, no prior non-null
    // within `terms`) has weight 0 — emit null, not a divide-by-zero
    // (ANSI mode throws on 0.0/0.0)
    val num = lags.map(_._1).reduce(_ + _)
    val den = lags.map(_._2).reduce(_ + _)
    round(when(den > lit(0.0), num / den), 6)
  }

  /** Weekly cohort retention over an event stream: users are cohorted
    * by the ISO week of their FIRST event; each (cohort_week,
    * week_offset) cell reports how many of the cohort were active that
    * week and the retained share — the standard engagement triangle.
    *
    * Shape: one aggregate for first-events (keyed by user), one
    * distinct over (user, week) activity, one equi-join of the two on
    * user (the activity side never re-shuffles wider than
    * user×week), then a count keyed by the tiny (cohort, offset)
    * space. All date arithmetic in whole days (exact cross-engine).
    */
  def cohortRetention(
      events: org.apache.spark.sql.DataFrame,
      userCol: String,
      tsCol: String): org.apache.spark.sql.DataFrame = {
    val week = to_date(date_trunc("week", col(tsCol)))
    val firsts = events
      .groupBy(col(userCol))
      .agg(min(week).as("cohort_week"))
    val active = events
      .select(col(userCol), week.as("active_week"))
      .distinct()
    val cohortSize = firsts.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_n"))
    active.join(firsts, Seq(userCol))
      .withColumn("week_offset",
        (datediff(col("active_week"), col("cohort_week")) / 7).cast("long"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("active_users"))
      .join(broadcast(cohortSize), Seq("cohort_week"))
      .withColumn("retention",
        round(col("active_users").cast("double") / col("cohort_n"), 6))
      .select(col("cohort_week"), col("week_offset"),
        col("active_users"), col("cohort_n"), col("retention"))
  }
}
