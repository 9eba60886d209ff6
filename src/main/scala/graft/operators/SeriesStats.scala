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
    round(lags.map(_._1).reduce(_ + _) / lags.map(_._2).reduce(_ + _), 6)
  }
}
