package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed point-in-interval range join. Spark has no native range
  * join: the naive `a.join(b, s <= p && p < e)` plans a nested-loop
  * over the full cross product. This operator bins the number line:
  * each interval explodes to the fixed-width bins it overlaps, each
  * point maps to exactly ONE bin, the join is a hash equi-join on the
  * bin id, and the exact range predicate filters in place.
  *
  * Every true (interval, point) match appears exactly once — the
  * point's single bin is necessarily one of the interval's bins — so
  * no dedup pass is needed.
  *
  * Scale: shuffle keyed by bin; work is O(matches + intervals ×
  * bins-per-interval). Size `binWidth` to the typical interval length
  * (≈1–2 bins per interval); a too-small width multiplies the interval
  * side, a too-large width degrades toward per-bin mini cross
  * products. Degenerate (end <= start) intervals match nothing and are
  * dropped up front, which also keeps the bin `sequence` ascending.
  */
object RangeJoin {

  /** Floor-division bin id in EXACT integer arithmetic: `Column./` is
    * double division, which is a ulp from the wrong bin beyond 2^53
    * (epoch nanos). `x - pmod(x, w)` floors to an exact multiple of
    * `w` for either sign, and SQL `div` (truncating) equals floor
    * division on exact multiples. The multiple is materialized as a
    * named column because `div` is only reachable through `expr`.
    */
  private def withBinOf(df: DataFrame, x: Column, w: Long, out: String): DataFrame =
    df.withColumn(s"${out}_src", x - pmod(x, lit(w)))
      .withColumn(out, expr(s"`${out}_src` div $w"))
      .drop(s"${out}_src")

  /** Explode an interval frame to one row per overlapped bin; keeps
    * the start bin under `startBin` (interval-overlap's exactly-once
    * emission needs it after the join).
    */
  private def binned(df: DataFrame, sc: String, ec: String, w: Long,
      startBin: String): DataFrame = {
    val (s, e) = (col(sc).cast("long"), col(ec).cast("long"))
    val lo = withBinOf(withBinOf(df.filter(e > s), s, w, startBin), e - 1, w, "_bin_hi")
    lo.withColumn("_bin", explode(sequence(col(startBin), col("_bin_hi"))))
      .drop("_bin_hi")
  }

  /** Inner-join `points` to `intervals` on
    * `start <= point < end` (all three integral — e.g. epoch micros).
    * Output: every interval column plus every point column (names must
    * not collide, except the bin key which is internal).
    */
  def pointInInterval(
      points: DataFrame,
      ptCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val s = col(startCol).cast("long")
    val e = col(endCol).cast("long")
    val p = col(ptCol).cast("long")
    val iv = binned(intervals, startCol, endCol, binWidth, "_bin_s").drop("_bin_s")
    val pts = withBinOf(points, p, binWidth, "_bin")
    iv.join(pts, "_bin")
      .filter(p >= s && p < e)
      .drop("_bin")
  }

  /** Interval × interval OVERLAP join (`s1 < e2 && s2 < e1`, half-open
    * [s,e) semantics), same binning scheme. An overlapping pair shares
    * every bin in [max(bin(s1), bin(s2)), min(bin(e1-1), bin(e2-1))] —
    * emitting only from the FIRST shared bin (the later start's bin)
    * makes each match exactly-once without a distinct pass.
    */
  def intervalOverlap(
      left: DataFrame,
      leftStart: String,
      leftEnd: String,
      right: DataFrame,
      rightStart: String,
      rightEnd: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val (s1, e1) = (col(leftStart).cast("long"), col(leftEnd).cast("long"))
    val (s2, e2) = (col(rightStart).cast("long"), col(rightEnd).cast("long"))
    binned(left, leftStart, leftEnd, binWidth, "_bin_s1")
      .join(binned(right, rightStart, rightEnd, binWidth, "_bin_s2"), "_bin")
      .filter(s1 < e2 && s2 < e1)
      .filter(col("_bin") === greatest(col("_bin_s1"), col("_bin_s2")))
      .drop("_bin", "_bin_s1", "_bin_s2")
  }
}
