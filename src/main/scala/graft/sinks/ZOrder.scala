package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustered writes: multi-dimensional data
  * skipping for the training-shard layout. A single-column sort gives
  * perfect min/max pruning on that column and none on any other;
  * interleaving the bits of each dimension's quantile bucket keeps
  * EVERY z-ordered dimension's values clustered within each output
  * file, so file/row-group min-max stats prune scans filtered on any
  * of them.
  *
  * Scale shape: quantile boundaries come from `approxQuantile`
  * (sampled sketch, driver holds only `buckets` numbers per column);
  * the z-value is pure per-row bit arithmetic; the write is one
  * `repartitionByRange` on the z-value (range exchange with sampled
  * bounds — no global sort barrier) plus an in-partition sort. No
  * step holds data on the driver.
  */
object ZOrder {

  /** Bits per dimension; 8 → 256 quantile buckets per column and a
    * z-value of 8×dims bits.
    */
  private val BitsPerDim = 8

  /** The z-value column for `zCols` over `df`'s own value
    * distribution (quantile-bucketed, so skew cannot collapse the
    * curve). Columns must be numeric.
    */
  def zValueFor(df: DataFrame, zCols: Seq[String]): Column = {
    require(zCols.nonEmpty, "zOrder needs at least one column")
    require(zCols.size * BitsPerDim <= 63, s"too many z-order columns (max ${63 / BitsPerDim})")
    val buckets = 1 << BitsPerDim
    // ONE sketch pass for every column (the per-column overload would
    // re-scan df once per dimension)
    val allBounds = df.stat.approxQuantile(zCols.toArray,
      (1 until buckets).map(_.toDouble / buckets).toArray, 0.5 / buckets)
    val bucketed = zCols.zip(allBounds).map { case (c, bounds) =>
      // bucket index = #boundaries <= value (0..buckets-1), computed as
      // pure per-row arithmetic over the broadcast literal array; cast
      // to LONG before shifting — an int shift wraps at bit 31, which
      // would silently fold dimensions onto each other
      aggregate(
        lit(bounds),
        lit(0),
        (acc, b) => acc + when(col(c).cast("double") >= b, 1).otherwise(0))
        .cast("long")
    }
    // interleave: bit b of dimension i lands at position b*dims + i
    val dims = zCols.size
    val terms = for {
      b <- 0 until BitsPerDim
      (bk, i) <- bucketed.zipWithIndex
    } yield shiftleft(shiftright(bk, b).bitwiseAND(lit(1L)), b * dims + i)
    terms.reduce(_ + _) // disjoint bit positions: sum == bitwise or
  }

  /** Write `df` as parquet clustered on the z-curve of `zCols`, in
    * `numFiles` range-partitioned files. Returns the directory.
    */
  def writeZOrdered(df: DataFrame, dir: String, zCols: Seq[String],
      numFiles: Int): String = {
    require(numFiles >= 1, "numFiles must be >= 1")
    val z = "_zvalue"
    df.withColumn(z, zValueFor(df, zCols))
      .repartitionByRange(numFiles, col(z))
      .sortWithinPartitions(col(z))
      .drop(z)
      .write.mode("overwrite").parquet(dir)
    dir
  }
}
