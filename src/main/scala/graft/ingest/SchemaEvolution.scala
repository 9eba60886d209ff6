package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-evolution ingestion: batches of the same logical dataset
  * whose physical schemas drifted (columns added/dropped over time)
  * merge into one frame with the union of columns, absent values null.
  *
  * Two paths:
  *   - parquet self-describing files → `mergeSchema` at scan time
  *     (schema reconciliation happens in the reader, per file footer —
  *     no per-row work);
  *   - already-loaded frames → `unionByName(allowMissingColumns)`,
  *     which aligns BY NAME (positional union silently mismatches
  *     drifted schemas).
  */
object SchemaEvolution {

  /** Read parquet path(s) whose files carry drifted schemas. */
  def readMergedParquet(spark: SparkSession, paths: String*): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)

  /** Union frames with drifted schemas by column NAME; columns missing
    * from a frame come back null.
    */
  def unionEvolved(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "unionEvolved needs at least one frame")
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))
  }
}
