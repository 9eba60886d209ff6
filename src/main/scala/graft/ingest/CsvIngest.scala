package graft.ingest

import graft.config.EntitySpec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** CSV source (reference main.py:432 pd.read_csv).
  *
  * All columns are read as strings so type errors are catchable per
  * row downstream (the reference gets this from pandas+Pydantic; we
  * get it by deferring the cast to the validator's expressions).
  *
  * Row identity: the reference relies on DuckDB ROWID / pandas index
  * (main.py:78,135). Spark has no stable implicit order, so we mint an
  * explicit `_row_id`:
  *   - `spark_partition_id`/`monotonically_increasing_id` is
  *     order-consistent with input order for a file-based read
  *     (partitions are sequential file splits), which is all dedup
  *     first/last needs at scale — ordering, not density;
  *   - for the reference's dense 1-based row numbers (error CSVs), a
  *     window over that order densifies. Dense ids cost a global sort
  *     of ids only, acceptable at pipeline-input scale; flip
  *     `dense=false` for ordering-only ids at very large inputs.
  */
object CsvIngest {

  val RowId = "_row_id"

  def read(spark: SparkSession, spec: EntitySpec, dense: Boolean = true): DataFrame =
    readPath(spark, spec.source, dense)

  def readPath(spark: SparkSession, path: String, dense: Boolean = true): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .csv(path)
      .withColumn(RowId, monotonically_increasing_id())
    if (dense) {
      // 1-based dense ids in input order (pandas `index + 1`, main.py:78)
      raw.withColumn(RowId, row_number().over(Window.orderBy(col(RowId))).cast("long"))
    } else raw
  }
}
