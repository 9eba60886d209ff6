package graft.ingest

import graft.config.EntitySpec
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** CSV source (reference main.py:432 pd.read_csv).
  *
  * All columns are read as strings so type errors are catchable per
  * row downstream (the reference gets this from pandas+Pydantic; we
  * get it by deferring the cast to the validator's expressions).
  *
  * Row identity: the reference relies on DuckDB ROWID / pandas index
  * (main.py:78,135). Spark has no stable implicit order, so we mint an
  * explicit `_row_id`:
  *   - `dense=false`: `monotonically_increasing_id` — order-consistent
  *     with input order for a file-based read (partitions are
  *     sequential file splits) at zero cost; all dedup first/last
  *     needs is ordering, not density;
  *   - `dense=true` (default, reference parity — pandas `index + 1`,
  *     main.py:78): RDD `zipWithIndex`, which is fully distributed
  *     (one lightweight job to count per-partition sizes, then a
  *     per-partition offset add) — no single-partition window, no
  *     global sort, survives a 100× scale-up.
  */
object CsvIngest {

  val RowId = "_row_id"

  /** Format-dispatching source reader (the "universal importer"
    * surface): csv is the reference's path; json/parquet sources are
    * normalized to all-string columns so the same lexical validation
    * pipeline applies regardless of the wire format.
    */
  def read(spark: SparkSession, spec: EntitySpec, dense: Boolean = true): DataFrame =
    spec.format match {
      case "csv" => readPath(spark, spec.source, dense)
      case "json" | "parquet" =>
        val raw = spark.read.format(spec.format).load(spec.source)
        val asStrings = raw.select(raw.columns.map(c => col(c).cast("string").as(c)): _*)
        if (dense) withDenseRowIds(asStrings)
        else asStrings.withColumn(RowId, monotonically_increasing_id())
      case other =>
        throw new IllegalArgumentException(s"unsupported source format '$other' for entity '${spec.name}'")
    }

  def readPath(spark: SparkSession, path: String, dense: Boolean = true): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .csv(path)
    if (dense) withDenseRowIds(raw) else raw.withColumn(RowId, monotonically_increasing_id())
  }

  /** Append 1-based dense input-order row ids via zipWithIndex. */
  def withDenseRowIds(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(df.schema.fields :+ StructField(RowId, LongType, nullable = false))
    val rdd = df.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ (idx + 1L))
    }
    spark.createDataFrame(rdd, schema)
  }
}
