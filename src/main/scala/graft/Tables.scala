package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Helpers for reading the driver-provided parquet testdata tables
  * (see TESTDATA.md). Every `SparkEntry.queries` entry receives a
  * scale-factor directory and reads only via these helpers, so filter
  * pushdown / column pruning reach the parquet scans unchanged.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame  = apply(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame    = apply(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame  = apply(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame  = apply(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame      = apply(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame    = apply(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame    = apply(spark, sfDir, "region")
  /** events.parquet has shipped `ts` in three physical shapes across
    * testdata generations: parquet TIMESTAMP(NANOS) (read as a raw
    * LongType under `spark.sql.legacy.parquet.nanosAsLong=true`, set by
    * Verify/Bench/test sessions), naive TIMESTAMP(MICROS)
    * (isAdjustedToUTC=false → Spark TIMESTAMP_NTZ), and UTC-adjusted
    * micros (TimestampType). Normalize all three to the same surface:
    * exact nanos `ts_ns` (for oracle-matched arithmetic — DuckDB's
    * `epoch_ns(ts)`) and a microsecond TimestampType `ts` for
    * event-time operators. The NTZ→LTZ cast reinterprets wall time in
    * the session timezone, which every session pins to UTC, so the
    * underlying micros value is unchanged and DuckDB (which reads the
    * same naive column as its epoch value) agrees.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = apply(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts_ns", col("ts"))
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts")) * 1000)
      case _ =>
        raw.withColumn("ts_ns", unix_micros(col("ts")) * 1000)
    }
  }
  /** documents/embeddings ship as one small parquet file per scale =
    * one scan partition, which serializes every downstream per-row
    * computation (hashing, shingling, cosine). Spread compute across
    * the cores when the scan has fewer splits than the cluster —
    * a no-op on real multi-file datasets, a 30× win on the testdata.
    */
  private def parallelized(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  def documents(spark: SparkSession, sfDir: String): DataFrame =
    parallelized(apply(spark, sfDir, "documents"))
  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    parallelized(apply(spark, sfDir, "embeddings"))
}
