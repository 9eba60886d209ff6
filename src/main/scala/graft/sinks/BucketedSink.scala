package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed/partitioned table layout for shuffle-free downstream
  * joins and partition-pruned scans — the storage half of the 100 TB
  * posture.
  *
  * Writing both sides of a recurring join bucketed by the join key
  * (same bucket count) lets Spark plan a SortMergeJoin with NO
  * exchange on either side; date-partitioning gives static and
  * dynamic partition pruning on time-ranged queries.
  */
object BucketedSink {

  /** Persist as a bucketed (+ optionally sorted / partitioned) managed
    * table. Requires a warehouse-enabled session; bucket metadata
    * lives in the catalog, so readers must use `spark.table(name)`.
    */
  def writeBucketed(
      df: DataFrame,
      name: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Seq.empty,
      partitionCols: Seq[String] = Seq.empty): Unit = {
    var w = df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    if (partitionCols.nonEmpty) w = w.partitionBy(partitionCols: _*)
    w.saveAsTable(name)
  }

  /** True when a sort-merge join of the two catalog tables on `keys`
    * plans without a shuffle on either side (bucket layouts line up).
    * The merge hint pins the join strategy so a small side being
    * auto-broadcast doesn't mask the bucketing question; broadcast
    * exchanges are not shuffles and don't count.
    */
  def joinIsShuffleFree(spark: SparkSession, left: String, right: String,
      keys: Seq[String]): Boolean = {
    val plan = spark.table(left).hint("merge")
      .join(spark.table(right).hint("merge"), keys)
      .queryExecution.executedPlan
    !plan.toString.contains("Exchange hashpartitioning")
  }
}
