package graft.plans

import org.apache.spark.sql.SparkSession

/** Scoped session-conf override for EAGER operators.
  *
  * AQE's byte-based partition coalescing assumes stage cost tracks
  * shuffle bytes. A few operators break that assumption structurally:
  * LSH bucket self-joins (output quadratic per bucket) and
  * set-similarity verifies (few rows, heavy per-row array CPU) arrive
  * as kilobytes and coalesce to one task, serializing the most
  * expensive stage of the query. For those stages the right dial is
  * `spark.sql.adaptive.coalescePartitions.minPartitionSize` — but
  * globally lowering it taxes every iterative operator with dozens of
  * genuinely tiny shuffles (measured +0.3–0.7 s each at sf0.1).
  *
  * `withMinPartitionSize` scopes the override to one operator's own
  * Spark actions. ONLY safe for eager operators that materialize every
  * result (localCheckpoint/collect) before returning — a lazy frame
  * escaping the scope would plan under the restored conf. Sessions are
  * assumed to run queries sequentially (true of Bench/Verify and any
  * sane driver loop); concurrent same-session queries would observe
  * the override for the duration of the block.
  */
object ConfScope {
  private val MinPartitionSizeKey =
    "spark.sql.adaptive.coalescePartitions.minPartitionSize"

  def withMinPartitionSize[T](spark: SparkSession, size: String)(body: => T): T = {
    val prev = spark.conf.getOption(MinPartitionSizeKey)
    spark.conf.set(MinPartitionSizeKey, size)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(MinPartitionSizeKey, v)
      case None    => spark.conf.unset(MinPartitionSizeKey)
    }
  }
}
