package graft.operators

import graft.functions.TextFunctions.canonicalFingerprint
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-batch exact dedup for incremental ingestion: a persistent
  * parquet LEDGER of canonical content fingerprints accumulates across
  * batches, and each new batch drops rows whose fingerprint was seen
  * in ANY earlier batch (then dedups within itself) before appending
  * its surviving fingerprints.
  *
  * Scale shape: one anti-join of the batch against the ledger on the
  * fingerprint (shuffle keyed by hash — or shuffle-free if both sides
  * are bucketed on it, see [[graft.sinks.BucketedSink]]) plus one
  * within-batch window. The ledger stores only (fingerprint) — bytes
  * per document, not the document.
  *
  * Failure semantics: the ledger append is the LAST step, so a crash
  * mid-batch re-admits at most one batch's rows on retry (duplicates
  * are re-dropped when the batch is re-run; the ledger never loses
  * hashes it committed). Idempotent re-runs of the same batch produce
  * zero survivors.
  */
object IncrementalDedup {

  /** Process one batch against the ledger at `ledgerPath`; returns the
    * surviving (previously unseen) rows and appends their fingerprints.
    */
  def ingestBatch(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      ledgerPath: String): DataFrame = {
    val spark = batch.sparkSession
    val hashed = batch.withColumn("_fp", canonicalFingerprint(col(textCol)))

    val unseen =
      if (ledgerExists(spark, ledgerPath))
        hashed.join(spark.read.parquet(ledgerPath), Seq("_fp"), "left_anti")
      else hashed

    // within-batch exact dedup: keep the smallest id per fingerprint.
    // localCheckpoint SEVERS lineage before the ledger append — a lazy
    // plan re-evaluated after the append would anti-join against the
    // ledger that now contains this batch's own hashes and come back
    // empty.
    val w = Window.partitionBy(col("_fp")).orderBy(col(idCol))
    val survivors = unseen
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
      .localCheckpoint(true)

    survivors.select(col("_fp")).write.mode("append").parquet(ledgerPath)
    survivors.drop("_fp")
  }

  private def ledgerExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }
}
