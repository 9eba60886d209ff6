package graft.operators

import graft.functions.TextFunctions.canonicalFingerprint
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-batch exact dedup for incremental ingestion: a persistent
  * parquet LEDGER of canonical content fingerprints accumulates across
  * batches, and each new batch drops rows whose fingerprint was seen
  * in ANY earlier batch (then dedups within itself), durably writes
  * its survivors, and only then appends their fingerprints.
  *
  * Scale shape: one anti-join of the batch against the ledger on the
  * fingerprint (shuffle keyed by hash — or shuffle-free if both sides
  * are bucketed on it, see [[graft.sinks.BucketedSink]]) plus one
  * within-batch window. The ledger stores only (fingerprint) — bytes
  * per document, not the document.
  *
  * Failure semantics — the ordering is the contract: survivors are
  * committed to `outputDir` BEFORE their fingerprints reach the
  * ledger, so a crash between the two re-admits (and overwrites) one
  * batch's output on retry, never silently drops it. Ledger-committed
  * hashes are never lost; re-running an already-ledgered batch
  * produces zero survivors.
  */
object IncrementalDedup {

  /** Process one batch: anti-join the ledger, dedup within the batch,
    * write survivors to `outputDir` (overwrite — retries are
    * idempotent per batch directory), then append fingerprints to the
    * ledger. Returns the durably written survivors (read back, so the
    * result no longer depends on the ledger state).
    */
  def ingestBatch(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      ledgerPath: String,
      outputDir: String): DataFrame = {
    val spark = batch.sparkSession
    val hashed = batch.withColumn("_fp", canonicalFingerprint(col(textCol)))

    val unseen =
      if (ledgerExists(spark, ledgerPath))
        hashed.join(spark.read.parquet(ledgerPath), Seq("_fp"), "left_anti")
      else hashed

    // within-batch exact dedup: keep the smallest id per fingerprint
    val w = Window.partitionBy(col("_fp")).orderBy(col(idCol))
    val survivors = unseen
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")

    // 1. durable output first …
    survivors.write.mode("overwrite").parquet(outputDir)
    val written = spark.read.parquet(outputDir)
    // 2. … ledger append second — and from the WRITTEN data, so the
    // appended hashes exactly match what the output directory holds
    written.select(col("_fp")).write.mode("append").parquet(ledgerPath)
    written.drop("_fp")
  }

  /** True only if the ledger holds committed data files (not just job
    * debris like _temporary/_SUCCESS from a killed first append).
    */
  private def ledgerExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
  }
}
