package graft.streaming

import graft.config.EntitySpec
import graft.dedup.Dedup
import graft.ingest.CsvIngest
import graft.validate.SchemaValidator
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Structured-Streaming form of the import pipeline: a file-source
  * stream of CSVs flows through the same validation/dedup stages via
  * foreachBatch, appending survivors and errors to parquet sinks.
  *
  * foreachBatch is the right integration point here: the batch
  * pipeline stages are pure DataFrame→DataFrame functions, so each
  * micro-batch reuses them unchanged (one code path for batch and
  * streaming), while cross-batch duplicate suppression composes via
  * `EventStream.dedupWithinWatermark` upstream when the source has
  * event-time.
  */
object StreamingIngest {

  /** Start the streaming import for an entity: watch `spec.source`
    * (a directory) for new CSV files, validate + dedup each
    * micro-batch, append to `outDir/stage` and `outDir/errors`.
    */
  def start(
      spark: SparkSession,
      spec: EntitySpec,
      outDir: String,
      checkpoint: String): StreamingQuery = {
    // streaming sources need an explicit schema: all-string, like the
    // batch reader (typed casts stay inside the validator). The schema
    // maps CSV columns POSITIONALLY, so the files' column order must
    // match the config's field declaration order (PipelineConfig
    // preserves YAML insertion order for exactly this).
    val schema = StructType(spec.fields.map(f => StructField(f.name, StringType)))
    val stream = spark.readStream
      .option("header", "true")
      .schema(schema)
      .csv(spec.source)
    startFromSource(stream, spec, outDir, checkpoint)
  }

  /** Run the validate + dedup ingest over ANY streaming source — a
    * Kafka topic (`readStream.format("kafka")` + a value-parsing
    * select), a rate source, a socket — whose columns carry the
    * entity's fields as strings. The file-watching [[start]] is just
    * this with a CSV directory source; a log-bus deployment swaps the
    * source expression and nothing downstream changes.
    */
  def startFromSource(
      source: DataFrame,
      spec: EntitySpec,
      outDir: String,
      checkpoint: String): StreamingQuery = {
    require(source.isStreaming, "startFromSource needs a streaming DataFrame (readStream)")
    val missing = spec.fields.map(_.name).filterNot(source.columns.contains)
    require(missing.isEmpty,
      s"streaming source is missing entity fields: ${missing.mkString(", ")}")

    source.writeStream
      .queryName(s"graft-ingest-${spec.name}")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val withIds = batch.withColumn(CsvIngest.RowId, monotonically_increasing_id())
        val vr = SchemaValidator.validate(withIds, spec.fields)
        val dd = Dedup(vr.valid, spec.settings.uniqueComposite, spec.settings.duplicateResolution)
        dd.survivors
          .withColumn("_batch_id", lit(batchId))
          .write.mode("append").parquet(s"$outDir/stage")
        val errs = vr.errors.select(col("row"), concat_ws("; ", col("errors")).as("errors"))
        if (!errs.isEmpty)
          errs.withColumn("_batch_id", lit(batchId))
            .write.mode("append").parquet(s"$outDir/errors")
        ()
      }
      .start()
  }

  /** Streaming NEAR-duplicate suppression: every micro-batch flows
    * through [[graft.operators.IncrementalDedup.ingestBatchNearDup]] —
    * cross-batch dedup against the simhash ledger (8 bytes per
    * document ever admitted), then within-batch pigeonhole pairs +
    * connected components. Survivors land under
    * `outDir/batch_<id>`; the ledger grows by the admitted hashes.
    *
    * Why foreachBatch and not a stateful operator: near-dup state is
    * the FULL history of admitted signatures — unbounded, so it can't
    * live in watermark-evicted streaming state. The ledger is that
    * state made durable and cheap (a probe is a block equi-join, never
    * batch × history), and the two-marker commit protocol makes each
    * batch idempotent: a replay after a crash resumes exactly where
    * the markers say, so the stream is effectively-once end to end.
    */
  def startNearDup(
      source: DataFrame,
      idCol: String,
      textCol: String,
      outDir: String,
      ledgerPath: String,
      checkpoint: String,
      maxHamming: Int = 10,
      shingleN: Int = 2): StreamingQuery = {
    require(source.isStreaming, "startNearDup needs a streaming DataFrame (readStream)")
    source.writeStream
      .queryName("graft-near-dup")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.operators.IncrementalDedup.ingestBatchNearDup(
            batch, idCol, textCol, ledgerPath,
            outputDir = s"$outDir/batch_$batchId",
            maxHamming = maxHamming, shingleN = shingleN)
          ()
        }
      }
      .start()
  }
}
