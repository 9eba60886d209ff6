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
}
