package graft.pipeline

import graft.config.{EntitySpec, PipelineConfig}
import graft.dedup.Dedup
import graft.ingest.CsvIngest
import graft.project.Projections
import graft.rules.CustomRules
import graft.sinks.Sinks
import graft.validate.SchemaValidator
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel
import java.time.LocalDate

/** End-to-end entity pipeline orchestration (reference main.py:401-505):
  *
  *   read CSV → schema validation (vectorized) → raw → dedup →
  *   custom rules → projections → CSV exports + error CSVs → summary
  *
  * Stage boundaries that the reference materializes as DuckDB tables
  * (raw/stage CTAS) become cache() points here — needed anyway because
  * valid/error/dup splits each traverse the same parent.
  *
  * Quirks kept for parity:
  *   - `custom_validation_mode == "stop"` also gates *schema* errors
  *     (main.py:435-439) — the flag's name notwithstanding;
  *   - error CSVs are written before the stop-gate fires;
  *   - a `stop` custom rule raises after capturing its issue set.
  */
object Pipeline {

  final case class PipelineSummary(
      totalRows: Long,
      validRows: Long,
      schemaErrorRows: Long,
      customInvalidRows: Long,
      duplicateRowsRemoved: Long,
      projectionRows: Map[String, Long],
      stoppedAtSchemaErrors: Boolean)

  final case class PipelineResult(
      summary: PipelineSummary,
      stage: Option[DataFrame],
      schemaErrors: DataFrame,
      duplicates: Option[DataFrame],
      ruleIssues: Seq[CustomRules.RuleIssue],
      projections: Seq[Projections.ProjectionResult],
      /** intermediates persisted by multi-key dedup / multi-rule runs */
      intermediateCaches: Seq[DataFrame] = Seq.empty) {

    /** Release every DataFrame this run cached (stage barriers, table
      * projections, fold intermediates) — call when done consuming the
      * result in a long-lived session; a run-and-exit CLI doesn't
      * strictly need to.
      */
    def unpersist(): Unit = {
      stage.foreach(_.unpersist())
      schemaErrors.unpersist()
      duplicates.foreach(_.unpersist())
      projections.foreach(_.df.unpersist())
      intermediateCaches.foreach(_.unpersist())
      ()
    }
  }

  def run(
      spark: SparkSession,
      config: PipelineConfig,
      entityName: String,
      outputDir: String,
      asOf: LocalDate = LocalDate.now(),
      sourceOverride: Option[String] = None): PipelineResult = {

    val spec0 = config.entity(entityName)
    val spec: EntitySpec = sourceOverride.fold(spec0)(src => spec0.copy(source = src))

    // 1. ingest + 2. schema validation
    val input = CsvIngest.read(spark, spec, fileAware = spec.settings.fileAware)
    val vr = SchemaValidator.validate(input, spec.fields)
    val schemaErrors = vr.errors.persist(StorageLevel.MEMORY_AND_DISK)
    val schemaErrorCount = schemaErrors.count()
    Sinks.saveErrors(schemaErrors, "schema_validation", entityName, outputDir)

    // 3. raw table (materialization barrier, main.py:90-95) — persisted
    // before the stop gate so the gate's totals come from the already
    // computed valid/error frames instead of a second source scan.
    val raw = vr.valid.persist(StorageLevel.MEMORY_AND_DISK)
    val validRows = raw.count()

    if (schemaErrorCount > 0 && spec.settings.customValidationMode == "stop") {
      return PipelineResult(
        PipelineSummary(validRows + schemaErrorCount, validRows, schemaErrorCount, 0, 0,
          Map.empty, stoppedAtSchemaErrors = true),
        None, schemaErrors, None, Seq.empty, Seq.empty,
        intermediateCaches = Seq(raw))
    }

    // 4. dedup raw → stage (main.py:97-159)
    val dd = Dedup(raw, spec.settings.uniqueComposite, spec.settings.effectiveResolution)
    val duplicates = dd.removed.persist(StorageLevel.MEMORY_AND_DISK)
    val duplicatesRemoved = duplicates.count()
    if (duplicatesRemoved > 0)
      Sinks.saveErrors(duplicates, "duplicates", entityName, outputDir)

    // 5. custom rules (main.py:161-197); stop mode raises out of here
    // after the issue capture, like the reference's ValueError.
    val rr = CustomRules.execute(
      dd.survivors, spec.rules, spec.settings.customValidationMode, asOf)
    for (issue <- rr.issues)
      Sinks.saveErrors(issue.invalidRows, s"custom_${issue.field}", entityName, outputDir)

    val stage = rr.survivors.persist(StorageLevel.MEMORY_AND_DISK)

    // 6. projections (user SQL over the stage view). The stage is
    // sorted by _row_id BEFORE the id is dropped so projection output
    // (and therefore the exports) comes out in input order, matching
    // the reference's ROWID-ordered table scans (main.py:323). For
    // plain SELECT projections the sort survives to the single-file
    // writer; queries that aggregate define their own order, exactly
    // as in the reference.
    val projections = Projections.run(
      spark, stage.orderBy(CsvIngest.RowId).drop(CsvIngest.RowId), spec)

    // 7. exports
    for (p <- projections)
      Sinks.exportProjection(p.df, p.spec.name, outputDir, format = spec.exportFormat)

    val projectionRows = projections.map(p => p.spec.name -> p.df.count()).toMap

    PipelineResult(
      PipelineSummary(
        totalRows = validRows + schemaErrorCount,
        validRows = validRows,
        schemaErrorRows = schemaErrorCount,
        customInvalidRows = rr.totalInvalidRows,
        duplicateRowsRemoved = duplicatesRemoved,
        projectionRows = projectionRows,
        stoppedAtSchemaErrors = false),
      Some(stage), schemaErrors, Some(duplicates), rr.issues, projections,
      intermediateCaches = dd.cached ++ rr.cached)
  }
}
