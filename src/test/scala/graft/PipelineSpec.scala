package graft

import graft.config.PipelineConfig
import graft.pipeline.Pipeline
import java.time.LocalDate
import scala.jdk.CollectionConverters._

/** Golden end-to-end: full pipeline on the self-authored employees
  * fixture (SURVEY.md §5.2 item 2) — 14 rows in, 2 schema errors, 2
  * duplicates (keep-last), 2 age_gte(35) failures skipped, 2 table
  * projections exported as single CSVs.
  */
class PipelineSpec extends SparkSpec {

  private lazy val run = {
    val dir = tmpDir("pipeline")
    val (cfgPath, _) = Fixtures.materialize(dir)
    val out = s"$dir/output"
    val result = Pipeline.run(
      spark, PipelineConfig.load(cfgPath), "employees", out,
      asOf = LocalDate.parse("2026-01-01"))
    (result, out)
  }

  test("summary counts match the fixture's construction") {
    val (r, _) = run
    assert(r.summary.totalRows == 14)
    assert(r.summary.validRows == 12)
    assert(r.summary.schemaErrorRows == 2)
    assert(r.summary.duplicateRowsRemoved == 2)
    assert(r.summary.customInvalidRows == 2) // ids 5, 6 under 35
    assert(r.summary.projectionRows == Map("personal_data" -> 8, "contract_data" -> 8))
    assert(!r.summary.stoppedAtSchemaErrors)
  }

  test("keep-last resolution kept the later duplicate (gus2 email)") {
    val (r, _) = run
    import spark.implicits._
    val emails = r.stage.get.select("email").as[String].collect().toSet
    assert(emails.contains("gus2@example.com"))
    assert(!emails.contains("gus@example.com"))
  }

  test("duplicate_resolution_compat: reference makes 'last' keep the first occurrence") {
    val dir = tmpDir("pipeline-compat")
    val (cfgPath, _) = Fixtures.materialize(dir)
    val yaml = java.nio.file.Files.readString(java.nio.file.Paths.get(cfgPath))
      .replace("custom_validation_mode: \"skip\"",
        "custom_validation_mode: \"skip\"\n      duplicate_resolution_compat: \"reference\"")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(cfgPath), yaml)
    val r = Pipeline.run(
      spark, PipelineConfig.load(cfgPath), "employees", s"$dir/output",
      asOf = LocalDate.parse("2026-01-01"))
    import spark.implicits._
    // same dup pair as the keep-last test, but the executed-reference
    // semantics keep the EARLIER row (gus, not gus2)
    val emails = r.stage.get.select("email").as[String].collect().toSet
    assert(emails.contains("gus@example.com"))
    assert(!emails.contains("gus2@example.com"))
    assert(r.summary.duplicateRowsRemoved == 2)
  }

  test("export + error CSV layout matches the reference naming") {
    val (_, out) = run
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(out))
      .iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
      .map(_.toString.stripPrefix(out + "/")).toSet
    assert(files.contains("exports/personal_data.csv"))
    assert(files.contains("exports/contract_data.csv"))
    assert(files.contains("errors/employees_schema_validation_errors.csv"))
    assert(files.contains("errors/employees_duplicates_errors.csv"))
    assert(files.contains("errors/employees_custom_birthday_on_errors.csv"))
  }

  test("exported projection CSV has header and expected rows; alias applied") {
    val (_, out) = run
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(s"$out/exports/contract_data.csv")).asScala
    assert(lines.head.split(",").toSeq == Seq("emp_id", "first_name", "country"))
    assert(lines.size == 9) // header + 8 rows
  }

  test("schema-error CSV flattens errors with '; ' (main.py:391)") {
    val (_, out) = run
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(s"$out/errors/employees_schema_validation_errors.csv")).asScala
    assert(lines.size == 3) // header + 2 error rows
    assert(lines.head.split(",").contains("errors"))
  }

  test("stop mode gates schema errors (main.py:435-439 quirk)") {
    val dir = tmpDir("pipeline-stop")
    val (cfgPath, _) = Fixtures.materialize(dir)
    val yaml = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(cfgPath)), "UTF-8")
      .replace("custom_validation_mode: \"skip\"", "custom_validation_mode: \"stop\"")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(cfgPath), yaml)
    val r = Pipeline.run(
      spark, PipelineConfig.load(cfgPath), "employees", s"$dir/output",
      asOf = LocalDate.parse("2026-01-01"))
    assert(r.summary.stoppedAtSchemaErrors)
    assert(r.projections.isEmpty)
    // errors were still saved before the gate
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/output/errors/employees_schema_validation_errors.csv")))
  }

  test("file_aware setting: multi-file source runs the full pipeline identically") {
    import java.nio.file.{Files, Paths}
    val dir = tmpDir("pipeline-fileaware")
    val (cfgPath, _) = Fixtures.materialize(dir)
    // split the fixture CSV into two ordered part files
    val lines = Fixtures.employeesCsv.split("\n").toSeq
    val srcDir = s"$dir/multisrc"
    Files.createDirectories(Paths.get(srcDir))
    Files.write(Paths.get(srcDir, "part-00000.csv"),
      (lines.head +: lines.tail.take(7)).mkString("\n").getBytes)
    Files.write(Paths.get(srcDir, "part-00001.csv"),
      (lines.head +: lines.tail.drop(7)).mkString("\n").getBytes)
    val yaml = new String(Files.readAllBytes(Paths.get(cfgPath)), "UTF-8")
      .replace("settings:", "settings:\n      file_aware: true")
    Files.writeString(Paths.get(cfgPath), yaml)
    val cfg = PipelineConfig.load(cfgPath)
    assert(cfg.entity("employees").settings.fileAware)
    val r = Pipeline.run(spark, cfg, "employees", s"$dir/out",
      asOf = LocalDate.parse("2026-01-01"), sourceOverride = Some(srcDir))
    // same summary as the single-file fixture run
    assert(r.summary.totalRows == 14 && r.summary.validRows == 12)
    assert(r.summary.duplicateRowsRemoved == 2)

    // file_aware with a non-csv format is rejected, not silently ignored
    val badSpec = cfg.entity("employees").copy(format = "parquet")
    val ex = intercept[IllegalArgumentException] {
      graft.ingest.CsvIngest.read(spark, badSpec, fileAware = true)
    }
    assert(ex.getMessage.contains("only supported for csv"))
  }

  test("alias referencing unknown field skips that projection only") {
    val dir = tmpDir("pipeline-alias")
    val (cfgPath, _) = Fixtures.materialize(dir)
    val yaml = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(cfgPath)), "UTF-8")
      .replace("employee_id: emp_id", "no_such_field: emp_id")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(cfgPath), yaml)
    val r = Pipeline.run(
      spark, PipelineConfig.load(cfgPath), "employees", s"$dir/output",
      asOf = LocalDate.parse("2026-01-01"))
    assert(r.projections.map(_.spec.name) == Seq("personal_data"))
  }
}
