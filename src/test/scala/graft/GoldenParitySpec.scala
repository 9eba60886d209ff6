package graft

import graft.config.PipelineConfig
import graft.pipeline.Pipeline
import java.nio.file.{Files, Paths}
import java.time.LocalDate
import scala.sys.process._

/** Golden end-to-end parity against the LIVE reference: run
  * `python3 /root/reference/main.py` and this engine's pipeline on
  * IDENTICAL inputs (the reference's own config.yaml + input_data,
  * source paths absolutized, `duplicate_resolution_compat: reference`
  * added — a settings key the reference's validate_config ignores,
  * main.py:15-33), then diff every file under `output/exports` and
  * `output/errors`.
  *
  * Exports and dedup/custom error CSVs must be BYTE-IDENTICAL modulo
  * one documented divergence:
  *   D1 bool spelling — the reference's pandas error writer emits
  *      Python `True`/`False` (main.py:396 to_csv of coerced records)
  *      while Spark, like the reference's own DuckDB export writer,
  *      emits `true`/`false`; normalized before comparing.
  * Schema-validation error CSVs additionally carry the second
  * documented divergence:
  *   D2 `errors` message text — category-level vs Pydantic byte text
  *      (SURVEY §2.5) — and the reference serializes its
  *      pandas-typed raw record (ints like `40` print `40`, floats
  *      `30000.0`) while this engine captures the raw CSV strings
  *      (`30000`); those files compare flagged row ids and
  *      value-normalized data cells, not message bytes.
  *
  * The suite CANCELS (not fails) when the reference checkout or the
  * driver-side python3+pydantic+duckdb stack is unavailable.
  */
class GoldenParitySpec extends SparkSpec {

  private val refMain = "/root/reference/main.py"
  private val refInput = "/root/reference/input_data"

  private lazy val referenceRunnable: Boolean =
    Files.exists(Paths.get(refMain)) && Files.exists(Paths.get(refInput)) &&
      (try Process(Seq("python3", "-c", "import duckdb, pandas, yaml, pydantic")).! == 0
      catch { case _: Throwable => false })

  /** Both engines pinned to the same as-of date: the reference always
    * uses the run date (main.py:169 datetime.today()), so ours gets
    * today too.
    */
  private val asOf = LocalDate.now()

  /** Copy the reference fixtures into `dir`, absolutize source paths,
    * inject the compat flag; optionally append rows to employees.csv.
    * Returns the config path.
    */
  private def materialize(dir: String, extraEmployeeRows: Seq[String] = Nil): String = {
    val inDir = s"$dir/input_data"
    Files.createDirectories(Paths.get(inDir))
    for (f <- Seq("employees.csv", "locations.csv")) {
      val body = Files.readString(Paths.get(s"$refInput/$f"))
      val full =
        if (f == "employees.csv" && extraEmployeeRows.nonEmpty)
          body.stripSuffix("\n") + extraEmployeeRows.mkString("\n", "\n", "\n")
        else body
      Files.writeString(Paths.get(s"$inDir/$f"), full)
    }
    val cfg = Files.readString(Paths.get("/root/reference/config.yaml"))
      .replace("\"./input_data/", s"\"$inDir/")
      .replace("custom_validation_mode: \"skip\"",
        "custom_validation_mode: \"skip\"\n      duplicate_resolution_compat: \"reference\"")
    val cfgPath = s"$dir/config.yaml"
    Files.writeString(Paths.get(cfgPath), cfg)
    cfgPath
  }

  /** Returns (exitCode, stdout, stderr). */
  private def runReference(
      cfgPath: String, entity: String, outDir: String): (Int, String, String) = {
    val out = new StringBuilder
    val err = new StringBuilder
    val logger = ProcessLogger(
      l => { out.append(l).append('\n'); () },
      l => { err.append(l).append('\n'); () })
    val code = Process(
      Seq("python3", refMain, entity, "--config", cfgPath, "--output_dir", outDir),
      new java.io.File(System.getProperty("java.io.tmpdir"))).!(logger)
    (code, out.toString, err.toString)
  }

  private def runReferenceOk(cfgPath: String, entity: String, outDir: String): String = {
    val (code, out, err) = runReference(cfgPath, entity, outDir)
    assert(code == 0, s"reference exited $code:\n$out\n$err")
    out
  }

  /** D1 normalization: Python bool spellings → lowercase. */
  private def normBools(text: String): String =
    text.replaceAll("\\bTrue\\b", "true").replaceAll("\\bFalse\\b", "false")

  private def readFile(path: String): String = {
    assert(Files.exists(Paths.get(path)), s"missing expected output $path")
    Files.readString(Paths.get(path))
  }

  private def assertFileParity(refDir: String, graftDir: String, rel: String): Unit = {
    val ref = normBools(readFile(s"$refDir/$rel"))
    val got = readFile(s"$graftDir/$rel")
    if (rel.startsWith("errors/")) {
      // error-CSV row ORDER is unspecified (README tolerance — the
      // reference's DuckDB join order varies run to run) → compare
      // header byte-equal + row multiset
      val refLines = ref.linesIterator.toSeq
      val gotLines = got.linesIterator.toSeq
      assert(refLines.headOption == gotLines.headOption, s"$rel header diverges")
      assert(refLines.tail.sorted == gotLines.tail.sorted,
        s"$rel rows diverge:\n--- reference\n$ref\n--- graft\n$got")
    } else
      assert(ref == got, s"$rel diverges:\n--- reference\n$ref\n--- graft\n$got")
  }

  /** D2 normalization of a schema-error CSV: (row id, column, value)
    * triples over the data cells only — message text and pandas-typed
    * numeric spellings (`40.0` vs `40`) are the documented divergence.
    */
  private def cells(df: org.apache.spark.sql.DataFrame): Set[(String, String, String)] = {
    val dataCols = df.columns.filterNot(Seq("row", "errors").contains)
    df.collect().iterator.flatMap { row =>
      val id = row.getAs[String]("row")
      dataCols.iterator.map { c =>
        val raw = Option(row.getAs[String](c)).getOrElse("")
        val norm = try BigDecimal(raw).underlying.stripTrailingZeros.toPlainString
        catch { case _: NumberFormatException => normBools(raw) }
        (id, c, norm)
      }
    }.toSet
  }

  test("employees end-to-end: exports and error CSVs byte-match the live reference") {
    assume(referenceRunnable, "reference checkout or driver python stack unavailable")
    val dir = tmpDir("golden-clean")
    val cfgPath = materialize(dir)
    runReferenceOk(cfgPath, "employees", s"$dir/ref_out")
    val r = Pipeline.run(spark, PipelineConfig.load(cfgPath), "employees", s"$dir/graft_out", asOf)
    try {
      for (rel <- Seq(
          "exports/personal_data.csv",
          "exports/contract_data.csv",
          "errors/employees_duplicates_errors.csv",
          "errors/employees_custom_birthday_on_errors.csv"))
        assertFileParity(s"$dir/ref_out", s"$dir/graft_out", rel)
      // no schema errors on the clean fixture — in either engine
      assert(!Files.exists(Paths.get(s"$dir/ref_out/errors/employees_schema_validation_errors.csv")))
      assert(!Files.exists(Paths.get(s"$dir/graft_out/errors/employees_schema_validation_errors.csv")))
    } finally r.unpersist()
  }

  test("schema-error inputs: both engines flag the same rows; valid outputs still match") {
    assume(referenceRunnable, "reference checkout or driver python stack unavailable")
    val dir = tmpDir("golden-errors")
    // two appended rows that fail schema validation in both engines:
    // data row 13 breaks the email pattern, row 14 the working_hours
    // int coercion; both pass every other declared check
    val cfgPath = materialize(dir, extraEmployeeRows = Seq(
      "11,111,Bad,Mail,not-an-email,male,1988-01-01,ES,2024-01-01,2024-01-01,2025-01-01," +
        "true,false,2024-06-30,30000,yearly,\"monday,tuesday\",40,week,2000,40,2024-01-01,2024-01-01,1",
      "12,112,Zoe,Hours,zoe@example.com,female,1987-02-02,FR,2024-01-01,2024-01-01,2025-01-01," +
        "true,false,2024-06-30,31000,monthly,\"monday,tuesday\",forty,week,2000,40,2024-01-01,2024-01-01,2"))
    runReferenceOk(cfgPath, "employees", s"$dir/ref_out")
    val r = Pipeline.run(spark, PipelineConfig.load(cfgPath), "employees", s"$dir/graft_out", asOf)
    try {
      // the valid-row surface is unchanged by the two rejects and must
      // still byte-match
      for (rel <- Seq(
          "exports/personal_data.csv",
          "exports/contract_data.csv",
          "errors/employees_duplicates_errors.csv",
          "errors/employees_custom_birthday_on_errors.csv"))
        assertFileParity(s"$dir/ref_out", s"$dir/graft_out", rel)

      // schema CSVs: same flagged rows, same data cells (D2: message
      // text + raw-value formatting differ → parse and normalize)
      val rel = "errors/employees_schema_validation_errors.csv"
      def parsed(path: String) =
        spark.read.option("header", "true").csv(path)
      val ref = parsed(s"$dir/ref_out/$rel")
      val got = parsed(s"$dir/graft_out/$rel")
      assert(ref.columns.toSet == got.columns.toSet,
        s"schema error columns diverge: ${ref.columns.toSeq} vs ${got.columns.toSeq}")
      assert(ref.columns.take(2).toSeq == Seq("row", "errors"))
      assert(got.columns.take(2).toSeq == Seq("row", "errors"))
      assert(ref.select("row").collect().map(_.getString(0)).sorted.toSeq == Seq("13", "14"))
      assert(cells(ref) == cells(got))
    } finally r.unpersist()
  }

  test("committed golden fixtures replay with the pinned as-of date (no python needed)") {
    // the fixtures under src/test/resources/golden/ were captured by
    // tools/golden/generate_golden.py from the live reference with
    // as-of pinned to 2026-01-01 — replaying them here keeps parity
    // coverage in environments without the driver python stack and
    // pins the fixtures themselves against drift. The input CSVs are
    // committed alongside (golden/input_data), so the config's
    // /root/reference source paths are rewritten to them and the test
    // runs with NO reference checkout at all.
    val golden = new java.io.File(getClass.getResource("/golden").toURI).getAbsolutePath
    val pinned = LocalDate.of(2026, 1, 1)
    val cfgDir = tmpDir("golden-fixture-cfg")
    Files.writeString(Paths.get(s"$cfgDir/config.yaml"),
      Files.readString(Paths.get(s"$golden/config.yaml"))
        .replace("/root/reference/input_data/", s"$golden/input_data/"))
    for (entity <- Seq("employees", "locations")) {
      val out = tmpDir(s"golden-fixture-$entity")
      val r = Pipeline.run(spark, PipelineConfig.load(s"$cfgDir/config.yaml"), entity, out, pinned)
      try {
        val entityDir = new java.io.File(s"$golden/$entity")
        val fixtureCsvs = for {
          sub <- Seq("exports", "errors")
          f <- Option(new java.io.File(entityDir, sub).listFiles())
            .getOrElse(Array.empty[java.io.File]).toSeq.sortBy(_.getName)
          if f.getName.endsWith(".csv")
        } yield (sub, f)
        assert(fixtureCsvs.nonEmpty, s"no fixture CSVs found for $entity")
        for ((sub, f) <- fixtureCsvs) {
          val rel = s"$sub/${f.getName}"
          if (f.getName.contains("schema_validation")) {
            // D2: message text + numeric spellings differ → compare
            // flagged rows, normalized data cells, AND the failing
            // fields per row (the `field:` prefix of each "; "-joined
            // message is shared across both engines — only the text
            // after the colon is the documented divergence)
            val ref = spark.read.option("header", "true").csv(f.getAbsolutePath)
            val got = spark.read.option("header", "true").csv(s"$out/$rel")
            assert(ref.columns.toSet == got.columns.toSet, s"$rel columns diverge")
            def flagged(df: org.apache.spark.sql.DataFrame): Map[String, Set[String]] =
              df.select("row", "errors").collect().iterator.map { r =>
                r.getString(0) -> Option(r.getString(1)).getOrElse("")
                  .split("; ").iterator.map(_.takeWhile(_ != ':').trim)
                  .filter(_.nonEmpty).toSet
              }.toMap
            val refFlagged = flagged(ref)
            val gotFlagged = flagged(got)
            assert(refFlagged.keySet == gotFlagged.keySet, s"$rel flagged row ids diverge")
            assert(refFlagged == gotFlagged, s"$rel failing-field sets diverge: " +
              s"$refFlagged vs $gotFlagged")
            assert(cells(ref) == cells(got), s"$rel cells diverge")
          } else if (sub == "errors") {
            // error-CSV row ORDER is unspecified (README tolerance) →
            // compare header + row set
            val refLines = normBools(readFile(f.getAbsolutePath)).linesIterator.toSeq
            val gotLines = readFile(s"$out/$rel").linesIterator.toSeq
            assert(refLines.head == gotLines.head, s"$rel header diverges")
            assert(refLines.tail.toSet == gotLines.tail.toSet, s"$rel rows diverge")
          } else assertFileParity(s"$golden/$entity", out, rel)
        }
      } finally r.unpersist()
    }
  }

  test("locations negative path: same configuration error as the reference") {
    assume(referenceRunnable, "reference checkout or driver python stack unavailable")
    val dir = tmpDir("golden-locations")
    val cfgPath = materialize(dir)
    // the reference's locations entity ships without a settings block →
    // validate_config raises KeyError. Note validate_config runs BEFORE
    // main.py's try block (main.py:412 vs 429), so the reference
    // actually dies with an uncaught traceback and exit 1 — the
    // "Configuration Error" envelope never fires for config errors.
    // Same gate (missing settings), same message text here; this
    // engine's CLI wraps it in the envelope the reference intended.
    val (code, _, err) = runReference(cfgPath, "locations", s"$dir/ref_out")
    assert(code != 0, "reference unexpectedly accepted the settings-less locations entity")
    val refMsg = err.linesIterator.filter(_.contains("KeyError")).toSeq.lastOption
      .getOrElse(fail(s"reference did not raise KeyError:\n$err"))
    val ex = intercept[NoSuchElementException] {
      PipelineConfig.load(cfgPath).entity("locations")
    }
    // python str(KeyError) wraps the message in quotes; compare content
    assert(refMsg.contains(s""""${ex.getMessage}""""),
      s"messages diverge:\n  reference: $refMsg\n  graft:     ${ex.getMessage}")
    assert(!Files.exists(Paths.get(s"$dir/ref_out/exports")))
  }
}
