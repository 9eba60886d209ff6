package graft

import graft.config.PipelineConfig
import graft.pipeline.Pipeline
import java.time.LocalDate
import scala.util.Random

/** Seeded fuzz of the whole pipeline: random schemas and messy data
  * (nulls, garbage types, random duplicates) must never throw in skip
  * mode, and the conservation invariants must hold.
  */
class PipelineFuzzSpec extends SparkSpec {

  private def randomCsv(rnd: Random, nRows: Int): (String, String) = {
    def cell(kind: Int): String = kind match {
      case 0 => rnd.nextInt(100).toString            // valid int
      case 1 => f"${rnd.nextDouble() * 100}%.2f"     // float-ish
      case 2 => "garbage-" + rnd.nextInt(10)         // bad for typed fields
      case 3 => ""                                   // empty → null
      case _ => f"19${60 + rnd.nextInt(40)}%02d-0${1 + rnd.nextInt(9)}-1${rnd.nextInt(9)}"
    }
    val header = "id,grp,amount,when,note"
    val rows = (1 to nRows).map { i =>
      val id = if (rnd.nextInt(4) == 0) rnd.nextInt(nRows / 2 + 1) else i
      s"$id,${rnd.nextInt(3)},${cell(rnd.nextInt(5))},${cell(4)},${cell(rnd.nextInt(5))}"
    }
    (header, rows.mkString("\n"))
  }

  private val configYaml =
    """transformations_config:
      |  fuzz:
      |    source: "SRC"
      |    settings:
      |      duplicate_resolution: "RES"
      |      custom_validation_mode: "skip"
      |      unique_composite:
      |        - ["id", "grp"]
      |    projections:
      |      - name: fuzz_out
      |        type: "view"
      |        query: |
      |          SELECT id, grp, amount FROM fuzz
      |    validations:
      |      schema:
      |        fields:
      |          id: {"type": "int", "required": true}
      |          grp: {"type": "int", "required": true}
      |          amount: {"type": "float"}
      |          when: {"type": "str", "pattern": "^\\d{4}-\\d{2}-\\d{2}$"}
      |          note: {"type": "str"}
      |      custom:
      |        rules:
      |          - field: when
      |            validation: "age_gte"
      |            params:
      |              min_age: 10
      |""".stripMargin

  test("random data + all resolutions: no exceptions, conservation holds") {
    for (seed <- 1 to 3; res <- Seq("first", "last", "exclude_all")) {
      val rnd = new Random(seed)
      val dir = tmpDir(s"fuzz-$seed-$res")
      val (header, rows) = randomCsv(rnd, 60)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/fuzz.csv"), header + "\n" + rows)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/config.yaml"),
        configYaml.replace("SRC", s"$dir/fuzz.csv").replace("RES", res))
      val r = Pipeline.run(
        spark, PipelineConfig.load(s"$dir/config.yaml"), "fuzz", s"$dir/out",
        asOf = LocalDate.parse("2026-01-01"))
      val s = r.summary
      assert(s.totalRows == 60, s"total (seed=$seed res=$res)")
      assert(s.validRows + s.schemaErrorRows == s.totalRows, s"validation split (seed=$seed res=$res)")
      // stage = valid - duplicates - custom-skipped
      val stageCount = r.stage.get.count()
      assert(stageCount == s.validRows - s.duplicateRowsRemoved - s.customInvalidRows,
        s"conservation (seed=$seed res=$res): stage=$stageCount summary=$s")
      // survivors unique on the composite key for first/last
      if (res != "exclude_all") {
        val maxPerKey = r.stage.get.groupBy("id", "grp").count()
          .agg(org.apache.spark.sql.functions.max("count")).head().getLong(0)
        assert(maxPerKey <= 1, s"unique keys (seed=$seed res=$res)")
      }
    }
  }
}
