package graft

import graft.config.PipelineConfig

class ConfigSpec extends SparkSpec {

  test("valid config parses with source, settings, rules, projections") {
    val cfg = PipelineConfig.fromYaml(Fixtures.configYaml)
    val e = cfg.entity("employees")
    assert(e.source == "PLACEHOLDER")
    assert(e.settings.duplicateResolution == "last")
    assert(e.settings.customValidationMode == "skip")
    assert(e.settings.uniqueComposite == Seq(Seq("employee_id", "company_id")))
    assert(e.fields.map(_.name).contains("email"))
    assert(e.fields.find(_.name == "email").get.pattern.isDefined)
    assert(e.rules.map(_.validation) == Seq("age_gte"))
    assert(e.rules.head.params("min_age").toString.toInt == 35)
    assert(e.projections.map(_.name) == Seq("personal_data", "contract_data"))
    assert(e.projections(1).aliases == Map("employee_id" -> "emp_id"))
  }

  test("duplicate_resolution_compat flips last to the executed-reference behavior") {
    val cfg = PipelineConfig.fromYaml(Fixtures.configYaml)
    val e = cfg.entity("employees") // no compat key → documented semantics
    assert(e.settings.duplicateResolutionCompat == "documented")
    assert(e.settings.effectiveResolution == "last")
    val compat = e.settings.copy(duplicateResolutionCompat = "reference")
    // reference mode: 'last' runs as the reference EXECUTES it (keep
    // first, main.py:131-152); first/exclude_all are unaffected
    assert(compat.effectiveResolution == "first")
    assert(compat.copy(duplicateResolution = "first").effectiveResolution == "first")
    assert(compat.copy(duplicateResolution = "exclude_all").effectiveResolution == "exclude_all")
    // the yaml key parses through
    val y = Fixtures.configYaml.replace("custom_validation_mode: \"skip\"",
      "custom_validation_mode: \"skip\"\n      duplicate_resolution_compat: \"reference\"")
    assert(PipelineConfig.fromYaml(y).entity("employees").settings.effectiveResolution == "first")
    // unknown mode rejected
    intercept[IllegalArgumentException] {
      e.settings.copy(duplicateResolutionCompat = "nope")
    }
  }

  test("missing entity raises (validate_config parity, main.py:17-18)") {
    val cfg = PipelineConfig.fromYaml(Fixtures.configYaml)
    val ex = intercept[NoSuchElementException](cfg.entity("nope"))
    assert(ex.getMessage.contains("'nope' not found"))
  }

  test("missing settings raises (validate_config parity, main.py:21-31)") {
    val cfg = PipelineConfig.fromYaml(Fixtures.invalidConfigYaml)
    val ex = intercept[NoSuchElementException](cfg.entity("employees"))
    assert(ex.getMessage.contains("settings"))
  }

  test("missing duplicate_resolution in settings raises") {
    val yaml =
      """transformations_config:
        |  e:
        |    source: "x.csv"
        |    settings:
        |      custom_validation_mode: "skip"
        |    validations: {}
        |""".stripMargin
    val ex = intercept[NoSuchElementException](PipelineConfig.fromYaml(yaml).entity("e"))
    assert(ex.getMessage.contains("duplicate_resolution"))
  }
}
