package graft

/** Self-authored test fixtures with the same *shape* as the reference's
  * shipped employees entity (24-col CSV, dup keys, schema errors, an
  * age-sensitive date column) — data is our own, not copied.
  */
object Fixtures {

  /** 12 data rows: 2 schema-invalid (bad email row 11, bad date row 12),
    * 2 duplicate keys among the valid 10 (ids 3 and 7 repeated), and a
    * spread of birthdays around the age_gte(35) boundary at
    * asOf=2026-01-01 (under-35: ids 5 and 6).
    */
  val employeesCsv: String =
    """company_id,employee_id,first_name,last_name,email,gender,birthday_on,country
      |1,1,Ada,Smith,ada@example.com,female,1980-03-01,ES
      |1,2,Ben,Jones,ben@example.com,male,1985-07-15,ES
      |1,3,Cai,Brown,cai@example.com,male,1990-12-31,FR
      |1,4,Dot,White,dot@example.com,female,1970-01-20,PT
      |1,5,Eli,Green,eli@example.com,male,1995-06-05,ES
      |1,6,Fay,Black,fay@example.com,female,1999-11-11,DE
      |1,7,Gus,Gray,gus@example.com,male,1982-02-02,FR
      |1,8,Hal,Reed,hal@example.com,male,1975-09-09,ES
      |1,9,Ivy,Hall,ivy@example.com,female,1988-04-04,PT
      |1,10,Jan,Wood,jan@example.com,female,1960-08-08,ES
      |1,3,Cai,Brown,cai@example.com,male,1990-12-31,FR
      |1,7,Gus,Gray,gus2@example.com,male,1982-02-02,FR
      |2,11,Kip,Lake,not-an-email,male,1980-01-01,ES
      |2,12,Lou,Moss,lou@example.com,female,1980-13-45,ES""".stripMargin
  // note: 14 data rows total = 10 unique valid + 2 dups + 2 invalid

  val configYaml: String =
    """transformations_config:
      |  employees:
      |    source: "PLACEHOLDER"
      |    settings:
      |      duplicate_resolution: "last"
      |      custom_validation_mode: "skip"
      |      unique_composite:
      |        - ["employee_id", "company_id"]
      |    projections:
      |      - name: personal_data
      |        type: "table"
      |        query: |
      |          SELECT employee_id, company_id, first_name, last_name, email, birthday_on, country FROM employees
      |      - name: contract_data
      |        type: "table"
      |        query: |
      |          SELECT employee_id, first_name, country FROM employees
      |        aliases:
      |          employee_id: emp_id
      |    validations:
      |      schema:
      |        fields:
      |          company_id: {"type": "int", "required": true}
      |          employee_id: {"type": "int", "required": true}
      |          first_name: {"type": "str", "required": true}
      |          last_name: {"type": "str", "required": true}
      |          email: {"type": "str", "required": true, "pattern": "^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}$"}
      |          gender: {"type": "str", "required": true, "pattern": "^(male|female)$"}
      |          birthday_on: {"type": "str", "required": true, "pattern": "^\\d{4}-(0[1-9]|1[0-2])-(0[1-9]|[12]\\d|3[01])$"}
      |          country: {"type": "str", "required": true}
      |      custom:
      |        rules:
      |          - field: birthday_on
      |            validation: "age_gte"
      |            params:
      |              min_age: 35
      |""".stripMargin

  val invalidConfigYaml: String =
    """transformations_config:
      |  employees:
      |    source: "whatever.csv"
      |    validations:
      |      schema:
      |        fields:
      |          id: {"type": "int"}
      |""".stripMargin

  /** Write the fixture CSV + config into a temp dir; returns
    * (configPath, csvPath).
    */
  def materialize(dir: String): (String, String) = {
    val csvPath = s"$dir/employees.csv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(csvPath), employeesCsv)
    val cfgPath = s"$dir/config.yaml"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(cfgPath),
      configYaml.replace("PLACEHOLDER", csvPath))
    (cfgPath, csvPath)
  }
}
