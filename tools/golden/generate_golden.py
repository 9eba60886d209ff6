#!/usr/bin/env python3
"""Golden-parity fixture generator.

Runs the LIVE reference pipeline (/root/reference/main.py) on the two
shipped entities with a pinned as-of date and saves its outputs as
golden fixtures under src/test/resources/golden/.  GoldenParitySpec's
primary tests shell out to the live reference at test time (as-of =
run date); its "committed golden fixtures" test replays THESE files
through graft.pipeline.Pipeline with the pinned 2026-01-01 as-of, so
the fixtures stay a live oracle even without the python stack.

Driver-side tooling only (python/pandas/duckdb/pydantic) — none of
this is a dependency of the Scala library.

Config notes (all cited against the reference):
  * The config below is authored here as data, re-stating the schema
    tables from FIXTURES.md / reference config.yaml:24-84.  Source
    paths point into the read-only reference checkout.
  * `locations` ships without a `settings` block, which makes
    validate_config raise KeyError (main.py:22-31) — a negative path
    already covered by ConfigSpec.  To exercise the schema-error CSV
    path end-to-end we add a minimal settings block here.
  * `duplicate_resolution_compat: "reference"` is OUR flag (the
    reference ignores unknown settings keys).  It makes graft execute
    `last` the way the reference executes it — keep FIRST occurrence,
    main.py:131-152 orders by ROWID ascending for both "first" and
    "last" — so export row order is comparable.
  * The as-of date for the age_gte rule is pinned to 2026-01-01 by
    monkeypatching main.datetime (the reference hardcodes
    datetime.today(), main.py:169); the Scala side passes
    --as_of 2026-01-01.
"""
import io
import os
import shutil
import sys
import tempfile
import datetime as _dt
from contextlib import redirect_stdout

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REFERENCE = "/root/reference"
GOLDEN = os.path.join(REPO, "src", "test", "resources", "golden")
AS_OF = (2026, 1, 1)

EMPLOYEE_FIELDS = {
    "company_id": {"type": "int", "required": True},
    "employee_id": {"type": "int", "required": True},
    "first_name": {"type": "str", "required": True},
    "last_name": {"type": "str", "required": True},
    "email": {"type": "str", "required": True,
              "pattern": "^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}$"},
    "gender": {"type": "str", "required": True, "pattern": "^(male|female)$"},
    "birthday_on": {"type": "str", "required": True, "pattern": "^\\d{4}-\\d{2}-\\d{2}$"},
    "country": {"type": "str", "required": True},
    "effective_on": {"type": "str", "pattern": "^\\d{4}-\\d{2}-\\d{2}$"},
    "starts_on": {"type": "str", "pattern": "^\\d{4}-\\d{2}-\\d{2}$"},
    "ends_on": {"type": "str", "pattern": "^\\d{4}-\\d{2}-\\d{2}$"},
    "has_payroll": {"type": "bool"},
    "has_trial_period": {"type": "bool"},
    "trial_period_ends_on": {"type": "str", "required": False, "default": "",
                             "pattern": "^\\d{4}-\\d{2}-\\d{2}$"},
    "salary_amount": {"type": "float"},
    "salary_frequency": {"type": "str", "pattern": "^(yearly|monthly|weekly|daily|hourly)$"},
    "working_week_days": {"type": "str"},
    "working_hours": {"type": "int"},
    "working_hours_frequency": {"type": "str", "pattern": "^(week|month|year)$"},
    "max_legal_yearly_hours": {"type": "int"},
    "maximum_weekly_hours": {"type": "int"},
    "created_at": {"type": "str", "pattern": "^\\d{4}-\\d{2}-\\d{2}$"},
    "updated_at": {"type": "str", "pattern": "^\\d{4}-\\d{2}-\\d{2}$"},
    "contracts_es_tariff_group_id": {"type": "int"},
}

LOCATION_FIELDS = {
    "id": {"type": "int", "required": True},
    "company_id": {"type": "int", "required": True},
    "name": {"type": "str", "required": True},
    "timezone": {"type": "str", "required": True, "pattern": "^[a-zA-Z/_-]+$"},
    "country": {"type": "str", "required": True, "pattern": "^[a-zA-Z]{2}$"},
    "state": {"type": "str", "required": True},
    "city": {"type": "str", "required": True},
    "address_line_1": {"type": "str", "required": True},
    "address_line_2": {"type": "str", "required": False, "default": ""},
    "postal_code": {"type": "str", "required": True,
                    "pattern": "^[0-9]{3,6}(-[0-9]{3,4})?$"},
    "main": {"type": "bool", "required": True},
    "latitude": {"type": "float", "required": True},
    "longitude": {"type": "float", "required": True},
    "radius": {"type": "int", "required": True},
    "siret": {"type": "str", "required": False, "default": ""},
}


def build_config():
    return {
        "transformations_config": {
            "employees": {
                "source": os.path.join(REFERENCE, "input_data", "employees.csv"),
                "settings": {
                    "duplicate_resolution": "last",
                    "custom_validation_mode": "skip",
                    "unique_composite": [["employee_id", "company_id"]],
                    # graft-only; the reference reads settings with .get and
                    # ignores unknown keys (main.py:421-424)
                    "duplicate_resolution_compat": "reference",
                },
                "projections": [
                    {"name": "personal_data", "type": "table",
                     "query": "SELECT employee_id, company_id, first_name, last_name, "
                              "email, birthday_on, country FROM employees\n"},
                    {"name": "contract_data", "type": "table",
                     "query": "SELECT employee_id, starts_on, ends_on, salary_amount "
                              "FROM employees\n",
                     "aliases": {"employee_id": "emp_id"}},
                ],
                "validations": {
                    "schema": {"fields": EMPLOYEE_FIELDS},
                    "custom": {"rules": [
                        {"field": "birthday_on", "validation": "age_gte",
                         "params": {"min_age": 35}},
                    ]},
                },
            },
            "locations": {
                "source": os.path.join(REFERENCE, "input_data", "locations.csv"),
                "settings": {
                    "duplicate_resolution": "first",
                    "custom_validation_mode": "skip",
                    "unique_composite": [["id"]],
                },
                "projections": [
                    {"name": "location_data", "type": "view",
                     "query": "SELECT id, company_id, name, timezone, country, state, "
                              "city, postal_code, main, latitude, longitude FROM locations\n"},
                ],
                "validations": {
                    "schema": {"fields": LOCATION_FIELDS},
                },
            },
        }
    }


def run_reference(entity, config_path, output_dir):
    sys.path.insert(0, REFERENCE)
    import main  # noqa: E402

    class PinnedDateTime(_dt.datetime):
        @classmethod
        def today(cls):
            return cls(*AS_OF)

    main.datetime = PinnedDateTime
    argv_backup = sys.argv
    sys.argv = ["main.py", entity, "--config", config_path, "--output_dir", output_dir]
    buf = io.StringIO()
    try:
        with redirect_stdout(buf):
            main.main()
    finally:
        sys.argv = argv_backup
    return buf.getvalue()


def main_():
    cfg = build_config()
    os.makedirs(GOLDEN, exist_ok=True)
    config_path = os.path.join(GOLDEN, "config.yaml")
    with open(config_path, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False, allow_unicode=True)

    for entity in ("employees", "locations"):
        workdir = tempfile.mkdtemp(prefix=f"golden_{entity}_")
        stdout = run_reference(entity, config_path, workdir)
        dest = os.path.join(GOLDEN, entity)
        shutil.rmtree(dest, ignore_errors=True)
        os.makedirs(dest)
        with open(os.path.join(dest, "stdout.txt"), "w") as f:
            f.write(stdout)
        for sub in ("exports", "errors"):
            src = os.path.join(workdir, sub)
            if os.path.isdir(src):
                shutil.copytree(src, os.path.join(dest, sub))
        shutil.rmtree(workdir)
        print(f"[golden] {entity}: captured {stdout.count('saved to')} error files; "
              f"see {dest}")

    with open(os.path.join(GOLDEN, "README.md"), "w") as f:
        f.write(
            "# Golden fixtures\n\n"
            "Outputs of the LIVE reference pipeline (`/root/reference/main.py`),\n"
            "generated by `tools/golden/generate_golden.py` with the as-of date\n"
            "pinned to 2026-01-01. `GoldenParitySpec` replays the identical\n"
            "config (`config.yaml` here) through `graft.pipeline.Pipeline` and\n"
            "diffs every export/error CSV row-for-row.\n\n"
            "Documented comparison tolerances (SURVEY.md §5):\n"
            "  * numeric cells compare by value (`30000.0` == `30000`),\n"
            "    booleans case-insensitively (pandas `True` vs Spark `true`);\n"
            "  * schema-error `errors` messages compare by failing-field\n"
            "    prefix, not byte-for-byte (category-level vs Pydantic text);\n"
            "  * error-CSV row ORDER compares as a set — DuckDB window/fetchdf\n"
            "    order is itself unspecified; export row order compares exactly.\n")
    print(f"[golden] wrote {config_path}")


if __name__ == "__main__":
    main_()
