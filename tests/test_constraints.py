"""Constraint validation (operators/constraints.py): enum domain,
regex pattern, required-null — one scan, violations only."""

from cds_etl_spark.model.schema import Model, PropDef
from cds_etl_spark.operators.constraints import check_constraints

MODEL = Model(
    nodes={},
    relationships=[],
    props={
        "md5sum": PropDef("md5sum", pattern=r"^[0-9a-fA-F]{32}$"),
        "phs_accession": PropDef(
            "phs_accession", pattern=r"^phs[0-9]+([.]v[0-9]+)*$", required=True
        ),
        "gender": PropDef("gender", enum=("Male", "Female")),
    },
)


def test_check_constraints(spark):
    df = spark.createDataFrame(
        [
            ("f1", "a" * 32, "phs001.v2", "Male"),      # clean
            ("f2", "ZZ-not-hex", "phs001", "Female"),   # bad md5
            ("f3", "b" * 32, "PHS9", "Male"),           # bad accession pattern
            ("f4", "c" * 32, None, "other"),            # required null + bad enum
        ],
        "file_id string, md5sum string, phs_accession string, gender string",
    )
    report = check_constraints(
        {"file": df}, MODEL, {"file": "file_id"}
    ).collect()
    got = {(r["row_key"], r["property"], r["violation"]) for r in report}
    assert got == {
        ("f2", "md5sum", "pattern_mismatch"),
        ("f3", "phs_accession", "pattern_mismatch"),
        ("f4", "phs_accession", "required_null"),
        ("f4", "gender", "not_in_enum"),
    }
    assert all(r["node"] == "file" for r in report)
    # No Python in the plan: expressions only.
    plan = check_constraints({"file": df}, MODEL)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_schema_drift_report_kinds_and_breaking():
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from cds_etl_spark.operators.validation import schema_drift_report

    expected = StructType(
        [
            StructField("id", LongType(), False),
            StructField("name", StringType(), True),
            StructField("gone", StringType(), True),
        ]
    )
    observed = StructType(
        [
            StructField("id", LongType(), True),      # loosened
            StructField("name", LongType(), True),    # type change
            StructField("extra", StringType(), True), # added
        ]
    )
    fs = {
        (f["column"], f["kind"]): f["breaking"]
        for f in schema_drift_report(expected, observed)
    }
    assert fs == {
        ("gone", "removed"): True,
        ("name", "type_changed"): True,
        ("id", "nullability_changed"): True,
        ("extra", "added"): False,
    }
    assert schema_drift_report(expected, expected) == []
