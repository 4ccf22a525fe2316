"""Sinks (O30/O31) + historical state (O28/O29): TSV roundtrip, the
all-null skip guard, and idempotent history merge/re-stamp."""

from cds_etl_spark.operators.history import add_historical_value, stamp_historical_value
from cds_etl_spark.sources.files import read_tsv, write_node_tsv, write_report_tsv


def test_tsv_roundtrip_and_null_skip(spark, tmp_path):
    df = spark.createDataFrame(
        [("phs001", "StudyA", None), ("phs002", None, "v2")],
        "phs_accession string, study_name string, study_version string",
    )
    path = write_node_tsv(df, str(tmp_path), "study", prefix="batch1")
    assert path and path.endswith("batch1-study")
    back = read_tsv(spark, path, schema=df.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))

    # All-null frame → skipped, like the reference's print_data guard.
    empty = spark.createDataFrame([(None, None)], "a string, b string")
    assert write_node_tsv(empty, str(tmp_path), "empty") is None
    assert write_report_tsv(empty.limit(0), str(tmp_path), "report") is None


def test_history_merge_and_stamp(spark, tmp_path):
    state = str(tmp_path / "hist.parquet")
    batch1 = spark.createDataFrame(
        [("phs001", "1"), ("phs002", "1")], "phs_accession string, study_version string"
    )
    batch2 = spark.createDataFrame(
        [("phs001", "2, 1")], "phs_accession string, study_version string"
    )
    add_historical_value(batch1, "phs_accession", "study_version", state)
    add_historical_value(batch2, "phs_accession", "study_version", state)
    # Idempotent: re-adding a seen batch changes nothing.
    add_historical_value(batch2, "phs_accession", "study_version", state)

    stamped = stamp_historical_value(batch2, "phs_accession", "study_version", state)
    [row] = stamped.collect()
    assert row["study_version"] == "2,1"  # full history, sorted desc

    # Keys with no history pass through unchanged.
    other = spark.createDataFrame(
        [("phs999", "7")], "phs_accession string, study_version string"
    )
    [row] = stamp_historical_value(other, "phs_accession", "study_version", state).collect()
    assert row["study_version"] == "7"
