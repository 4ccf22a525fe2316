"""Small-file compaction (sources/compact.py)."""

import glob
import os

from cds_etl_spark.catalog import load_table
from cds_etl_spark.sources.compact import compact_parquet, dataset_bytes


def _files(path):
    return glob.glob(os.path.join(path, "part-*.parquet"))


def test_compact_reduces_file_count_preserving_rows(spark, sf_dir, tmp_path):
    src = str(tmp_path / "fragmented")
    out = str(tmp_path / "compacted")
    ev = load_table(spark, sf_dir, "events")
    ev.repartition(40).write.parquet(src)
    assert len(_files(src)) == 40

    total_mb = dataset_bytes(spark, src) / (1024 * 1024)
    compacted = compact_parquet(spark, src, out, target_mb=max(1, int(total_mb / 2)))
    assert 1 <= len(_files(out)) <= 4
    assert compacted.count() == ev.count()
    assert set(compacted.columns) == set(ev.columns)


def test_dataset_bytes_counts_data_not_markers(spark, sf_dir, tmp_path):
    src = str(tmp_path / "d")
    load_table(spark, sf_dir, "region").write.parquet(src)
    got = dataset_bytes(spark, src)
    want = sum(os.path.getsize(f) for f in _files(src))
    assert got == want > 0
