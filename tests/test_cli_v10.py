"""v1.0 golden test — the two-workbook flow end-to-end
(`python -m cds_etl_spark --pipeline_version 1.0`), mirroring reference
cds-transformation.py:80-146: the headerless Study transpose +
manifest-length replicate, sheet-major substring extraction with
last-match-wins values, the diagnosis/participant remove_node +
Participant-only re-extract, the hard-coded add_properties table
(join-or-concat with the truncation quirk), the study column drop +
dedup, and unprefixed per-node TSV outputs."""

import csv

import pytest
import yaml

from cds_etl_spark.cli import main

MODEL_YAML = {
    "Version": "test",
    "Nodes": {
        "study": {
            "Props": [
                "phs_accession",
                "study_name",
                "size_of_data_being_uploaded",
                "study_external_url",
            ]
        },
        "participant": {"Props": ["participant_id", "gender"]},
        "sample": {"Props": ["sample_id", "sample_type"]},
        "file": {"Props": ["file_name", "file_size"]},
        "genomic_info": {"Props": ["library_id", "platform"]},
        "diagnosis": {"Props": ["diagnosis_id"]},
    },
    "Relationships": {},
}

BOOK1 = {
    # df_list position 3 — overwrites File's file_name and Genomic
    # Info's library_id values (last match wins, :17-19).
    "CDS Manifest": (
        ["GUID", "acl", "sample_id", "library_id", "file_name"],
        [
            ("G-1", "open", "S1", "L1", "m-a.bam"),
            ("G-2", "open", "S2", "L2", "m-b.bam"),
            ("G-3", "open", "S3", "L3", "m-c.bam"),
        ],
    ),
    "CGC CDS Explorer": (
        ["Sample ID", "Participant ID"],
        [("S1", "P1"), ("S2", "P2"), ("S3", "P1")],
    ),
    "SRA Run Selector": (
        ["Run", "Assay Type"],
        [("R1", "WGS"), ("R2", "WXS"), ("R3", "WGS")],
    ),
}

BOOK2 = {
    "Participant": (
        ["participant_id", "gender"],
        [("P1", "Male"), ("P2", "Female")],
    ),
    "Sample": (
        ["sample_id", "sample_type"],
        [("S1", "Tumor"), ("S2", "Normal"), ("S3", "Tumor")],
    ),
    "File": (
        ["file_name", "file_size"],
        [("a.bam", "100"), ("b.bam", "200"), ("c.bam", "300")],
    ),
    "Genomic Info": (
        ["library_id", "platform"],
        [("GL1", "ILLUMINA"), ("GL2", "PACBIO"), ("GL3", "ILLUMINA")],
    ),
}

# Headerless two-column Study sheet (:108-120); the empty-valued key is
# dropped by the transpose.
STUDY_ROWS = [
    ("phs_accession", "phs99"),
    ("study_name", "StudyX"),
    ("acl", "open-acl"),
    ("size_of_data_being_uploaded", "10TB"),
    ("study_external_url", "http://x"),
    ("empty_key", ""),
]


def _write_tsv(path, rows, columns=None):
    with open(path, "w", newline="") as f:
        w = csv.writer(f, delimiter="\t")
        if columns is not None:
            w.writerow(columns)
        w.writerows(rows)


def _read_tsv(path):
    with open(path, newline="") as f:
        return list(csv.DictReader(f, delimiter="\t"))


@pytest.fixture()
def workdir(tmp_path):
    d = tmp_path
    book1 = d / "file1.book"
    book2 = d / "file2.book"
    book1.mkdir()
    book2.mkdir()
    for sheet, (cols, rows) in BOOK1.items():
        _write_tsv(book1 / f"{sheet}.tsv", rows, cols)
    for sheet, (cols, rows) in BOOK2.items():
        _write_tsv(book2 / f"{sheet}.tsv", rows, cols)
    _write_tsv(book2 / "Study.tsv", STUDY_ROWS)  # headerless
    (d / "model.yaml").write_text(yaml.dump(MODEL_YAML))
    config = {
        "NODE_FILE": str(d / "model.yaml"),
        "DATA_FILE1": str(book1),
        "DATA_FILE2": str(book2),
        "OUTPUT_FOLDER": str(d / "out"),
    }
    (d / "config.yaml").write_text(yaml.dump(config))
    return d


def _run(workdir, spark, *extra):
    args = ["--config_file", str(workdir / "config.yaml"), "--pipeline_version", "1.0"]
    assert main(args + list(extra), spark=spark) == 0


def test_v10_end_to_end(workdir, spark):
    _run(workdir, spark)
    out = workdir / "out"

    # Unprefixed outputs (:70-74); diagnosis has no data → no file.
    # (.crc sidecars from the Hadoop LocalFileSystem are not outputs.)
    assert sorted(p.name for p in out.iterdir() if not p.name.startswith(".")) == [
        "file.tsv", "genomic_info.tsv", "participant.tsv",
        "sample.tsv", "study.tsv",
    ]

    # Study: transposed + replicated, then the improve step drops the
    # two upload-bookkeeping columns and dedups to one row (:141-142).
    # data_access_level arrives via add_properties from the 'acl' key.
    study = _read_tsv(out / "study.tsv")
    assert len(study) == 1
    row = study[0]
    assert row["phs_accession"] == "phs99"
    assert row["study_name"] == "StudyX"
    assert row["data_access_level"] == "open-acl"
    assert row["type"] == "study"
    assert "size_of_data_being_uploaded" not in row
    assert "study_external_url" not in row
    assert "empty_key" not in row  # empty-valued keys skipped (:119)

    # File: base length from the File sheet, file_name VALUES from the
    # manifest (last match wins); acl/file_id/sample FK attached
    # positionally by add_properties.
    files = {r["file_id"]: r for r in _read_tsv(out / "file.tsv")}
    assert set(files) == {"G-1", "G-2", "G-3"}
    assert files["G-1"]["file_name"] == "m-a.bam"
    assert files["G-1"]["file_size"] == "100"
    assert files["G-1"]["acl"] == "open"
    assert files["G-1"]["sample.sample_id"] == "S1"
    assert files["G-3"]["file_name"] == "m-c.bam"
    assert files["G-3"]["sample.sample_id"] == "S3"
    assert all(r["type"] == "file" for r in files.values())

    # Sample: values from the Sample sheet (last match), participant FK
    # joined on sample_id from the CGC explorer.
    samples = {r["sample_id"]: r for r in _read_tsv(out / "sample.tsv")}
    assert set(samples) == {"S1", "S2", "S3"}
    assert samples["S1"]["sample_type"] == "Tumor"
    assert samples["S1"]["participant.participant_id"] == "P1"
    assert samples["S2"]["participant.participant_id"] == "P2"
    assert samples["S3"]["participant.participant_id"] == "P1"

    # Genomic info: library_id values overwritten by the manifest's
    # (GL1→L1...), file.file_id joined on library_id.
    gi = {r["library_id"]: r for r in _read_tsv(out / "genomic_info.tsv")}
    assert set(gi) == {"L1", "L2", "L3"}
    assert gi["L1"]["platform"] == "ILLUMINA"
    assert gi["L1"]["file.file_id"] == "G-1"
    assert gi["L2"]["file.file_id"] == "G-2"

    # Participant: removed then re-extracted from the Participant sheet
    # ONLY (2 rows, not the explorer's 3); study FK replicated then
    # truncated to participant length (:54-55).
    parts = {r["participant_id"]: r for r in _read_tsv(out / "participant.tsv")}
    assert set(parts) == {"P1", "P2"}
    assert parts["P1"]["gender"] == "Male"
    assert parts["P2"]["gender"] == "Female"
    assert all(r["study.phs_accession"] == "phs99" for r in parts.values())
    assert all(r["type"] == "participant" for r in parts.values())


def test_v10_diagnosis_dropped_even_with_data(workdir, spark):
    # remove_node (:60-68) empties diagnosis unconditionally; the
    # Participant-only re-extract matches none of its properties.
    book2 = workdir / "file2.book"
    _write_tsv(
        book2 / "Participant.tsv",
        [("P1", "Male", "D1")],
        ["participant_id", "gender", "diagnosis_id"],
    )
    _run(workdir, spark)
    out = workdir / "out"
    # diagnosis_id now matches in the Participant re-extract, so the
    # node DOES come back from the second extract_data (:133).
    diags = _read_tsv(out / "diagnosis.tsv")
    assert len(diags) == 1 and diags[0]["diagnosis_id"] == "D1"


def test_v10_extract_dictionary_mode_rejected(workdir, spark):
    with pytest.raises(SystemExit):
        main(
            [
                "--config_file", str(workdir / "config.yaml"),
                "--pipeline_version", "1.0",
                "--extract_raw_data_dictionary",
            ],
            spark=spark,
        )
