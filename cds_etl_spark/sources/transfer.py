"""Raw-file (non-DataFrame) transfer between storage schemes (O32).

The reference moves whole FILES — raw submitter xlsx workbooks in,
emitted TSVs out — with boto3 (`upload_files`
cds_transformation_functions.py:82-104, `download_from_s3` :346-360).
DataFrame IO already covers tabular S3 round-trips via ``s3a://`` URIs
(sources/files.py), but raw artifacts (workbooks, reports, configs)
never become DataFrames.

Engine re-expression: the Hadoop FileSystem API the Spark JVM already
ships. Every path is a URI; the scheme picks the filesystem
(``file://``, ``s3a://``, ``hdfs://``, ...), so the same copy works
against local disk in tests and S3A in production — no boto3, no
second credentials path (S3A reuses the cluster's Hadoop credential
providers).
"""

from __future__ import annotations

import posixpath

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, uri: str):
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(uri)
    return path.getFileSystem(conf), path


def list_files(spark: SparkSession, dir_uri: str, suffix: str | None = None) -> list[str]:
    """Non-recursive file listing of a directory URI; [] if absent."""
    fs, path = _fs_and_path(spark, dir_uri)
    if not fs.exists(path):
        return []
    out = []
    for st in fs.listStatus(path):
        if st.isFile():
            name = st.getPath().getName()
            if suffix is None or name.endswith(suffix):
                out.append(st.getPath().toString())
    return sorted(out)


def copy_file(spark: SparkSession, src_uri: str, dst_uri: str) -> None:
    """Copy one file across (possibly different) filesystems,
    overwriting and creating parent dirs on the destination."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    src_fs, src = _fs_and_path(spark, src_uri)
    dst_fs, dst = _fs_and_path(spark, dst_uri)
    parent = dst.getParent()
    if parent is not None and not dst_fs.exists(parent):
        dst_fs.mkdirs(parent)
    jvm.org.apache.hadoop.fs.FileUtil.copy(
        src_fs, src, dst_fs, dst, False, True, conf
    )


def copy_dir_files(
    spark: SparkSession, src_dir: str, dst_dir: str, suffix: str | None = None
) -> list[str]:
    """Copy every (optionally suffix-filtered) file in ``src_dir`` to
    ``dst_dir``; returns destination URIs. Flat, like the reference's
    per-folder listdir loops."""
    copied = []
    for src in list_files(spark, src_dir, suffix):
        dst = posixpath.join(dst_dir, posixpath.basename(src))
        copy_file(spark, src, dst)
        copied.append(dst)
    return copied


def remote_root(config: dict) -> str:
    """Destination root for batch transfers. ``REMOTE_ROOT`` (any
    Hadoop-FS URI — lets tests use ``file://`` and deployments choose
    s3a/gcs/abfs/hdfs) wins; else ``s3a://<S3_BUCKET>`` mirroring the
    reference's bucket-only config."""
    root = config.get("REMOTE_ROOT")
    if root:
        return str(root).rstrip("/")
    return "s3a://" + config["S3_BUCKET"]


def upload_batch(
    spark: SparkSession,
    config: dict,
    timestamp: str,
    data_suffixes: tuple[str, ...] = (".xlsx", ".tsv", ".csv"),
) -> dict[str, list[str]]:
    """Reference `upload_files` parity: emitted ``.tsv`` outputs go to
    ``<root>/transformed/<batch>/<timestamp>/``, raw inputs to
    ``<root>/raw/<batch>/<timestamp>/`` (timestamp = O33 batch stamp).
    """
    import os

    root = remote_root(config)
    batch = config["DATA_BATCH_NAME"]
    out_dir = os.path.join(config["OUTPUT_FOLDER"], batch)
    raw_dir = os.path.join(config["DATA_FOLDER"], batch)
    uploaded = {"transformed": [], "raw": []}
    uploaded["transformed"] = copy_dir_files(
        spark, out_dir, posixpath.join(root, "transformed", batch, timestamp), ".tsv"
    )
    for sfx in data_suffixes:
        uploaded["raw"] += copy_dir_files(
            spark, raw_dir, posixpath.join(root, "raw", batch, timestamp), sfx
        )
    return uploaded


def download_batch(
    spark: SparkSession,
    config: dict,
    data_suffixes: tuple[str, ...] = (".xlsx", ".tsv", ".csv"),
) -> list[str]:
    """Reference `download_from_s3` parity: pull raw data files from
    ``<root>/<S3_RAWDATA_SUBFOLDER>`` into the local batch folder."""
    import os

    src = posixpath.join(remote_root(config), config["S3_RAWDATA_SUBFOLDER"])
    dst = os.path.join(config["DATA_FOLDER"], config["DATA_BATCH_NAME"])
    got = []
    for sfx in data_suffixes:
        got += copy_dir_files(spark, src, dst, sfx)
    return got
