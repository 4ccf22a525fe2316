"""Commit-log snapshot layout — atomic publish + time travel.

The missing piece between a plain parquet directory and a table
format: writers that die mid-write must never expose partial data,
concurrent writers must never clobber each other, and readers must be
able to pin a version. This is the core protocol of every lakehouse
table format (Delta/Iceberg commit logs), re-expressed minimally with
stock Spark + the Hadoop FileSystem API (scheme-portable: file://,
hdfs://, s3a://  — no os.* path walking):

  <table>/data/<commit-uuid>/part-*.parquet   immutable data files
  <table>/_log/<version>.json                 full-snapshot manifests

A manifest lists EVERY file of its snapshot (Delta-checkpoint style,
simplified: no delta chains — manifests are metadata-sized, one line
per file; at extreme file counts you would add incremental logs, the
protocol below doesn't change). Data files are immutable and shared
across versions, so time travel is free and `overwrite` is a logical
operation: old files stay until `vacuum`.

Atomicity: data files land under a fresh UUID directory that NO
manifest references yet; the manifest itself is created at a temp
name and published with an atomic FS rename. A rename that returns
False (destination exists — another writer won the version) RETRIES
with the next number instead of failing or clobbering — the
cross-process-safe allocation the history-state module documents as
its own single-writer boundary.

The reference has no durability story at all (it overwrites TSVs in
place — cds-transformation_v1.3.py writes directly to its output
dir); this module is part of the declared beyond-reference surface.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession

_LOG = "_log"
_DATA = "data"


def _fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, p.getFileSystem(hconf)


def _jpath(jvm, s: str):
    return jvm.org.apache.hadoop.fs.Path(s)


def _list_files(jvm, fs, path: str) -> list[str]:
    p = _jpath(jvm, path)
    if not fs.exists(p):
        return []
    out = []
    it = fs.listFiles(p, True)
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if not name.startswith(("_", ".")):
            out.append(f.getPath().toString())
    return sorted(out)


def _versions(jvm, fs, table: str) -> list[int]:
    logp = _jpath(jvm, f"{table}/{_LOG}")
    if not fs.exists(logp):
        return []
    out = []
    for st in fs.listStatus(logp):
        name = st.getPath().getName()
        if name.endswith(".json") and not name.startswith("."):
            try:
                out.append(int(name[: -len(".json")]))
            except ValueError:
                continue
    return sorted(out)


def latest_version(spark: SparkSession, table: str) -> int | None:
    """Highest published version, or None for an empty table."""
    jvm, fs = _fs(spark, table)
    vs = _versions(jvm, fs, table)
    return vs[-1] if vs else None


def _read_manifest(spark: SparkSession, table: str, version: int) -> dict:
    jvm, fs = _fs(spark, table)
    p = _jpath(jvm, f"{table}/{_LOG}/{version:012d}.json")
    stream = fs.open(p)
    try:
        data = bytes(
            spark.sparkContext._jvm.org.apache.commons.io.IOUtils.toByteArray(
                stream
            )
        )
    finally:
        stream.close()
    return json.loads(data.decode("utf-8"))


def _write_data(df: DataFrame, table: str) -> list[str]:
    """Write df's rows as a fresh immutable commit directory; return
    the file list. Nothing references these files until a manifest
    is published, so a writer dying here leaves only invisible
    garbage for vacuum — never a partial table."""
    spark = df.sparkSession
    cdir = f"{table}/{_DATA}/{uuid.uuid4().hex}"
    df.write.mode("error").parquet(cdir)
    jvm, fs = _fs(spark, table)
    return _list_files(jvm, fs, cdir)


def _publish(
    spark: SparkSession,
    table: str,
    files: list[str],
    mode: str,
    schema_json: str,
    epoch: int | None = None,
) -> int:
    """Publish a manifest atomically; returns the version it landed
    at. Version allocation races resolve by rename-retry, never by
    overwrite."""
    jvm, fs = _fs(spark, table)
    # Qualify every file through the FS (file:/… on local) so
    # manifests from ANY writer — the Hadoop-side commit_* path or
    # the Python DataSourceWriter — compare identically in vacuum's
    # liveness set and in epoch/snapshot reads.
    files = [
        fs.makeQualified(_jpath(jvm, f)).toString() for f in files
    ]
    logdir = _jpath(jvm, f"{table}/{_LOG}")
    fs.mkdirs(logdir)
    while True:
        vs = _versions(jvm, fs, table)
        version = (vs[-1] + 1) if vs else 0
        if mode == "append" and vs:
            prev = _read_manifest(spark, table, vs[-1])
            snapshot = prev["files"] + files
        else:
            snapshot = list(files)
        manifest = {
            "version": version,
            "mode": mode,
            "files": snapshot,
            "schema": schema_json,
        }
        if epoch is not None:
            manifest["epoch"] = epoch
        body = json.dumps(manifest).encode("utf-8")
        tmp = _jpath(
            jvm, f"{table}/{_LOG}/.tmp-{uuid.uuid4().hex}.json"
        )
        out = fs.create(tmp, False)
        try:
            out.write(body)
        finally:
            out.close()
        final = _jpath(jvm, f"{table}/{_LOG}/{version:012d}.json")
        if _publish_rename(spark, jvm, fs, tmp, final):
            return version
        # Lost the race: another writer published this version.
        # Re-read the log (an append must chain onto THEIR snapshot)
        # and retry at the next number.
        fs.delete(tmp, False)


def _publish_rename(spark: SparkSession, jvm, fs, tmp, final) -> bool:
    """Rename that FAILS when the destination exists — the commit
    point of the protocol.

    ``FileSystem.rename`` cannot express no-overwrite: on ``file://``
    RawLocalFileSystem delegates to POSIX ``rename(2)``, which
    silently REPLACES an existing destination, so two racing writers
    could both "win" a version and one manifest would vanish. The
    ``FileContext`` API takes ``Options.Rename.NONE`` and raises
    ``FileAlreadyExistsException`` instead — the same primitive
    Delta's HDFSLogStore builds its commit on, and it holds on
    ``file://`` too (verified by ``test_commitlog.py``'s no-clobber
    test). Returns False when the destination exists (lost the
    race); falls back to ``FileSystem.rename`` only on stores with
    no AbstractFileSystem binding (e.g. bare s3a), whose False
    return means the same thing.
    """
    sc = spark.sparkContext
    try:
        fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            final.toUri(), sc._jsc.hadoopConfiguration()
        )
    except Exception:
        return fs.rename(tmp, final)
    opts = sc._gateway.new_array(
        jvm.org.apache.hadoop.fs.Options.Rename, 1
    )
    opts[0] = jvm.org.apache.hadoop.fs.Options.Rename.NONE
    try:
        fc.rename(tmp, final, opts)
        return True
    except Exception as ex:
        java_ex = getattr(ex, "java_exception", None)
        if java_ex is not None and "AlreadyExists" in (
            java_ex.getClass().getName()
        ):
            return False
        raise


def commit_append(
    df: DataFrame, table: str, epoch: int | None = None
) -> int:
    """Atomically append ``df`` as a new snapshot version (previous
    snapshot's files + the new commit's). ``epoch`` optionally stamps
    the manifest with a writer-side idempotence token (see
    ``committed_epochs``). Returns the version."""
    files = _write_data(df, table)
    return _publish(
        df.sparkSession, table, files, "append", df.schema.json(), epoch
    )


def committed_epochs(spark: SparkSession, table: str) -> set:
    """Epoch stamps of all surviving manifests — the replay guard for
    streaming writers: a micro-batch whose epoch is already here was
    fully committed before a crash, so the replay skips it (the
    commit IS the transaction marker; no separate ledger to drift).
    Constraint: ``vacuum`` drops old manifests, so keep_last must
    cover the stream's possible replay horizon (in practice: the
    checkpoint's unexpired epochs)."""
    jvm, fs = _fs(spark, table)
    out = set()
    for v in _versions(jvm, fs, table):
        m = _read_manifest(spark, table, v)
        if "epoch" in m:
            out.add(m["epoch"])
    return out


def commit_overwrite(df: DataFrame, table: str) -> int:
    """Atomically replace the table's LOGICAL content with ``df``.
    Physically nothing is deleted — prior versions remain readable
    until ``vacuum``. Returns the version."""
    files = _write_data(df, table)
    return _publish(
        df.sparkSession, table, files, "overwrite", df.schema.json()
    )


def read_snapshot(
    spark: SparkSession, table: str, version: int | None = None
) -> DataFrame:
    """Scan exactly the files of ``version`` (latest when None) —
    a pinned, repeatable read: concurrent commits cannot change what
    this DataFrame sees."""
    if version is None:
        version = latest_version(spark, table)
        if version is None:
            raise ValueError(f"empty commit-log table: {table}")
    manifest = _read_manifest(spark, table, version)
    if not manifest["files"]:
        # A zero-file snapshot (e.g. an overwrite with an empty
        # DataFrame) still reads: the manifest carries the schema.
        from pyspark.sql.types import StructType

        return spark.createDataFrame(
            [], StructType.fromJson(json.loads(manifest["schema"]))
        )
    return spark.read.parquet(*manifest["files"])


def compact_snapshot(
    spark: SparkSession, table: str, target_mb: int = 128
) -> int:
    """Rewrite the CURRENT snapshot into size-targeted files and
    publish the result as a new overwrite version — OPTIMIZE as a
    commit: readers of old versions are untouched, the swap is the
    manifest rename, and the small files become vacuum-able garbage.
    Returns the new version."""
    import math

    cur = latest_version(spark, table)
    if cur is None:
        raise ValueError(f"empty commit-log table: {table}")
    manifest = _read_manifest(spark, table, cur)
    df = spark.read.parquet(*manifest["files"])
    jvm, fs = _fs(spark, table)
    total = sum(
        fs.getFileStatus(_jpath(jvm, f)).getLen()
        for f in manifest["files"]
    )
    n = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    current = df.rdd.getNumPartitions()
    sized = df.coalesce(n) if n <= current else df.repartition(n)
    return commit_overwrite(sized, table)


def vacuum(
    spark: SparkSession,
    table: str,
    keep_last: int = 1,
    retention_s: float = 3600.0,
) -> int:
    """Delete data files referenced ONLY by versions older than the
    last ``keep_last`` manifests (plus orphaned never-published
    commit dirs), then drop those manifests. Time travel to vacuumed
    versions stops working — that is the point. Returns the number
    of files deleted.

    ``retention_s`` is the concurrent-writer grace window (Delta's
    retention-check, same reason): a writer that has finished
    ``_write_data`` but not yet ``_publish`` has data files on disk
    that NO manifest references — without an age check vacuum would
    delete them and the writer would then publish a manifest pointing
    at deleted files, a permanently corrupt snapshot. Unreferenced
    files younger than ``retention_s`` (by FS modification time,
    compared against the filesystem's own clock) are therefore kept.
    ``retention_s=0`` is the exclusive-access fast path for tests
    and single-writer maintenance jobs."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    jvm, fs = _fs(spark, table)
    vs = _versions(jvm, fs, table)
    if not vs:
        return 0
    keep_vs = vs[-keep_last:]
    live: set[str] = set()
    for v in keep_vs:
        live.update(_read_manifest(spark, table, v)["files"])
    cutoff = (
        jvm.java.lang.System.currentTimeMillis() - retention_s * 1000.0
    )
    deleted = 0
    for f in _list_files(jvm, fs, f"{table}/{_DATA}"):
        if f in live:
            continue
        p = _jpath(jvm, f)
        if (
            retention_s > 0
            and fs.getFileStatus(p).getModificationTime() > cutoff
        ):
            continue  # inside the in-flight-writer grace window
        fs.delete(p, False)
        deleted += 1
    for v in vs[:-keep_last]:
        fs.delete(_jpath(jvm, f"{table}/{_LOG}/{v:012d}.json"), False)
    return deleted


def read_changes(
    spark: SparkSession, table: str, from_version: int, to_version: int
) -> DataFrame:
    """Incremental read: the rows ADDED between two snapshot versions
    — scan exactly the files present in ``to_version`` but not in
    ``from_version``. The CDC primitive that lets a downstream
    pipeline process a table's growth without rescanning history
    (pair with ``stream_commitlog_sink``: one call per consumed
    version range is an exactly-once incremental ETL). File-set
    difference, so it is precise for append commits; files REMOVED
    by an overwrite are reported via the manifest modes instead —
    this function raises if the range crosses an overwrite, where
    "what changed" stops being a file-set difference."""
    if to_version <= from_version:
        raise ValueError("to_version must be > from_version")
    jvm, fs = _fs(spark, table)
    for v in _versions(jvm, fs, table):
        if from_version < v <= to_version:
            if _read_manifest(spark, table, v)["mode"] != "append":
                raise ValueError(
                    f"version {v} is not an append commit; "
                    "file-set diff is not the change set"
                )
    old = set(_read_manifest(spark, table, from_version)["files"])
    new_manifest = _read_manifest(spark, table, to_version)
    added = [f for f in new_manifest["files"] if f not in old]
    if not added:
        from pyspark.sql.types import StructType

        return spark.createDataFrame(
            [], StructType.fromJson(json.loads(new_manifest["schema"]))
        )
    return spark.read.parquet(*added)


def commit_merge(
    source: DataFrame,
    table: str,
    key_cols: list[str],
    **merge_kwargs,
) -> int:
    """MERGE INTO the commit-log table, atomically: read the CURRENT
    snapshot, apply the keyed upsert (operators/reconcile.merge_into
    — update matched, insert unmatched, optional delete condition),
    and publish the result as one overwrite commit. Readers never see
    a half-merged table; the previous version stays time-travelable
    until vacuum — the Delta/Iceberg MERGE flow on the minimal
    protocol. Concurrency note: read-modify-write spans two commits'
    worth of time, so a concurrent writer landing in between is
    serialized AFTER this merge by the version race (the rename
    retry re-reads nothing here — callers needing strict
    serializable merges should single-writer the table)."""
    from cds_etl_spark.operators.reconcile import merge_into

    spark = source.sparkSession
    target = read_snapshot(spark, table)
    merged = merge_into(target, source, key_cols, **merge_kwargs)
    return commit_overwrite(merged, table)
