"""SparkSession factory for the engine.

Single place where execution-relevant configuration lives. The settings
are chosen for correctness-vs-oracle (UTC session time zone, ANSI off so
overflow/parse behavior is permissive like the reference pandas code)
and for scale (AQE on with partition coalescing and skew-join handling,
shuffle partitions sized to the local core count; on a real cluster the
same settings let AQE re-plan to the data).
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import SparkSession

# Configs every engine session needs, whether we build the session or an
# external harness hands us one (see `ensure_session_confs`). All of
# these are runtime-settable (non-static) SQL confs.
RUNTIME_CONFS: dict[str, str] = {
    # Oracle comparability: DuckDB timestamps are UTC-naive.
    "spark.sql.session.timeZone": "UTC",
    # The `events` table stores parquet TIMESTAMP(NANOS); Spark has no
    # nanosecond timestamp type, so read as epoch-nanos long and convert
    # in the catalog layer (catalog.load_table).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Let custom Python DataSources (sources/pysource.py) receive
    # pushed filters — off by default in Spark 4.1.
    "spark.sql.python.filterPushdown.enabled": "true",
    # AQE: runtime re-planning, partition coalescing, skew-join splitting.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Coalesce post-shuffle partitions to the advisory size instead of
    # fanning out to maximize parallelism (the Spark docs' recommended
    # production setting): small shuffles collapse to few tasks instead
    # of `shuffle.partitions` mostly-empty ones.
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    # With parallelismFirst off, coalescing honors the advisory size.
    # The 64 MB default is tuned for IO-bound scans; post-shuffle work
    # here (window sorts, collect_set apply) is CPU-bound, so a 64 MB
    # target collapses small-but-hot shuffles onto one core. 8 MB keeps
    # those parallel (measured ~25% on window/agg shapes at sf0.1)
    # while still coalescing away mostly-empty partitions at scale.
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
    # Cost-based optimization: when catalog tables carry ANALYZE
    # statistics (catalog.analyze_tables), join reordering and
    # broadcast decisions use estimated row counts/NDVs instead of raw
    # file sizes. A no-op for stat-less path reads; at warehouse scale
    # join order chosen from stats is the difference between shuffling
    # the small and the large intermediate.
    "spark.sql.cbo.enabled": "true",
    "spark.sql.cbo.joinReorder.enabled": "true",
}


# Sub-second local-mode latency profile. On a cluster at real scale the
# defaults above are right: AQE re-plans to the data, shuffle files are
# compressed and checksummed because they cross the network and disks.
# In local[N] on warm sub-second queries those same mechanisms are pure
# fixed cost — AQE inserts a re-planning barrier per stage, and every
# tiny shuffle round-trips through compressed, checksummed files on a
# disk-backed /tmp. Measured on the bench shapes at sf0.1: a two-stage
# job floor of ~140 ms drops to ~64 ms with tmpfs shuffle dirs, no
# shuffle compression, and map-task counts sized to the data.
#
# Static (builder-time only — the shuffle manager reads them at context
# start):
LOCAL_LATENCY_STATIC_CONFS: dict[str, str] = {
    "spark.local.dir": "/dev/shm/cds_etl_spark_local",
    "spark.shuffle.compress": "false",
    "spark.shuffle.spill.compress": "false",
    "spark.shuffle.checksum.enabled": "false",
    # FAIR lets a batch of concurrent small jobs share the executor
    # instead of queueing whole-job FIFO — the workload-throughput path
    # (bench submits its 8 queries from threads; measured ~25% off the
    # batch wall time vs FIFO).
    "spark.scheduler.mode": "FAIR",
}
# Runtime-settable part; re-applied by ensure_session_confs when the
# session was built with local_latency=True (marker conf below), so the
# catalog layer re-running ensure_session_confs cannot clobber it back
# to the cluster profile.
LOCAL_LATENCY_RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "false",
    # Sub-second local queries shuffle a few thousand rows: 4 reduce
    # tasks beat 8 once several jobs run concurrently (8 jobs x 8 tasks
    # oversubscribes 32 cores; measured on the bench batch).
    "spark.sql.shuffle.partitions": "4",
    # The columnar cache is the bench's buffer pool; dictionary/RLE
    # decompression on every scan is pure per-query cost at this scale
    # (the whole warehouse is ~50 MB). Bigger batches amortize the
    # per-batch codegen loop header; stats stay per-batch for pruning.
    "spark.sql.inMemoryColumnarStorage.compressed": "false",
    "spark.sql.inMemoryColumnarStorage.batchSize": "65536",
    # One scan partition per ingest file (files are ~1-2 MB): keeps the
    # range-layout file boundaries (sorted runs) aligned with cache
    # partitions instead of bin-packing 4 MB "open cost" groups.
    "spark.sql.files.maxPartitionBytes": "2097152",
    "spark.sql.files.openCostInBytes": "262144",
}
# Above this dataset size the sub-second tricks invert: 2 MB scan
# partitions explode into hundreds of tiny tasks (measured 667 on the
# sf10 lineitem — scheduling overhead and stragglers dominate), 4
# reduce tasks throttle real shuffles, and AQE's per-stage barrier is
# noise on multi-hundred-ms queries it can actually improve. The large
# profile keeps the local statics (tmpfs shuffle, FAIR, no compression)
# but restores the scale runtime settings.
#
# Threshold history: an r6 session briefly lowered this to 128 MB on
# the theory that sf1 (~240 MB) analytics queries were mis-served by
# the latency profile; measurement showed the slow sf1 audit numbers
# were ambient contention (the audits use the PLAIN profile, which
# this constant never gates), while the sf1 BENCH point measurably
# prefers the latency profile (0.233 s recorded vs ~0.31 s under the
# scale profile). 512 MB stands: between the sf1 bench regime and the
# multi-GB regime where the latency statics invert.
LOCAL_LATENCY_LARGE_DATA_BYTES = 512 * 1024 * 1024
# …and above THIS size the statics invert too: an uncompressed shuffle
# in RAM-backed /dev/shm is ~3x the compressed on-disk bytes, so a
# multi-GB ingest shuffle evicts the page cache and OOM-kills the JVM
# (observed: sf100's 16 GB/600M-row lineitem range re-layout — ~50 GB
# raw shuffle into tmpfs took the executor down). Past the threshold
# only the FAIR scheduler static survives (the concurrent-batch
# protocol needs it; it costs nothing); shuffle goes back to disk with
# compression, exactly like a cluster deployment.
LOCAL_LATENCY_HUGE_DATA_BYTES = 8 * 1024 * 1024 * 1024
LOCAL_SCALE_RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.files.openCostInBytes": "4194304",
    "spark.sql.inMemoryColumnarStorage.compressed": "false",
    "spark.sql.inMemoryColumnarStorage.batchSize": "65536",
}
_LATENCY_MARKER = "spark.cds_etl.local_latency"

# Streaming state-store backends. HDFS-backed (the Spark default) keeps
# every partition's state map ON HEAP — at 100 TB/day the state of a
# windowed agg or dropDuplicatesWithinWatermark competes with execution
# memory and drives GC. RocksDB keeps state off-heap/on-disk with
# incremental checkpointing (changelog), the production choice for
# large stateful pipelines; Spark ships rocksdbjni in its distribution.
# The provider is a runtime conf read at STREAMING QUERY START, so it
# can be chosen per session (get_spark flag) or flipped before starting
# a query (set_streaming_state_store).
STATE_STORE_PROVIDERS: dict[str, str] = {
    "hdfs": (
        "org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider"
    ),
    "rocksdb": (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    ),
}


def set_streaming_state_store(spark: SparkSession, provider: str) -> None:
    """Select the state-store backend for streaming queries STARTED
    after this call (running queries keep the provider recorded in
    their checkpoint)."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        STATE_STORE_PROVIDERS[provider],
    )


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


# Sessions already configured by ensure_session_confs. Identity-keyed
# via weak references (an id is forgotten when its session is garbage
# collected, so a recycled id can't skip a fresh session): every
# conf.set is a py4j round-trip (~1-3 ms under GIL contention), and the
# catalog layer calls ensure_session_confs on EVERY table load —
# unmemoized that put ~20-50 ms of pure client-side chatter into every
# query build (measured: bench q2 plan construction 103 ms -> ~20 ms).
_CONFIGURED_SESSIONS: "weakref.WeakValueDictionary[int, SparkSession]" = (
    weakref.WeakValueDictionary()
)


def ensure_session_confs(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime confs to an externally created session.

    Idempotent and memoized per Python session object: the confs are
    applied once; later calls are a set-membership check. (Nothing in
    the engine unsets them; an external harness that deliberately
    overrides a conf mid-session keeps its override, same as any
    engine's session variables.)
    """
    if _CONFIGURED_SESSIONS.get(id(spark)) is spark:
        return spark
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # A static conf on some build — leave the session's value.
            pass
    marker = spark.conf.get(_LATENCY_MARKER, "false")
    if marker == "large":
        for k, v in LOCAL_SCALE_RUNTIME_CONFS.items():
            spark.conf.set(k, v)
        spark.conf.set("spark.sql.shuffle.partitions", str(default_parallelism()))
    elif marker == "true":
        for k, v in LOCAL_LATENCY_RUNTIME_CONFS.items():
            spark.conf.set(k, v)
    _CONFIGURED_SESSIONS[id(spark)] = spark
    return spark


def _apply_profile(spark: SparkSession, marker: str, n: int) -> None:
    """Align a live session's RUNTIME profile with ``marker``.

    Needed because ``getOrCreate()`` silently ignores builder configs
    when a session already exists in-process — without this, bench
    invoked after another component created the session would keep the
    wrong profile, and ensure_session_confs would then re-apply the
    stale marker's confs forever (ADVICE r5). Static confs (tmpfs
    shuffle dirs, scheduler mode, compression) cannot change on a live
    context; only the runtime-settable set is aligned, which covers
    everything correctness-relevant and the dominant perf knobs.
    """
    spark.conf.set(_LATENCY_MARKER, marker)
    if marker == "large":
        for k, v in LOCAL_SCALE_RUNTIME_CONFS.items():
            spark.conf.set(k, v)
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
    elif marker == "true":
        for k, v in LOCAL_LATENCY_RUNTIME_CONFS.items():
            spark.conf.set(k, v)
    else:
        # Plain profile: restore defaults for every conf a latency
        # profile may have touched, then the engine baseline on top.
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
        touched = (
            set(LOCAL_LATENCY_RUNTIME_CONFS) | set(LOCAL_SCALE_RUNTIME_CONFS)
        ) - set(RUNTIME_CONFS) - {"spark.sql.shuffle.partitions"}
        for k in touched:
            try:
                spark.conf.unset(k)
            except Exception:
                pass
        for k, v in RUNTIME_CONFS.items():
            try:
                spark.conf.set(k, v)
            except Exception:
                pass


def get_spark(
    app_name: str = "cds_etl_spark",
    cores: int | None = None,
    local_latency: bool = False,
    data_bytes: int | None = None,
    streaming_state_store: str | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    local[N] for tests/bench; on a cluster the master/deploy settings
    come from spark-submit and everything here still applies.

    ``local_latency=True`` selects a local bench profile sized by
    ``data_bytes`` (the working dataset's on-disk size): below
    LOCAL_LATENCY_LARGE_DATA_BYTES the sub-second profile
    (LOCAL_LATENCY_RUNTIME_CONFS), above it the local-statics-plus-
    scale-runtime profile (LOCAL_SCALE_RUNTIME_CONFS) — the same
    latency tricks that win at 50 MB lose at 2 GB (tiny-task
    explosion). Cluster deployments and the oracle tests keep the
    plain scale profile.
    """
    n = cores or default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    if local_latency:
        large = (data_bytes or 0) >= LOCAL_LATENCY_LARGE_DATA_BYTES
        huge = (data_bytes or 0) >= LOCAL_LATENCY_HUGE_DATA_BYTES
        requested = "large" if large else "true"
        builder = builder.config(_LATENCY_MARKER, requested)
        statics = (
            {"spark.scheduler.mode": LOCAL_LATENCY_STATIC_CONFS["spark.scheduler.mode"]}
            if huge
            else LOCAL_LATENCY_STATIC_CONFS
        )
        for k, v in statics.items():
            builder = builder.config(k, v)
    else:
        requested = "false"
    spark = builder.getOrCreate()
    # On a pre-existing session getOrCreate applies only the builder's
    # runtime SQL configs (Spark 4) or none at all (older behavior) —
    # either way the requested profile's conf SET may not be live, and
    # the ensure_session_confs memo would mask that forever (ADVICE
    # r5). get_spark is an explicit profile request and is called
    # rarely (never per-table), so unconditionally re-align the runtime
    # profile and drop the memo.
    _CONFIGURED_SESSIONS.pop(id(spark), None)
    _apply_profile(spark, requested, n)
    if streaming_state_store is not None:
        set_streaming_state_store(spark, streaming_state_store)
    spark.sparkContext.setLogLevel("WARN")
    return ensure_session_confs(spark)
