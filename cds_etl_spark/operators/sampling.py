"""Deterministic hash-based sampling, splitting, and interleaving.

Training-data pipelines need REPRODUCIBLE selection: the same row must
land in the same sample/split on every run, at any cluster size, in any
engine (re-runs, backfills, audits, train/test leakage checks). Spark's
``df.sample()`` seeds per-partition — its output changes whenever the
partitioning does — so these operators key selection off a content hash
of a stable key column instead: md5 (bit-identical everywhere) → 32-bit
bucket → threshold compare.

Every operator here is narrow (pure map-side filter/project): no
shuffle, no state, no driver round-trip; at 100 TB the cost is the scan
itself, and the selection predicate sits above the parquet reader so
column pruning still applies (the hash key + payload columns are the
only reads).

The reference has no sampling surface at all (SURVEY.md §2.1 absences);
this module is part of the LLM-pipeline extension alongside
operators/dedup and operators/similarity.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Bucket space for hash thresholds. 1e6 gives 0.0001% rate granularity
#: while keeping thresholds exact integers (no float compare anywhere).
BUCKETS = 1_000_000


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Uniform bucket in ``[0, BUCKETS)`` from a stable key.

    First 8 hex chars of ``md5(key || '|' || salt)`` parsed as an
    integer, mod ``BUCKETS``. md5 is engine-portable: DuckDB computes
    the identical value via ``('0x' || substr(md5(k || '|s'), 1, 8))
    ::BIGINT % 1000000``, which is what the qs65/qs66 oracles do — the
    sampling decision itself is value-checked cross-engine, not just
    the row counts.

    The salt decouples independent decisions: sampling with salt A and
    splitting with salt B are statistically independent even on the
    same key (re-using one hash for both would correlate them — e.g.
    every sampled row landing in 'train').
    """
    h = F.md5(F.concat(key.cast("string"), F.lit("|" + salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % BUCKETS


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Deterministic ``fraction`` sample keyed on ``key_col``.

    Selection is a property of the row's key, not of the run: stable
    under re-execution, repartitioning, and incremental appends (a row
    added tomorrow is in/out by the same rule). Map-side filter only.
    """
    threshold = int(round(fraction * BUCKETS))
    return df.filter(hash_bucket(F.col(key_col), salt) < threshold)


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: Mapping[str, float],
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Partition rows into named splits by cumulative hash thresholds.

    ``weights`` maps split name → proportion (must sum to ~1). Each row
    gets exactly one label; the last split absorbs integer-rounding
    remainder so the union is always total and the splits disjoint —
    the two invariants train/val/test must satisfy (property-tested in
    tests/test_sampling.py).
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-6:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = hash_bucket(F.col(key_col), salt)
    names = list(weights)
    expr: Column | None = None
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name]
        cond = bucket < int(round(cum * BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    label = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(split_col, label)


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: Mapping[str, float],
    default_fraction: float = 0.0,
    salt: str = "strata",
) -> DataFrame:
    """Per-stratum deterministic sampling rates (e.g. downsample 'en'
    to 20% while keeping all low-resource languages).

    The per-stratum threshold is a broadcast-free CASE chain over
    ``strata_col`` — still a pure map-side filter. Strata not listed
    get ``default_fraction``.
    """
    bucket = hash_bucket(F.col(key_col), salt)
    thr: Column = F.lit(int(round(default_fraction * BUCKETS)))
    for value, frac in fractions.items():
        thr = (
            F.when(F.col(strata_col) == value, int(round(frac * BUCKETS)))
            .otherwise(thr)
        )
    return df.filter(bucket < thr)


def interleave_sources(
    sources: Mapping[str, DataFrame],
    key_col: str,
    rates: Mapping[str, float],
    salt: str = "mix",
    source_col: str = "source_ds",
) -> DataFrame:
    """Deterministic dataset mixture: tag each source, hash-sample it
    at its configured rate, union by name.

    ``rates`` are per-source sampling rates (the caller derives them
    from target mixture proportions and known source sizes — keeping
    that derivation out of the operator means no count() jobs hidden
    in a transform). Each source uses a distinct salt so co-keyed rows
    in different sources are decided independently. The union is a
    metadata-only concat (no shuffle); downstream repartition decides
    the physical interleaving.
    """
    parts = []
    for name, df in sources.items():
        rate = rates.get(name, 1.0)
        tagged = df.withColumn(source_col, F.lit(name))
        if rate < 1.0:
            tagged = hash_sample(tagged, key_col, rate, salt=f"{salt}|{name}")
        parts.append(tagged)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def weighted_hash_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "",
    strata_cols: list[str] | None = None,
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-Res with a hash-derived uniform): each row
    gets priority ``u^(1/w)`` where ``u`` is the key's stable
    md5-uniform in (0,1) and ``w`` its positive weight; the top-k
    priorities are the sample. Inclusion probability is proportional
    to weight, yet the draw is a pure function of (key, salt) — stable
    across runs, partitionings, and engines, like hash_sample.

    Global form compiles to TakeOrderedAndProject (per-partition top-k,
    no full sort); with ``strata_cols`` it is a windowed top-k per
    stratum. Rows with non-positive weight are excluded."""
    u = (hash_bucket(F.col(key_col), salt) + 0.5) / BUCKETS
    pri = F.pow(u, F.lit(1.0) / F.col(weight_col))
    ranked = df.filter(F.col(weight_col) > 0).withColumn("__pri", pri)
    if strata_cols:
        w = Window.partitionBy(*strata_cols).orderBy(
            F.col("__pri").desc(), F.col(key_col)
        )
        return (
            ranked.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__pri", "__rn")
        )
    return (
        ranked.orderBy(F.col("__pri").desc(), F.col(key_col))
        .limit(k)
        .drop("__pri")
    )


def temperature_weights(
    df: DataFrame, group_cols: list[str], alpha: float = 0.5
) -> DataFrame:
    """Temperature-based corpus mixing weights: the multilingual-LM
    sampling rule p_g ∝ (n_g/N)^α (Conneau & Lample 2019; α<1 upsamples
    low-resource groups). Complements ``qs134``'s uniform-target
    weights with the tunable-exponent family actually used to mix
    pretraining corpora.

    Determinism contract: the only float ops are one division of two
    exact integers, one root/power, and one multiply — no float SUM
    whose accumulation order could differ between engines — so
    ``weight_e6`` is bit-identical everywhere. α=0.5 routes through
    ``sqrt`` (IEEE correctly-rounded in every engine) instead of
    ``pow`` (NOT guaranteed correctly rounded by libm) — with pow, a
    1-ULP engine difference adjacent to an integer boundary would flip
    the floor.
    The weight is normalized against the LARGEST group (weight_e6 =
    1e6 for it) rather than the sum, keeping it integer-exact; the
    caller rescales to probabilities if needed.

    One narrow aggregate (groupBy count), then the max is an
    unpartitioned window OVER THE AGGREGATE (group-count rows, not
    corpus rows) — a separate ``g.agg(max)`` branch would make Spark
    re-run the corpus scan+aggregate for the second consumer of ``g``.
    At 100 TB the cost is the one count scan.
    """
    g = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("cnt"))
    max_cnt = F.max("cnt").over(Window.partitionBy())
    share = F.col("cnt").cast("double") / max_cnt
    powered = F.sqrt(share) if alpha == 0.5 else F.pow(share, F.lit(alpha))
    return g.select(
        *group_cols,
        "cnt",
        F.floor(F.lit(1_000_000.0) * powered).cast("long").alias("weight_e6"),
    )


def epoch_shards(
    df: DataFrame,
    key_col: str,
    num_shards: int,
    epoch: int,
    salt: str = "epoch",
) -> DataFrame:
    """Deterministic per-epoch global shuffle, expressed as a SHARD
    PLAN instead of a shuffle: every row gets a (shard, pos) address
    that is a pure function of (key, epoch), so a training job reads
    shard files in pos order and sees a different — but exactly
    reproducible — permutation each epoch. This is how large
    pretraining runs randomize data order without ever paying a
    global sort of the corpus:

    * ``shard`` is a hash mod — a plain hash-partition exchange, NO
      range partitioning and NO global ordering (a naive ORDER BY
      md5(...) over 100 TB is a full-corpus range sort; this is one
      hash shuffle, the same cost as any groupBy);
    * ``pos`` is a row_number per shard ordered by the full md5 hex
      of the same salted key — each window covers only its shard's
      rows, sorts locally inside the exchange that the hash
      partitioning already paid for.

    md5-derived (``hash_bucket``), so the permutation is engine-
    portable and auditable: the qs158 oracle recomputes the identical
    addresses in DuckDB SQL. Changing ``epoch`` re-salts the hash —
    epochs are statistically independent permutations of the same
    corpus, no state carried between them.

    ``pos`` orders by the FULL 32-hex md5 string (then key as the
    final tiebreak), not the million-way-quantized ``hash_bucket``
    value: past ~1M rows a shard's bucketed hashes collide and a
    bucket-ordered permutation would fall back to raw key order
    inside every tie group — the same order every epoch, exactly at
    the pretraining scale this exists for. Shard assignment keeps
    the bucketed hash (collisions there are the point of a mod).
    """
    hexh = F.md5(
        F.concat(F.col(key_col).cast("string"), F.lit(f"|{salt}{epoch}"))
    )
    h = hash_bucket(F.col(key_col), f"{salt}{epoch}")
    with_h = (
        df.withColumn("__hex", hexh)
        .withColumn("__h", h)
        .withColumn("__shard", (F.col("__h") % num_shards).cast("bigint"))
    )
    w = Window.partitionBy("__shard").orderBy("__hex", key_col)
    return with_h.select(
        F.col(key_col),
        F.col("__shard").alias("shard"),
        F.row_number().over(w).alias("pos"),
    )
