"""Count-Min sketch: mergeable frequency estimation over unbounded
key domains.

Companion to the HLL distinct sketches in ``text_analysis.
distinct_sketch_by``: HLL answers "how many distinct", CMS answers
"how often does X occur" with sublinear state — the standard pair a
100 TB corpus profiler keeps per shard. The reference's frequency
analogue is full enumeration (pandas ``value_counts`` shapes inside
cds_transformation_functions.py validation reports), which cannot ship
a bounded summary per batch; a CMS table is ``depth × width`` rows
regardless of corpus size.

Representation is RELATIONAL on purpose: a sketch is a DataFrame of
``(j, bucket, cnt)`` rows (j = hash-function index). That makes every
sketch operation a plain DataFrame op — build is one groupBy, merge of
two sketches is union + sum (counters are additive), and a point query
is a join + min — all shuffle-parallel, nothing driver-side, and the
sketch itself is storable/unionable as a tiny parquet table. The hash
family is md5 with the depth index salted into the preimage,
hex-parsed to int64 — deterministic and engine-portable, so the exact
same sketch is reproducible from DuckDB/any SQL engine (qs110's
oracle builds it in SQL).

Guarantees (standard CMS, Cormode & Muthukrishnan): estimate ≥ true
count always (counters only over-count on collisions); with width w
and depth d, P[error > e·N] ≤ (1/2^d-ish) for w ≈ 2/e — property-
tested in tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(item: Column, j: Column, width: int) -> Column:
    """Hash-function family: int64 of the first 8 md5 hex chars of
    ``j:item``, mod width. Engine-portable (DuckDB:
    ('0x'||substr(md5(...),1,8))::BIGINT % w)."""
    preimage = F.concat(j.cast("string"), F.lit(":"), item.cast("string"))
    return (
        F.conv(F.substring(F.md5(preimage), 1, 8), 16, 10).cast("long")
        % F.lit(width)
    ).alias("bucket")


def cms_build(
    df: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Build a ``(j, bucket, cnt)`` Count-Min sketch of ``item_col``
    occurrences (or of ``weight_col`` sums when given).

    One explode (×depth — a constant) and ONE shuffle on the composite
    (j, bucket) key whose cardinality is depth·width, with map-side
    partial aggregation collapsing each partition's stream before the
    exchange — at scale the shuffle carries at most depth·width rows
    per map task, independent of input size.
    """
    w = F.col(weight_col) if weight_col else F.lit(1)
    rows = (
        df.select(F.col(item_col).alias("__item"), w.alias("__w"))
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("__j"),
            "__item",
            "__w",
        )
        .select(F.col("__j").cast("long").alias("j"), "__item", "__w")
    )
    return (
        rows.select("j", _bucket(F.col("__item"), F.col("j"), width), "__w")
        .groupBy("j", "bucket")
        .agg(F.sum("__w").cast("long").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same (depth, width): counters are
    additive, so merge is union + sum — the property that lets each
    corpus shard sketch independently and a reducer combine results
    without touching raw data."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("j", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query a batch of items: returns ``(item_col, est)`` with
    est = min over the depth rows the item hashes to (classic CMS
    upper-bound estimate). The probe side re-derives its (j, bucket)
    keys and joins the sketch — sketch side is depth·width rows, so
    Catalyst broadcasts it and the probe never shuffles."""
    probes = (
        items.select(F.col(item_col).alias("__item"))
        .distinct()
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("__j"),
            "__item",
        )
        .select(F.col("__j").cast("long").alias("j"), "__item")
    )
    keyed = probes.select("j", "__item", _bucket(F.col("__item"), F.col("j"), width))
    return (
        keyed.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy(F.col("__item").alias(item_col))
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
