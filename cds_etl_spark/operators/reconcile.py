"""Dataset reconciliation and anonymization.

``table_diff`` — keyed diff of two table versions (added / removed /
changed / unchanged), the validation step behind any CDC or migration
cutover: run the old and new pipeline, diff the outputs. Extends the
reference's duplicate-ID conflict diagnosis (O22,
cds_transformation_functions.py:247-277) from one table to a pair.

``anonymize`` — column-policy PII protection: salted hashing,
partial masking, numeric banding (k-anonymity-style generalization).
Complements the reference's SSN *detection* (O26, :284-299) with the
remediation side.

Scale shape: table_diff hashes each side's compared columns map-side
into one 32-byte digest, so the full-outer join shuffles
(key, digest) pairs, never the wide rows; anonymize is entirely
row-local expressions (whole-stage codegen, no UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NULL_SENTINEL = "\x00"
_SEP = "\x1f"


def _row_digest(cols: list[str]) -> Column:
    return F.md5(
        F.concat_ws(
            _SEP,
            *[F.coalesce(F.col(c).cast("string"), F.lit(_NULL_SENTINEL)) for c in cols],
        )
    )


def table_diff(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Diff ``right`` (new) against ``left`` (old) by key: returns
    ``(*key_cols, status)`` with status in {'added', 'removed',
    'changed', 'unchanged'}. ``compare_cols`` defaults to the common
    non-key columns; comparison is null-safe (NULL == NULL)."""
    if compare_cols is None:
        compare_cols = [
            c for c in left.columns if c in set(right.columns) and c not in key_cols
        ]
    l = left.select(*key_cols, _row_digest(compare_cols).alias("__lh"))
    r = right.select(*key_cols, _row_digest(compare_cols).alias("__rh"))
    joined = l.join(r, key_cols, "full_outer")
    status = (
        F.when(F.col("__lh").isNull(), "added")
        .when(F.col("__rh").isNull(), "removed")
        .when(F.col("__lh") != F.col("__rh"), "changed")
        .otherwise("unchanged")
    )
    return joined.select(*key_cols, status.alias("status"))


def merge_into(
    target: DataFrame,
    source: DataFrame,
    key_cols: list[str],
    update_cols: list[str] | None = None,
    insert_unmatched: bool = True,
    delete_condition: Column | None = None,
) -> DataFrame:
    """Keyed upsert with MERGE INTO semantics (the write side of the
    CDC workflow ``table_diff`` validates): for each source row whose
    key matches a target row, target values in ``update_cols``
    (default: all common non-key columns) are replaced by the source's;
    matched rows satisfying ``delete_condition`` (a Column over the
    post-merge values) are dropped; unmatched source rows are inserted
    when ``insert_unmatched``. Target rows with no source match pass
    through. Generalizes the reference's per-batch overwrite model
    (cds-transformation_v1.3.py writes whole nodes per run) to an
    incremental keyed apply.

    Source must have at most one row per key (enforce upstream with
    ``first_match_lookup``-style dedup); duplicate source keys would
    fan out target rows.

    Scale shape: ONE shuffle on the key for each side (a full-outer
    sort-merge join); the per-column CASE is row-local whole-stage
    codegen. No driver materialization, no second pass — at 100 TB the
    cost is the same as any keyed join of the two inputs, and AQE skew
    splitting applies to hot keys.
    """
    if update_cols is None:
        update_cols = [
            c for c in target.columns if c in set(source.columns) and c not in key_cols
        ]
    t = target.alias("t")
    s = source.alias("s")
    cond = None
    for k in key_cols:
        piece = F.col(f"t.{k}") == F.col(f"s.{k}")
        cond = piece if cond is None else cond & piece
    joined = t.join(s, cond, "full_outer")
    matched = F.col(f"t.{key_cols[0]}").isNotNull() & F.col(
        f"s.{key_cols[0]}"
    ).isNotNull()
    source_only = F.col(f"t.{key_cols[0]}").isNull()
    out_cols = []
    for c in target.columns:
        if c in key_cols:
            expr = F.coalesce(F.col(f"t.{c}"), F.col(f"s.{c}"))
        elif c in update_cols:
            expr = F.when(matched | source_only, F.col(f"s.{c}")).otherwise(
                F.col(f"t.{c}")
            )
        elif c in source.columns:
            expr = F.when(source_only, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}"))
        else:
            expr = F.col(f"t.{c}")
        out_cols.append(expr.alias(c))
    merged = joined.select(
        matched.alias("__matched"), source_only.alias("__src_only"), *out_cols
    )
    if not insert_unmatched:
        merged = merged.filter(~F.col("__src_only"))
    if delete_condition is not None:
        merged = merged.filter(~(F.col("__matched") & delete_condition))
    return merged.drop("__matched", "__src_only")


def hash_column(col: str, salt: str = "") -> Column:
    """Salted SHA-256 pseudonymization: stable within a run/salt so
    joins on the hashed key still work, irreversible without the
    salt."""
    return F.sha2(F.concat(F.lit(salt), F.col(col).cast("string")), 256)


def mask_keep_last(col: str, n: int = 4) -> Column:
    """Replace all but the last ``n`` characters with ``*``."""
    c = F.col(col).cast("string")
    return F.concat(
        F.repeat(F.lit("*"), F.greatest(F.length(c) - n, F.lit(0))),
        F.right(c, F.lit(n)),
    )


def band_numeric(col: str, width: float) -> Column:
    """Generalize a numeric to the low edge of its ``width``-sized
    band (k-anonymity-style coarsening)."""
    return F.floor(F.col(col) / width) * width


def anonymize(df: DataFrame, policy: dict[str, Column]) -> DataFrame:
    """Apply a column→expression policy (hash_column / mask_keep_last /
    band_numeric or any Column); unlisted columns pass through."""
    return df.select(
        *[policy.get(c, F.col(c)).alias(c) if c in policy else F.col(c) for c in df.columns]
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_distance: int,
    block: "Callable[[Column], Column]",
) -> DataFrame:
    """Blocked fuzzy record linkage: generalizes the reference's fuzzy
    COLUMN matching (O5, SequenceMatcher over header names,
    cds_transformation_functions.py:137-160) to ROW matching — the
    submitter-typo join ('Jhon Smith' ↔ 'John Smith') that exact keys
    cannot express.

    ``block`` maps a name column to a coarse blocking key (prefix,
    soundex, length band, …) applied to BOTH sides; candidate pairs
    come from the equi-join on that key and only candidates pay the
    Levenshtein refine (JVM built-in, codegen'd). The all-pairs
    comparison this avoids is O(n·m) — with blocking the cost is
    Σ_block |L_b|·|R_b|, the same bounded-block contract as
    ``ngram_jaccard_pairs``. Choose blocks the typo class preserves
    (a prefix block misses first-char typos; a length band misses
    insertions — compose two calls for both).

    Caller aliases overlapping column names before calling (the join
    keeps all columns of both sides).
    """
    from cds_etl_spark.operators.skew import spread_scan

    # r15 (guide §2.5): a single-file input puts the whole blocked join
    # + Levenshtein refine in ONE task; spreading both sides on the
    # block key keeps the candidate expansion parallel (and the
    # repartitions satisfy the equi-join's distribution, so no further
    # exchange is added). No-op when the scans already have >= cores
    # splits.
    lb = spread_scan(left.withColumn("__blk", block(F.col(left_col))), "__blk")
    rb = spread_scan(right.withColumn("__blk", block(F.col(right_col))), "__blk")
    return (
        lb.join(rb, "__blk")
        .filter(F.levenshtein(F.col(left_col), F.col(right_col)) <= max_distance)
        .drop("__blk")
    )
