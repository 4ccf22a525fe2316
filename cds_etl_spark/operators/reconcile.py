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
