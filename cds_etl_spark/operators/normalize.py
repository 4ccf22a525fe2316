"""Cell-level normalization (reference ops O3/O4).

The reference normalizes late and in two passes over every cell
(cds-transformation_v1.3.py:134-136: regex-replace whitespace-only →
NaN, then strip each string). Here both collapse into one vectorized
expression per string column — trim, then empty → NULL — applied at
ingest so every downstream operator sees a single null policy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_strings(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Trim leading/trailing whitespace and null-out blank cells for
    every (or the given) string column. Non-string columns pass
    through untouched."""
    string_cols = {c for c, t in df.dtypes if t == "string"}
    targets = [c for c in (columns or df.columns) if c in string_cols]
    exprs = {}
    for c in targets:
        trimmed = F.trim(F.col(c))
        exprs[c] = F.when(trimmed == "", None).otherwise(trimmed)
    return df.withColumns(exprs) if exprs else df
