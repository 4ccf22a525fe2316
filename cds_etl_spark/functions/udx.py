"""User-defined function surface (SURVEY.md §2.3 UDF/UDAF/UDTF row).

The engine's rule is built-ins first (everything in plans/queries.py is
JVM expressions); this module is the sanctioned escape hatch for the
three extension points, each in its Arrow-vectorized form:

* scalar   — `pandas_udf` returning a Series (see also
             operators/similarity.cosine_topk_pandas);
* UDAF     — grouped-agg `pandas_udf` (one scalar per group), usable in
             `groupBy().agg()` and as a window function;
* UDTF     — `@udtf` table function (one input row → N output rows)
             for generator-shaped logic that has no relational form.

Row-at-a-time `F.udf` is deliberately absent: at 100 TB there is no
workload where it beats either an expression or an Arrow batch.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import DoubleType


@pandas_udf(DoubleType())
def weighted_mean(values: pd.Series, weights: pd.Series) -> float:  # type: ignore[misc]
    """Grouped-agg UDAF: sum(v*w)/sum(w) per group, computed on Arrow
    batches with numpy. Partial aggregation does not apply to Python
    UDAFs (the group's rows ship to one worker) — use only where the
    measure has no algebraic decomposition; this one exists as the
    template and is tested against its expression equivalent."""
    w = weights.fillna(0.0)
    denom = float(w.sum())
    return float((values.fillna(0.0) * w).sum() / denom) if denom else float("nan")


@udtf(returnType="sentence: string, n_words: int, idx: int")
class SplitSentences:
    """UDTF: explode a document into (sentence, word count, index)
    rows — generator-shaped output (data-dependent row count per
    input) where a join/explode expression would need to materialize
    the split twice. Evaluated per input partition; no shuffle."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        for i, raw in enumerate(s for s in text.split(".") if s.strip()):
            s = raw.strip()
            yield s, len(s.split()), i


def register_all(spark) -> None:
    """Expose the UD* surface to spark.sql."""
    spark.udtf.register("split_sentences", SplitSentences)
    spark.udf.register("weighted_mean", weighted_mean)
    _ = F  # re-exported convenience
