"""Sequence packing — concat-and-chunk documents into fixed-token
training chunks (the GPT-pretraining data layout).

Pretraining consumes fixed-length token blocks: documents are
concatenated in a deterministic order and the token stream is split
every ``budget`` tokens, so a document can straddle a chunk boundary.
The operator computes, for every document, the chunk ids it overlaps —
the shuffle-side manifest a downstream tokenizer/writer needs to
materialize block files. No reference analogue (LLM-pipeline
extension, like operators/sampling.py).

Shape: one window cumsum per shard + an exploded per-row sequence —
a single shuffle on the shard key. Sharding is what makes this hold at
100 TB: the running sum is inherently sequential, so it runs
*per shard* (e.g. language, source, or a hash bucket), each shard's
cumsum an independent window partition; chunk ids are local to a
shard. An unsharded call is a single global window partition — fine
for tests, single-task at scale (same caveat as any global ordering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_assignments(
    df: DataFrame,
    id_col: str,
    token_count_col,
    budget: int,
    shard_col: str | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Assign each document the training-chunk ids it overlaps.

    ``token_count_col`` is a column name or Column of per-document
    token counts; rows with a non-positive count are dropped (they
    occupy no tokens). Order within a shard is ``order_col``
    (default: ``id_col``) — it must be unique per shard for the
    packing to be deterministic.

    Returns one row per (document, chunk): ``(shard?, id, chunk_id,
    n_tokens, cum_before)`` where ``cum_before`` is the document's
    start offset in the shard's concatenated token stream.
    """
    tok = F.col(token_count_col) if isinstance(token_count_col, str) else token_count_col
    order = order_col or id_col
    parts = [shard_col] if shard_col else []
    w = (
        Window.partitionBy(*parts)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        df.withColumn("n_tokens", tok.cast("long"))
        .filter(F.col("n_tokens") > 0)
        .withColumn("cum_after", F.sum("n_tokens").over(w))
        .withColumn("cum_before", F.col("cum_after") - F.col("n_tokens"))
        .withColumn(
            "chunk_id",
            F.explode(
                F.sequence(
                    (F.col("cum_before") / budget).cast("long"),
                    ((F.col("cum_after") - 1) / budget).cast("long"),
                )
            ),
        )
    )
    cols = parts + [id_col, "chunk_id", "n_tokens", "cum_before"]
    return out.select(*cols)
