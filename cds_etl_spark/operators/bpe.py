"""BPE tokenizer training and application over a Spark corpus.

Sennrich et al. 2016 byte-pair encoding, the tokenizer-construction
step of an LLM data pipeline, structured Spark-first:

* the corpus collapses ONCE into a word-frequency table (the classic
  trick — all further work is per DISTINCT word weighted by its count,
  so 100 TB of text becomes a vocabulary-sized working set);
* each merge step is two narrow aggregates over that table: count
  adjacent symbol pairs weighted by word frequency, take the argmax
  (count desc, pair asc — a deterministic tie-break so training is
  reproducible run-to-run and engine-to-engine), then rewrite the
  symbol arrays with a higher-order ``aggregate`` expression — all
  JVM-side, no Python in the per-word loop;
* only the single winning pair crosses to the driver per step
  (one-row collect), mirroring the reference algorithm's "best pair"
  selection; the merge list is driver-sized by definition
  (n_merges entries).

``qs145`` exposes one pair-count step as an oracle-checked query; this
module is the full loop plus the encoder. ``bpe_encode`` applies the
learned merges IN TRAINING ORDER with the identical leftmost-greedy
adjacency rule, so encoding the training corpus reproduces the final
training state exactly — that invariant is the test contract
(tests/test_bpe.py), checked against a pure-Python reference
implementation of the published algorithm.

The reference ETL has no tokenizer surface (SURVEY.md §2.1 absences);
this is part of the LLM-pipeline extension alongside operators/dedup
and operators/sampling.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cds_etl_spark.operators.pin import cut_lineage
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: End-of-word marker, a separate trailing symbol (the Sennrich paper's
#: formulation): merges learned at word ends don't leak into prefixes.
END = "</w>"


def word_freq_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(syms array<string>, freq) per distinct lowercase word: the
    symbol array is the word's characters plus the END marker. One
    corpus scan + one narrow groupBy — everything downstream is sized
    by the vocabulary, not the corpus."""
    words = df.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), " "),
                lambda x: x != F.lit(""),
            )
        ).alias("w")
    )
    wf = words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    return wf.select(
        F.concat(
            F.split(F.col("w"), ""), F.array(F.lit(END))
        ).alias("syms"),
        "freq",
    )


def merge_adjacent(syms: Column, a: str, b: str) -> Column:
    """Rewrite a symbol array applying one merge (a, b) → a+b with the
    leftmost-greedy adjacency rule: a fold over the array where the
    accumulator's last element decides whether the incoming symbol
    completes the pair. After a merge the combined symbol becomes the
    last element, so overlapping occurrences (aaa under (a,a)) merge
    non-overlapping left-to-right — the published semantics. All
    JVM-side (``aggregate`` HOF), no UDF."""
    merged = a + b
    return F.aggregate(
        syms,
        F.array().cast(ArrayType(StringType())),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _pair_counts(wf: DataFrame) -> DataFrame:
    """Adjacent-pair counts weighted by word frequency: row-local zip
    of the array against its shift, one exploded aggregate. The
    shuffle carries (pair, partial count) — map-side combined."""
    pairs = wf.select(
        F.explode(
            F.expr(
                "arrays_zip(slice(syms, 1, size(syms) - 1), "
                "slice(syms, 2, size(syms) - 1))"
            )
        ).alias("p"),
        "freq",
    ).select(
        F.col("p.0").alias("a"), F.col("p.1").alias("b"), "freq"
    )
    return pairs.groupBy("a", "b").agg(F.sum("freq").alias("cnt"))


def bpe_train(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    checkpoint_every: int = 8,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``n_merges`` BPE merges; returns (merges, final word
    table). Deterministic: ties on count break by (a, b) ascending.

    Loop economics at scale: each step is one pair-count aggregate
    over the DISTINCT-WORD table plus a one-row collect; the corpus
    itself was scanned exactly once (word_freq_table). The symbol
    rewrite is lazy column surgery — ``localCheckpoint`` every
    ``checkpoint_every`` steps truncates the growing lineage so step
    N's plan doesn't replay steps 1..N-1."""
    wf = df if set(df.columns) == {"syms", "freq"} else word_freq_table(
        df, text_col
    )
    wf = cut_lineage(wf)  # pin: iterative (merge-loop frame)
    merges: list[tuple[str, str]] = []
    for step in range(n_merges):
        top = (
            _pair_counts(wf)
            .orderBy(F.col("cnt").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < 2:
            break  # nothing left worth merging
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        wf = wf.withColumn("syms", merge_adjacent(F.col("syms"), a, b))
        if (step + 1) % checkpoint_every == 0:
            wf = cut_lineage(wf)  # pin: iterative (merge-loop frame)
    return merges, wf


ENCODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("tokens", ArrayType(StringType())),
        StructField("n_tokens", IntegerType()),
    ]
)


def apply_merges(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Encode one word by replaying the merge list in training order
    with the same leftmost-greedy rule as ``merge_adjacent`` — plain
    Python, used inside the Arrow batches of ``bpe_encode`` and as
    the parity reference in tests."""
    syms = list(word) + [END]
    for a, b in merges:
        out: list[str] = []
        for x in syms:
            if out and out[-1] == a and x == b:
                out[-1] = a + b
            else:
                out.append(x)
        syms = out
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize documents with a learned merge list: per doc, lowercase
    whitespace words → per-word merge replay → concatenated token
    array. Row-local ``mapInPandas`` (Arrow batches, a per-batch
    word→tokens memo so repeated words replay merges once); the merge
    list ships to executors via closure — it is n_merges tuples, the
    quintessential broadcast-sized model."""

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            out = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks: list[str] = []
                for w in str(text).lower().split(" "):
                    if not w:
                        continue
                    if w not in memo:
                        memo[w] = apply_merges(w, merges)
                    toks.extend(memo[w])
                out.append(
                    {"doc_id": int(did), "tokens": toks, "n_tokens": len(toks)}
                )
            yield pd.DataFrame(out, columns=["doc_id", "tokens", "n_tokens"])

    return df.select(id_col, text_col).mapInPandas(_enc, schema=ENCODE_SCHEMA)
