"""Text/hash column functions for dedup & text analysis.

Everything here is built from Spark higher-order array functions and
``md5`` — JVM-side, whole-stage-codegen'd, no Python in the loop. That
is the 100 TB design decision: a document's shingle set, MinHash
signature, LSH band keys and SimHash are all computed *per row inside
the scan projection* (zero shuffles, zero UDFs); only candidate-pair
generation later shuffles, and only by small band-key tuples.

Hash-function choice: every hash is ``md5`` over a seed-prefixed
string, ordered lexicographically on the hex digest. md5 is available
bit-identically in Spark, DuckDB, and virtually every engine, which is
what lets the driver's DuckDB oracle replay these operators exactly
(seeded xxhash64 would be Spark-only). A uniform hash ordered on hex
is a valid MinHash permutation family.

Reference parity: the reference has no near-dup machinery at all — its
only dedup is full-row ``drop_duplicates`` (cds-transformation_v1.3.py
:148-152); this module is part of the declared LLM-pipeline extension
surface (SURVEY.md §2.2 QS-50..53 and §7.1 M5).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# Tokenization
# --------------------------------------------------------------------------


def tokens(text: Column, lowercase: bool = True) -> Column:
    """Whitespace tokens of a text column."""
    t = F.lower(text) if lowercase else text
    return F.split(t, r"\s+")


def bpe_ish_tokens(text: Column) -> Column:
    """BPE-ish sub-word split: letter runs, digit runs, single
    punctuation — the standard pre-tokenizer regex shape."""
    return F.regexp_extract_all(text, F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"), 1)


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-word shingles (the unit set for MinHash / Jaccard).

    Built as a transform over index positions — one array expression
    per row, no explode. Rows with fewer than k tokens get an empty
    set.
    """
    toks = F.split(text, " ")
    n = F.size(toks)
    idx = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(k)]
            ),
        )
    )


# --------------------------------------------------------------------------
# MinHash / LSH
# --------------------------------------------------------------------------


def minhash_signature(shingle_set: Column, num_hashes: int = 12) -> Column:
    """MinHash signature: array of ``num_hashes`` hex digests, entry j =
    min over the set of ``md5('<j>|' || shingle)``.

    Cost is O(|set| · H) md5 calls per row, fully parallel across rows;
    the signature is ~``32·H`` bytes regardless of document size, which
    is what makes the LSH join's shuffle payload document-size-
    independent.
    """
    return F.array(
        *[
            F.array_min(
                F.transform(shingle_set, lambda s: F.md5(F.concat(F.lit(f"{j}|"), s)))
            )
            for j in range(num_hashes)
        ]
    )


def lsh_band_keys(signature: Column, bands: int, rows_per_band: int) -> Column:
    """LSH band keys: the signature split into ``bands`` groups of
    ``rows_per_band`` hashes, each group collapsed to one md5 key.

    Two documents collide on band b iff their signatures agree on every
    row of that band (P = jaccard^rows_per_band per band).
    """
    return F.array(
        *[
            F.md5(
                F.concat_ws(
                    ",",
                    *[
                        F.element_at(signature, b * rows_per_band + r + 1)
                        for r in range(rows_per_band)
                    ],
                )
            )
            for b in range(bands)
        ]
    )


def jaccard(set_a: Column, set_b: Column) -> Column:
    """Exact Jaccard similarity of two distinct-element arrays."""
    inter = F.size(F.array_intersect(set_a, set_b))
    union = F.size(F.array_union(set_a, set_b))
    return F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(
        F.lit(0.0)
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


def _token_hash32(tok: Column) -> Column:
    """First 32 bits of md5(token) as a non-negative long — the same
    value DuckDB gets from CAST('0x'||substr(md5(t),1,8) AS BIGINT)."""
    return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")


def simhash(token_set: Column, bits: int = 16) -> Column:
    """SimHash of a distinct-token array as a ``bits``-wide integer.

    Bit i of the result is 1 iff more tokens have bit i set than clear
    (unit weights). Computed as ``bits`` array-aggregate expressions
    over the per-row token array — no explode, no shuffle; the fingerprint
    is a single long so grouping near-dups is a plain groupBy.
    """
    def _vote(i: int) -> Column:
        return F.aggregate(
            token_set,
            F.lit(0),
            lambda acc, t: acc
            + F.when(
                F.shiftright(_token_hash32(t), i).bitwiseAND(1) == 1, 1
            ).otherwise(-1),
        )

    votes = [_vote(i) for i in range(bits)]
    out = F.lit(0).cast("long")
    for i, v in enumerate(votes):
        out = out + F.when(v > 0, F.lit(2**i).cast("long")).otherwise(F.lit(0).cast("long"))
    return out


# --------------------------------------------------------------------------
# Fingerprinting (k-min sketch / winnowing family)
# --------------------------------------------------------------------------


def kmin_fingerprint(shingle_set: Column, k: int = 4) -> Column:
    """Document fingerprint: md5 over the k lexicographically smallest
    shingle hashes (a k-min sketch — the winnowing idea with a global
    instead of sliding window). Equal fingerprints ⇒ near-identical
    shingle sets with high probability."""
    hashes = F.array_sort(F.transform(shingle_set, lambda s: F.md5(s)))
    return F.md5(F.array_join(F.slice(hashes, 1, k), ","))
