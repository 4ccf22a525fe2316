#!/usr/bin/env python
"""Zipf-skewed fixture generator for the shuffle-skew audit (r11).

The scale story in BASELINE.md assumed TPC-H-uniform keys; 100 TB
corpora are Zipfian.  This writes the same 10-table schema as
tools/gen_sf.py (same dtypes, value ranges, row counts per sf) but
draws every shuffle-relevant key from a heavy-tailed mixture:

  * one HOT key carrying ~1% of all rows (the "viral" entity), plus
  * a Zipf(a) tail over the rest of the domain,

applied to o_custkey (customer fan-in), l_partkey (hot product in
basket queries), events.user_id (hot user in sessionization),
documents.lang/source (hot corpus partition) and the document WORD
distribution (hot term — shingle/posting-list skew).  Uniform columns
(dates, prices, flags) keep gen_sf's distributions so only key skew
changes between the two fixtures.

Usage: python tools/gen_skew.py [sf] [out_root]
       -> <out_root>/sf<sf>/<table>.parquet
       (default out_root /tmp/cds_etl_spark_wh/skew)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_sf import (  # noqa: E402
    DAY_US,
    EPOCH_1995,
    EVENT_TYPES,
    LANGS,
    PRIORITIES,
    SEGMENTS,
    STATUSES,
    VOCAB,
    _days_us,
    _ts,
)

HOT_FRAC = 0.01  # the one hot key's share of all rows
ZIPF_A = 0.7  # tail exponent (top tail key ~0.2-2% depending on domain)


def zipf_keys(rng, n: int, domain: int) -> np.ndarray:
    """n draws over [0, domain): key 0 is hot (~HOT_FRAC of rows),
    keys 1..domain-1 follow a truncated Zipf(ZIPF_A) tail."""
    ranks = np.arange(1, domain, dtype=np.float64)
    w = 1.0 / ranks**ZIPF_A
    cdf = np.cumsum(w)
    cdf /= cdf[-1]
    u = rng.random(n)
    hot = u < HOT_FRAC
    tail = np.searchsorted(cdf, rng.random(n)) + 1
    return np.where(hot, 0, tail).astype(np.int64)


def zipf_words(rng, n: int) -> np.ndarray:
    """Word indices over the VOCAB with a Zipf(1.0) frequency profile
    (the empirical law for natural text) — makes posting lists and
    shingle buckets skewed the way a real corpus is."""
    ranks = np.arange(1, len(VOCAB) + 1, dtype=np.float64)
    w = 1.0 / ranks
    cdf = np.cumsum(w)
    cdf /= cdf[-1]
    return np.searchsorted(cdf, rng.random(n)).astype(np.int64)


def generate(sf: float, out_dir: str, seed: int = 99) -> None:
    os.makedirs(out_dir, exist_ok=True)
    scale = sf / 0.1
    n_cust = int(15_000 * scale)
    n_supp = int(1_000 * scale)
    n_part = int(20_000 * scale)
    n_ord = int(150_000 * scale)
    n_li = int(600_000 * scale)
    n_ev = int(100_000 * scale)
    n_doc = int(5_000 * scale)
    n_emb = int(2_000 * scale)
    n_users = int(1_500 * scale)
    rng = np.random.default_rng(seed)

    def write(name, table):
        # 64k row groups — see gen_sf.py (split vs row-group boundary).
        pq.write_table(
            table,
            os.path.join(out_dir, f"{name}.parquet"),
            row_group_size=65536,
        )
        print(f"{name}: {table.num_rows} rows", flush=True)

    write("region", pa.table({
        "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
        "r_name": [f"REGION_{i}" for i in range(5)],
    }))
    write("nation", pa.table({
        "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array(np.arange(25, dtype=np.int32) % 5),
    }))
    write("customer", pa.table({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        # nation skew (measured, r11 ADVICE): the designated hot key
        # gets only ~1% (HOT_FRAC) here; the rank-1 Zipf(0.7) tail
        # nation lands at ~13-17% of customers — moderate, not 30%.
        "c_nationkey": zipf_keys(rng, n_cust, 25).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_cust), 2),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)],
    }))
    write("supplier", pa.table({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_supp), 2),
    }))
    adj = ["large", "hot", "blue", "small", "green", "red", "cold", "new"]
    noun = ["ring", "bolt", "gear", "pipe", "disk", "cable", "lens", "frame"]
    write("part", pa.table({
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": [
            f"{adj[i % 8]} {noun[(i // 8) % 8]}" for i in range(n_part)
        ],
        "p_brand": [f"Brand#{int(b)}" for b in rng.integers(1, 26, n_part)],
        "p_type": np.array(["LARGE", "SMALL", "ECONOMY", "STANDARD", "PROMO"])[
            rng.integers(0, 5, n_part)
        ],
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": np.round(rng.uniform(900, 2100, n_part), 2),
    }))
    write("orders", pa.table({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": zipf_keys(rng, n_ord, n_cust),  # hot customer
        "o_orderstatus": np.array(STATUSES)[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1_000, 500_000, n_ord), 2),
        "o_orderdate": _ts(_days_us(rng, n_ord)),
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)],
    }))
    write("lineitem", pa.table({
        # hot customer's orders are NOT hot orderkeys (orderkey stays
        # uniform — basket sizes stay realistic); the skew lever in
        # basket queries is the HOT PRODUCT below.
        "l_orderkey": rng.integers(0, n_ord, n_li),
        "l_partkey": zipf_keys(rng, n_li, n_part),  # hot product
        "l_suppkey": zipf_keys(rng, n_li, n_supp),  # hot supplier
        "l_linenumber": rng.integers(1, 8, n_li).astype(np.int32),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(1_000, 105_000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": np.array(["R", "N", "A"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["O", "F"])[rng.integers(0, 2, n_li)],
        "l_shipdate": _ts(_days_us(rng, n_li, days=2500)),
    }))
    write("events", pa.table({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": _ts(EPOCH_1995 + rng.integers(0, 365 * DAY_US, n_ev)),
        "user_id": zipf_keys(rng, n_ev, n_users),  # hot user
        "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.uniform(0, 100, n_ev), 4),
        "props": [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, n_ev)],
    }))
    lens = rng.integers(10, 60, n_doc)
    words = zipf_words(rng, int(lens.sum()))  # Zipfian term frequencies
    texts, pos = [], 0
    for ln in lens:
        texts.append(" ".join(VOCAB[w] for w in words[pos:pos + ln]))
        pos += ln
    write("documents", pa.table({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        # skewed language mix (top lang ~40% of docs, measured) and a
        # Zipf source mix — the partition skew for blocked dedup
        "lang": np.array(LANGS)[zipf_keys(rng, n_doc, 5)],
        "source": [f"src{int(s)}" for s in zipf_keys(rng, n_doc, 10)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }))
    emb = rng.normal(size=(n_emb, 64)).astype(np.float32)
    write("embeddings", pa.table({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": pa.array(list(emb), type=pa.list_(pa.float32())),
        "label": zipf_keys(rng, n_emb, 8).astype(np.int32),  # hot label
    }))


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    root = sys.argv[2] if len(sys.argv) > 2 else "/tmp/cds_etl_spark_wh/skew"
    out = os.path.join(root, f"sf{sf:g}")
    generate(sf, out)
    print(out)
