#!/usr/bin/env python
"""Deterministic scale-factor data generator for bench evidence runs.

The driver ships sf0.001/0.01/0.1 only; the scale argument (BASELINE.md
"floor amortization") needs at least one order of magnitude more. This
writes the same 10-table star schema with the same dtypes, string
formats, and cardinality ratios as /root/testdata (inspected, not
copied: counts scale linearly at 10x per sf decade; key domains,
category sets, and value ranges match the shipped files), seeded so
reruns are byte-stable. Output goes under the bench warehouse (tmp) —
/root/testdata is read-only by contract.

Usage: python tools/gen_sf.py [sf] [out_root]
       -> <out_root>/sf<sf>/<table>.parquet
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEGMENTS = ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["O", "F", "P"]
EVENT_TYPES = ["click", "signup", "error", "view", "purchase"]
LANGS = ["de", "zh", "fr", "en", "es"]
VOCAB = (
    "batch part spark line column order small sort fast value scan hash "
    "slow group agg filter query a big key window row table stream merge "
    "data vector join scan read write disk page block node plan cost"
).split()

DAY_US = 86_400_000_000


def _epoch_days(date: str) -> int:
    return (np.datetime64(date, "D") - np.datetime64("1970-01-01", "D")).astype(int)


EPOCH_1995 = _epoch_days("1995-01-01") * DAY_US


def _days_us(rng, n, start="1995-01-01", days=2404):
    return (_epoch_days(start) + rng.integers(0, days, n)) * DAY_US


def _ts(col):
    return pa.array(col, type=pa.timestamp("us"))


#: Zipf-vocabulary option (r14, VERDICT r13 task 1): the flat 36-word
#: VOCAB has NO rare tokens (min df ≈ 58% of the corpus), so the qs393
#: prefix filter provably cannot prune on gen fixtures — the one
#: claimed scale property with no supporting cell. ``doc_vocab="zipf"``
#: draws document tokens from a 50,000-type vocabulary with
#: P(rank r) ∝ r^-1.1 (the classic text exponent), giving a long
#: singleton tail like real corpora. Drawn from a DEDICATED rng stream
#: (seed+11, the partsupp pattern) after consuming the flat draw, so
#: every other table — and the flat documents output — stays
#: byte-stable whichever option is chosen.
ZIPF_VOCAB_SIZE = 50_000
ZIPF_EXPONENT = 1.1


def generate(
    sf: float, out_dir: str, seed: int = 42, doc_vocab: str = "flat"
) -> None:
    if doc_vocab not in ("flat", "zipf"):
        raise ValueError(f"doc_vocab must be 'flat' or 'zipf': {doc_vocab!r}")
    os.makedirs(out_dir, exist_ok=True)
    scale = sf / 0.1  # counts below are the measured sf0.1 counts
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
        # Cap row groups at 64k rows: parquet SPLITS cannot cross a
        # row-group boundary, so a single-row-group file pins any scan
        # to one task no matter how many splits the engine requests —
        # measured as a 10x wall regression on the 500k-doc corpus
        # queries (one straggler task did all the shingling). The
        # shipped driver testdata has the same layout property.
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
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
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
        "o_custkey": rng.integers(0, n_cust, n_ord),
        "o_orderstatus": np.array(STATUSES)[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1_000, 500_000, n_ord), 2),
        "o_orderdate": _ts(_days_us(rng, n_ord)),
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)],
    }))
    write("lineitem", pa.table({
        "l_orderkey": rng.integers(0, n_ord, n_li),
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
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
        "user_id": rng.integers(0, n_users, n_ev),
        "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.uniform(0, 100, n_ev), 4),
        "props": [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, n_ev)],
    }))
    lens = rng.integers(10, 60, n_doc)
    words = rng.integers(0, len(VOCAB), int(lens.sum()))
    vocab = list(VOCAB)
    if doc_vocab == "zipf":
        # The flat draw above still ran, so the main stream (and every
        # table drawn after documents) is identical to the flat run.
        zrng = np.random.default_rng(seed + 11)
        p = 1.0 / np.arange(1, ZIPF_VOCAB_SIZE + 1) ** ZIPF_EXPONENT
        p /= p.sum()
        words = zrng.choice(ZIPF_VOCAB_SIZE, int(lens.sum()), p=p)
        vocab = [f"t{i}" for i in range(ZIPF_VOCAB_SIZE)]
    texts, pos = [], 0
    for ln in lens:
        texts.append(" ".join(vocab[w] for w in words[pos:pos + ln]))
        pos += ln
    write("documents", pa.table({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": np.array(LANGS)[rng.integers(0, 5, n_doc)],
        "source": [f"src{int(s)}" for s in rng.integers(0, 10, n_doc)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }))
    emb = rng.normal(size=(n_emb, 64)).astype(np.float32)
    write("embeddings", pa.table({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": pa.array(list(emb), type=pa.list_(pa.float32())),
        "label": rng.integers(0, 8, n_emb).astype(np.int32),
    }))
    # partsupp — the one TPC-H table the driver testdata does NOT ship
    # (TPC-H Q2/Q9/Q16/Q20 are inexpressible without it; they live as
    # locally-oracle-checked extras in tests/test_tpch_partsupp.py, NOT
    # in queries()). Generated LAST with a dedicated rng stream so
    # adding it never perturbs the byte-stable draws of the 10 shipped
    # tables (same determinism contract). TPC-H shape: 4 suppliers per
    # part, supplier assignment a deterministic stride like dbgen's.
    ps_rng = np.random.default_rng(seed + 7)
    ps_part = np.repeat(np.arange(n_part, dtype=np.int64), 4)
    ps_i = np.tile(np.arange(4, dtype=np.int64), n_part)
    ps_supp = (ps_part + ps_i * (n_supp // 4 + 1)) % max(n_supp, 1)
    n_ps = n_part * 4
    write("partsupp", pa.table({
        "ps_partkey": ps_part,
        "ps_suppkey": ps_supp,
        "ps_availqty": ps_rng.integers(1, 10_000, n_ps).astype(np.int32),
        "ps_supplycost": np.round(ps_rng.uniform(1.0, 1000.0, n_ps), 2),
    }))


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    root = sys.argv[2] if len(sys.argv) > 2 else "/tmp/cds_etl_spark_wh/gen"
    doc_vocab = sys.argv[3] if len(sys.argv) > 3 else "flat"
    suffix = "" if doc_vocab == "flat" else f"-{doc_vocab}"
    out = os.path.join(root, f"sf{sf:g}{suffix}")
    generate(sf, out, doc_vocab=doc_vocab)
    print(out)
