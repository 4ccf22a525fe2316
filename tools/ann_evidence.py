#!/usr/bin/env python
"""ANN recall/latency evidence run over generated embeddings.

Measures the quality/speed tradeoff of the engine's four ANN
strategies (brute cosine, IVF, hyperplane-LSH multiprobe, PQ-ADC)
against brute-force ground truth on the gen_sf embeddings table —
the number the BASELINE scale story quotes for "would the index
actually be used at 100 TB".

Usage: python tools/ann_evidence.py [sf_dir] [n_queries]
       (default /tmp/cds_etl_spark_wh/gen/sf10, 20 queries)
Prints one JSON line: per-strategy mean recall@10 vs brute and mean
per-query seconds (index build times reported separately).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from cds_etl_spark.operators.similarity import (  # noqa: E402
    cosine_topk,
    hyperplane_lsh_assign,
    ivf_assign_arrow,
    ivfpq_build,
    ivfpq_topk,
    lsh_topk_fast,
    ivf_topk,
    pq_train_codebooks,
    kmeans_train,
    pq_adc_topk,
    pq_encode,
)
from cds_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/cds_etl_spark_wh/gen/sf10"
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    e = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .repartition(32)
        .localCheckpoint(eager=True)
    )
    n = e.count()
    dim = len(e.first()["embedding"])
    qids = [r["vec_id"] for r in
            e.select("vec_id").orderBy(F.abs(F.xxhash64(F.col("vec_id").cast("string"), F.lit(7)))).limit(n_q).collect()]
    queries = {
        r["vec_id"]: r["embedding"]
        for r in e.filter(F.col("vec_id").isin(qids)).collect()
    }

    def qdf(vec):
        return spark.createDataFrame([(list(vec),)], "qvec array<double>")

    builds = {}
    t0 = time.perf_counter()
    iters = int(os.environ.get("ANN_KMEANS_ITERS", "4"))
    smod = int(os.environ.get("ANN_SAMPLE_MOD", "50"))
    cents = kmeans_train(e, n_centroids=64, iterations=iters, sample_mod=smod)
    cents = cents.localCheckpoint(eager=True)
    ivf = ivf_assign_arrow(e, cents).localCheckpoint(eager=True)
    builds["ivf_build_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    lsh = hyperplane_lsh_assign(e, dim=dim, n_bits=12).localCheckpoint(eager=True)
    builds["lsh_build_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    # Cosine-metric PQ: L2-normalize first, then ADC inner product IS
    # cosine (unnormalized dot would rank large-norm vectors up and
    # recall collapses to noise — measured 0.017 recall@10 without
    # this, 20 lines down from here with it).
    from cds_etl_spark.functions.vector import l2_norm

    en = e.select(
        "vec_id",
        F.transform("embedding", lambda x: x / l2_norm(F.col("embedding"))).alias(
            "embedding"
        ),
    ).localCheckpoint(eager=True)
    cb = pq_train_codebooks(en, n_sub=4, sub_dim=16, k=64).localCheckpoint(
        eager=True
    )
    codes = pq_encode(en, cb, n_sub=4, sub_dim=16, metric="l2").localCheckpoint(eager=True)
    builds["pq_build_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    # IVF-PQ: coarse centroids over the NORMALIZED corpus (so the
    # dot(q, c) + residual-LUT score IS cosine), residual codebooks.
    cents_n = kmeans_train(
        en, n_centroids=64, iterations=iters, sample_mod=smod
    ).localCheckpoint(eager=True)
    codes_r, books_r = ivfpq_build(
        en, cents_n, n_sub=4, sub_dim=16, k_codes=64,
        sample_mod=smod, use_arrow=True,
    )
    codes_r = codes_r.localCheckpoint(eager=True)
    books_r = books_r.localCheckpoint(eager=True)
    builds["ivfpq_build_s"] = round(time.perf_counter() - t0, 2)

    truth, res = {}, {}
    times = {"brute": [], "ivf": [], "lsh": [], "pq": [], "ivfpq": []}
    hits = {"ivf": 0, "lsh": 0, "pq": 0, "ivfpq": 0}
    for qid, vec in queries.items():
        q = qdf(vec)
        t0 = time.perf_counter()
        truth[qid] = [r["vec_id"] for r in cosine_topk(e, q, k=10).collect()]
        times["brute"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        got = [r["vec_id"] for r in ivf_topk(ivf, cents, q, k=10, nprobe=8).collect()]
        times["ivf"].append(time.perf_counter() - t0)
        hits["ivf"] += len(set(got) & set(truth[qid]))

        t0 = time.perf_counter()
        got = [r["vec_id"] for r in lsh_topk_fast(lsh, list(vec), k=10, n_bits=12).collect()]
        times["lsh"].append(time.perf_counter() - t0)
        hits["lsh"] += len(set(got) & set(truth[qid]))

        import math

        nv = math.sqrt(sum(x * x for x in vec)) or 1.0
        qn = qdf([x / nv for x in vec])
        t0 = time.perf_counter()
        # Standard PQ pipeline: ADC is the coarse shortlist (codes
        # cannot rank fine within-cluster neighbors — ADC-only
        # recall@10 is 0.0 on planted clusters), exact cosine re-ranks
        # the shortlist.
        short = pq_adc_topk(codes, cb, qn, k=4000).select("vec_id")
        cand = e.join(F.broadcast(short), "vec_id")
        got = [r["vec_id"] for r in cosine_topk(cand, q, k=10).collect()]
        times["pq"].append(time.perf_counter() - t0)
        hits["pq"] += len(set(got) & set(truth[qid]))

        t0 = time.perf_counter()
        # IVF-PQ: probe 8/64 lists, residual-ADC shortlist, exact
        # cosine re-rank of the shortlist (same pipeline as PQ, but
        # the scan touches only the probed lists).
        short = ivfpq_topk(
            codes_r, books_r, cents_n, qn, k=4000, nprobe=8,
            n_sub=4, sub_dim=16,
        ).select("vec_id")
        cand = e.join(F.broadcast(short), "vec_id")
        got = [r["vec_id"] for r in cosine_topk(cand, q, k=10).collect()]
        times["ivfpq"].append(time.perf_counter() - t0)
        hits["ivfpq"] += len(set(got) & set(truth[qid]))

    out = {
        "n_vectors": n,
        "dim": dim,
        "n_queries": len(queries),
        **builds,
        "mean_query_s": {k: round(sum(v) / len(v), 3) for k, v in times.items()},
        "recall_at_10": {k: round(h / (10 * len(queries)), 3) for k, h in hits.items()},
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
