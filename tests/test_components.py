"""Connected-components cluster resolution (operators/components.py).

Differential oracle: a driver-side union-find over the same edge list —
the textbook sequential algorithm — must agree with the distributed
label propagation on every graph, including hypothesis-generated ones.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cds_etl_spark.operators.components import (
    connected_components,
    dedup_keep_canonical,
)


def union_find_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min member id of each set
    roots: dict[int, int] = {}
    for n in list(parent):
        r = find(n)
        roots[r] = min(roots.get(r, n), n)
    return {n: roots[find(n)] for n in parent}


def spark_components(spark, edges: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(df, "src", "dst")
    return {r["node"]: r["component"] for r in out.collect()}


def test_two_chains_and_isolated_pair(spark):
    # 1-2-3-4 chain, 10-11, self-contained triangle 20-21-22
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)]
    got = spark_components(spark, edges)
    assert got == union_find_components(edges)
    assert got[4] == 1 and got[11] == 10 and got[22] == 20


def test_self_loops_and_duplicate_edges_ignored(spark):
    edges = [(5, 5), (1, 2), (2, 1), (1, 2)]
    got = spark_components(spark, edges)
    # 5's only edge is a self-loop — it is not a clustered node
    assert got == {1: 1, 2: 1}


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=40,
    )
)
def test_matches_union_find_on_random_graphs(spark, edges):
    real = [e for e in edges if e[0] != e[1]]
    if not real:
        return
    assert spark_components(spark, real) == union_find_components(real)


def test_dedup_keep_canonical(spark):
    df = spark.createDataFrame(
        [(i, f"doc{i}") for i in range(6)], "doc_id long, text string"
    )
    comps = connected_components(
        spark.createDataFrame([(0, 3), (3, 5)], "a long, b long"), "a", "b"
    )
    kept = dedup_keep_canonical(df, "doc_id", comps)
    ids = sorted(r["doc_id"] for r in kept.collect())
    # cluster {0,3,5} keeps 0; 1, 2, 4 untouched
    assert ids == [0, 1, 2, 4]
    # anti-join must not reorder/duplicate surviving columns
    assert kept.columns == ["doc_id", "text"]


def test_converges_on_long_chain(spark):
    edges = [(i, i + 1) for i in range(24)]
    got = spark_components(spark, edges)
    assert set(got.values()) == {0}


# ------------------------------------------------------------ triangle_count


def _brute_triangles(edges):
    import itertools

    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {}
    for x, y, z in itertools.combinations(sorted(adj), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            for n in (x, y, z):
                counts[n] = counts.get(n, 0) + 1
    return counts


def test_triangle_count_known_graph(spark):
    from cds_etl_spark.operators.components import triangle_count

    # two triangles sharing edge (1,2), plus a dangling edge
    edges = [(1, 2), (2, 3), (1, 3), (1, 4), (2, 4), (4, 5)]
    got = {
        r["node"]: r["triangles"]
        for r in triangle_count(
            spark.createDataFrame(edges, "a long, b long"), "a", "b"
        ).collect()
    }
    assert got == {1: 2, 2: 2, 3: 1, 4: 1}


@given(
    st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=20, deadline=None)
def test_triangle_count_matches_brute_force(spark, edges):
    from cds_etl_spark.operators.components import triangle_count

    expected = _brute_triangles(edges)
    real = [e for e in edges if e[0] != e[1]]
    if not real:
        return
    got = {
        r["node"]: r["triangles"]
        for r in triangle_count(
            spark.createDataFrame(real, "a long, b long"), "a", "b"
        ).collect()
    }
    assert got == expected


def test_weighted_sssp_hand_graph(spark):
    from cds_etl_spark.operators.components import weighted_sssp

    # s -1- a -1- b -1- c -1- d ; s -10- c : the cheap 4-hop chain
    # beats the direct heavy edge only within the hop bound.
    edges = spark.createDataFrame(
        [
            ("s", "a", 1), ("a", "b", 1), ("b", "c", 1), ("c", "d", 1),
            ("s", "c", 10), ("d", "e", 1),
        ],
        "src string, dst string, w long",
    )
    d4 = {
        r["node"]: r["d"]
        for r in weighted_sssp(edges, "s", max_hops=4).collect()
    }
    # c: min(3-hop chain cost 3, direct 10) = 3; d: 4 edges, cost 4;
    # e needs 5 edges -> reachable only via s-c(10)-d... no: c->d->e
    # = 10+1+1 = 12 within 3 edges.
    assert d4 == {"a": 1, "b": 2, "c": 3, "d": 4, "e": 12}
    # Tighter bound: with <=2 hops c costs the direct edge's 10 and
    # the chain's tail is unreachable.
    d2 = {
        r["node"]: r["d"]
        for r in weighted_sssp(edges, "s", max_hops=2).collect()
    }
    assert d2 == {"a": 1, "b": 2, "c": 10, "d": 11}


def test_label_propagation_splits_bridged_cliques(spark):
    from cds_etl_spark.operators.components import (
        connected_components,
        label_propagation,
    )

    # Two 6-cliques joined by ONE bridge edge: components merges
    # them; label propagation must keep them apart.
    def clique(base):
        return [
            (base + i, base + j)
            for i in range(6)
            for j in range(i + 1, 6)
        ]

    edges = spark.createDataFrame(
        clique(0) + clique(100) + [(5, 100)], "src long, dst long"
    )
    lab = {
        r["node"]: r["community"]
        for r in label_propagation(edges).collect()
    }
    left = {lab[i] for i in range(6)}
    right = {lab[100 + i] for i in range(6)}
    assert len(left) == 1 and len(right) == 1 and left != right
    comp = connected_components(edges, "src", "dst")
    assert comp.select("component").distinct().count() == 1
    # Deterministic: a second run is identical.
    again = {
        r["node"]: r["community"]
        for r in label_propagation(edges).collect()
    }
    assert again == lab


def test_k_core_peels_tendrils_keeps_clique(spark):
    from cds_etl_spark.operators.components import k_core

    # A 5-clique (every degree 4) with a chain of tendrils hanging
    # off it: 0-1-2-3-4 complete, then 4-10-11-12. The 3-core is
    # exactly the clique — the chain peels away layer by layer
    # (which requires the ITERATION: node 10's initial degree is 2
    # only after 11 goes, proving single-pass filtering is wrong).
    clique = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    chain = [(4, 10), (10, 11), (11, 12)]
    edges = spark.createDataFrame(clique + chain, "src long, dst long")
    core3 = {
        r["node"]: r["degree"] for r in k_core(edges, 3).collect()
    }
    assert core3 == {0: 4, 1: 4, 2: 4, 3: 4, 4: 4}
    # k=1 keeps everything; k=5 empties (max degree in core is 4).
    assert k_core(edges, 1).count() == 8
    assert k_core(edges, 5).count() == 0
