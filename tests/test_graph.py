"""Connected components vs a plain union-find on the same edges."""

import random

from pyspark.sql import functions as F

from gobblin_spark.functions import graph as G


def _uf_components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonicalize to the min id of each set
    comp = {}
    for n in nodes:
        r = find(n)
        comp.setdefault(r, []).append(n)
    return {n: min(comp[find(n)]) for n in nodes}


def test_components_match_union_find_on_random_graph(spark):
    rng = random.Random(7)
    nodes = list(range(60))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(45)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.id: r.component
           for r in G.connected_components(df).collect()}
    touched = sorted({n for e in edges for n in e})
    want = _uf_components(edges, touched)
    assert got == {n: want[n] for n in touched}


def test_long_chain_needs_multiple_iterations(spark):
    # a 30-node path: diameter 29, forces real multi-round propagation
    edges = [(i, i + 1) for i in range(30)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.id: r.component for r in G.connected_components(df, max_iter=40).collect()}
    assert set(got.values()) == {0} and len(got) == 31


def test_keep_one_per_component_transitive(spark):
    # A~B, B~C: only one of {1,2,3} survives even though (1,3) is no pair
    docs = spark.createDataFrame(
        [(1, "x"), (2, "x'"), (3, "x''"), (9, "y")], "doc_id long, t string")
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    out = sorted(r.doc_id for r in
                 G.keep_one_per_component(docs, pairs, "doc_id").collect())
    assert out == [1, 9]


def test_convergence_guard_raises(spark):
    edges = [(i, i + 1) for i in range(30)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    import pytest as _pt
    with _pt.raises(RuntimeError, match="convergence"):
        G.connected_components(df, max_iter=2)
