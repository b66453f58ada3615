"""Connected-components (dedup group assignment) vs a pure-Python
union-find reference — including the diameter stress case that breaks
naive label propagation."""

import random

import pytest
from pyspark.sql import functions as F

from crawler_core_spark.operators.components import (
    assign_components,
    connected_components,
)


def uf_components(n_ids, edges):
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component label = min id in component
    comp = {}
    for i in n_ids:
        r = find(i)
        comp.setdefault(r, []).append(i)
    return {i: min(members) for r, members in comp.items() for i in members}


def _run(spark, ids, edges):
    edf = spark.createDataFrame(
        [(a, b) for a, b in edges], "id_a: long, id_b: long"
    )
    ndf = spark.createDataFrame([(i,) for i in ids], "doc_id: long")
    got = {
        r["id"]: r["component"]
        for r in assign_components(ndf, edf, "doc_id").collect()
    }
    want = uf_components(ids, edges)
    assert got == want
    return got


def test_components_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    ids = list(range(120))
    edges = [(rng.randrange(120), rng.randrange(120)) for _ in range(90)]
    edges = [e for e in edges if e[0] != e[1]]
    _run(spark, ids, edges)


def test_components_chain_diameter_stress(spark):
    """A 200-node chain has diameter 199: min-label propagation needs 199
    rounds, large/small-star converges in O(log^2) — the convergence
    RuntimeError at max_iter=25 fires if the algorithm were diameter-bound."""
    ids = list(range(200))
    edges = [(i, i + 1) for i in range(199)]
    got = _run(spark, ids, edges)
    assert set(got.values()) == {0}


def test_components_singletons_and_merges(spark):
    # two clusters bridged by one edge + true singletons
    ids = list(range(20))
    edges = [(0, 1), (1, 2), (5, 6), (6, 7), (2, 5), (10, 11)]
    got = _run(spark, ids, edges)
    assert got[7] == 0 and got[11] == 10 and got[19] == 19


def test_connected_components_edge_incident_only(spark):
    edf = spark.createDataFrame([(3, 9), (9, 4)], "id_a: long, id_b: long")
    got = {
        r["id"]: r["component"] for r in connected_components(edf).collect()
    }
    assert got == {3: 3, 9: 3, 4: 3}
