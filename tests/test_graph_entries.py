"""g2_triangle_count: triangle counting + local clustering coefficient over
the v6 kNN graph.

The oracle sweep (tools/driver_sim.py) checks value parity with DuckDB;
these tests pin the graph-theoretic invariants directly against a
driver-side brute force on the same edge list, so the entry stays honest
even if both the Spark plan and the oracle SQL were edited in lockstep.
"""

from __future__ import annotations

from collections import defaultdict

import pytest

from weather_data_pipeline_sv_spark.catalog import all_queries


@pytest.fixture(scope="module")
def queries():
    return all_queries()


def _bruteforce(edge_rows):
    """Triangle counts per node from the directed kNN edge list, the
    straightforward way: undirect, then enumerate a<b<c triples closing
    each canonical edge."""
    und = set()
    for r in edge_rows:
        a, b = sorted((r["vec_id"], r["neighbor_id"]))
        und.add((a, b))
    adj = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    tri = defaultdict(int)
    for a, b in und:
        for c in adj[a] & adj[b]:
            if c > b:  # a < b < c: each triangle visited exactly once
                tri[a] += 1
                tri[b] += 1
                tri[c] += 1
    deg = {v: len(ns) for v, ns in adj.items()}
    return und, deg, tri


def test_g2_matches_bruteforce(spark, sf_dir, queries):
    edges = (
        queries["v6_knn_graph"](spark, sf_dir)
        .select("vec_id", "neighbor_id")
        .collect()
    )
    _, deg, tri = _bruteforce(edges)
    out = {r["vec_id"]: r for r in queries["g2_triangle_count"](spark, sf_dir).collect()}
    # every embedding row appears exactly once, including isolated nodes
    assert set(out) >= set(deg)
    for vid, row in out.items():
        d = deg.get(vid, 0)
        t = tri.get(vid, 0)
        assert row["degree"] == d, vid
        assert row["tri_count"] == t, vid
        expect_cc = round(2.0 * t / (d * (d - 1)), 6) if d >= 2 else 0.0
        assert row["clustering_coeff"] == pytest.approx(expect_cc, abs=1e-9), vid


def test_g2_coeff_bounds_and_totals(spark, sf_dir, queries):
    rows = queries["g2_triangle_count"](spark, sf_dir).collect()
    assert all(0.0 <= r["clustering_coeff"] <= 1.0 for r in rows)
    # sum of per-corner counts is divisible by 3 (each triangle has 3 corners)
    assert sum(r["tri_count"] for r in rows) % 3 == 0
    # a node below degree 2 can close no triangle
    assert all(r["tri_count"] == 0 for r in rows if r["degree"] < 2)


def test_g2_partition_invariant(spark, sf_dir, queries):
    out = queries["g2_triangle_count"](spark, sf_dir)
    base = sorted(map(tuple, out.collect()))
    again = sorted(map(tuple, out.repartition(7).collect()))
    assert base == again


def test_g3_components_consistent_with_edges(spark, sf_dir, queries):
    """Union-find over the v6 edge list must reproduce g3's labeling
    exactly (component = min vec_id reachable)."""
    edges = (
        queries["v6_knn_graph"](spark, sf_dir)
        .select("vec_id", "neighbor_id")
        .collect()
    )
    parent: dict[int, int] = {}

    def find(a):
        while parent.setdefault(a, a) != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for r in edges:
        union(r["vec_id"], r["neighbor_id"])
    out = queries["g3_knn_components"](spark, sf_dir).collect()
    for r in out:
        assert r["component"] == find(r["vec_id"]), r["vec_id"]
