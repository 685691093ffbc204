"""Fixed-iteration PageRank contracts: hand-computed ranks, mass
conservation, determinism."""

import pyspark.sql.functions as F
import pytest

from relationalize_spark.operators.graph import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_pagerank_star_hand_computed(spark):
    # 3 leaves -> 1 center; center is dangling (mass leaks, documented).
    # N=4, r0=0.25. iter1: center = 0.15/4 + 0.85*(3*0.25) = 0.675,
    # leaves = 0.0375. iter2: center = 0.0375 + 0.85*(3*0.0375)
    # = 0.133125, leaves unchanged.
    e = _edges(spark, [("a", "x"), ("b", "x"), ("c", "x")])
    r = {row.id: row.rank for row in pagerank(e, max_iter=2).collect()}
    assert r["x"] == pytest.approx(0.133125, abs=1e-12)
    for leaf in "abc":
        assert r[leaf] == pytest.approx(0.0375, abs=1e-12)


def test_pagerank_cycle_uniform_and_conserved(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    rows = pagerank(e, max_iter=5).collect()
    ranks = [row.rank for row in rows]
    assert all(r == pytest.approx(1 / 3, abs=1e-9) for r in ranks)
    # no dangling nodes: total mass conserved up to quantization
    assert sum(ranks) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_deterministic_under_repartition(spark):
    import random

    rng = random.Random(9)
    pairs = [
        (f"n{rng.randrange(40)}", f"n{rng.randrange(40)}") for _ in range(300)
    ]
    pairs = [(s, d) for s, d in pairs if s != d]
    e = _edges(spark, pairs)
    a = sorted(map(tuple, pagerank(e, max_iter=4).collect()))
    b = sorted(map(tuple, pagerank(e.repartition(13), max_iter=4).collect()))
    assert a == b


def test_pagerank_duplicate_edges_collapse(spark):
    once = _edges(spark, [("a", "b"), ("b", "a")])
    dup = _edges(spark, [("a", "b"), ("a", "b"), ("b", "a")])
    ra = sorted(map(tuple, pagerank(once, max_iter=3).collect()))
    rb = sorted(map(tuple, pagerank(dup, max_iter=3).collect()))
    assert ra == rb
