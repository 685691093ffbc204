"""SemDeDup + group-quota sampling contracts."""

import math

import pyspark.sql.functions as F
import pytest

from relationalize_spark.operators.dedup import embedding_dup_pairs, semdedup_pairs
from relationalize_spark.operators.sampling import group_quota_sample


def _clustered_vectors():
    """Three well-separated axis clusters; within each, one
    near-duplicate pair (cos > 0.99) and one distant member."""
    rows = []
    base = {0: [1.0, 0.0, 0.0, 0.0], 1: [0.0, 1.0, 0.0, 0.0], 2: [0.0, 0.0, 1.0, 0.0]}
    vid = 0
    for c, v in base.items():
        dup = list(v)
        dup[3] = 0.01  # tiny perturbation: near-duplicate
        far = [x * 0.5 for x in v]
        far[(c + 1) % 3] = 0.45  # same cell, not a duplicate
        for vec in (v, dup, far):
            n = math.sqrt(sum(x * x for x in vec))
            rows.append((vid, [x / n for x in vec]))
            vid += 1
    return rows


@pytest.fixture(scope="module")
def vectors(spark):
    return spark.createDataFrame(
        _clustered_vectors(), "vec_id int, embedding array<double>"
    )


def test_semdedup_finds_within_cluster_dups(spark, vectors):
    pairs = semdedup_pairs(vectors, k=3, threshold=0.95).collect()
    found = {(r.i, r.j) for r in pairs}
    assert found == {(0, 1), (3, 4), (6, 7)}
    assert all(r.cos_sim >= 0.95 for r in pairs)


def test_semdedup_subset_of_brute_force(spark, vectors):
    sem = {(r.i, r.j) for r in semdedup_pairs(vectors, k=3, threshold=0.9).collect()}
    brute = {
        (r.i, r.j)
        for r in embedding_dup_pairs(
            vectors, "vec_id", "embedding", threshold=0.9, dim=4,
            n_planes=1, n_tables=64,
        ).collect()
    }
    assert sem <= brute


def test_semdedup_deterministic(spark, vectors):
    a = sorted(semdedup_pairs(vectors, k=3, threshold=0.95).collect())
    b = sorted(semdedup_pairs(vectors.repartition(5), k=3, threshold=0.95).collect())
    assert [(r.i, r.j) for r in a] == [(r.i, r.j) for r in b]


def test_semdedup_on_testdata(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pairs = semdedup_pairs(e, "vec_id", "embedding", k=8, threshold=0.95)
    rows = pairs.collect()
    assert all(r.cos_sim >= 0.95 for r in rows)
    assert all(r.i < r.j for r in rows)


def test_group_quota_exact_counts(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = group_quota_sample(d, "source", 5, id_col="doc_id")
    counts = {r.source: r.n for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    sizes = {r.source: r.n for r in
             d.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts == {s: min(5, n) for s, n in sizes.items()}


def test_group_quota_stable_under_repartition(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = {r.doc_id for r in group_quota_sample(d, "source", 7).collect()}
    b = {r.doc_id for r in group_quota_sample(d.repartition(13), "source", 7).collect()}
    assert a == b


def test_group_quota_append_no_eviction_above_rank(spark):
    # Appending rows can only displace from the bottom of the hash
    # order: rows that ranked strictly inside the quota before stay
    # unless a new row hashes ahead of them.
    base = spark.createDataFrame(
        [(i, "s") for i in range(1, 30)], "doc_id long, source string"
    )
    more = base.union(
        spark.createDataFrame([(i, "s") for i in range(30, 40)],
                              "doc_id long, source string")
    )
    keep_base = {r.doc_id for r in group_quota_sample(base, "source", 10).collect()}
    keep_more = {r.doc_id for r in group_quota_sample(more, "source", 10).collect()}
    # survivors of the append were already winners, or are new rows
    assert keep_more <= (keep_base | set(range(30, 40)))
