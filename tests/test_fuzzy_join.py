"""SymSpell deletion-neighborhood fuzzy join: exact recall/precision
against a brute-force levenshtein cross join on controlled corpora."""

import pytest
from pyspark.sql import functions as F

from relationalize_spark.operators.fuzzy import deletion_keys, fuzzy_join


@pytest.fixture(scope="module")
def words(spark):
    data = [
        (1, "spark"), (2, "spork"), (3, "sparks"), (4, "park"),
        (5, "shark"), (6, "sparkle"), (7, "park"), (8, ""),
        (9, "a"), (10, "b"), (11, "ab"), (12, "graft"),
    ]
    return spark.createDataFrame(data, "id long, w string")


def brute(spark, words, k):
    a, b = words.alias("a"), words.alias("b")
    return sorted(
        tuple(r) for r in a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id"), F.col("b.id"),
            F.levenshtein(F.col("a.w"), F.col("b.w")).alias("d"),
        )
        .filter(F.col("d") <= k)
        .collect()
    )


@pytest.mark.parametrize("k", [1, 2])
def test_matches_brute_force(spark, words, k):
    got = sorted(
        (r.l_id, r.r_id, r.dist)
        for r in fuzzy_join(words, words, "w", max_dist=k, left_id="id", right_id="id")
        .filter(F.col("l_id") < F.col("r_id"))
        .collect()
    )
    assert got == brute(spark, words, k)


def test_substitution_insertion_deletion_all_caught(spark):
    df = spark.createDataFrame(
        [(1, "kitten"), (2, "mitten"), (3, "kitte"), (4, "kittens")],
        "id long, w string",
    )
    pairs = {
        (r.l_id, r.r_id)
        for r in fuzzy_join(df, df, "w", max_dist=1, left_id="id", right_id="id")
        .filter(F.col("l_id") < F.col("r_id"))
        .collect()
    }
    assert {(1, 2), (1, 3), (1, 4)} <= pairs  # sub, del, ins vs "kitten"
    assert (2, 4) not in pairs  # distance 2


def test_no_cross_product_in_plan(spark, words):
    plan = (
        fuzzy_join(words, words, "w", max_dist=1, left_id="id", right_id="id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_deletion_keys_count(spark):
    row = (
        spark.range(1)
        .select(F.size(deletion_keys(F.lit("abcde"), 1)).alias("n1"),
                F.size(deletion_keys(F.lit("abcde"), 2)).alias("n2"))
        .first()
    )
    assert row.n1 == 6  # self + 5 deletions, all distinct
    # k=2: self + 5 + C(5,2) distinct double-deletes = 16
    assert row.n2 == 16
