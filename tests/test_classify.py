"""Hashed-feature logistic regression: learned signal, replayable
determinism, and edge cases (operators/classify.py)."""

import pyspark.sql.functions as F
import pytest

from relationalize_spark.operators.classify import (
    INTERCEPT,
    hash_bucket,
    hashed_features,
    hashed_logreg,
    logreg_fit,
    score_documents,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # Positive docs all mention "signal"; negatives never do. Filler
    # vocabulary is shared so the model has to isolate the signal
    # token's bucket, not memorize doc length.
    rows = []
    for i in range(30):
        filler = f"alpha beta gamma w{i % 5}"
        if i % 2 == 0:
            rows.append((i, f"{filler} signal extra"))
        else:
            rows.append((i, f"{filler} noise extra"))
    rows.append((100, ""))  # zero-token doc: excluded from the fit
    rows.append((101, "   "))
    return spark.createDataFrame(rows, "doc_id int, text string")


def _label():
    return F.array_contains(F.split(F.col("text"), r"\s+"), "signal")


def test_learns_signal_bucket(spark, corpus):
    dim = 16
    w = {
        r.feature: r.weight
        for r in hashed_logreg(corpus, _label(), dim=dim, lr=2.0, iters=3).collect()
    }
    assert len(w) == dim + 1 and INTERCEPT in w
    j_sig = spark.range(1).select(
        hash_bucket(F.lit("signal"), dim).alias("j")
    ).collect()[0].j
    j_noise = spark.range(1).select(
        hash_bucket(F.lit("noise"), dim).alias("j")
    ).collect()[0].j
    assert 0 <= j_sig < dim
    # The signal token's bucket gets the largest positive weight; the
    # anti-correlated token's bucket goes negative.
    assert w[j_sig] > 0
    assert w[j_sig] == max(v for k, v in w.items() if k != INTERCEPT)
    assert w[j_noise] < 0


def test_scores_separate_classes(spark, corpus):
    feats_w = hashed_logreg(corpus, _label(), dim=16, lr=2.0, iters=3)
    w = {r.feature: r.weight for r in feats_w.collect()}
    scored = score_documents(corpus, w, dim=16)
    rows = (
        corpus.select("doc_id", _label().alias("y"))
        .join(scored, "doc_id")
        .collect()
    )
    pos = [r.score for r in rows if r.y]
    neg = [r.score for r in rows if not r.y]
    assert min(pos) > max(neg)


def test_empty_docs_excluded_from_features(spark, corpus):
    feats = hashed_features(corpus, _label(), dim=16)
    ids = {r.id for r in feats.select("id").collect()}
    assert 100 not in ids and 101 not in ids
    # every surviving row carries the intercept pseudo-feature
    bad = feats.where(
        ~F.exists("feats", lambda f: f.j == F.lit(INTERCEPT))
    ).count()
    assert bad == 0


def test_fit_deterministic_under_repartition(spark, corpus):
    feats_a = hashed_features(corpus, _label(), dim=16).persist()
    feats_b = hashed_features(
        corpus.repartition(7), _label(), dim=16
    ).repartition(11).persist()
    try:
        wa = logreg_fit(feats_a, dim=16, lr=2.0, iters=3)
        wb = logreg_fit(feats_b, dim=16, lr=2.0, iters=3)
    finally:
        feats_a.unpersist()
        feats_b.unpersist()
    # fixed-point lattice sums: bit-identical weights, any partitioning
    assert wa == wb


def test_all_empty_corpus_raises(spark):
    df = spark.createDataFrame([(1, ""), (2, " ")], "doc_id int, text string")
    feats = hashed_features(df, _label(), dim=8)
    with pytest.raises(ValueError, match="no non-empty documents"):
        logreg_fit(feats, dim=8)


def test_stateless_score_matches_feature_path_closely(spark, corpus):
    """The streaming-safe per-token lattice and the batch per-feature
    lattice approximate the SAME dot product; their floors differ by
    at most ~(#terms)·1e-12, so scores agree to well under 1e-6 and
    the class separation is preserved."""
    from relationalize_spark.operators.classify import stateless_score_col

    w = {
        r.feature: r.weight
        for r in hashed_logreg(corpus, _label(), dim=16, lr=2.0, iters=3).collect()
    }
    batch = {
        r.doc_id: r.score
        for r in score_documents(corpus, w, dim=16)
        .withColumnRenamed("id", "doc_id")
        .collect()
    }
    fold = {
        r.doc_id: r.s
        for r in corpus.select(
            "doc_id", stateless_score_col(w, dim=16).alias("s")
        ).collect()
    }
    # zero-token docs: NULL from the fold, absent from the batch path
    assert fold[100] is None and fold[101] is None
    for doc_id, s in batch.items():
        assert abs(fold[doc_id] - s) < 1e-6, doc_id


def test_stateless_quanta_deterministic_and_integer(spark, corpus):
    from relationalize_spark.operators.classify import stateless_score_col

    w = {
        r.feature: r.weight
        for r in hashed_logreg(corpus, _label(), dim=16, lr=2.0, iters=3).collect()
    }
    col = stateless_score_col(w, dim=16, as_quanta=True)
    a = corpus.select("doc_id", col.alias("q")).collect()
    b = corpus.repartition(7).select("doc_id", col.alias("q")).collect()
    assert {r.doc_id: r.q for r in a} == {r.doc_id: r.q for r in b}
    vals = [r.q for r in a if r.q is not None]
    assert vals and all(isinstance(v, int) and 0 <= v <= 10**9 for v in vals)


def test_hash_bucket_range_and_stability(spark):
    toks = spark.createDataFrame(
        [(f"tok{i}",) for i in range(200)], "t string"
    )
    got = toks.select(hash_bucket(F.col("t"), 32).alias("j")).collect()
    assert all(0 <= r.j < 32 for r in got)
    again = toks.select(hash_bucket(F.col("t"), 32).alias("j")).collect()
    assert [r.j for r in got] == [r.j for r in again]


def test_weights_dim_mismatch_raises(spark, corpus):
    # ADVICE r8: a weights/dim mismatch used to NULL every score via
    # missing element_at buckets — indistinguishable from the
    # empty-document NULL. Both scoring paths must fail fast instead.
    from relationalize_spark.operators.classify import stateless_score_col

    w16 = {j: 0.1 for j in range(16)}
    w16[INTERCEPT] = -0.5
    with pytest.raises(ValueError, match="missing buckets"):
        stateless_score_col(w16, dim=32)
    with pytest.raises(ValueError, match="missing buckets"):
        score_documents(corpus, w16, dim=32)
    no_intercept = {j: 0.1 for j in range(16)}
    with pytest.raises(ValueError, match="missing buckets"):
        stateless_score_col(no_intercept, dim=16)
    # the matching dim still builds a column without touching data
    assert stateless_score_col(w16, dim=16) is not None
