"""Global plan-hygiene sweep over the whole query registry: no query
may plan a CartesianProduct (unbounded pair space) or a row-at-a-time
Python UDF (BatchEvalPython — the non-Arrow slow path). Arrow-batched
Python (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas) is the
sanctioned boundary and broadcast nested-loop joins against 1-row /
bounded broadcast sides are legitimate, so neither is flagged."""

import pytest

from relationalize_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"

# streaming queries execute their (bounded) stream during construction;
# plan inspection would re-run them for no signal
_SKIP = {
    "q54_streaming_windowed_counts",
    "q55_streaming_sessionize",
    "q74_stream_static_join",
    "q75_stream_stream_join",
    "q83_streaming_dedup",
}


@pytest.mark.parametrize("name", [n for n in REGISTRY if n not in _SKIP])
def test_no_cartesian_or_row_python(spark, name):
    df = REGISTRY[name][0](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    assert "BatchEvalPython" not in plan, (
        f"{name} plans a row-at-a-time Python UDF"
    )


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_corpus_derived_filters_never_broadcast(spark):
    """The max_df shingle filters join back a list DERIVED from the
    corpus; its size scales with the input, so broadcast promotion
    (fine at test SF, driver-OOM at 100x — observed at 500k docs /
    3.7M distinct shingles) must stay out of the plan regardless of
    estimated size. The merge hint shares the shingle exchange the
    surrounding joins need anyway."""
    from relationalize_spark.operators.dedup import jaccard_pairs, ngram_overlap_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    jp = _plan(jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5, max_df=50))
    ov = _plan(
        ngram_overlap_pairs(
            docs, docs.limit(20), "doc_id", "text", n=3, min_overlap=0.5, max_df=50
        )
    )
    for name, plan in (("jaccard_pairs", jp), ("ngram_overlap_pairs", ov)):
        semi = [ln for ln in plan.splitlines() if "LeftSemi" in ln]
        assert semi, f"{name}: expected a semi join in the plan"
        assert all("Broadcast" not in ln for ln in semi), (
            f"{name}: corpus-derived filter list is broadcast:\n" + "\n".join(semi)
        )


def test_aggregate_derived_sides_never_broadcast(spark):
    """spans/nest join sides are aggregates PROPORTIONAL to the corpus
    (per-gram df table, per-doc runs, per-cell folded arrays); the
    static estimator happily broadcast-promotes them at test SF, which
    is an OOM at scale (same class as the shingle-filter defect, see
    BASELINE.md). Merge hints must keep every join in these plans
    broadcast-free."""
    import pyspark.sql.functions as F

    from relationalize_spark.operators.nest import unrelationalize
    from relationalize_spark.operators.relationalize import relationalize
    from relationalize_spark.operators.spans import duplicate_span_stats

    from relationalize_spark.operators.dedup import tfidf_pairs
    from relationalize_spark.operators.timeseries import gapfill_interpolate

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    span_plan = _plan(duplicate_span_stats(docs, "doc_id", "text", n=3))

    nested = docs.select(
        "doc_id", F.split("text", " ").alias("words")
    )
    tables = relationalize(nested, "d", key_cols=["doc_id"])
    nest_plan = _plan(unrelationalize(tables, "d"))

    # r9 additions, same defect class caught by this round's audit:
    # the APSS posting self-join and the gap-fill grid join both have
    # corpus-proportional sides the static estimator promoted at
    # test SF (the 1-row totals cross join is a BroadcastNestedLoop,
    # deliberately out of scope here).
    tfidf_plan = _plan(tfidf_pairs(docs, threshold=0.8, max_df=1000))
    tfidf_prefix_plan = _plan(
        tfidf_pairs(docs, threshold=0.8, max_df=1000, prefix_filter=True)
    )
    ev = spark.read.parquet(f"{SF}/events.parquet").where(
        F.col("event_type") == "purchase"
    )
    gap_plan = _plan(
        gapfill_interpolate(ev, "user_id", "ts", "value", step_s=21600)
    )

    # r11: the banded Hamming self-join's band-entries table is
    # corpus-derived too (the q152 audit caught the un-hinted plan
    # broadcast-promoting the build side at test SF); the
    # video/audio dup compositions inherit the same join and must
    # stay clean through their wrapping (plus Arrow-only Python)
    from relationalize_spark.operators.dedup import hamming_dup_pairs
    from relationalize_spark.operators.multimodal import (
        audio_dup_pairs,
        video_dup_pairs,
    )

    sigs = docs.select("doc_id", F.xxhash64("text").alias("sig"))
    hamming_plan = _plan(
        hamming_dup_pairs(sigs, id_col="doc_id", sig_col="sig")
    )
    media = docs.select(
        "doc_id", F.encode("text", "UTF-8").alias("content")
    )
    video_plan = _plan(video_dup_pairs(media, n_frames=2))
    audio_plan = _plan(audio_dup_pairs(media))
    assert "BatchEvalPython" not in video_plan + audio_plan

    for name, plan in (("duplicate_span_stats", span_plan),
                       ("unrelationalize", nest_plan),
                       ("tfidf_pairs", tfidf_plan),
                       ("tfidf_pairs_prefix", tfidf_prefix_plan),
                       ("hamming_dup_pairs", hamming_plan),
                       ("video_dup_pairs", video_plan),
                       ("audio_dup_pairs", audio_plan),
                       ("gapfill_interpolate", gap_plan)):
        assert "BroadcastHashJoin" not in plan, (
            f"{name}: aggregate-derived join side is broadcast"
        )


def test_semdedup_self_join_ships_no_vectors(spark):
    """semdedup's cluster-keyed candidate self-join must shuffle only
    (cluster, id) — at 100 TB a 768-dim double vector is ~6 KB/row,
    and shipping it through BOTH aliases of the hot self-join exchange
    was the repo's last wide-shuffle defect (VERDICT r3). Vectors may
    only cross the wire in the post-candidate id-keyed re-attach
    joins. Parse the formatted plan: every Exchange partitioned on
    the cluster key must have a vector-free input."""
    import re

    from relationalize_spark.operators.dedup import semdedup_pairs

    vecs = spark.read.parquet(f"{SF}/embeddings.parquet")
    df = semdedup_pairs(vecs, "vec_id", "embedding", k=4, threshold=0.5)
    fmt = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # formatted node details: "(n) Exchange\nInput [k]: [...]". The
    # candidate join may plan as broadcast (small SF) or sort-merge
    # (scale), so the invariant is strategy-independent: any exchange
    # whose payload includes the cluster key is on the candidate path
    # and must be vector-free. (The id-keyed re-attach exchanges carry
    # v but never cluster.)
    blocks = re.split(r"\n\(\d+\) ", fmt)
    cluster_exchanges = [
        b
        for b in blocks
        if b.split("\n", 1)[0].strip() in ("Exchange", "BroadcastExchange")
        and re.search(r"Input.*cluster#", b)
    ]
    assert cluster_exchanges, "expected cluster-carrying exchanges in the plan"
    for b in cluster_exchanges:
        inp = next(ln for ln in b.splitlines() if ln.startswith("Input"))
        assert not re.search(r"\bv#|embedding#", inp), (
            "cluster-keyed exchange ships vectors:\n" + b
        )
