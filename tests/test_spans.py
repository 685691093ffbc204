"""Segment dedup + duplicate-span stats on corpora with known structure."""

import pyspark.sql.functions as F
import pytest

from relationalize_spark.operators.spans import (
    duplicate_span_stats,
    remove_duplicate_spans,
    segment_dedup,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # doc 1: two distinct paragraphs; doc 2 repeats doc 1's first
    # paragraph then adds its own; doc 3 is entirely doc 1's content.
    p1 = "alpha beta gamma delta"
    p2 = "epsilon zeta eta theta"
    p3 = "iota kappa lambda mu"
    rows = [
        (1, f"{p1}\n\n{p2}"),
        (2, f"{p1}\n\n{p3}"),
        (3, f"{p2}\n\n{p1}"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string"), (p1, p2, p3)


def test_segment_dedup_delimiter_mode(spark, corpus):
    df, (p1, p2, p3) = corpus
    out = {r.doc_id: r for r in segment_dedup(
        df, "doc_id", "text", delimiter=r"\n\n"
    ).collect()}
    # First occurrence of p1/p2 is doc 1; doc 2 keeps only p3; doc 3
    # keeps nothing.
    assert out[1].n_segments == 2 and out[1].n_kept == 2
    assert out[1].cleaned_text == f"{p1} {p2}"
    assert out[2].n_kept == 1 and out[2].cleaned_text == p3
    assert out[3].n_kept == 0 and out[3].cleaned_text == ""


def test_segment_dedup_word_windows(spark):
    # 10-word windows: doc 20 repeats doc 10's first window exactly.
    w = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [(10, w + " tail words here"), (20, w)], "doc_id int, text string"
    )
    out = {r.doc_id: r for r in segment_dedup(df).collect()}
    assert out[10].n_segments == 2 and out[10].n_kept == 2
    assert out[20].n_segments == 1 and out[20].n_kept == 0


def test_empty_and_whitespace_docs_yield_zero_segments(spark):
    """The documented contract: empty docs yield zero segments.
    Pre-fix, split('', '\\s+') produced [''] and every empty or
    whitespace-only doc shared one empty segment (so all but the
    first were 'deduped'); leading whitespace likewise injected an
    '' token that shifted word windows (ADVICE r3)."""
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "\n\t "), (4, "  alpha beta")],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in segment_dedup(df).collect()}
    for d in (1, 2, 3):
        assert out[d].n_segments == 0 and out[d].n_kept == 0
        assert out[d].cleaned_text == ""
    # leading whitespace does not create an empty leading token
    assert out[4].n_segments == 1 and out[4].cleaned_text == "alpha beta"
    # span stats drop docs with zero n-gram positions (both engines:
    # the oracle's unnest(range(...)) is empty too) — only doc 4 has
    # tokens, and its leading whitespace must not shift the grams
    stats = {r.doc_id: r for r in duplicate_span_stats(
        df, "doc_id", "text", n=2
    ).collect()}
    assert set(stats) == {4} and stats[4].n_positions == 1


def test_segment_dedup_deterministic_under_repartition(spark, corpus):
    df, _ = corpus
    a = sorted(segment_dedup(df, delimiter=r"\n\n").collect())
    b = sorted(segment_dedup(df.repartition(7), delimiter=r"\n\n").collect())
    assert a == b


def test_duplicate_span_stats_known_runs(spark):
    # Shared prefix of 6 words => 3-gram positions 1..4 duplicated in
    # both docs; doc B's tail is unique.
    shared = "a b c d e f"
    df = spark.createDataFrame(
        [(1, shared), (2, shared + " x y z")], "doc_id int, text string"
    )
    out = {r.doc_id: r for r in duplicate_span_stats(df, n=3).collect()}
    assert out[1].n_positions == 4 and out[1].dup_positions == 4
    assert out[1].max_dup_run == 4 and out[1].dup_frac == 1.0
    assert out[2].n_positions == 7 and out[2].dup_positions == 4
    assert out[2].max_dup_run == 4


def test_duplicate_span_stats_no_dups(spark):
    df = spark.createDataFrame(
        [(1, "p q r s t"), (2, "v w x y z")], "doc_id int, text string"
    )
    out = duplicate_span_stats(df, n=3).collect()
    assert all(r.dup_positions == 0 and r.max_dup_run == 0 for r in out)


def test_duplicate_span_stats_split_runs(spark):
    # duplicated - unique - duplicated: two islands, max run counts
    # the longer one, not the sum.
    df = spark.createDataFrame(
        [
            (1, "a b c UNIQ1 d e f g"),
            (2, "a b c UNIQ2 d e f g"),
        ],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in duplicate_span_stats(df, n=3).collect()}
    # positions: (a b c) dup, (b c U) uniq, (c U d) uniq, (U d e) uniq,
    # (d e f) dup, (e f g) dup -> islands of 1 and 2.
    assert out[1].dup_positions == 3 and out[1].max_dup_run == 2


def test_short_documents_yield_no_positions(spark):
    df = spark.createDataFrame([(1, "only two")], "doc_id int, text string")
    assert segment_dedup(df).count() == 1  # one short segment, kept
    assert duplicate_span_stats(df, n=3).count() == 0  # no 3-gram fits


def test_remove_duplicate_spans_known_corpus(spark):
    # Shared 6-word prefix (3-gram run positions 0..3 -> covers words
    # 0..5, span 6 >= min_span 6): excised from BOTH docs (Lee et al.
    # remove every copy of a duplicated substring, unlike keep-first
    # segment_dedup); unique tails survive.
    shared = "a b c d e f"
    df = spark.createDataFrame(
        [(1, shared + " p q"), (2, shared + " x y z")], "doc_id int, text string"
    )
    out = {r.doc_id: r for r in remove_duplicate_spans(df, n=3, min_span=6).collect()}
    assert out[1].n_words == 8 and out[1].n_removed == 6
    assert out[1].cleaned_text == "p q"
    assert out[2].n_words == 9 and out[2].n_removed == 6
    assert out[2].cleaned_text == "x y z"


def test_remove_duplicate_spans_min_span_gate(spark):
    # Shared 3-gram only (coverage 3 words) < min_span 6: kept.
    df = spark.createDataFrame(
        [(1, "a b c p q r s"), (2, "a b c x y z w")], "doc_id int, text string"
    )
    out = remove_duplicate_spans(df, n=3, min_span=6).collect()
    assert all(r.n_removed == 0 for r in out)
    # With min_span = n the same corpus loses the shared gram's words.
    out2 = {r.doc_id: r for r in remove_duplicate_spans(df, n=3, min_span=3).collect()}
    assert out2[1].n_removed == 3 and out2[1].cleaned_text == "p q r s"


def test_remove_duplicate_spans_short_and_empty_docs_pass_through(spark):
    df = spark.createDataFrame(
        [(1, "only two"), (2, ""), (3, "   "), (4, "a b c d e f"),
         (5, "a b c d e f tail")],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in remove_duplicate_spans(df, n=3, min_span=6).collect()}
    assert len(out) == 5  # one row per document, always
    assert out[1].n_words == 2 and out[1].n_removed == 0
    assert out[1].cleaned_text == "only two"
    assert out[2].n_words == 0 and out[2].cleaned_text == ""
    assert out[3].n_words == 0 and out[3].cleaned_text == ""
    # docs 4/5 share the 6-word prefix -> both excised.
    assert out[4].cleaned_text == "" and out[4].n_removed == 6
    assert out[5].cleaned_text == "tail"


def test_remove_duplicate_spans_overlapping_run_coverage(spark):
    # dup - unique - dup with n=3: run [0,0] covers words 0..2, run
    # [4,5] covers 4..7; the unique word 3 survives. Coverage distinct
    # is exercised when spans touch.
    df = spark.createDataFrame(
        [
            (1, "a b c UNIQ1 d e f g"),
            (2, "a b c UNIQ2 d e f g"),
        ],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in remove_duplicate_spans(df, n=3, min_span=3).collect()}
    assert out[1].n_removed == 7 and out[1].cleaned_text == "UNIQ1"
    assert out[2].cleaned_text == "UNIQ2"


def test_remove_duplicate_spans_deterministic_under_repartition(spark):
    rows = [(i, f"common run of words {i % 3} plus tail t{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    a = sorted(map(tuple, remove_duplicate_spans(df, n=3).collect()))
    b = sorted(map(tuple, remove_duplicate_spans(df.repartition(13), n=3).collect()))
    assert a == b


def _ref_remove_spans(docs, n, min_span, min_docs=2):
    """Independent pure-Python reference of remove_duplicate_spans
    (dict/scan implementation — no shared code with the Spark plan)."""
    toks = {i: [w for w in t.split() if w] for i, t in docs.items()}
    gram_docs = {}
    for i, ws in toks.items():
        for k in range(len(ws) - n + 1):
            gram_docs.setdefault(tuple(ws[k : k + n]), set()).add(i)
    out = {}
    for i, ws in toks.items():
        dup = [
            k
            for k in range(len(ws) - n + 1)
            if len(gram_docs[tuple(ws[k : k + n])]) >= min_docs
        ]
        covered = set()
        run = []
        for k in dup + [None]:
            if run and (k is None or k != run[-1] + 1):
                a, b = run[0], run[-1]
                if b - a + n >= min_span:
                    covered.update(range(a, b + n))
                run = []
            if k is not None:
                run.append(k)
        keep = [w for j, w in enumerate(ws) if j not in covered]
        out[i] = (len(ws), len(ws) - len(keep), " ".join(keep))
    return out


def test_remove_duplicate_spans_randomized_differential(spark):
    # Random corpora with heavy cross-doc overlap (small vocab, short
    # docs) diffed against the independent reference implementation.
    import random

    for seed in (1, 7, 20260815):
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(8)]
        docs = {
            i: " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 14)))
            for i in range(25)
        }
        n, min_span = rng.choice([(2, 4), (3, 3), (3, 6)])
        df = spark.createDataFrame(
            list(docs.items()), "doc_id int, text string"
        )
        got = {
            r.doc_id: (r.n_words, r.n_removed, r.cleaned_text)
            for r in remove_duplicate_spans(df, n=n, min_span=min_span).collect()
        }
        assert got == _ref_remove_spans(docs, n, min_span), (seed, n, min_span)


def test_char_entropy_known_values(spark):
    from relationalize_spark.operators.text import char_entropy

    df = spark.createDataFrame(
        [(1, "aabb"), (2, "abcd"), (3, "aaaa"), (4, ""), (5, "aaa"), (6, "aaaaa")],
        "id int, t string",
    )
    out = {r.id: r.h for r in df.select("id", char_entropy("t").alias("h")).collect()}
    assert out[1] == 1.0
    assert out[2] == 2.0
    assert out[3] == 0.0
    assert out[4] == 0.0
    # non-power-of-two single-char docs: the two floors can land the
    # numerator a quantum negative — must clamp to exactly 0, never
    # emit a negative Shannon entropy (r10 review)
    assert out[5] == 0.0
    assert out[6] == 0.0


def test_char_entropy_plan_is_shuffle_free(spark):
    from relationalize_spark.operators.text import char_entropy

    df = spark.createDataFrame([(1, "abc")], "id int, t string")
    plan = df.select(char_entropy("t")) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_release_span_caches_reclaims_residuals(spark, corpus):
    # ADVICE r8: each call leaves exactly one recorded residual cache
    # (covered set / stats frame) and release_span_caches() reclaims
    # them all without breaking a still-lazy or already-collected
    # result.
    from relationalize_spark.operators import spans
    from relationalize_spark.plans import caches

    caches.release_caches()  # start clean (session-wide)
    df, _ = corpus
    stats = duplicate_span_stats(df, n=2)
    cleaned = remove_duplicate_spans(df, n=2, min_span=2)
    span_owned = [e for e in caches.LIVE_CACHES if e[0] == "spans"]
    assert len(span_owned) == 2
    # owner scoping: a foreign residual survives the span release
    foreign = caches.register_cache(df.limit(1).persist(), owner="other")
    before = {r.doc_id: r.max_dup_run for r in stats.collect()}
    released = spans.release_span_caches()
    assert released == 2
    assert [e[0] for e in caches.LIVE_CACHES] == ["other"]
    assert foreign.storageLevel.useMemory  # untouched by span release
    caches.release_caches()
    # post-release consumption recomputes through lineage, same values
    after = {r.doc_id: r.max_dup_run for r in stats.collect()}
    assert after == before
    assert cleaned.count() == df.count()
