"""Segment-level dedup and duplicate-span statistics.

Two corpus-duplication signals finer than whole-document dedup
(``operators/dedup.py``), modeled on published training-data
pipelines:

- :func:`segment_dedup` — CCNet-style removal of repeated
  paragraphs/segments across the corpus, keeping the first
  occurrence (Wenzek et al., "CCNet", 2019 — paragraph-hash dedup).
- :func:`duplicate_span_stats` — per-document duplicated-substring
  exposure at n-gram granularity (the signal behind Lee et al.,
  "Deduplicating Training Data Makes Language Models Better", 2021,
  approximated at word-shingle resolution instead of suffix-array
  byte resolution).
- :func:`remove_duplicate_spans` — the excision counterpart (Lee et
  al.'s actual dedup step, word-resolution): maximal duplicated runs
  spanning at least ``min_span`` words are cut out of every document
  and the survivors are re-joined in order.

Both are pure Catalyst plans: explode → one hash-keyed aggregation →
join back → per-doc fold. No Python runs per row.

Scale shape: shuffle keys are 64-bit ``xxhash64`` digests of the
segment/gram — never the text — so a position row is three longs
wide; the first formulation shuffled 32-char md5 strings and built
them with ``slice``+``array_join`` per position, which blew the heap
at the 100x spot-check (measured; see BASELINE.md). Grams are built
with ``element_at`` chains (flat expressions, no per-position array
allocation). Two token sequences collide only on a 64-bit hash
collision (~N^2/2^65 pairs — irrelevant below ~10^9 distinct grams;
pass ``digest="md5"`` to trade key width for a 128-bit space). The
correctness oracles group by the raw gram text — the semantic
contract the digest approximates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Token separator inside hashed grams; ASCII unit separator so real
#: whitespace-split tokens can never straddle a boundary ambiguously.
_SEP = "\x1f"

#: Caches the returned (lazy) frames still depend on — one entry per
#: operator call that must leave a persisted frame alive (e.g.
#: :func:`remove_duplicate_spans`' covered-word set, bounded by the
#: words actually removed). Long-lived sessions that run these
#: operators repeatedly should call :func:`release_span_caches`
#: after materializing (writing/collecting) the returned frames, or
#: the per-call residuals compound. Entries live in the shared
#: owner-keyed registry (``plans/caches.py``) under the "spans" tag.
from ..plans.caches import register_cache as _register_cache
from ..plans.caches import release_caches


def release_span_caches() -> int:
    """Unpersist only the residual caches SPAN operators registered
    (owner-scoped — it no longer also releases other modules'
    residuals, r9 ADVICE); returns how many. For a session-wide
    sweep use :func:`relationalize_spark.plans.caches.release_caches`
    directly."""
    return release_caches(owner="spans")


def _digest(c: Column, digest: str) -> Column:
    if digest == "xxhash64":
        return F.xxhash64(c)
    if digest == "md5":
        return F.md5(c)
    raise ValueError(f"digest must be 'xxhash64' or 'md5', got {digest!r}")


def _tokens(text: Column) -> Column:
    """Whitespace tokens with empties removed: ``split('', WS)``
    yields ``['']`` (size 1), so without the filter an empty or
    whitespace-only document produced one empty segment that every
    such document shared — and segment_dedup then stripped it from
    all but the first (ADVICE r3). Leading/trailing whitespace
    likewise no longer injects '' tokens. The q104/q105 oracles
    mirror this with DuckDB ``list_filter``. The split class is the
    shared explicit ``text.WS`` (Java ``\\s`` and RE2 ``\\s``
    disagree on U+000B — r10)."""
    from .text import WS

    return F.filter(F.split(text, WS), lambda x: x != "")


def _segments(toks: Column, seg_words: int) -> Column:
    """Split a token array into consecutive ``seg_words``-word
    segments (last one may be short). Empty docs yield zero segments.

    Linear-cost formulation: the old ``transform(sequence(...),
    i -> array_join(slice(toks, ...)))`` captured ``toks`` inside the
    per-segment lambda, and Catalyst re-evaluates captured
    expressions per element (no CSE inside higher-order functions) —
    quadratic in document length. Instead, decompose the token array
    into ``seg_words`` strided parts (``part_k`` = tokens at
    positions k, k+w, k+2w, ... via one indexed ``filter`` each —
    a filter's ARGUMENT is evaluated once) and zip_with-fold the
    parts with concat_ws: segment j is exactly
    ``part_0[j] .. part_{w-1}[j]``. zip_with null-pads the shorter
    side and concat_ws skips nulls, which is precisely the partial
    tail segment. ``toks`` evaluates ``w + 1`` times per row and no
    wasted intermediate strings are built (the first linear attempt
    built every 1-shifted window and kept one in ``w`` — 10x excess
    concatenation)."""
    w = seg_words

    def stride(k: int):
        # separate factory: a default-arg lambda would have arity 3
        # and PySpark maps lambda arity onto the HOF's parameters
        return lambda _x, i: i % w == k

    parts = [F.filter(toks, stride(k)) for k in range(w)]
    segs = parts[0]
    for p in parts[1:]:
        segs = F.zip_with(segs, p, lambda a, b: F.concat_ws(" ", a, b))
    return segs


def _gram_keys(toks: Column, n: int, digest: str) -> Column:
    """Digest of each word n-gram position. Same linear construction
    as :func:`_segments`: n shifted slices zip_with-folded by
    concat_ws, digested in one final map — the prior
    ``transform(sequence, i -> element_at(toks, i+j)...)`` captured
    ``toks`` per position (no CSE inside HOF lambdas), re-splitting
    the document once per gram."""
    n_pos = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    acc = F.slice(toks, 1, n_pos)
    for k in range(1, n):
        acc = F.zip_with(
            acc,
            F.slice(toks, 1 + k, n_pos),
            lambda a, b: F.concat_ws(_SEP, a, b),
        )
    keys = F.transform(acc, lambda g: _digest(g, digest))
    empty = F.array().cast(
        "array<bigint>" if digest == "xxhash64" else "array<string>"
    )
    return F.when(n_pos >= 1, keys).otherwise(empty)


def segment_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    seg_words: int = 10,
    delimiter: str | None = None,
    digest: str = "xxhash64",
) -> DataFrame:
    """Remove corpus-wide repeated segments, keeping first occurrence.

    Segmentation is fixed ``seg_words``-word windows by default, or
    ``delimiter``-split (e.g. ``"\\n\\n"`` for real paragraphs) when
    given. "First occurrence" is the globally smallest
    ``(id, segment_index)`` — deterministic under any partitioning.

    Returns one row per document — including documents with zero
    segments (empty/whitespace-only text), which come back as
    ``n_segments = n_kept = 0, cleaned_text = ''``:
    ``id, n_segments, n_kept, cleaned_text`` (kept segments rejoined
    in order).
    """
    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t__"))
    if delimiter is not None:
        segs = F.split(F.col("__t__"), delimiter)
    else:
        segs = _segments(_tokens(F.col("__t__")), seg_words)
    # posexplode_outer: a zero-segment doc keeps one NULL row so it
    # survives to the output (one row per document, contract above).
    exploded = base.select("id", F.posexplode_outer(segs).alias("idx", "seg"))
    # One shuffle on the segment digest; first copy in (id, idx)
    # order survives. The digest — not the segment text — is the
    # shuffle key, so key width stays bounded at scale.
    # NULL-seg placeholder rows get a per-id key instead of the shared
    # digest-of-NULL, so a corpus with many empty docs doesn't funnel
    # them into one window partition (their __keep__ is forced false
    # below, so the key value itself is irrelevant).
    part_key = F.when(
        F.col("seg").isNotNull(), _digest(F.col("seg"), digest)
    ).otherwise(_digest(F.col("id").cast("string"), digest))
    w = Window.partitionBy(part_key).orderBy("id", "idx")
    marked = exploded.withColumn(
        "__keep__", (F.row_number().over(w) == 1) & F.col("seg").isNotNull()
    )
    return (
        marked.groupBy("id")
        .agg(
            F.count("seg").alias("n_segments"),
            F.sum(F.col("__keep__").cast("int")).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__keep__"),
                                F.struct(F.col("idx").alias("i"), F.col("seg").alias("s")),
                            )
                        )
                    ),
                    lambda x: x.s,
                ),
                " ",
            ).alias("cleaned_text"),
        )
        .withColumnRenamed("id", id_col)
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 5,
    min_span: int | None = None,
    min_docs: int = 2,
    digest: str = "xxhash64",
) -> DataFrame:
    """Excise duplicated spans from every document (Lee et al. 2021's
    dedup step at word resolution): a word position is *covered* when
    it lies inside a maximal run of cross-document-duplicated
    ``n``-gram positions whose word coverage is at least ``min_span``
    words (default ``n`` — every duplicated gram's span); covered
    words are removed, survivors re-joined in order.

    Returns one row per input document — including empty and
    shorter-than-``n`` documents, which pass through untouched:
    ``id, n_words, n_removed, cleaned_text``.

    Plan: the :func:`duplicate_span_stats` inverted-index shape
    (position explode → per-gram distinct-doc count → join back, all
    keyed by the 64-bit gram digest) up to the duplicated positions;
    then islands → covered intervals ``[a, b + n - 1]`` → interval
    explode to covered word ids (bounded by the words actually
    removed, not by gram count) → one left join against the word
    positions → per-doc ordered fold. Shuffle keys are ``(id, long)``
    pairs throughout; document text rides exactly one shuffle (the
    final fold — same bound as :func:`segment_dedup`).
    """
    if min_span is None:
        min_span = n
    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t__"))
    toks = _tokens(F.col("__t__"))
    pos = base.select(
        "id", F.posexplode(_gram_keys(toks, n, digest)).alias("idx", "g")
    ).persist()
    # Corpus-proportional, so merge-hinted — never broadcast (the
    # duplicate_span_stats invariant).
    dup_grams = (
        pos.groupBy("g")
        .agg(F.count_distinct("id").alias("__docs__"))
        .where(F.col("__docs__") >= min_docs)
        .select("g")
        .hint("merge")
    )
    dup = pos.join(dup_grams, "g").select("id", "idx")
    w = Window.partitionBy("id").orderBy("idx")
    runs = (
        dup.withColumn("__grp__", F.col("idx") - F.row_number().over(w))
        .groupBy("id", "__grp__")
        .agg(F.min("idx").alias("a"), F.max("idx").alias("b"))
        # run [a, b] covers words [a, b + n - 1]: b - a + n words.
        .where(F.col("b") - F.col("a") + F.lit(n) >= min_span)
    )
    covered = (
        runs.select(
            "id", F.explode(F.sequence("a", F.col("b") + F.lit(n - 1))).alias("widx")
        )
        .distinct()  # adjacent maximal runs can overlap in coverage
        .withColumn("__rm__", F.lit(True))
        .persist()
    )
    # Materialize the (much smaller, removed-words-proportional)
    # covered set now so the corpus-proportional position cache can be
    # released immediately instead of living for the session (the
    # operator is eager to this extent, like hashed_logreg). Block
    # loss just recomputes through the scan — cache semantics, safe
    # on clusters with executor churn (unlike localCheckpoint).
    # `covered` itself must stay cached until the RETURNED frame is
    # consumed (it feeds the final join); it is registered under the
    # "spans" owner so repeated calls in one session can reclaim the
    # residuals via release_span_caches() (ADVICE r8).
    covered.count()
    pos.unpersist()
    _register_cache(covered, owner="spans")
    words = base.select("id", F.posexplode_outer(toks).alias("widx", "wrd"))
    kept = words.join(covered.hint("merge"), ["id", "widx"], "left")
    return (
        kept.groupBy("id")
        .agg(
            F.count("wrd").alias("n_words"),
            F.sum(F.coalesce(F.col("__rm__").cast("int"), F.lit(0))).alias(
                "n_removed"
            ),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("wrd").isNotNull() & F.col("__rm__").isNull(),
                                F.struct(
                                    F.col("widx").alias("i"), F.col("wrd").alias("s")
                                ),
                            )
                        )
                    ),
                    lambda x: x.s,
                ),
                " ",
            ).alias("cleaned_text"),
        )
        .withColumnRenamed("id", id_col)
    )


def duplicate_span_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 5,
    digest: str = "xxhash64",
) -> DataFrame:
    """Per-document duplicated-substring exposure at word n-gram
    resolution.

    A position ``i`` in a document is *duplicated* when its word
    ``n``-gram also occurs in at least one other document. Returns
    one row per document with at least one n-gram position:
    ``id, n_positions, dup_positions, dup_frac, max_dup_run``
    (longest consecutive duplicated stretch, in positions; 0 when
    nothing is duplicated).

    Plan: explode positions (T rows per doc, three longs wide) →
    per-gram distinct document count → join the bounded
    ``(digest, df)`` table back → ONE windowed island labeling → a
    single two-stage aggregation that yields counts, dup counts, and
    the longest island together (r9: the old shape computed ``runs``
    and ``per_doc`` as two separately-persisted aggregates and joined
    them, leaving two caches pinned per call — ADVICE r8). The
    position table feeds both the gram aggregation and the join, so
    it is persisted, materialized through the final (small, per-doc
    numeric) result, and released before returning; only the returned
    stats frame itself stays cached, registered under the "spans"
    owner (``plans/caches.py:register_cache``) for
    :func:`release_span_caches`.
    """
    toks = _tokens(F.col("__t__"))
    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t__"))
    pos = base.select(
        "id", F.posexplode(_gram_keys(toks, n, digest)).alias("idx", "g")
    ).persist()
    # Merge-hinted: docs_per_gram is corpus-proportional (one row per
    # distinct gram), so a static broadcast promotion would OOM at
    # scale — same invariant as dedup.py's shingle filter lists.
    docs_per_gram = pos.groupBy("g").agg(
        F.count_distinct("id").alias("__docs__")
    ).hint("merge")
    dup = pos.join(docs_per_gram, "g").select(
        "id", "idx", (F.col("__docs__") >= 2).alias("is_dup")
    )
    # Island detection over ALL positions in one window: the running
    # count of duplicated positions equals row_number() among the
    # duplicated subset, so idx - cum_dup is constant per consecutive
    # duplicated run (and strictly increases across runs — each gap
    # of non-duplicated positions bumps idx without bumping cum_dup).
    # Non-duplicated rows get a NULL label and collapse into one
    # per-doc group that only contributes to the totals.
    w = (
        Window.partitionBy("id")
        .orderBy("idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_dup = F.sum(F.col("is_dup").cast("int")).over(w)
    labeled = dup.select(
        "id", F.when(F.col("is_dup"), F.col("idx") - cum_dup).alias("__grp__")
    )
    out = (
        labeled.groupBy("id", "__grp__")
        .agg(F.count("*").alias("__cnt__"))
        .groupBy("id")
        .agg(
            F.sum("__cnt__").alias("n_positions"),
            F.sum(
                F.when(F.col("__grp__").isNotNull(), F.col("__cnt__")).otherwise(
                    F.lit(0)
                )
            ).alias("dup_positions"),
            F.coalesce(
                F.max(F.when(F.col("__grp__").isNotNull(), F.col("__cnt__"))),
                F.lit(0),
            ).alias("max_dup_run"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_positions",
            "dup_positions",
            (F.col("dup_positions") / F.col("n_positions")).alias("dup_frac"),
            "max_dup_run",
        )
        .persist()
    )
    # Materialize the per-doc numeric result while `pos` is cached
    # (the plan consumes it twice), then release the
    # corpus-proportional cache; only `out` — five numeric columns
    # per doc — remains, reclaimable via release_span_caches().
    out.count()
    pos.unpersist()
    _register_cache(out, owner="spans")
    return out
