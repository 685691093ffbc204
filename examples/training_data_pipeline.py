"""Large-scale training-data curation pipeline over the documents table.

Chains the LLM-pipeline operators end to end: corpus-wide segment
dedup -> language ID + quality scoring -> quality filter -> exact
dedup -> MinHash near-dedup -> duplicate-span filter -> model-based
quality filter -> DSIR importance resampling toward the target
distribution -> semantic dedup over embeddings -> source mixing +
per-source caps -> token accounting -> BUCKETED output — the shape
of a 100 TB curation job, runnable here on the sf test data.

The bucketed write is the load-for-downstream-joins step: curated
documents and their embeddings land hash-bucketed on doc_id, so every
later join or per-document aggregation (training-shard assembly,
embedding lookups, incremental re-curation) runs with ZERO shuffle
exchange — the layout is the reference's rid-linkage story expressed
as Spark bucketing (ref README.md:107-119).

    python examples/training_data_pipeline.py [sf_dir]
"""

import sys

sys.path.insert(0, ".")

import pyspark.sql.functions as F

from relationalize_spark.operators import text as TX
from relationalize_spark.operators.dedup import exact_dedup, minhash_lsh_pairs
from relationalize_spark.plans.scale import write_bucketed
from relationalize_spark.plans.session import get_spark
from relationalize_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app="training-data-pipeline")
    docs = load_table(spark, sf_dir, "documents")
    total = docs.count()

    # Corpus-wide segment dedup first: boilerplate repeated across
    # documents (headers, license blurbs) is removed before any
    # scoring sees it, keeping the first occurrence only.
    from relationalize_spark.operators.spans import segment_dedup

    seg = segment_dedup(docs, "doc_id", "text", seg_words=10)
    docs = docs.drop("text").join(
        seg.where(F.col("n_kept") > 0).select(
            "doc_id", F.col("cleaned_text").alias("text")
        ),
        "doc_id",
    )
    after_segments = docs.count()

    scored = TX.text_stats(docs)

    kept = scored.filter(
        (F.col("quality_score_") > 0.25) & (F.col("n_tokens_") >= 10)
    )
    after_quality = kept.count()

    kept = exact_dedup(kept, subset=["fingerprint_"], tiebreak="doc_id")
    after_exact = kept.count()

    # Normalization-robust dedup (r9): case flips, punctuation and
    # whitespace jitter slip past raw-text hashing; collapse each
    # canonical-form group onto its survivor (min doc_id). The
    # shuffle carries (md5 fingerprint, id) pairs, never text.
    from relationalize_spark.operators.text import canonical_dedup

    surv = canonical_dedup(kept, "doc_id", "text").select(
        F.col("survivor_id").alias("doc_id")
    )
    kept = kept.join(surv, "doc_id", "left_semi")
    after_canonical = kept.count()

    near_pairs = minhash_lsh_pairs(kept, "doc_id", "text", threshold=0.8)
    to_drop = near_pairs.select(F.col("j").alias("doc_id")).distinct()
    kept = kept.join(to_drop, "doc_id", "left_anti")
    after_near = kept.count()

    # Drop documents that are mostly duplicated 5-gram spans of the
    # rest of the corpus (cross-document boilerplate survivors) ...
    from relationalize_spark.operators.spans import (
        duplicate_span_stats,
        remove_duplicate_spans,
    )

    spans = duplicate_span_stats(kept, "doc_id", "text", n=5)
    heavy = spans.where(F.col("dup_frac") > 0.9).select("doc_id")
    kept = kept.join(heavy, "doc_id", "left_anti")
    # ... and EXCISE the long duplicated runs from the survivors
    # (Lee et al. 2021's dedup step, r8): spans of >= 15 words
    # duplicated across documents are cut out, the rest of each
    # document survives — finer than dropping whole documents.
    cleaned = remove_duplicate_spans(kept, "doc_id", "text", n=5, min_span=15)
    # rewrite ONLY excised documents (untouched docs keep their
    # original bytes — cleaned_text is whitespace-renormalized, which
    # would otherwise silently reflow the whole corpus); drop docs the
    # excision emptied entirely.
    kept = (
        kept.join(
            cleaned.select("doc_id", "n_words", "n_removed", "cleaned_text"),
            "doc_id",
        )
        .where(F.col("n_words") > F.col("n_removed"))
        .withColumn(
            "text",
            F.when(F.col("n_removed") > 0, F.col("cleaned_text")).otherwise(
                F.col("text")
            ),
        )
        .drop("n_words", "n_removed", "cleaned_text")
    )
    after_spans = kept.count()

    # Model-based quality filter (r8): train the hashed-feature
    # logistic regression on a weak label (here: mentions of the
    # domain term), score every document with the fused-projection
    # apply path, and keep the confident half. On a real corpus the
    # label comes from a curated seed set; the machinery is the same.
    from relationalize_spark.operators.classify import (
        hashed_logreg,
        score_documents,
    )

    label = F.array_contains(F.split(F.col("text"), r"\s+"), "spark")
    w = {
        r.feature: r.weight
        for r in hashed_logreg(kept, label, dim=64, lr=2.0, iters=3).collect()
    }
    scores = score_documents(kept, w, dim=64)
    # data-driven cut: drop the least-confident decile (a fixed 0.5
    # threshold is meaningless when the label prior is skewed);
    # approx_percentile is the sketch the same cut uses at 100 TB.
    cut = scores.agg(
        F.expr("approx_percentile(score, 0.10)").alias("c")
    ).collect()[0].c
    kept = kept.join(scores.where(F.col("score") >= cut).select("doc_id"),
                     "doc_id", "left_semi")
    after_model = kept.count()

    # Lineage cut: every stage so far derives kept from itself via a
    # join, so the un-materialized plan DOUBLES per stage (the DSIR
    # stage below branches it again) — by this point plan analysis
    # alone exhausts the example-scale heap. At 100 TB the pipeline
    # would land each mega-stage to parquet; locally an eager
    # localCheckpoint is the same cut without the I/O.
    kept = kept.localCheckpoint(eager=True)

    # DSIR importance resampling (r8): re-shape the non-target pool
    # toward the target distribution (here: the src0/src1 docs).
    # dsir_select's top-k is the right call for a fixed budget; for a
    # FRACTION of an unbounded corpus the scale-correct form is the
    # one below — per-doc Gumbel keys (zero-shuffle scan fold) cut at
    # an approx_percentile threshold, a distributed filter with no
    # top-k funnel through the driver.
    from relationalize_spark.operators.dsir import (
        dsir_weights,
        gumbel_key,
        hashed_lm_logratio,
    )

    tgt = F.col("source").isin("src0", "src1")
    lrq = hashed_lm_logratio(kept, tgt, dim=64)
    # cache the keys: the percentile collect AND the join both read
    # them — without the persist the per-doc scoring scan runs twice
    keyed = dsir_weights(kept.where(~tgt), lrq, id_col="doc_id").select(
        F.col("id").alias("doc_id"),
        (F.col("weight_q") + gumbel_key(F.col("id"))).alias("key_q"),
    ).persist()
    key_cut = keyed.agg(
        F.expr("approx_percentile(key_q, 0.30)").alias("c")
    ).collect()[0].c
    kept = kept.join(
        keyed.where(F.col("key_q") >= key_cut).select(
            "doc_id", F.lit(True).alias("__dsir__")
        ),
        "doc_id",
        "left",
    ).where(tgt | F.col("__dsir__").isNotNull()).drop("__dsir__")
    kept = kept.localCheckpoint(eager=True)  # cut before unpersisting
    keyed.unpersist()
    after_dsir = kept.count()

    # Fluency filter (r9): interpolated-bigram LM perplexity (the
    # KenLM/CCNet quality axis), cut RELATIVELY per source — each
    # source keeps its own most-fluent 85% (low avg_nll ranks first),
    # so a systematically noisy source is trimmed without being wiped
    # out by a global threshold (the mixture-preserving cut).
    from relationalize_spark.operators.sampling import group_relative_filter
    from relationalize_spark.operators.text import bigram_nll_scores

    nll = bigram_nll_scores(kept, "doc_id", "text")
    # LEFT join: sub-2-token documents get no bigram score — they are
    # exempt from the fluency cut (coalesced to rank-first), not
    # silently dropped by an inner join.
    fluent = group_relative_filter(
        kept.join(nll.select("doc_id", "avg_nll"), "doc_id", "left"),
        -F.coalesce(F.col("avg_nll"), F.lit(float("-inf"))),
        ["source"],
        keep_frac=0.85,
        id_col="doc_id",
    )
    kept = kept.join(fluent.select("doc_id"), "doc_id", "left_semi")
    after_fluency = kept.count()

    # Semantic dedup (SemDeDup): k-means cells over the documents'
    # embeddings, exact within-cell cosine; drop the higher id of
    # each >=0.97 pair.
    from relationalize_spark.operators.dedup import semdedup_pairs

    emb_all = load_table(spark, sf_dir, "embeddings").withColumnRenamed(
        "vec_id", "doc_id"
    )
    emb_kept = emb_all.join(kept.select("doc_id"), "doc_id", "left_semi")
    sem = semdedup_pairs(emb_kept, "doc_id", "embedding", k=16, threshold=0.97)
    kept = kept.join(
        sem.select(F.col("j").alias("doc_id")).distinct(), "doc_id", "left_anti"
    )
    after_sem = kept.count()

    # Re-balance the corpus: weight the sources (keep all of src0,
    # downsample the rest) with the deterministic hash mix — a pure
    # pushed-down filter, reproducible on any cluster shape.
    from relationalize_spark.operators.sampling import mix_sources

    kept = mix_sources(
        kept,
        {"src0": 1.0, "src1": 0.8, "src2": 0.6},
        default=0.5,
        id_col="doc_id",
    )
    # ... and cap any single source at an exact per-source quota
    # (rate-based mixing cannot express "at most N of src2").
    from relationalize_spark.operators.sampling import group_quota_sample

    kept = group_quota_sample(kept, "source", 200, id_col="doc_id")
    after_mix = kept.count()

    # Dense example ids for the training loader: range shuffle +
    # per-partition offsets, never a single-task global window.
    from relationalize_spark.operators.indexing import add_global_index

    kept = add_global_index(kept, ["doc_id"], index_col="example_id")

    tokens_total = kept.agg(F.sum("n_tokens_")).collect()[0][0]
    print(f"documents:        {total}")
    print(f"after seg dedup:  {after_segments}")
    print(f"after quality:    {after_quality}")
    print(f"after exact dedup:{after_exact}")
    print(f"after canon dedup:{after_canonical}")
    print(f"after near dedup: {after_near}")
    print(f"after span filter:{after_spans}")
    print(f"after model filt.:{after_model}")
    print(f"after DSIR:       {after_dsir}")
    print(f"after fluency:    {after_fluency}")
    print(f"after sem dedup:  {after_sem}")
    print(f"after mix+quota:  {after_mix}")
    print(f"tokens kept:      {tokens_total}")
    kept.groupBy("lang_id_").count().show()

    # What made it through, per source — the c-TF-IDF keyword report
    # (r9) a curation run prints beside its mixture stats.
    from relationalize_spark.operators.text import class_tfidf_keywords

    class_tfidf_keywords(kept, "source", "doc_id", "text", top_k=3).orderBy(
        "source", "rank"
    ).show(12, truncate=False)

    # Load for downstream joins: curated docs + their embeddings,
    # co-bucketed on doc_id. The verification join below must run
    # with no Exchange in the executed plan.
    emb = emb_all
    write_bucketed(kept, "curated_docs", ["doc_id"], num_buckets=16,
                   sort_cols=["doc_id"])
    write_bucketed(emb, "curated_doc_embeddings", ["doc_id"], num_buckets=16,
                   sort_cols=["doc_id"])
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    joined = spark.table("curated_docs").join(
        spark.table("curated_doc_embeddings"), "doc_id"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    print(f"curated+embeddings rows: {joined.count()}")
    print(f"shuffle-free co-located join: {'Exchange' not in plan}")

    # Tokenizer stage (r8): learn the first BPE merges on the CURATED
    # corpus (one corpus shuffle, vocab-bounded iterations) and report
    # per-source fertility — the go/no-go signal for a tokenizer
    # before committing to a full vocabulary build.
    from relationalize_spark.operators.bpe import bpe_eval, bpe_train

    rules = [(l, r) for _, l, r, _, _ in bpe_train(kept, "text", merges=8)]
    print(f"BPE merges learned: {[a + b for a, b in rules]}")
    bpe_eval(kept, rules, text_col="text", group_col="source").orderBy(
        F.desc("tokens_per_word")
    ).show(5)

    # Final stage: chunk the curated corpus into token windows and
    # pack chunks into ~512-token training shards (greedy running sum
    # inside hash buckets, so packing parallelizes across executors).
    from relationalize_spark.operators.text import chunk_documents, pack_shards

    chunks = chunk_documents(kept, "doc_id", "text", chunk_tokens=64, overlap=8)
    packed = pack_shards(chunks, "id", "chunk_id", "n_tokens",
                         target_tokens=512, n_buckets=16)
    shards = packed.groupBy("bucket", "shard_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_tokens").alias("n_tokens"),
    )
    n_shards = shards.count()
    print(f"training shards: {n_shards} "
          f"(~{packed.agg(F.sum('n_tokens')).collect()[0][0]} tokens)")


if __name__ == "__main__":
    main()
