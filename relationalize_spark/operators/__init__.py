from .relationalize import relationalize
from .infer import infer_and_convert, schema_of_dataframe
from .asof import asof_join, range_bucket_join
from .clustering import assign_clusters, kmeans, kmeans_fit
from .dedup import (
    dedup_clusters,
    exact_dedup,
    embedding_dup_pairs,
    hamming_dup_pairs,
    jaccard_pairs,
    minhash_incremental_pairs,
    minhash_lsh_pairs,
    ngram_overlap_pairs,
    semdedup_pairs,
    simhash_pairs,
)
from .nest import unrelationalize
from .spans import duplicate_span_stats, segment_dedup
from .audit import fk_violations, merge_partial_aggs, profile_columns, table_checksum
from .funnel import funnel_steps
from .fuzzy import deletion_keys, fuzzy_join
from .indexing import add_global_index
from .multimodal import (
    audio_features,
    decode_images,
    dhash128,
    image_dup_pairs,
    image_features,
    image_signatures,
    resize_images,
    sample_frames,
)
from .scd2 import scd2_from_snapshots, scd2_merge, snapshot_diff
from .sampling import (
    group_quota_sample,
    hash_split,
    mix_sources,
    stratified_sample,
    temperature_weights,
    weighted_quota_sample,
)
from .timeseries import cohort_retention, gap_fill_locf, rollup_time_buckets
from .similarity import (
    brute_force_topk,
    ivf_topk,
    ivfpq_append,
    ivfpq_index,
    ivfpq_recall_eval,
    ivfpq_topk,
    jl_project,
    jl_recall_eval,
    lsh_topk,
    quantize_embeddings,
    quantized_topk,
)
from .text import boilerplate_phrases, bm25_topk, char_entropy, redact_pii

__all__ = [
    "relationalize",
    "infer_and_convert",
    "schema_of_dataframe",
    "asof_join",
    "range_bucket_join",
    "assign_clusters",
    "kmeans",
    "kmeans_fit",
    "dedup_clusters",
    "exact_dedup",
    "hamming_dup_pairs",
    "embedding_dup_pairs",
    "jaccard_pairs",
    "minhash_incremental_pairs",
    "minhash_lsh_pairs",
    "ngram_overlap_pairs",
    "semdedup_pairs",
    "simhash_pairs",
    "unrelationalize",
    "duplicate_span_stats",
    "segment_dedup",
    "fk_violations",
    "merge_partial_aggs",
    "profile_columns",
    "table_checksum",
    "funnel_steps",
    "deletion_keys",
    "fuzzy_join",
    "add_global_index",
    "audio_features",
    "decode_images",
    "dhash128",
    "image_dup_pairs",
    "image_features",
    "image_signatures",
    "resize_images",
    "sample_frames",
    "scd2_from_snapshots",
    "scd2_merge",
    "snapshot_diff",
    "group_quota_sample",
    "hash_split",
    "mix_sources",
    "temperature_weights",
    "stratified_sample",
    "weighted_quota_sample",
    "cohort_retention",
    "gap_fill_locf",
    "rollup_time_buckets",
    "brute_force_topk",
    "ivf_topk",
    "ivfpq_append",
    "ivfpq_index",
    "ivfpq_recall_eval",
    "ivfpq_topk",
    "jl_project",
    "jl_recall_eval",
    "lsh_topk",
    "quantize_embeddings",
    "quantized_topk",
    "boilerplate_phrases",
    "bm25_topk",
    "char_entropy",
    "redact_pii",
]
