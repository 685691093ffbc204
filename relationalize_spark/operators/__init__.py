from .relationalize import relationalize
from .infer import infer_and_convert, schema_of_dataframe
from .asof import asof_join, range_bucket_join
from .dedup import (
    dedup_clusters,
    exact_dedup,
    embedding_dup_pairs,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash_pairs,
)
from .similarity import brute_force_topk, ivf_topk, lsh_topk

__all__ = [
    "relationalize",
    "infer_and_convert",
    "schema_of_dataframe",
    "asof_join",
    "range_bucket_join",
    "dedup_clusters",
    "exact_dedup",
    "embedding_dup_pairs",
    "jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "brute_force_topk",
    "ivf_topk",
    "lsh_topk",
]
