"""Large-scale training-data curation pipeline over the documents table.

Chains the LLM-pipeline operators end to end: language ID + quality
scoring -> quality filter -> exact dedup -> MinHash near-dedup ->
token accounting — the shape of a 100 TB curation job, runnable here
on the sf test data.

    python examples/training_data_pipeline.py [sf_dir]
"""

import sys

sys.path.insert(0, ".")

import pyspark.sql.functions as F

from relationalize_spark.operators import text as TX
from relationalize_spark.operators.dedup import exact_dedup, minhash_lsh_pairs
from relationalize_spark.plans.session import get_spark
from relationalize_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app="training-data-pipeline")
    docs = load_table(spark, sf_dir, "documents")

    scored = TX.text_stats(docs)
    total = scored.count()

    kept = scored.filter(
        (F.col("quality_score_") > 0.25) & (F.col("n_tokens_") >= 10)
    )
    after_quality = kept.count()

    kept = exact_dedup(kept, subset=["fingerprint_"], tiebreak="doc_id")
    after_exact = kept.count()

    near_pairs = minhash_lsh_pairs(kept, "doc_id", "text", threshold=0.8)
    to_drop = near_pairs.select(F.col("j").alias("doc_id")).distinct()
    kept = kept.join(to_drop, "doc_id", "left_anti")
    after_near = kept.count()

    tokens_total = kept.agg(F.sum("n_tokens_")).collect()[0][0]
    print(f"documents:        {total}")
    print(f"after quality:    {after_quality}")
    print(f"after exact dedup:{after_exact}")
    print(f"after near dedup: {after_near}")
    print(f"tokens kept:      {tokens_total}")
    kept.groupBy("lang_id_").count().show()


if __name__ == "__main__":
    main()
