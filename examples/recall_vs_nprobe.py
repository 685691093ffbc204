"""IVF-PQ recall@k vs nprobe table (r10, VERDICT r9 item 4).

Runs ``ivfpq_recall_eval`` on the embeddings table across a probe
sweep (including full probe = every cell) and prints the per-nprobe
mean recall and perfect-query counts — the numbers a practitioner
reads to set ``nprobe`` on the production search (q142/q150). The
driver-gated q150 uses the (1, 2, 4) prefix of this sweep with a
full DuckDB value oracle; this script adds the full-probe ceiling
row and the mean view for BASELINE.md.

Run: python examples/recall_vs_nprobe.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from relationalize_spark.plans.session import get_spark  # noqa: E402
from relationalize_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    cells, k, n_queries = 8, 5, 10
    spark = get_spark(
        app="recall-vs-nprobe", master="local[8]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")
    from relationalize_spark.operators.similarity import ivfpq_recall_eval

    e = load_table(spark, sf, "embeddings")
    out = ivfpq_recall_eval(
        e, nprobes=(1, 2, 4, cells), n_queries=n_queries, k=k,
        cells=cells, coarse_iters=2, m=4, pq_k=16, pq_iters=2,
    ).collect()
    by_np: dict[int, list[float]] = {}
    for r in out:
        by_np.setdefault(r.nprobe, []).append(r.recall_at_k)
    print(f"sf={sf} cells={cells} k={k} panel={n_queries}")
    print("| nprobe | mean recall@5 | queries at 5/5 |")
    print("|---|---|---|")
    for np_ in sorted(by_np):
        recs = by_np[np_]
        perfect = sum(1 for x in recs if x == 1.0)
        print(
            f"| {np_}{' (all cells)' if np_ == cells else ''} "
            f"| {sum(recs) / len(recs):.2f} | {perfect}/{len(recs)} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
