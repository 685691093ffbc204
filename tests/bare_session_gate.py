"""Driver-parity check: run the ENTIRE oracle gate under a bare
default SparkSession — no AQE tuning, no broadcast threshold, no
timezone pin, default 200 shuffle partitions, default 1g heap. The
driver's harness builds its own session, so nothing in the registry
may depend on plans/session.py's settings.

Not named test_* on purpose: it duplicates tests/test_entry_oracle.py
's coverage at ~4 minutes of extra wall, so it runs on demand:

    python tests/bare_session_gate.py

Last full run: r12 OPTIMIZATION round (session 2) at commit 3ed48ab
— the final r12 optimization code: dynamic-relationalize fused
analysis (one grouped job for schema + level-1 tags + array-element
tags), minhash band-bucket precompute, tfidf maxweight prefix bound,
the fused replayable Lloyd's mapInArrow kernel, the hardened
streaming-conf helper, and the r12 oracle-window rotation —
BARE-SESSION GATE: ALL 152 OK. Default pytest lane at the same HEAD:
682 passed / 201 deselected in 15:44; FULL suite (slow lanes
included) at the final r12 HEAD: 882 passed / 1 env-skip / 0 failed
in 30:08.
Prior full run: r11 OPTIMIZATION round close-out (session 5) at
commit 0ccce2f — the final optimization HEAD's code (subsequent
commits are docs/log-only): BARE-SESSION GATE: ALL 152 OK, with
every r11-opt change in (q01/q03 keyed scan parallelization, PQ
sub-fit overlap + shared init, streaming backlog-sized state
partitions + no-data-batch skip, q59 convergence fold, kmeans/logreg
iteration right-sizing, q150 panel collect-once). Full suite at the
same HEAD: 877 passed / 1 env-skip / 0 failed in 32:37.
(Earlier r11-opt attested runs: ALL 152 at f904ef2 — session-2
start — and at 29b471d — session-4 start.)
Prior full run: round 11 BUILD final HEAD at commit c5e9fc9 (everything in
the runs below, plus the post-attestation additions — JPEG
4:2:2/4:4:4 chroma tests, video_dup_pairs keyframe-evidence video
near-dup, audio_dup_pairs energy-gradient audio near-dup, the media
pipeline's three dedup outputs — and the SECOND review pass's seven
closures: truncated-WAV crash fix in both decode lanes, keyframe-
not-pair evidence counting, max_bucket passthroughs, the shared
per-payload mapInPandas helper, exports, parquet-read counts) —
BARE-SESSION GATE: ALL 152 OK. Full suite at the same HEAD:
869 passed / 1 env-skip in 21:59.
(Earlier r11 attested runs: ALL 152 + 867-test suite at 7c080b0;
ALL 152 at ba549fb.)
Prior r11 run: commit ba549fb (the r11
window rotation — the 50 r8-attested entries, zero free slots;
q152 perceptual image near-dup registered behind the cap with its
full pixel/bit/packing value oracle at both SFs; pure-numpy
baseline JPEG decoder closing the AVI→keyframes→pixels lane;
hamming_dup_pairs with multi-lane 128-bit signatures and the
max_bucket degeneracy cap, simhash_pairs delegating to it; the
opt-in Bayardo prefix filter with the corpus-max exact bound;
pagerank true integer division; all five r10 ADVICE closures; all
eight r11 mid-round review fixes; the cyclic-padding fix for the
measured LSH mega-bucket melt) — ALL 152 OK.
(Earliest r11 run: ALL 151 at the rotation commit 73c6a24, before
q152 registered.)
(Prior rounds: r10 final ALL 151 at f0dd37a — earlier r10 runs ALL
151 at 28502b8 and 405e467; r8 final ALL 142; earlier r8 runs as
the registry grew: ALL 130 / 135 / 136 / 137 / 140. The r9 round
shipped with this header stale at 142 while the registry was 149 —
r9 verdict item 3; keep this header current with an
ALL-<registry> run at the final gate-attested commit EVERY round.)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").appName("bare-gate").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    from test_entry_oracle import _pandas_rows

    from relationalize_spark.sources.tables import TABLE_NAMES

    sf = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    # The driver's smoke check runs entry() first — replicate it.
    entry_rows = entry_mod.entry(spark).collect()
    assert len(entry_rows) >= 0

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    bad = []
    for name, fn in qs.items():
        try:
            df = fn(spark, sf)
            if name not in oracles:
                df.count()
                continue
            s_cols, s_rows = _pandas_rows(df.toPandas())
            d_cols, d_rows = _pandas_rows(con.sql(oracles[name]).df())
            if s_cols != d_cols or s_rows != d_rows:
                bad.append((name, "mismatch"))
        except Exception as e:  # noqa: BLE001 - report and continue
            bad.append((name, str(e).split("\n")[0][:140]))
    print(
        "BARE-SESSION GATE:",
        f"ALL {len(qs)} OK" if not bad else f"FAILURES: {bad}",
    )
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
