"""Driver-parity check: run the ENTIRE oracle gate under a bare
default SparkSession — no AQE tuning, no broadcast threshold, no
timezone pin, default 200 shuffle partitions, default 1g heap. The
driver's harness builds its own session, so nothing in the registry
may depend on plans/session.py's settings.

Not named test_* on purpose: it duplicates tests/test_entry_oracle.py
's coverage at ~4 minutes of extra wall, so it runs on demand:

    python tests/bare_session_gate.py

Last full run: round 8 final HEAD (q130 JsonStreamDemux driver
query, q131/q135 replayable logreg train+score, q132 span excision,
q133/q134 replayable BPE train+eval, q136 streaming windowed HLL
distinct, q137 replayable PQ/ADC ANN, q138 replayable DSIR
importance resampling, q139/q140 plans-toolkit driver rows, q141
streaming x ML full-value scoring, q142 IVF-PQ composition, demux
write pool, all three self-review hardening passes in) —
BARE-SESSION GATE: ALL 142 OK.
(Earlier same-round runs as the registry grew: ALL 130 / 135 / 136
/ 137 / 140.)
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
