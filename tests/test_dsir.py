"""DSIR importance resampling: pure-Python mirror, determinism,
plan shape, and edge cases (operators/dsir.py)."""

import hashlib
import math

import pyspark.sql.functions as F
import pytest

from relationalize_spark.operators.dsir import (
    REPLAY_LNR,
    dsir_select,
    dsir_weights,
    gumbel_key,
    hashed_lm_logratio,
)

DIM = 16
FP = float(10**REPLAY_LNR)


@pytest.fixture(scope="module")
def corpus(spark):
    # Target docs speak "quality clean prose"; raw docs mostly speak
    # "junk spam noise", except a few raw docs that sound like the
    # target — those are what DSIR must surface.
    rows = []
    for i in range(10):
        rows.append((i, f"quality clean prose w{i % 3}", True))
    for i in range(10, 40):
        rows.append((i, f"junk spam noise w{i % 3}", False))
    for i in range(40, 46):
        rows.append((i, f"quality clean prose w{i % 3}", False))
    rows.append((100, "", False))  # zero-token docs: excluded
    rows.append((101, "   ", True))
    return spark.createDataFrame(rows, "doc_id int, text string, tgt boolean")


def _py_bucket(tok: str, dim: int) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % dim


def _py_lrq(rows, dim):
    """Pure-Python mirror of hashed_lm_logratio over (text, tgt)."""
    ct: dict[int, int] = {}
    cr: dict[int, int] = {}
    for text, tgt in rows:
        toks = [t for t in text.split() if t]
        if not toks:
            continue
        for t in toks:
            j = _py_bucket(t, dim)
            (ct if tgt else cr)[j] = (ct if tgt else cr).get(j, 0) + 1
    tt, rt = sum(ct.values()), sum(cr.values())
    return {
        j: math.floor(
            (
                math.log((ct.get(j, 0) + 1) / (tt + dim))
                - math.log((cr.get(j, 0) + 1) / (rt + dim))
            )
            * FP
        )
        for j in range(dim)
    }


def _py_gumbel(doc_id) -> int:
    h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
    u = (float(h) + 1.0) / float(2**60 + 256)
    return math.floor(-math.log(-math.log(u)) * FP)


def test_logratio_matches_python_mirror(spark, corpus):
    got = hashed_lm_logratio(corpus, F.col("tgt"), dim=DIM)
    rows = [(r.text, r.tgt) for r in corpus.collect()]
    assert got == _py_lrq(rows, DIM)


def test_weights_match_python_mirror(spark, corpus):
    lrq = hashed_lm_logratio(corpus, F.col("tgt"), dim=DIM)
    raw = corpus.where(~F.col("tgt"))
    got = {r.id: r.weight_q for r in dsir_weights(raw, lrq, dim=DIM).collect()}
    want = {}
    for r in raw.collect():
        toks = [t for t in r.text.split() if t]
        if toks:
            want[r.doc_id] = sum(lrq[_py_bucket(t, DIM)] for t in toks)
    assert got == want
    assert 100 not in got  # zero-token doc excluded


def test_gumbel_key_matches_python_mirror(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], "id int")
    got = df.select("id", gumbel_key(F.col("id")).alias("g")).collect()
    assert {r.id: r.g for r in got} == {i: _py_gumbel(i) for i in range(50)}


def test_select_surfaces_target_like_raw_docs(spark, corpus):
    sel = dsir_select(corpus, F.col("tgt"), dim=DIM, k=6).collect()
    ids = [r.doc_id for r in sel]
    assert len(ids) == 6
    # only raw-pool docs are selectable
    assert all(10 <= i <= 46 for i in ids)
    # the target-like raw docs (40-45) dominate: their importance
    # weights tower over the junk docs, so all six must be them.
    assert sorted(ids) == list(range(40, 46))
    # output ordered by key desc, ties by id
    keys = [(r.key_q, -r.doc_id) for r in sel]
    assert keys == sorted(keys, reverse=True)


def test_select_deterministic_under_repartition(spark, corpus):
    a = dsir_select(corpus, F.col("tgt"), dim=DIM, k=8).collect()
    b = dsir_select(
        corpus.repartition(7), F.col("tgt"), dim=DIM, k=8
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_scoring_is_zero_shuffle_and_jvm_side(spark, corpus):
    """The weight projection must fuse into the scan: no Exchange, no
    Python evaluation; selection must plan TakeOrderedAndProject,
    never a global Sort."""
    lrq = hashed_lm_logratio(corpus, F.col("tgt"), dim=DIM)
    w = dsir_weights(corpus.where(~F.col("tgt")), lrq, dim=DIM)
    plan = w._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    sel = dsir_select(corpus, F.col("tgt"), dim=DIM, k=5)
    sel_plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in sel_plan


def test_gumbel_uniform_strictly_inside_unit_interval():
    """The denominator must stay strictly above every IEEE-rounded
    numerator. md5_60 + 1 rounds as high as exactly 2^60 (ulp there
    is 128 — a '2^60 + 1' denominator ALSO rounds to 2^60, u hits
    1.0, and DuckDB aborts on ln(0)); 2^60 + 256 is representable
    and strictly larger, so both logs are finite in every engine."""
    import duckdb

    from relationalize_spark.operators.dsir import _U_DEN

    max_num = float(2**60 - 1) + 1.0  # the largest rounded numerator
    assert max_num == float(2**60)  # the rounding this test pins
    assert _U_DEN == float(2**60 + 256) and _U_DEN > max_num
    u = max_num / _U_DEN
    assert 0.0 < u < 1.0
    g = math.floor(-math.log(-math.log(u)) * FP)
    # the identical expression must evaluate (not abort) in DuckDB
    got = duckdb.sql(
        "SELECT CAST(floor(-ln(-ln((CAST(? AS DOUBLE) + 1.0)"
        " / CAST(? AS DOUBLE))) * 1000000000.0) AS BIGINT) AS g",
        params=[2**60 - 1, 2**60 + 256],
    ).fetchone()[0]
    assert got == g


def test_all_target_or_all_raw_still_finite(spark):
    # degenerate split: raw pool empty -> selection is empty, no NaN/inf
    df = spark.createDataFrame(
        [(1, "a b", True), (2, "c d", True)], "doc_id int, text string, tgt boolean"
    )
    lrq = hashed_lm_logratio(df, F.col("tgt"), dim=8)
    assert all(isinstance(v, int) for v in lrq.values())
    assert dsir_select(df, F.col("tgt"), dim=8, k=3).count() == 0


def test_dsir_weights_dim_mismatch_raises(spark, corpus):
    # ADVICE r8: same fail-fast contract as classify — a log-ratio
    # table fit at a different dim must raise, not NULL every weight.
    from relationalize_spark.operators.dsir import dsir_weights

    lrq32 = {j: 100 for j in range(32)}
    with pytest.raises(ValueError, match="missing buckets"):
        dsir_weights(corpus, lrq32, dim=64)
