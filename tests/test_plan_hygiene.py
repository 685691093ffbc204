"""Global plan-hygiene sweep over the whole query registry: no query
may plan a CartesianProduct (unbounded pair space) or a row-at-a-time
Python UDF (BatchEvalPython — the non-Arrow slow path). Arrow-batched
Python (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas) is the
sanctioned boundary and broadcast nested-loop joins against 1-row /
bounded broadcast sides are legitimate, so neither is flagged."""

import pytest

from relationalize_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"

# streaming queries execute their (bounded) stream during construction;
# plan inspection would re-run them for no signal
_SKIP = {
    "q54_streaming_windowed_counts",
    "q55_streaming_sessionize",
    "q74_stream_static_join",
    "q75_stream_stream_join",
    "q83_streaming_dedup",
}


@pytest.mark.parametrize("name", [n for n in REGISTRY if n not in _SKIP])
def test_no_cartesian_or_row_python(spark, name):
    df = REGISTRY[name][0](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    assert "BatchEvalPython" not in plan, (
        f"{name} plans a row-at-a-time Python UDF"
    )
