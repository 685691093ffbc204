"""The floor-lattice quantizer — the repo's ONE way to emit a float.

``round()`` on a float expression is unstable across Spark's own
evaluation paths at a half-way boundary (the r9 q143 gate failure)
and Spark/DuckDB round semantics differ (BigDecimal HALF_UP vs
multiply-based), so every oracle-backed emission floors onto a
``10^-dp`` BIGINT lattice instead: exact integer quanta, one IEEE
division back out. SQL oracles mirror it as
``CAST(FLOOR(x * 1e{dp}) AS BIGINT) / 1e{dp}``.

Pinned by ``tests/test_pipeline_ops.py::
test_no_round_quantizers_in_package``; the discipline's full
rationale lives in ``operators/text.py:unigram_nll_scores``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def floor_lattice(col: Column, dp: int) -> Column:
    """``floor(col * 10^dp) / 10^dp`` as DOUBLE — the quantized value
    itself. For cross-row sums keep the raw BIGINT quanta instead
    (``F.floor(col * F.lit(float(10**dp)))``) and divide once at the
    end; this helper is for FINAL per-row emissions."""
    den = F.lit(float(10**dp))
    return F.floor(col * den).cast("double") / den
