"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169), Spark-first and engine-replayable.

The third leg of the classic data-selection stack beside heuristic
filters (:mod:`.text`) and the trained quality classifier
(:mod:`.classify`): fit a cheap bag-of-hashed-ngrams language model
on a small TARGET corpus (the distribution you want more of) and on
the RAW candidate pool, weight every raw document by its importance
log-ratio ``log p_target(x) - log p_raw(x)``, and resample the pool
proportionally to the importance weight via the Gumbel-top-k trick.

Spark-first shape:

- **Both LMs in one pass**: tokenize -> explode -> ``groupBy(bucket)``
  with two conditional counts (target / raw). ONE ``dim``-key
  shuffle, map-side combined, for the entire model fit; driver state
  is ``dim`` rows (the k-means / logreg small-aggregate pattern).
- **Scoring is a pure scan projection**: the per-bucket log-ratio
  table is a map LITERAL (constant-folded into the task binary — the
  centroid/weight-literal trick from clustering/classify), and the
  per-document weight is a BIGINT ``F.aggregate`` fold over the token
  array. ZERO shuffles: no join, no groupBy, no broadcast exchange.
- **Selection is ``orderBy(key).limit(k)``** — Spark plans
  TakeOrderedAndProject: per-partition top-k then a driver merge of
  ``partitions x k`` rows, never a global sort shuffle.

At 100 TB: one dim-key shuffle (model) + one scan (score+select).

Engine-replayable determinism (the q121/q67/q131 lattice
discipline, so the ENTIRE pipeline — LM counts, smoothing, log
ratios, per-doc weights, Gumbel keys, top-k — has a TRUE chained-CTE
DuckDB value oracle, q138):

- LM counts are exact BIGINTs; add-one smoothing ratios are single
  IEEE divisions (identical in any engine);
- the transcendentals (``ln`` in the log-ratio, ``-ln(-ln u)`` in the
  Gumbel key) are floored onto the 1e-9 lattice IMMEDIATELY — a
  1-ulp cross-engine ``ln`` divergence flips a floored value with
  ~1e-7 probability per evaluation, negligible per gate run;
- per-document weights are BIGINT sums of lattice quanta —
  order-free by integer associativity, so partial aggregation /
  fold order cannot change them;
- the resampling "randomness" is an md5-derived uniform
  ``u = (md5_60(doc_id) + 1) / (2^60 + 256)`` (the dedup.py md5_60
  lane; the ``+ 256`` — not ``+ 1`` — keeps ``u`` strictly below 1.0
  after IEEE rounding, see the ``_U_DEN`` comment), so the Gumbel
  perturbation is a pure function of the row — deterministic,
  seedless, computable in any SQL engine.

Reference parity: none (capability beyond the reference's surface,
cited as such in SURVEY.md §8.4).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .classify import hash_bucket

#: Lattice scale (decimal digits) for every transcendental: bucket
#: log-ratios and Gumbel keys are ``floor(v * 10^REPLAY_LNR)``
#: BIGINTs. 1e-9 is coarse enough to absorb cross-engine libm ulp
#: noise and fine enough that selection order is semantically the
#: importance order (see module docstring).
REPLAY_LNR = 9

#: The md5_60 uniform's denominator: ``2^60 + 256``. The numerator
#: ``md5_60 + 1`` is at most ``2^60``, and since the double ulp at
#: 2^60 is 128, the IEEE-rounded numerator can reach exactly ``2^60``
#: (a denominator of ``2^60 + 1`` would ALSO round to ``2^60``,
#: letting ``u`` hit exactly 1.0 and ``-ln(-ln u)`` blow up — DuckDB
#: aborts on ``ln(0)``). ``2^60 + 256`` is exactly representable
#: (multiple of 128) and strictly above every possible numerator, so
#: ``u`` is in (0, 1) exclusive and both logs are always finite.
_U_DEN = float(2**60 + 256)


def _tokens(text_col: str) -> Column:
    """Whitespace tokens with empties dropped — the exact shape the
    oracle replays (``regexp_split_to_array`` + ``list_filter``)."""
    return F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")


def hashed_lm_logratio(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    *,
    dim: int = 64,
) -> dict[int, int]:
    """Fit both hashed-unigram LMs in one pass and return the
    per-bucket importance log-ratio table as lattice BIGINTs:

    ``lrq[j] = floor((ln((ct_j + 1) / (T + dim))
                     - ln((cr_j + 1) / (R + dim))) * 10^REPLAY_LNR)``

    where ``ct/cr`` are the bucket's token counts in the target /
    raw corpus and ``T/R`` the corpus token totals (add-one
    smoothing, so never-seen buckets are finite). One explode + one
    dim-key map-side-combined shuffle; the driver holds ``dim`` rows.

    Documents with zero tokens contribute nothing (they are excluded
    from scoring too, mirrored by the oracle's ``len(ws) > 0``)."""
    toks = _tokens(text_col)
    rows = (
        df.select(target.alias("__tgt__"), toks.alias("__toks__"))
        .where(F.size("__toks__") > 0)
        .select("__tgt__", F.explode("__toks__").alias("__tok__"))
        .groupBy(hash_bucket(F.col("__tok__"), dim).alias("j"))
        .agg(
            F.count_if(F.col("__tgt__")).alias("ct"),
            F.count_if(~F.col("__tgt__")).alias("cr"),
        )
        .collect()
    )
    counts = {r.j: (r.ct, r.cr) for r in rows}
    t_total = sum(c[0] for c in counts.values())
    r_total = sum(c[1] for c in counts.values())
    fp = float(10**REPLAY_LNR)
    lrq: dict[int, int] = {}
    for j in range(dim):
        ct, cr = counts.get(j, (0, 0))
        # The exact double expression the oracle replays: two IEEE
        # divisions, two lns, one subtract, floored onto the lattice.
        v = math.log((ct + 1) / (t_total + dim)) - math.log(
            (cr + 1) / (r_total + dim)
        )
        lrq[j] = math.floor(v * fp)
    return lrq


def _lrq_map(lrq: dict[int, int]) -> Column:
    """The log-ratio table as a map literal (all children literal →
    Catalyst ConstantFolding collapses it; ships in the task binary,
    no join/broadcast). Values cast to BIGINT explicitly so mixed
    magnitudes cannot split the map's value type."""
    pairs: list[Column] = []
    for j in sorted(lrq):
        pairs.append(F.lit(j))
        pairs.append(F.lit(lrq[j]).cast("long"))
    return F.create_map(*pairs)


def dsir_weights(
    df: DataFrame,
    lrq: dict[int, int],
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    dim: int = 64,
) -> DataFrame:
    """Per-document importance weight ``(id, weight_q)`` where
    ``weight_q = sum_tokens lrq[bucket(tok)]`` (BIGINT lattice
    quanta). A pure projection: the fold runs inside the scan via
    ``F.aggregate`` over the token array with the map literal — zero
    shuffles, zero joins. Empty-token documents are excluded.
    Raises ``ValueError`` if ``lrq`` does not cover ``range(dim)``
    (a dim mismatch would otherwise NULL every weight via a missing
    ``element_at`` bucket, indistinguishable from empty docs)."""
    from .classify import _check_weights

    _check_weights(lrq, dim, intercept=False)
    wm = _lrq_map(lrq)
    toks = _tokens(text_col)
    wq = F.aggregate(
        "__toks__",
        F.lit(0).cast("bigint"),
        lambda acc, t: acc + F.element_at(wm, hash_bucket(t, dim)),
    )
    return (
        df.select(F.col(id_col).alias("id"), toks.alias("__toks__"))
        .where(F.size("__toks__") > 0)
        .select("id", wq.alias("weight_q"))
    )


def gumbel_key(id_col: Column) -> Column:
    """Replayable Gumbel(0, 1) perturbation on the lattice:
    ``floor(-ln(-ln(u)) * 10^REPLAY_LNR)`` with the md5-derived
    uniform ``u = (md5_60(id) + 1) / (2^60 + 256)`` (``_U_DEN``; the
    ``+ 256`` keeps ``u`` strictly below 1.0 after IEEE rounding so
    ``ln(ln(u))`` never hits ``ln(0)`` — see the ``_U_DEN`` comment).
    A pure function of the id — any SQL engine computes the identical
    BIGINT."""
    h = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    u = (h.cast("double") + F.lit(1.0)) / F.lit(_U_DEN)
    return F.floor(-F.log(-F.log(u)) * F.lit(float(10**REPLAY_LNR))).cast(
        "long"
    )


def dsir_select(
    df: DataFrame,
    target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    dim: int = 64,
    k: int = 25,
) -> DataFrame:
    """The full DSIR step: fit both LMs on ``df`` (split by
    ``target``), weight every RAW document (``NOT target``), and
    Gumbel-top-k resample — taking the k largest
    ``key_q = weight_q + gumbel_q`` draws samples proportionally to
    the importance weight ``exp(weight_q / 10^REPLAY_LNR)`` (the
    Gumbel-max trick), deterministically via the md5 uniform.

    Returns ``(id_col, weight_q, key_q)``, the selected documents in
    descending key order (ties broken by id). The ``limit(k)`` after
    ``orderBy`` plans TakeOrderedAndProject — per-partition top-k,
    no global sort shuffle."""
    lrq = hashed_lm_logratio(df, target, text_col, dim=dim)
    raw = df.where(~target)
    w = dsir_weights(raw, lrq, id_col, text_col, dim=dim)
    keyed = w.select(
        F.col("id").alias(id_col),
        "weight_q",
        (F.col("weight_q") + gumbel_key(F.col("id"))).alias("key_q"),
    )
    return keyed.orderBy(F.desc("key_q"), id_col).limit(k)
