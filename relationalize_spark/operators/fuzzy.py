"""Edit-distance (fuzzy) joins without the cross product.

Candidate generation is the SymSpell deletion-neighborhood scheme:
every string emits itself plus every variant obtainable by deleting
up to ``max_dist`` characters. Two strings within Levenshtein
distance k always share a key in their delete-k neighborhoods
(a substitution at i deletes to the same string from both sides; an
insertion's neighborhood contains the shorter string), so recall is
exact; candidates are verified with the built-in ``levenshtein``, so
precision is exact too.

Scale shape: each side expands to O(len^k) short keys per row —
an equi-join on a 64-bit key hash, never an inequality or cross
join. The expansion is pure Catalyst (substr/transform/flatten);
the verify runs only on bucket collisions. For k=1 the expansion is
len+1 keys per row; k=2 is ~len^2/2, still fine for the
name/title/SKU-length strings entity resolution targets. Hot keys
(very common short strings) bound fanout by the duplicate count of
the string itself — dedup upstream if that is a concern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_keys(col: Column, max_dist: int) -> Column:
    """The delete-neighborhood of a string as an array of distinct
    64-bit key hashes: the string itself, all single deletions, and
    (k=2) all double deletions. Catalyst-only."""
    if max_dist not in (1, 2):
        raise ValueError("max_dist must be 1 or 2")

    def del1(s: Column) -> Column:
        # one array element per deletable position
        return F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(s), F.lit(1))),
            lambda i: F.concat(
                s.substr(F.lit(1), i - 1),
                s.substr(i + 1, F.greatest(F.length(s) - i, F.lit(0))),
            ),
        )

    keys = F.concat(F.array(col), del1(col))
    if max_dist == 2:
        keys = F.concat(keys, F.flatten(F.transform(del1(col), del1)))
    return F.array_distinct(F.transform(keys, lambda s: F.xxhash64(s)))


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str | None = None,
    max_dist: int = 1,
    left_id: str | None = None,
    right_id: str | None = None,
) -> DataFrame:
    """Pairs of rows whose join strings are within ``max_dist`` edits.

    Returns (l_id, r_id, l_val, r_val, dist); id columns default to
    the join columns themselves. Self-join dedup (l < r) is the
    caller's concern — this operator does not assume the inputs are
    the same table.
    """
    right_on = right_on or left_on
    l_id = left_id or left_on
    r_id = right_id or right_on
    lv = left.select(F.col(l_id).alias("l_id"), F.col(left_on).alias("l_val"))
    rv = right.select(F.col(r_id).alias("r_id"), F.col(right_on).alias("r_val"))
    # Shuffle discipline: the key join and the pair distinct move ONLY
    # (key, id) longs — a string emits len+1 keys, so carrying the
    # string itself through the exploded join would multiply shuffle
    # payload by the whole neighborhood. Values re-attach afterwards,
    # once per surviving candidate pair, for the exact verify.
    lk = lv.select(
        "l_id", F.explode(deletion_keys(F.col("l_val"), max_dist)).alias("__k__")
    )
    rk = rv.select(
        "r_id", F.explode(deletion_keys(F.col("r_val"), max_dist)).alias("__k__")
    )
    pairs = lk.join(rk, "__k__").select("l_id", "r_id").distinct()
    dist = F.levenshtein(F.col("l_val"), F.col("r_val"))
    return (
        pairs.join(lv, "l_id")
        .join(rv, "r_id")
        .withColumn("dist", dist)
        .filter(F.col("dist") <= max_dist)
        .select("l_id", "r_id", "l_val", "r_val", "dist")
    )
