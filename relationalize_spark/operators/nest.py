"""Unrelationalize: rebuild nested arrays/maps from rid-linked tables.

Inverse of :func:`relationalize_spark.operators.relationalize.relationalize`
for the array/map split-outs. The reference library is one-way — it
relies on the downstream warehouse to join child tables back through
the rid/index columns (reference README.md:107-119) — but a complete
engine needs the return path: exporting curated data back to nested
JSON/parquet for training-data delivery is exactly the shape LLM
pipelines ship.

Semantics
---------
For a table dict produced by ``relationalize(df, name)``:

- every child table ``{name}_{p}`` is folded back into an array (or
  map) column ``p`` on its parent, elements ordered by
  ``{p}__index_``;
- struct-element children (columns ``{p}_{sub}``) rebuild
  ``array<struct<sub,...>>`` with the ``{p}_`` prefix stripped;
- scalar children (column ``{p}__val_``) rebuild ``array<val>``;
- map children (``{p}__key_``/``{p}__val_``) rebuild ``map<k,v>``
  via ``map_from_entries``;
- grandchild tables fold first (depth-first), so arrays-of-arrays
  chain back through ``__val_`` exactly as they were split;
- a parent cell holding a rid with zero child rows becomes an
  *empty* array/map; a null parent cell stays null — matching the
  forward transform's empty-vs-null rule
  (reference relationalize.py:104-111).

Struct *flattening* is NOT inverted: ``{"a": {"b": 1}}`` flattened to
column ``a_b`` is indistinguishable from a source column named
``a_b`` (the reference has the same ambiguity, relationalize.py:101),
so flattened names stay flat.

Scale shape: one groupBy per child table (shuffle on rid — the same
key the forward explode partitioned by, so AQE coalesces small
sides), then a join back on rid. The parent side never shuffles for
broadcast-sized children; no per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from relationalize_spark.operators.relationalize import DELIM, INDEX, KEY, RID, VAL


def _q(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


def _direct_children(tables: dict[str, DataFrame], root: str, table: str) -> list[str]:
    """Paths ``p`` such that ``{root}_{p}`` is a direct child of ``table``:
    ``p`` is a column of ``table`` and the child carries ``{p}__rid_``."""
    parent_cols = set(tables[table].columns)
    out = []
    for k, df in tables.items():
        if k == table or not k.startswith(root + DELIM):
            continue
        p = k[len(root) + len(DELIM):]
        if p in parent_cols and f"{p}{DELIM}{RID}" in df.columns:
            out.append(p)
    return out


def _fold_child(child: DataFrame, p: str) -> tuple[DataFrame, bool]:
    """Aggregate one (already internally-nested) child table into
    ``(rid, value)`` rows where value is the rebuilt array or map.
    Returns (aggregated frame, is_map)."""
    rid_name = f"{p}{DELIM}{RID}"
    index_name = f"{p}{DELIM}{INDEX}"
    key_name = f"{p}{DELIM}{KEY}"
    val_name = f"{p}{DELIM}{VAL}"

    is_map = key_name in child.columns
    elem_cols = [c for c in child.columns if c not in (rid_name, index_name)]

    if is_map:
        entry: Column = F.struct(
            F.col(_q(key_name)).alias("key"), F.col(_q(val_name)).alias("value")
        )
    elif elem_cols == [val_name]:
        entry = F.col(_q(val_name))
    else:
        prefix = f"{p}{DELIM}"
        entry = F.struct(
            *[
                F.col(_q(c)).alias(c[len(prefix):] if c.startswith(prefix) else c)
                for c in elem_cols
            ]
        )

    # Order by the forward transform's position column: collect
    # (index, elem) pairs, sort on index, project the elem back out.
    # Default array_sort (native struct field-order compare) rather
    # than a comparator lambda: the index leads the struct and is
    # unique within a rid, so the ordering is identical, but the
    # native compare stays inside codegen instead of invoking an
    # interpreted lambda per comparison.
    pair = F.struct(F.col(_q(index_name)).alias("i"), entry.alias("e"))
    agg = child.groupBy(F.col(_q(rid_name)).alias("__rid__")).agg(
        F.transform(
            F.array_sort(F.collect_list(pair)),
            lambda x: x.e,
        ).alias("__arr__")
    )
    if is_map:
        agg = agg.select("__rid__", F.map_from_entries("__arr__").alias("__arr__"))
    return agg, is_map


def unrelationalize(
    tables: dict[str, DataFrame], name: str, *, _table: str | None = None
) -> DataFrame:
    """Fold a ``relationalize`` output dict back into one nested frame.

    Parameters
    ----------
    tables: the dict returned by ``relationalize`` (or any tables
        following its naming conventions).
    name: root table name used in the forward transform.
    """
    table = _table or name
    df = tables[table]
    for p in _direct_children(tables, name, table):
        # Depth-first: fold the child's own children before folding it.
        folded_child = unrelationalize(tables, name, _table=f"{name}{DELIM}{p}")
        agg, _ = _fold_child(folded_child, p)
        arr_type = agg.schema["__arr__"].dataType
        # Merge-hinted: the folded-child aggregate is proportional to
        # the parent table (one row per non-empty array cell); a
        # static broadcast promotion would OOM at scale.
        df = (
            df.join(agg.hint("merge"), df[_q(p)] == agg["__rid__"], "left")
            .withColumn(
                p,
                F.when(F.col(_q(p)).isNull(), F.lit(None).cast(arr_type)).otherwise(
                    F.coalesce(F.col("__arr__"), _empty_of(arr_type))
                ),
            )
            .drop("__rid__", "__arr__")
        )
    return df


def isinstance_map(dt) -> bool:
    from pyspark.sql.types import MapType

    return isinstance(dt, MapType)


def _empty_of(dt) -> Column:
    """A typed empty array/map literal matching ``dt``."""
    if isinstance_map(dt):
        return F.map_from_arrays(
            F.array().cast(f"array<{dt.keyType.simpleString()}>"),
            F.array().cast(f"array<{dt.valueType.simpleString()}>"),
        )
    return F.array().cast(dt)
