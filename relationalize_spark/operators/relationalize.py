"""Core relationalize: nested DataFrame -> flat, rid-linked tables.

Spark-first re-expression of the reference transform (reference
relationalize/relationalize.py:48-130). The reference walks *rows*
recursively in Python; here we walk the *schema* at plan time and emit
one declarative plan per output table — pure column projections plus
``posexplode`` — so Catalyst/Tungsten own execution, predicate
pushdown, and whole-stage codegen, and no Python runs per row.

Semantics preserved (verified against reference test cases, see
tests/test_relationalize.py):

- struct fields flatten to ``{parent}_{child}`` columns
  (reference relationalize.py:95-119; delimiter ``_``).
- every array path ``p`` becomes a child table ``{root}_{p}`` whose
  rows carry ``{p}__rid_`` (FK to the parent cell), ``{p}__index_``
  (0-based position) and, for scalar/array elements, ``{p}__val_``
  (reference relationalize.py:82-93, 9-13).
- the parent cell is replaced by the generated rid; an *empty* array
  keeps its rid with zero child rows (``posexplode``, not
  ``posexplode_outer`` — reference relationalize.py:104-111), while a
  *null* array yields a null parent cell and no child rows.
- arrays of arrays chain through ``__val_`` paths into grandchild
  tables (reference test/relationalize.test.py:111-184).
- flattening collisions (``{"a": {"b": 1}}`` vs ``{"a_b": 2}``) are
  last-write-wins, matching the reference's dict merge
  (reference relationalize.py:113-117).

Spark-native extension (documented): ``MapType`` columns — the
dynamic-keys JSON object, which the reference's dict model never
distinguishes from structs — split out like arrays into a child
table of ``{p}__rid_``/``{p}__index_``/``{p}__key_``/``{p}__val_``
rows via ``map_entries``; nested struct/array/map values keep
recursing. A null map yields a null parent cell and no child rows;
an empty map keeps its rid with zero child rows.

Deviation (documented): rids are ``R_`` + 32 hex like the reference's
``R_<uuid4.hex>`` (reference relationalize.py:125-130), but by default
they are *deterministic* — ``md5(table, path, row-key)`` — because a
nondeterministic uuid() is recomputed differently per Spark task retry
and would break parent/child linkage without forcing a full
materialization barrier. ``rid_mode="uuid"`` restores reference
behavior and transparently caches the intermediate.
"""

from __future__ import annotations

from typing import Literal, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, MapType, StructType

DELIM = "_"
RID = f"{DELIM}rid{DELIM}"      # column suffix: {path}__rid_
VAL = f"{DELIM}val{DELIM}"      # column suffix: {path}__val_
INDEX = f"{DELIM}index{DELIM}"  # column suffix: {path}__index_
KEY = f"{DELIM}key{DELIM}"      # column suffix: {path}__key_ (maps)

_ROW_KEY = "__relationalize_row_key__"
_ELEM = "__relationalize_elem__"


def _q(name: str) -> str:
    """Backtick-quote a column name for use in F.col paths."""
    return "`" + name.replace("`", "``") + "`"


def _flatten_structs(df: DataFrame) -> DataFrame:
    """Expand every StructType column into ``{parent}_{child}`` columns,
    repeating until no structs remain. Later names win on collision."""
    while any(
        isinstance(f.dataType, StructType)
        for f in df.schema.fields
        if f.name != _ROW_KEY
    ):
        cols: dict[str, Column] = {}
        for f in df.schema.fields:
            if f.name == _ROW_KEY or not isinstance(f.dataType, StructType):
                cols[f.name] = F.col(_q(f.name))
                continue
            for sub in f.dataType.fields:
                flat = f"{f.name}{DELIM}{sub.name}"
                cols[flat] = F.col(f"{_q(f.name)}.{_q(sub.name)}").alias(flat)
        df = df.select(*[c.alias(n) for n, c in cols.items()])
    return df


def _hash_rid(table: str, path: str) -> Column:
    seed = F.concat_ws("\x1f", F.lit(table), F.lit(path), F.col(_ROW_KEY))
    return F.concat(F.lit("R"), F.lit(DELIM), F.md5(seed))


def relationalize(
    df: DataFrame,
    name: str,
    *,
    key_cols: Sequence[str] | None = None,
    rid_mode: Literal["hash", "uuid"] = "hash",
    max_depth: int = 24,
) -> dict[str, DataFrame]:
    """Flatten ``df`` into a dict of flat DataFrames keyed by table name.

    Parameters
    ----------
    df: input with arbitrarily nested struct/array columns.
    name: root table name; child tables are ``{name}_{path}``.
    key_cols: columns that uniquely identify a row. Used to derive
        deterministic rids. Defaults to *all* top-level columns
        serialized as JSON — exact duplicate rows would then share
        rids (children join to both); pass a real key at scale.
    rid_mode: ``"hash"`` (deterministic, default) or ``"uuid"``
        (reference-exact randomness; forces a cache of each level).
    max_depth: guard on schema nesting depth.
    """
    if key_cols:
        row_key = F.to_json(F.struct(*[F.col(_q(c)) for c in key_cols]))
    else:
        row_key = F.to_json(F.struct(*[F.col(_q(c)) for c in df.columns]))

    out: dict[str, DataFrame] = {}
    _process(df.withColumn(_ROW_KEY, row_key), name, name, rid_mode, out, max_depth)
    return out


def _process(
    tdf: DataFrame,
    table: str,
    root: str,
    rid_mode: str,
    out: dict[str, DataFrame],
    depth_left: int,
) -> None:
    if depth_left <= 0:
        raise ValueError(f"nesting exceeds max_depth while planning table {table!r}")
    tdf = _flatten_structs(tdf)

    array_paths = [
        f.name
        for f in tdf.schema.fields
        if isinstance(f.dataType, ArrayType) and f.name != _ROW_KEY
    ]
    # Spark-native extension (the reference's JSON model has no maps):
    # a MapType column — the dynamic-keys object — splits out exactly
    # like an array, into a child table of (rid, index, key, value)
    # rows via map_entries. Nested struct/array/map VALUES keep
    # recursing through the normal machinery.
    map_paths = [
        f.name
        for f in tdf.schema.fields
        if isinstance(f.dataType, MapType) and f.name != _ROW_KEY
    ]
    link_paths = array_paths + map_paths

    # Materialize one rid column per array/map path on the working
    # frame so parent and child plans agree on the value.
    rid_col = {p: f"__rid{DELIM}{i}__" for i, p in enumerate(link_paths)}
    for p in link_paths:
        if rid_mode == "hash":
            rid = _hash_rid(table, p)
        else:
            rid = F.concat(
                F.lit("R"), F.lit(DELIM), F.regexp_replace(F.expr("uuid()"), "-", "")
            )
        tdf = tdf.withColumn(
            rid_col[p], F.when(F.col(_q(p)).isNotNull(), rid)
        )
    if rid_mode == "uuid" and link_paths:
        # uuid() is nondeterministic: parent and child are separate
        # actions, so pin the values once.
        tdf = tdf.cache()

    parent_cols = []
    for f in tdf.schema.fields:
        if f.name == _ROW_KEY or f.name in rid_col.values():
            continue
        if f.name in rid_col:
            parent_cols.append(F.col(_q(rid_col[f.name])).alias(f.name))
        else:
            parent_cols.append(F.col(_q(f.name)))
    out[table] = tdf.select(*parent_cols)

    for p in array_paths:
        elem_type = next(
            f.dataType.elementType for f in tdf.schema.fields if f.name == p
        )
        rid_name = f"{p}{DELIM}{RID}"
        index_name = f"{p}{DELIM}{INDEX}"
        exploded = (
            tdf.where(F.col(_q(p)).isNotNull())
            .select(
                F.col(_q(rid_col[p])).alias(rid_name),
                F.posexplode(F.col(_q(p))).alias(index_name, _ELEM),
            )
        )
        child_key = F.concat_ws(
            ":", F.col(_q(rid_name)), F.col(_q(index_name)).cast("string")
        )
        if isinstance(elem_type, StructType):
            elem_cols = [
                F.col(f"{_q(_ELEM)}.{_q(sub.name)}").alias(f"{p}{DELIM}{sub.name}")
                for sub in elem_type.fields
            ]
        else:
            # scalar or nested array element: value column {p}__val_;
            # a nested array recurses into a grandchild table.
            elem_cols = [F.col(_q(_ELEM)).alias(f"{p}{DELIM}{VAL}")]
        child = exploded.select(
            *elem_cols,
            F.col(_q(rid_name)),
            F.col(_q(index_name)),
            child_key.alias(_ROW_KEY),
        )
        _process(child, f"{root}{DELIM}{p}", root, rid_mode, out, depth_left - 1)

    for p in map_paths:
        rid_name = f"{p}{DELIM}{RID}"
        index_name = f"{p}{DELIM}{INDEX}"
        exploded = tdf.where(F.col(_q(p)).isNotNull()).select(
            F.col(_q(rid_col[p])).alias(rid_name),
            F.posexplode(F.map_entries(F.col(_q(p)))).alias(index_name, _ELEM),
        )
        child_key = F.concat_ws(
            ":", F.col(_q(rid_name)), F.col(_q(index_name)).cast("string")
        )
        child = exploded.select(
            F.col(f"{_q(_ELEM)}.key").alias(f"{p}{DELIM}{KEY}"),
            F.col(f"{_q(_ELEM)}.value").alias(f"{p}{DELIM}{VAL}"),
            F.col(_q(rid_name)),
            F.col(_q(index_name)),
            child_key.alias(_ROW_KEY),
        )
        _process(child, f"{root}{DELIM}{p}", root, rid_mode, out, depth_left - 1)
