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

try:  # Spark >= 4: VARIANT columns carry per-row dynamic JSON typing
    from pyspark.sql.types import VariantType
except ImportError:  # pragma: no cover - older Spark
    class VariantType:  # type: ignore[no-redef]
        pass

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


def _is_arr(c: str) -> Column:
    return F.schema_of_variant(F.col(_q(c))).startswith("ARRAY")


def _is_obj(c: str) -> Column:
    return F.schema_of_variant(F.col(_q(c))).startswith("OBJECT")


def _obj_prefix(c: str) -> str:
    """Flatten prefix for a variant column's object branch. The
    reference flattens an exploded element dict with the ARRAY PATH as
    prefix (``recs`` -> ``recs_p``, reference relationalize.py:95-119),
    and this engine parks exploded variant elements in ``{path}__val_``
    — so the element-column suffix is stripped before prefixing, while
    a top-level dynamic key keeps its own name (``b`` -> ``b_k``)."""
    suffix = f"{DELIM}{VAL}"  # "__val_"
    return c[: -len(suffix)] if c.endswith(suffix) else c


def _expand_variants(
    tdf: DataFrame,
    precomputed: dict[str, tuple[set, str | None]] | None = None,
) -> tuple[DataFrame, dict[str, bool], dict[str, set]]:
    """Per-row dynamic typing for VARIANT columns — the reference's
    row-walk semantics (reference relationalize.py:48-119) recovered
    on top of plan-time relationalize.

    A VARIANT column exists exactly where the corpus-wide schema merge
    conflicted (e.g. ``b`` is a list in one row, a scalar in another,
    an object in a third). The reference handles that per row; a
    static plan cannot — unless the plan itself is derived from the
    data. This function runs ONE combined aggregate job per nesting
    level over all variant columns at that level, computing per
    column: does any row hold an array / an object / a scalar, plus
    the merged schema of the object rows only. It then

    - flattens the object branch into ``{prefix}_{field}`` columns
      (conflicted fields come back as VARIANT and are handled by the
      next loop iteration — nesting depth bounds the iteration). When
      a generated name collides with a sibling column (real top-level
      ``b_x`` alongside variant ``b`` whose object rows carry field
      ``x``), the LATER field in schema order wins — the module-level
      flatten contract (last-write-wins, mirroring the reference's
      ``temp_d.update`` dict merge, reference relationalize.py:114-117;
      the reference's winner is row-dict key order, which a set-based
      engine canonicalizes to schema order). Pinned in tests/
      test_jsonl_pipeline.py::test_dynamic_flatten_collision_last_write_wins.
    - keeps the scalar + array branches in the original column (the
      array branch is split out by the caller's normal child-table
      machinery, elements staying VARIANT so grandchildren recurse),
    - drops the column entirely when no row holds a scalar or array
      (the reference's flatten consumes pure-object keys — no column
      remains).

    Returns the expanded frame, ``{column: has_array_branch}``, and
    ``{column: set of observed scalar reference tags}`` — the latter
    fed forward as inference hints so ``infer_and_convert`` does not
    re-scan for tags the branch analysis already observed (one
    aggregate per nesting level TOTAL for the dynamic pipeline).

    Scale shape: the aggregate is a scan + partial-agg (a bounded
    ``collect_set`` over the fixed tag vocabulary per column — arrays
    and objects classify to the constant markers ``arr``/``obj``, so
    heterogeneous nested shapes cannot blow the set up — plus the
    same ``schema_of_variant_agg`` the top-level pass uses for the
    object branch) and runs only when conflicted leaves exist at this
    level. The pipeline's persisted parsed input (sources/jsonl.py)
    keeps these passes from re-parsing JSON.

    ``precomputed`` (r12) maps first-level column names to an already
    observed ``(class set, object-branch schema string)`` pair — the
    dynamic JSON pipeline's fused top-level analysis job collects the
    identical quantities per top-level key (sources/jsonl.py:
    _analyze_top_level), so columns named by it skip this function's
    aggregate. It applies to the FIRST loop iteration only (deeper
    iterations see flatten-generated names the top-level pass cannot
    observe); a first-iteration column missing from it still goes
    through the aggregate.
    """
    from ..sources.jsonl import _cast_ddl, parse_variant_schema
    from .infer import ref_tag_from_schema_str

    arr_flags: dict[str, bool] = {}
    tag_sets: dict[str, set[str]] = {}
    analyzed: set[str] = set()
    while True:
        tdf = _flatten_structs(tdf)
        vcols = [
            f.name
            for f in tdf.schema.fields
            if isinstance(f.dataType, VariantType)
            and f.name != _ROW_KEY
            and f.name not in analyzed
        ]
        if not vcols:
            return tdf, arr_flags, tag_sets
        # class-set + object-branch schema per column: from the fused
        # top-level analysis when available (first iteration), else
        # one combined aggregate job over the remaining columns.
        per_col: dict[str, tuple[set, str | None]] = {}
        need = list(vcols)
        if precomputed:
            per_col = {c: precomputed[c] for c in vcols if c in precomputed}
            need = [c for c in vcols if c not in per_col]
            precomputed = None  # first iteration only
        if need:
            # one projected class per column (schema_of_variant computed
            # once per row), then one combined aggregate
            cls_cols = {}
            proj = [F.col(_q(f.name)) for f in tdf.schema.fields]
            for i, c in enumerate(need):
                sov = F.schema_of_variant(F.col(_q(c)))
                cls = (
                    F.when(sov.startswith("ARRAY"), F.lit("arr"))
                    .when(sov.startswith("OBJECT"), F.lit("obj"))
                    .otherwise(ref_tag_from_schema_str(sov))
                )
                cls_cols[c] = f"__cls{DELIM}{i}__"
                proj.append(cls.alias(cls_cols[c]))
            classed = tdf.select(*proj)
            aggs = []
            for i, c in enumerate(need):
                aggs.append(F.collect_set(cls_cols[c]).alias(f"__set{i}__"))
                aggs.append(
                    F.schema_of_variant_agg(
                        F.when(F.col(cls_cols[c]) == "obj", F.col(_q(c)))
                    ).alias(f"__os{i}__")
                )
            stats = classed.agg(*aggs).first()
            for i, c in enumerate(need):
                per_col[c] = (set(stats[f"__set{i}__"] or []), stats[f"__os{i}__"])

        keep: dict[str, Column] = {}
        obj_tmp: dict[str, str] = {}  # tmp struct col -> flatten prefix
        idx = {c: i for i, c in enumerate(vcols)}
        for f in tdf.schema.fields:
            c = f.name
            if c not in idx:
                keep[c] = F.col(_q(c))
                continue
            i = idx[c]
            observed = set(per_col[c][0])
            any_arr = "arr" in observed
            any_obj = "obj" in observed
            scalars = observed - {"arr", "obj"}
            any_scalar = bool(scalars)
            tag_sets[c] = scalars
            analyzed.add(c)
            if any_arr or any_scalar:
                # strip the object branch; arrays/scalars stay put
                keep[c] = F.when(~_is_obj(c), F.col(_q(c)))
                arr_flags[c] = any_arr
            if any_obj:
                node = parse_variant_schema(per_col[c][1])
                if node.kind == "object" and node.fields:
                    tmp = f"__vobj{DELIM}{i}__"
                    keep[tmp] = F.try_variant_get(
                        F.col(_q(c)), "$", _cast_ddl(node)
                    )
                    obj_tmp[tmp] = _obj_prefix(c)
        tdf = tdf.select(*[col.alias(n) for n, col in keep.items()])
        if obj_tmp:
            cols: dict[str, Column] = {}
            for f in tdf.schema.fields:
                if f.name in obj_tmp:
                    prefix = obj_tmp[f.name]
                    for sub in f.dataType.fields:  # type: ignore[union-attr]
                        flat = f"{prefix}{DELIM}{sub.name}"
                        cols[flat] = F.col(
                            f"{_q(f.name)}.{_q(sub.name)}"
                        ).alias(flat)
                else:
                    cols[f.name] = F.col(_q(f.name))
            tdf = tdf.select(*[c.alias(n) for n, c in cols.items()])


def relationalize(
    df: DataFrame,
    name: str,
    *,
    key_cols: Sequence[str] | None = None,
    rid_mode: Literal["hash", "uuid"] = "hash",
    max_depth: int = 24,
    infer_hints: dict | None = None,
    variant_stats: dict[str, tuple[set, str | None]] | None = None,
    variant_elem_stats: dict[str, tuple[set, str | None]] | None = None,
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
    infer_hints: optional caller-provided dict, filled with
        ``{table: {column: normalized tag}}`` for variant columns
        whose observed tags the per-level branch analysis already
        collected — feed to ``infer_and_convert(tag_hints=...)`` to
        skip its per-table tag scan (tables assembled by multi-parent
        union are omitted; they fall back to the scan).
    """
    if key_cols:
        row_key = F.to_json(F.struct(*[F.col(_q(c)) for c in key_cols]))
    else:
        row_key = F.to_json(F.struct(*[F.col(_q(c)) for c in df.columns]))

    out: dict[str, DataFrame] = {}
    hint_sets: dict[str, dict[str, set] | None] = {}
    _process(
        df.withColumn(_ROW_KEY, row_key), name, name, rid_mode, out, max_depth,
        hint_sets, variant_stats, variant_elem_stats,
    )
    if infer_hints is not None:
        from .. import types as T

        for t, cols in hint_sets.items():
            if cols is None:
                continue
            infer_hints[t] = {
                c: (T.normalize(s) if s else T.NONE) for c, s in cols.items()
            }
    return out


def _union_aligned(a: DataFrame, b: DataFrame) -> DataFrame:
    """``unionByName(allowMissingColumns=True)`` that first lifts
    columns whose types disagree between the two sides to VARIANT —
    the same branch-vs-branch type conflict the per-row dynamic walk
    creates (one parent's merged object schema saw only BIGINTs at a
    field, the other saw mixed types and kept VARIANT). The type
    inference step downstream tags variant scalars identically, so
    the lift is observationally free."""
    at = {f.name: f.dataType for f in a.schema.fields}
    bt = {f.name: f.dataType for f in b.schema.fields}
    conflicted = [c for c in at if c in bt and at[c] != bt[c]]
    if conflicted:
        a = a.withColumns(
            {c: F.col(_q(c)).cast("variant") for c in conflicted}
        )
        b = b.withColumns(
            {c: F.col(_q(c)).cast("variant") for c in conflicted}
        )
    return a.unionByName(b, allowMissingColumns=True)


def _process(
    tdf: DataFrame,
    table: str,
    root: str,
    rid_mode: str,
    out: dict[str, DataFrame],
    depth_left: int,
    hint_sets: dict[str, dict[str, set] | None],
    variant_stats: dict[str, tuple[set, str | None]] | None = None,
    variant_elem_stats: dict[str, tuple[set, str | None]] | None = None,
) -> None:
    if depth_left <= 0:
        raise ValueError(f"nesting exceeds max_depth while planning table {table!r}")
    tdf, var_arr, var_tags = _expand_variants(tdf, variant_stats)

    def _child_stats(p: str) -> dict[str, tuple[set, str | None]] | None:
        """Precomputed first-iteration stats for the child table of
        array path ``p``: the fused top-level analysis already
        aggregated the class set / object-branch schema of ``p``'s
        elements (its ``lvl=1`` rows), which is exactly what the
        child's ``{p}__val_`` variant column would re-scan for. Only
        top-level paths carry entries (the dict is consumed here and
        not forwarded); deeper levels take the aggregate path."""
        if variant_elem_stats is None or p not in variant_elem_stats:
            return None
        return {f"{p}{DELIM}{VAL}": variant_elem_stats[p]}

    array_paths = [
        f.name
        for f in tdf.schema.fields
        if isinstance(f.dataType, ArrayType) and f.name != _ROW_KEY
    ]
    # VARIANT columns whose rows include arrays: per-row dynamic
    # split-out (the reference's row-walk — a key can be a list in one
    # row and a scalar in another; the scalar rows keep their value,
    # the list rows get a rid into the child table).
    variant_array_paths = [c for c, has_arr in var_arr.items() if has_arr]
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
    link_paths = array_paths + map_paths + variant_array_paths

    # Materialize one rid column per array/map path on the working
    # frame so parent and child plans agree on the value. A variant
    # path gets its rid only on rows where the value actually IS an
    # array (other rows keep their scalar).
    rid_col = {p: f"__rid{DELIM}{i}__" for i, p in enumerate(link_paths)}
    for p in link_paths:
        if rid_mode == "hash":
            rid = _hash_rid(table, p)
        else:
            rid = F.concat(
                F.lit("R"), F.lit(DELIM), F.regexp_replace(F.expr("uuid()"), "-", "")
            )
        has_rid = _is_arr(p) if p in variant_array_paths else F.col(_q(p)).isNotNull()
        tdf = tdf.withColumn(rid_col[p], F.when(has_rid, rid))
    if rid_mode == "uuid" and link_paths:
        # uuid() is nondeterministic: parent and child are separate
        # actions, so pin the values once.
        tdf = tdf.cache()

    parent_cols = []
    for f in tdf.schema.fields:
        if f.name == _ROW_KEY or f.name in rid_col.values():
            continue
        if f.name in variant_array_paths:
            # dynamic column: list rows -> rid (as a VARIANT string so
            # the column stays one type), scalar rows keep their value
            # — the reference's row-walk output exactly; the rid later
            # lands in the choice column's `_str` lane like any other
            # observed string.
            ridv = F.parse_json(
                F.concat(F.lit('"'), F.col(_q(rid_col[f.name])), F.lit('"'))
            )
            parent_cols.append(
                F.when(F.col(_q(rid_col[f.name])).isNotNull(), ridv)
                .otherwise(F.col(_q(f.name)))
                .alias(f.name)
            )
        elif f.name in rid_col:
            parent_cols.append(F.col(_q(rid_col[f.name])).alias(f.name))
        else:
            parent_cols.append(F.col(_q(f.name)))
    parent_df = tdf.select(*parent_cols)
    if table in out:
        # The same flattened path can surface from different parents
        # (e.g. key "b_items" both as an object-branch field of a
        # top-level "b" object and as a field of "b"'s list elements
        # — both name the child table {root}_b_items). The reference
        # APPENDS to one output file per table name (reference
        # relationalize.py:57-66, outputs keyed by name), so
        # same-named tables union; missing columns null-fill, exactly
        # like the reference's absent keys. Inference hints for such
        # multi-parent tables are dropped (union type-lifting can turn
        # typed columns variant); they fall back to the tag scan.
        out[table] = _union_aligned(out[table], parent_df)
        hint_sets[table] = None
    else:
        out[table] = parent_df
        present = {f.name for f in parent_df.schema.fields}
        hint_sets[table] = {
            c: (set(scal) | ({"str"} if var_arr.get(c) else set()))
            for c, scal in var_tags.items()
            if c in present
        }

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
            # A user field named `_rid_`/`_index_` inside a list-element
            # dict would flatten to exactly the generated child columns
            # (`{p}__rid_`/`{p}__index_`). The reference resolves this
            # by mutating its injected keys INTO the element dict
            # (reference relationalize.py:82-93 — last write wins, so
            # the generated values overwrite the user's); mirror that
            # by dropping the colliding user fields rather than
            # failing analysis with an ambiguous reference.
            elem_cols = [
                F.col(f"{_q(_ELEM)}.{_q(sub.name)}").alias(f"{p}{DELIM}{sub.name}")
                for sub in elem_type.fields
                if f"{p}{DELIM}{sub.name}" not in (rid_name, index_name)
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
        _process(
            child, f"{root}{DELIM}{p}", root, rid_mode, out, depth_left - 1,
            hint_sets, _child_stats(p),
        )

    for p in variant_array_paths:
        rid_name = f"{p}{DELIM}{RID}"
        index_name = f"{p}{DELIM}{INDEX}"
        exploded = tdf.where(_is_arr(p)).select(
            F.col(_q(rid_col[p])).alias(rid_name),
            F.posexplode(
                F.try_variant_get(F.col(_q(p)), "$", "array<variant>")
            ).alias(index_name, _ELEM),
        )
        child_key = F.concat_ws(
            ":", F.col(_q(rid_name)), F.col(_q(index_name)).cast("string")
        )
        # elements stay VARIANT: the child's _expand_variants spreads
        # object elements into `{p}_{field}` columns and keeps
        # scalar/array elements in `{p}__val_` — per-row, like the
        # reference's recursion.
        child = exploded.select(
            F.col(_q(_ELEM)).alias(f"{p}{DELIM}{VAL}"),
            F.col(_q(rid_name)),
            F.col(_q(index_name)),
            child_key.alias(_ROW_KEY),
        )
        _process(
            child, f"{root}{DELIM}{p}", root, rid_mode, out, depth_left - 1,
            hint_sets, _child_stats(p),
        )

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
        _process(child, f"{root}{DELIM}{p}", root, rid_mode, out, depth_left - 1, hint_sets)
