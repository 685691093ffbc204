"""Type-faithful JSONL ingestion via Spark VARIANT.

The reference streams raw JSON objects and distinguishes int/float/
bool/str per *row* (reference schema.py:304-319). ``spark.read.json``
would unify mixed-type keys to string and lose that, so this module
reads lines as text, parses them to VARIANT (JVM-side, type-
preserving), computes the merged structural schema in one pass with
``schema_of_variant_agg``, and casts to a concrete struct in which
conflicted or all-null leaves stay VARIANT. The existing
:func:`relationalize` then splits out tables, and
:func:`infer_and_convert` resolves the VARIANT leaves into choice
columns — the full reference pipeline (relationalize -> Schema ->
convert, reference README.md:50-95) as three Spark jobs and zero
per-row Python.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.infer import infer_and_convert
from ..operators.relationalize import relationalize
from ..schema import Schema


def read_jsonl_variant(
    spark: SparkSession, path: str, column: str = "v"
) -> DataFrame:
    """One VARIANT column per JSONL line; blank lines dropped."""
    return (
        spark.read.text(path)
        .filter(F.length(F.trim("value")) > 0)
        .select(F.parse_json("value").alias(column))
    )


# -- merged-schema string parser --------------------------------------------
# schema_of_variant_agg returns e.g.
#   OBJECT<a: VARIANT, `a b`: BIGINT, arr: ARRAY<OBJECT<k: DOUBLE>>>
# Leaves are Spark DDL type names (plus OBJECT/VARIANT extensions).


@dataclass
class VNode:
    kind: str  # "object" | "array" | "leaf"
    leaf_type: str = ""
    fields: dict[str, "VNode"] = field(default_factory=dict)
    element: "VNode | None" = None


def parse_variant_schema(s: str) -> VNode:
    pos = 0

    def parse_type() -> VNode:
        nonlocal pos
        if s.startswith("OBJECT<", pos):
            pos += len("OBJECT<")
            node = VNode("object")
            while s[pos] != ">":
                name = parse_name()
                assert s.startswith(": ", pos), f"expected ': ' at {pos} in {s!r}"
                pos += 2
                node.fields[name] = parse_type()
                if s.startswith(", ", pos):
                    pos += 2
            pos += 1
            return node
        if s.startswith("ARRAY<", pos):
            pos += len("ARRAY<")
            node = VNode("array", element=parse_type())
            assert s[pos] == ">", f"expected '>' at {pos} in {s!r}"
            pos += 1
            return node
        # leaf: runs to the next top-level ',' or '>'; may itself
        # contain angle-free parens like DECIMAL(21,1).
        start = pos
        depth = 0
        while pos < len(s):
            ch = s[pos]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif depth == 0 and ch in ",>":
                break
            pos += 1
        return VNode("leaf", leaf_type=s[start:pos].strip())

    def parse_name() -> str:
        nonlocal pos
        if s[pos] == "`":
            end = pos + 1
            out = []
            while True:
                if s[end] == "`":
                    if end + 1 < len(s) and s[end + 1] == "`":
                        out.append("`")
                        end += 2
                        continue
                    break
                out.append(s[end])
                end += 1
            name = "".join(out)
            pos = end + 1
            return name
        end = s.index(":", pos)
        name = s[pos:end]
        pos = end
        return name

    node = parse_type()
    assert pos == len(s), f"trailing content at {pos} in {s!r}"
    return node


def _cast_ddl(node: VNode) -> str:
    """DDL for the variant->struct cast: conflicted (VARIANT) and
    all-null (VOID) leaves stay VARIANT; everything else keeps its
    type.

    Fractional-numeric leaves (DECIMAL/DOUBLE/FLOAT) ALSO stay
    VARIANT: ``schema_of_variant_agg`` numerically merges BIGINT with
    DECIMAL (values 1 and 2.5 -> DECIMAL(21,1)), so a typed cast here
    would silently coerce mixed int/float keys to DOUBLE and the
    reference's c-float-int choice column could never arise. Keeping
    them VARIANT routes them through the per-row tag aggregation in
    operators/infer.py, which emits the choice split for genuinely
    mixed keys and a plain DOUBLE column for all-float keys — exactly
    the reference's behavior (ref schema.py:194-257)."""
    if node.kind == "object":
        parts = []
        for name, child in node.fields.items():
            quoted = "`" + name.replace("`", "``") + "`"
            parts.append(f"{quoted}: {_cast_ddl(child)}")
        return "struct<" + ", ".join(parts) + ">"
    if node.kind == "array":
        return f"array<{_cast_ddl(node.element)}>"
    t = node.leaf_type.upper()
    if t in ("VARIANT", "VOID") or t.startswith("DECIMAL") or t in ("DOUBLE", "FLOAT"):
        return "variant"
    return node.leaf_type.lower()


def merged_variant_schema(df: DataFrame, column: str = "v") -> VNode:
    merged = df.agg(F.schema_of_variant_agg(column).alias("s")).collect()[0].s
    return parse_variant_schema(merged)


#: sentinel key injected for rows whose top level is not an object (and
#: not VOID / SQL NULL, which the global schema merge absorbs): its
#: presence in the grouped analysis routes the corpus to the legacy
#: whole-object merge for the exact error. The leading NUL cannot come
#: out of ordinary data without colliding ONLY into that fallback.
_NONOBJECT_KEY = "\x00__nonobject__"
_NONOBJECT_JSON = '{"\\u0000__nonobject__": null}'


def _analyze_top_level(
    df: DataFrame, column: str = "v"
) -> tuple[
    VNode,
    dict[str, tuple[set, str | None]] | None,
    dict[str, tuple[set, str | None]] | None,
]:
    """ONE eager job for the dynamic pipeline's whole top-level
    analysis (r12; guide §2.4 — don't run two jobs where one
    suffices): ``variant_explode`` enumerates every row's top-level
    fields and a single grouped aggregation computes, per key,

    - the merged value schema (``schema_of_variant_agg`` over exactly
      the values the whole-object merge folds for that field — absent
      fields contribute nothing in both formulations, so the per-key
      merge IS the global merge's field type),
    - the observed class set (arr / obj / scalar reference tags) and
      the object-branch merged schema — precisely what
      ``_expand_variants`` would re-scan for at nesting level 1,
    - (level 2, same job) the identical class-set/object-schema pair
      for the ELEMENTS of array-classed values, grouped under
      ``lvl=1`` — what each first-level array child table's
      ``{key}__val_`` variant column would otherwise re-scan for.
      The ``(lvl, key)`` grouping key keeps the two levels apart
      structurally (no name mangling, no collision risk).

    This replaces the sequential driver-blocking jobs the pipeline
    used to run (whole-object ``schema_of_variant_agg``, the level-1
    branch analysis over the cast frame, and one branch analysis per
    first-level array child table): one pass over the parse, at any
    scale.

    The reassembled tree lists fields in UTF-16 code-unit order —
    ``schema_of_variant_agg``'s own field ordering (Java string sort;
    verified against OBJECT merges containing non-BMP keys) — so the
    cast DDL, and therefore every downstream column order, is
    bit-identical to the legacy path's.

    Name-lookup soundness (both returned dicts are consulted by
    COLUMN name downstream): a flattened struct-derived column can
    collide with a plain top-level key of the same name, but every
    struct parent generating that name is a strict PREFIX of it, and
    prefixes sort first in the UTF-16 field order the cast DDL fixes
    — so the plain key appears later in schema order and
    ``_flatten_structs``' last-write-wins always keeps the PLAIN
    key's column, which is exactly the entry these dicts hold. A
    struct-derived name with no plain twin is simply absent from the
    dicts and takes the aggregate path.

    Degenerate corpora (any non-object top level, or zero observed
    fields: empty/all-null/all-empty-object inputs) fall back to the
    legacy whole-object merge so error behavior is exactly unchanged.
    """
    from ..operators.infer import ref_tag_from_schema_str

    spark = df.sparkSession
    col = F.col("`" + column.replace("`", "``") + "`")
    sov = F.schema_of_variant(col)
    # objects explode to their fields; VOID / SQL-NULL rows explode to
    # nothing (the global merge absorbs both); anything else injects
    # the sentinel field so the fallback (and its exact error) fires.
    keep = sov.isNull() | sov.startswith("OBJECT") | (sov == "VOID")
    w = F.when(keep, col).otherwise(F.parse_json(F.lit(_NONOBJECT_JSON)))
    kv = (
        df.select(w.alias("__w__"))
        .lateralJoin(spark.tvf.variant_explode(F.col("__w__").outer()))
        .select("key", "value")
    )
    sval = F.schema_of_variant("value")
    lvl0 = kv.select(F.lit(0).alias("lvl"), "key", "value")
    elems = (
        kv.where(sval.startswith("ARRAY"))
        .select(F.col("key").alias("__k__"), F.col("value").alias("__a__"))
        .lateralJoin(spark.tvf.variant_explode(F.col("__a__").outer()))
        .select(F.lit(1).alias("lvl"), F.col("__k__").alias("key"), "value")
    )
    cls = (
        F.when(F.schema_of_variant("value").startswith("ARRAY"), F.lit("arr"))
        .when(F.schema_of_variant("value").startswith("OBJECT"), F.lit("obj"))
        .otherwise(ref_tag_from_schema_str(F.schema_of_variant("value")))
    )
    rows = (
        lvl0.unionByName(elems)
        .groupBy("lvl", "key")
        .agg(
            F.schema_of_variant_agg("value").alias("vs"),
            F.collect_set(cls).alias("cset"),
            F.schema_of_variant_agg(F.when(cls == "obj", F.col("value"))).alias(
                "os"
            ),
        )
        .collect()
    )
    fields = [r for r in rows if r["lvl"] == 0]
    if not fields or any(r["key"] == _NONOBJECT_KEY for r in fields):
        return merged_variant_schema(df, column), None, None
    tree = VNode("object")
    for r in sorted(fields, key=lambda r: r["key"].encode("utf-16-be")):
        tree.fields[r["key"]] = parse_variant_schema(r["vs"])
    stats = {r["key"]: (set(r["cset"] or []), r["os"]) for r in fields}
    elem_stats = {
        r["key"]: (set(r["cset"] or []), r["os"]) for r in rows if r["lvl"] == 1
    }
    return tree, stats, elem_stats


@dataclass
class RelationalizedJson:
    """Output of the end-to-end dynamic pipeline: one flat, converted
    DataFrame per discovered table plus its choice Schema."""

    tables: dict[str, DataFrame]
    schemas: dict[str, Schema]
    _cached_input: DataFrame | None = None

    def __getitem__(self, name: str) -> DataFrame:
        return self.tables[name]

    def __iter__(self):
        return iter(self.tables)

    def unpersist(self) -> None:
        """Release the cached parsed-variant input (call after the
        output tables have been written; further reads of them would
        re-parse the JSON)."""
        if self._cached_input is not None:
            self._cached_input.unpersist()


def relationalize_json(
    source: DataFrame | str,
    name: str,
    *,
    spark: SparkSession | None = None,
    key_cols: list[str] | None = None,
    convert: bool = True,
    persist: bool = True,
    rid_mode: str = "hash",
) -> RelationalizedJson:
    """Full dynamic pipeline: JSONL path (or variant DataFrame) ->
    rid-linked flat tables with choice columns resolved.

    Jobs: ONE scan computes the merged schema, the top-level
    choice/branch tags AND the first-level array children's element
    tags together (``_analyze_top_level``, r12); deeper nesting
    levels and deeper child tables pay one further scan per level
    (skipped when a table has no conflicted leaves and ``convert``
    handling is trivial). All per-row work is JVM-side variant casts
    and projections.

    The pipeline is inherently multi-pass (schema union needs every
    row before the typed cast exists — same reason the reference
    iterates the file twice, ref README.md:60-77), so by default the
    parsed-variant input is persisted MEMORY_AND_DISK for the
    analysis passes and left cached for the caller's materialization:
    the JSON parse is paid once, not once per pass. Call
    ``.unpersist()`` on the result after writing the tables, or pass
    ``persist=False`` to trade repeated parsing for zero cache
    footprint (the right call when the cluster is memory-tight and
    the source is a cheap columnar scan).
    """
    if isinstance(source, str):
        if spark is None:
            raise ValueError("pass spark= when source is a path")
        vdf = read_jsonl_variant(spark, source)
    else:
        vdf = source

    cached = None
    if persist:
        from pyspark import StorageLevel

        vdf = vdf.persist(StorageLevel.MEMORY_AND_DISK)
        cached = vdf

    [vcol] = vdf.columns
    tree, level1_stats, elem_stats = _analyze_top_level(vdf, vcol)
    if tree.kind != "object":
        raise ValueError(
            f"top-level JSON must be objects, got {tree.kind} ({tree.leaf_type})"
        )

    # JSON keys are case-sensitive (the reference's Python dicts treat
    # "col" and "Col" as distinct; its drop_duplicate_columns exists
    # precisely to clean such pairs *later*). Spark resolves column
    # names case-insensitively by default and would throw
    # AMBIGUOUS_REFERENCE while we build the plans, so flip the session
    # to case-sensitive for the (eager) analysis phase and restore.
    session = vdf.sparkSession
    prev_case = session.conf.get("spark.sql.caseSensitive")
    session.conf.set("spark.sql.caseSensitive", "true")
    try:
        typed = vdf.select(
            F.try_variant_get(F.col(vcol), "$", _cast_ddl(tree)).alias("__r__")
        ).select("__r__.*")

        hints: dict[str, dict[str, str]] = {}
        raw_tables = relationalize(
            typed, name, key_cols=key_cols, rid_mode=rid_mode, infer_hints=hints,
            variant_stats=level1_stats, variant_elem_stats=elem_stats,
        )
        tables: dict[str, DataFrame] = {}
        schemas: dict[str, Schema] = {}
        for tname, tdf in raw_tables.items():
            if convert:
                # branch-analysis tag hints make inference scan-free
                # for single-parent tables (see infer_and_convert)
                tables[tname], schemas[tname] = infer_and_convert(
                    tdf, tag_hints=hints.get(tname)
                )
            else:
                # untyped output still needs REAL observed tags (a key
                # conflicted within this frame must record e.g.
                # c-int-str, not a raw-variant placeholder) so that
                # downstream Schema.merge — the streaming demux's
                # cross-batch accumulation — composes correctly.
                from ..operators.infer import infer_schema

                tables[tname], schemas[tname] = tdf, infer_schema(
                    tdf, tag_hints=hints.get(tname)
                )
    finally:
        session.conf.set("spark.sql.caseSensitive", prev_case)
    return RelationalizedJson(tables, schemas, _cached_input=cached)
