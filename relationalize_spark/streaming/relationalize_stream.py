"""Structured Streaming surface.

The reference's single-pass design (write rows as they stream,
reference relationalize.py:54-63) maps to Structured Streaming
directly:

- ``relationalize_stream``: the multi-output demux. A streaming query
  can only have one sink, so the dynamic table fan-out runs inside
  ``foreachBatch``: each micro-batch is relationalized (same plan-time
  operator as batch — schema comes from the stream's fixed schema) and
  each derived table is handed to a user sink callback, mirroring the
  reference's ``create_output`` factory hook (relationalize.py:29).
- ``windowed_counts``: watermarked tumbling-window aggregation — the
  streaming analog of q17_events_hourly; late rows beyond the
  watermark are dropped, state is bounded.
- ``sessionize_stream``: gap-based sessions via the native
  ``session_window`` (stateful, watermark-bounded) — the streaming
  analog of q18_sessionization without custom state handling.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as ST
from pyspark.sql.streaming import DataStreamWriter

from ..operators.relationalize import relationalize
from ..schema import Schema

TableSink = Callable[[str, DataFrame, int], None]


# -- Hadoop-FS text helpers (work on local / HDFS / s3a alike) ---------------

def _fs_for(spark: SparkSession, path_str: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path_str)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p


def _fs_write_text(spark: SparkSession, path_str: str, content: str) -> None:
    """Atomic-replace text write: write ``{path}.tmp`` fully, then
    swap it in. A direct ``fs.create(p, True)`` truncates the existing
    file before the new bytes land, so a crash mid-write would destroy
    the previous (still valid) content — for ``_schema.json`` that
    would break the "on-disk schema covers on-disk rows" invariant.
    With the tmp dance every crash window leaves a recoverable state:
    mid-tmp-write -> old file intact; between delete and rename -> the
    complete tmp survives and ``_recover`` finishes the swap."""
    fs, p = _fs_for(spark, path_str)
    tmp_str = path_str + ".tmp"
    _, tmp = _fs_for(spark, tmp_str)
    out = fs.create(tmp, True)  # creates parent dirs, overwrites
    try:
        out.write(content.encode("utf-8"))
    finally:
        out.close()
    # HDFS/local rename refuses to overwrite: delete then rename.
    if fs.exists(p):
        fs.delete(p, False)
    if not fs.rename(tmp, p):
        raise RuntimeError(f"rename {tmp_str} -> {path_str} failed")


def _fs_read_text(spark: SparkSession, path_str: str) -> str | None:
    fs, p = _fs_for(spark, path_str)
    if not fs.exists(p):
        return None
    stm = fs.open(p)
    try:
        return spark._jvm.org.apache.commons.io.IOUtils.toString(stm, "UTF-8")
    finally:
        stm.close()


def _fs_list_dirs(spark: SparkSession, path_str: str) -> list[str]:
    fs, p = _fs_for(spark, path_str)
    if not fs.exists(p):
        return []
    return [s.getPath().getName() for s in fs.listStatus(p) if s.isDirectory()]


def _fs_has_data_files(spark: SparkSession, path_str: str) -> bool:
    """True if the directory holds any non-hidden file (recursing into
    subdirectories, for the per-batch exactly_once layout). Hidden =
    ``_``/``.`` prefixed — metadata, same filter Spark's readers use."""
    fs, p = _fs_for(spark, path_str)
    if not fs.exists(p):
        return False
    for s in fs.listStatus(p):
        name = s.getPath().getName()
        if name.startswith(("_", ".")):
            continue
        if s.isDirectory():
            if _fs_has_data_files(spark, f"{path_str}/{name}"):
                return True
        else:
            return True
    return False


def _dedup_lines(df: DataFrame, col: str = "value") -> DataFrame:
    """Drop byte-identical lines keyed on a 192-bit digest pair
    (xxhash64 + md5): shuffle comparisons touch 24-byte keys instead
    of whole documents, and collision across BOTH digests is ~2^-96 —
    negligible against corpus sizes. One definition so the table-side
    (finalize) and quarantine-side replays can never drift apart."""
    return (
        df.withColumn("__d1__", F.xxhash64(col))
        .withColumn("__d2__", F.md5(col))
        .dropDuplicates(["__d1__", "__d2__"])
        .drop("__d1__", "__d2__")
    )


def _has_variant(dt: ST.DataType) -> bool:
    if isinstance(dt, ST.VariantType):
        return True
    if isinstance(dt, ST.StructType):
        return any(_has_variant(f.dataType) for f in dt.fields)
    if isinstance(dt, ST.ArrayType):
        return _has_variant(dt.elementType)
    if isinstance(dt, ST.MapType):
        return _has_variant(dt.valueType)
    return False


def relationalize_stream(
    stream_df: DataFrame,
    name: str,
    sink: TableSink,
    *,
    key_cols: list[str] | None = None,
) -> DataStreamWriter:
    """Demux a nested stream into per-table sinks.

    ``sink(table_name, flat_df, batch_id)`` is called once per derived
    table per micro-batch; implementations typically append to one
    parquet/Delta path per table. Returns the unstarted writer so the
    caller picks trigger/checkpoint options.

    VARIANT columns are rejected loudly: the dynamic relationalize
    plan is derived from each batch's DATA (_expand_variants), so two
    micro-batches can resolve a conflicted key to different branch
    sets and write divergent child-table schemas into the same sink
    path. Dynamic streams go through ``JsonStreamDemux``, which
    appends untyped rows (the reference's single-pass append,
    reference relationalize.py:57-80) and aligns the typed view to a
    running merged schema at finalize.
    """
    bad = [f.name for f in stream_df.schema.fields if _has_variant(f.dataType)]
    if bad:
        raise ValueError(
            f"relationalize_stream: column(s) {bad} carry VARIANT data; "
            "per-batch dynamic planning would write divergent child-table "
            "schemas across micro-batches. Use JsonStreamDemux for "
            "dynamic streams."
        )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        for table_name, table_df in relationalize(
            batch_df, name, key_cols=key_cols
        ).items():
            sink(table_name, table_df, batch_id)

    return stream_df.writeStream.foreachBatch(process_batch)


@dataclass
class JsonStreamDemux:
    """Streaming demux for DYNAMIC (variant-carrying) corpora — the
    reference's single-pass semantics made micro-batch:

    - each batch runs the dynamic relationalize (plan-from-data) with
      ``convert=False`` and APPENDS every derived table's rows as
      JSONL under ``{base_path}/{table}`` — untyped, so batches that
      resolve a conflicted key differently (scalar vs list vs object
      rows) append to the SAME files without schema conflict, exactly
      like the reference's append-to-one-output
      (reference relationalize.py:57-80);
    - a running per-table ``Schema`` accumulates across batches via
      the same merge algebra the reference applies across rows
      (``Schema.merge``, reference schema.py:259-302);
    - ``finalize(spark)`` reads each table's accumulated JSONL back
      and imposes the MERGED schema (convert_choice_columns), so the
      typed view is consistent no matter how branches were spread
      over batches.

    Delivery: with ``exactly_once=False`` (flat layout) appends are
    at-least-once (foreachBatch appends replay on retry, like any
    non-transactional append sink) — recover exactly-once at read
    time via ``finalize(dedup_replays=True)``. With
    ``exactly_once=True`` each batch lands its rows under
    ``{table}/batch={batch_id}`` with per-directory OVERWRITE: a
    replayed batch replaces its own previous (possibly partial)
    output, so the layout is exactly-once by construction — no
    finalize-side dedup shuffle, and safe even under uuid rid_mode
    where replayed lines are not byte-identical. The ``_quarantine``
    lane is at-least-once in BOTH modes (malformed lines append raw);
    ``read_quarantine`` dedups byte-identical replays on read-back.

    The running merged schemas are DURABLE, not driver-only: after
    each batch the merged schema is written to
    ``{base_path}/{table}/_schema.json`` (underscore-prefixed, so data
    readers ignore it) BEFORE that batch's rows append — the on-disk
    schema is always a superset of the on-disk rows, so a crash
    between the two writes only leaves schema columns the replayed
    batch will re-append. A fresh demux instance (checkpoint restart)
    recovers every table's schema from these files on first use;
    ``finalize`` refuses loudly if ``base_path`` holds a table
    directory with no recoverable schema (e.g. written by something
    other than this demux) rather than emit a silently narrowed view.

    Scale shape: per batch this is the batch pipeline (variant casts
    and projections, one branch-analysis aggregate per nesting level
    over the persisted batch parse); the running schemas are
    driver-side dicts of column tags — O(columns), not O(rows) — and
    the per-batch persistence is one tiny metadata file per table.

    MICRO-BATCH SIZING (measured, BASELINE.md r8): per-batch latency
    scales with DISCOVERED TABLE COUNT (one Catalyst analysis + one
    write job + one schema write each), independent of row count —
    ~0.7 s/table submitted serially, ~0.5 s/table with the default
    8-thread write pool (``write_concurrency``): a 70-table dynamic
    stream has a ~35 s per-batch floor even at 250 rows/batch. Size
    triggers so the batch interval is well above 0.5 s x expected
    table count (multi-minute triggers or AvailableNow for wide
    corpora; rows are effectively free next to the per-table floor),
    and pre-split corpora expected to discover hundreds of tables
    into one demux per family.
    """

    base_path: str
    name: str
    key_cols: list[str] | None = None
    quarantine: bool = False
    #: default True on measurement (BASELINE.md r8): per-batch
    #: overwrite is no slower to write, needs no finalize dedup
    #: shuffle (2.16 vs 5.54 s at 100x), and is the only mode safe
    #: under uuid rids. exactly_once=False keeps the reference's flat
    #: append-to-one-output layout (reference relationalize.py:57-80)
    #: for sinks that must stay byte-compatible with it.
    #: MIGRATION: when pointing an exactly_once demux at a base_path
    #: previously written in the FLAT layout, any batch that crashed
    #: mid-append pre-upgrade left flat copies the replayed batch=N
    #: directory now duplicates — run the first post-upgrade
    #: finalize(dedup_replays=True) once (hash rids), or clean the
    #: flat files, before trusting the no-dedup view.
    exactly_once: bool = True
    #: HOW each batch's rows land (r10, the attack on the measured
    #: per-TABLE driver floor):
    #: - "per_table" (default, the attested layout): one write job
    #:   per discovered table under ``{base}/{table}`` — ~0.5-0.7 s
    #:   of driver latency per table per batch (Catalyst analysis +
    #:   job submission), overlapped by the write pool.
    #: - "single_job": every table's rows render to JSON lines
    #:   driver-free (``to_json(struct(*))`` — the same Jackson
    #:   rendering the per-table json writer uses), union into ONE
    #:   frame tagged ``__table__``, and land in ONE
    #:   ``partitionBy("__table__")`` text write under
    #:   ``{base}/__rows__`` — one job submission per batch no matter
    #:   how many tables the batch discovered. MEASURED NEGATIVE for
    #:   latency (bench_demux_scale F, 70-table corpus, same session):
    #:   66.5 s/batch vs per_table's 35.2 s — analyzing one 70-branch
    #:   union serializes what the 8-thread pool overlaps, the r7
    #:   plan-fusion result in new clothes. Choose it only when the
    #:   OUTPUT SHAPE is worth that cost: downstream consumers get a
    #:   single partition-pruned tree
    #:   (``__rows__/batch=N/__table__=T``) instead of N directories.
    #:   The per-table _schema.json metadata writes are unchanged and
    #:   already skip when stable. ``finalize``/``read_quarantine``
    #:   read BOTH layouts (their union), so switching layouts
    #:   mid-corpus is safe; partition values are escaped/restored by
    #:   Spark's partition discovery, so exotic table names survive
    #:   the round trip. exactly_once overwrites
    #:   ``__rows__/batch={id}`` per batch (same idempotent-replay
    #:   contract as the per-table batch dirs); append mode lands
    #:   under the sentinel ``batch=-1`` so the tree keeps ONE
    #:   partition depth — flipping exactly_once mid-corpus is safe
    #:   here too (mixed depths would break partition discovery,
    #:   which per_table tolerates via recursiveFileLookup but a
    #:   partition-discovered tree must not). Corpora whose appends
    #:   predate the batch=-1 sentinel (flat ``__rows__/__table__=T``)
    #:   stay readable: ``finalize`` detects the two generations and
    #:   reads each as its own partition-discovery root.
    write_layout: str = "per_table"
    #: per-batch table writes run on a driver thread pool of this
    #: size (1 = serial). Part of the ~0.7 s/table per-batch floor is
    #: driver latency (Catalyst analysis + job submission +
    #: schema-file write, serially per table) that concurrent
    #: submission overlaps across tables (Py4J releases the GIL
    #: during JVM calls; writes target disjoint directories; the
    #: schema-before-rows crash invariant is per-table and preserved
    #: inside each task). Measured on the 70-table wide-dynamic
    #: corpus, same session (BASELINE.md r8): steady per-batch
    #: 50.0 s serial -> 35.2 s at 8 threads (1.42x; 16 threads no
    #: better — the residue is executor-side job work plus
    #: lock-serialized analysis, not submission latency). Default 8;
    #: set 1 to restore strictly serial submission.
    write_concurrency: int = 8
    schemas: dict[str, Schema] = field(default_factory=dict)
    #: batch_id -> number of malformed lines quarantined in that batch
    #: (write-time Observation, no second scan; cleared with the
    #: instance — durable corruption telemetry is the _quarantine dir).
    quarantine_counts: dict[int, int] = field(default_factory=dict, init=False)
    _recovered: bool = field(default=False, init=False, repr=False)
    #: last serialized schema known to be ON DISK per table — the
    #: schema-stable fast path (r8 verdict item 3 / r9 item 5): after
    #: discovery, most batches change no table's schema, so the
    #: per-table _schema.json rewrite (one driver FS round trip per
    #: table per batch — delete + write + rename) is skipped when the
    #: merged serialization is unchanged. Crash-safe: the skip only
    #: fires when the on-disk schema ALREADY equals the merged one,
    #: so schema-superset-of-rows still holds; the dict is repopulated
    #: from disk by _recover on restart.
    _written_schemas: dict[str, str] = field(
        default_factory=dict, init=False, repr=False
    )

    def _parse_schema(self, content: str, path_str: str) -> Schema:
        try:
            return Schema.deserialize(content)
        except Exception as e:  # noqa: BLE001 - re-raise loud + actionable
            raise RuntimeError(
                f"JsonStreamDemux: {path_str} exists but does not parse "
                f"as a serialized Schema ({e!r}); rows under its table "
                "directory cannot be typed consistently. Was it written "
                "by something other than JsonStreamDemux?"
            ) from e

    def _recover(self, spark: SparkSession) -> None:
        """Merge any persisted per-table schemas under base_path into
        the running state (no-op after the first call). Raises for a
        table directory holding rows without a recoverable
        _schema.json — appended rows with no schema would silently
        vanish from finalize(). Underscore/dot-prefixed directories
        are metadata, not tables (``_quarantine``, checkpoint
        leftovers). Crash-window recovery: a complete
        ``_schema.json.tmp`` stranded by a crash between
        _fs_write_text's delete and rename is adopted (and the swap
        finished); a table dir whose only content is an unparsable
        tmp — crash mid-FIRST-schema-write, before any row appended —
        is skipped, the replayed batch rewrites it."""
        if self._recovered:
            return
        for t in _fs_list_dirs(spark, self.base_path):
            if t.startswith(("_", ".")):
                continue
            spath = f"{self.base_path}/{t}/_schema.json"
            content = _fs_read_text(spark, spath)
            if content is not None:
                schema = self._parse_schema(content, spath)
                on_disk = content
            else:
                tmp = _fs_read_text(spark, spath + ".tmp")
                has_rows = _fs_has_data_files(spark, f"{self.base_path}/{t}")
                if tmp is None and not has_rows:
                    continue  # empty shell dir — nothing to recover
                if tmp is None:
                    raise RuntimeError(
                        f"JsonStreamDemux: table directory "
                        f"{self.base_path}/{t} has no _schema.json; its rows "
                        "cannot be typed consistently. Was it written by "
                        "something other than JsonStreamDemux?"
                    )
                try:
                    schema = self._parse_schema(tmp, spath + ".tmp")
                except RuntimeError:
                    if has_rows:  # rows exist but no valid schema: loud
                        raise
                    continue  # partial tmp, zero rows: replay rewrites
                # finish the interrupted swap so the dir is clean again
                _fs_write_text(spark, spath, tmp)
                on_disk = tmp
            self.schemas[t] = Schema.merge(
                self.schemas.get(t, Schema()), schema
            )
            # seed the schema-stable fast path ONLY when the merged
            # running schema serializes to exactly what is on disk
            # (always true for a fresh instance; a pre-seeded
            # instance's wider schema must still be written out)
            ser = self.schemas[t].serialize()
            if ser == on_disk:
                self._written_schemas[t] = ser
        self._recovered = True

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        from ..sources.jsonl import relationalize_json

        spark = batch_df.sparkSession
        self._recover(spark)
        f = batch_df.schema.fields
        if len(f) == 1 and isinstance(f[0].dataType, ST.StringType):
            # raw JSONL lines -> one variant column
            col = batch_df.columns[0]
            lines = batch_df.where(F.length(F.trim(col)) > 0)
            if self.quarantine:
                # the streaming analog of the batch quarantine lane
                # (sources/readers.py:read_jsonl_quarantine): malformed
                # lines append raw to {base_path}/_quarantine for
                # replay instead of killing the stream. Default stays
                # fail-loud (parse_json throws), matching the
                # reference's json.loads crash (reference
                # relationalize.py:56-63). The malformed count rides
                # the write itself as an Observation (no second scan)
                # into ``quarantine_counts[batch_id]``.
                from pyspark.sql import Observation

                parsed = lines.select(
                    F.col(col).alias("__line__"),
                    F.try_parse_json(F.col(col)).alias("v"),
                )
                obs = Observation()
                parsed.where(F.col("v").isNull()).select(
                    F.col("__line__")
                ).observe(obs, F.count(F.lit(1)).alias("malformed")).write.mode(
                    "append"
                ).text(f"{self.base_path}/_quarantine")
                # plain assignment, not accumulation: a replayed batch
                # (same batch_id through the same instance) re-observes
                # the same lines, and the metric is documented as
                # per-batch malformed count — idempotent under replay,
                # consistent with read_quarantine()'s deduped view.
                self.quarantine_counts[batch_id] = int(obs.get["malformed"])
                batch_df = parsed.where(F.col("v").isNotNull()).select("v")
            else:
                batch_df = lines.select(F.parse_json(F.col(col)).alias("v"))
        out = relationalize_json(
            batch_df, self.name, key_cols=self.key_cols, convert=False
        )
        # JSON keys are case-sensitive (the reference keeps "w1" and
        # "W1" distinct until drop_duplicate_columns is asked for);
        # the table WRITES below must run case-sensitive too or the
        # writer rejects casefold-duplicate columns
        # (COLUMN_ALREADY_EXISTS) and kills the stream.
        prev_case = spark.conf.get("spark.sql.caseSensitive")
        spark.conf.set("spark.sql.caseSensitive", "true")
        try:
            # running-schema merges are serial driver dict updates
            # (cheap, and self.schemas must not race) ...
            for t in out.tables:
                self.schemas[t] = Schema.merge(
                    self.schemas.get(t, Schema()), out.schemas[t]
                )

            def write_schema(t: str) -> None:
                # Schema-stable fast path: when the merged schema
                # serializes to exactly what is already on disk, the
                # rewrite is a no-op — skip the per-table FS round
                # trip (delete + write + rename). After discovery
                # settles, every batch takes this branch for every
                # table (measured in examples/bench_demux_scale.py E).
                ser = self.schemas[t].serialize()
                if self._written_schemas.get(t) != ser:
                    _fs_write_text(
                        spark, f"{self.base_path}/{t}/_schema.json", ser
                    )
                    self._written_schemas[t] = ser

            def write_one(t: str) -> None:
                # schema first, rows second (see class docstring).
                write_schema(t)
                if self.exactly_once:
                    # idempotent landing zone: a replayed batch
                    # OVERWRITES its own directory instead of
                    # re-appending — exactly-once by construction,
                    # no finalize-side dedup shuffle, uuid-rid-safe.
                    out.tables[t].write.mode("overwrite").json(
                        f"{self.base_path}/{t}/batch={batch_id}"
                    )
                else:
                    out.tables[t].write.mode("append").json(
                        f"{self.base_path}/{t}"
                    )

            names = list(out.tables)
            if self.write_layout == "single_job":
                from functools import reduce

                # schema metadata first (schema-before-rows crash
                # invariant; skipped per table when stable), then ONE
                # union write for every table's rows
                for t in names:
                    write_schema(t)
                parts = [
                    out.tables[t].select(
                        F.to_json(F.struct("*")).alias("value"),
                        F.lit(t).alias("__table__"),
                    )
                    for t in names
                ]
                # A batch can discover zero tables only if
                # relationalize_json emits nothing (the root table is
                # always emitted today, but the per_table path is a
                # no-op on an empty table set and this lane must fail
                # the same way — reduce() on [] would raise instead).
                if parts:
                    allrows = reduce(DataFrame.unionByName, parts)
                    # Rows ALWAYS land under a batch=N level — append
                    # mode uses the sentinel batch=-1 — so the
                    # __rows__ tree keeps ONE partition depth even if
                    # exactly_once is flipped mid-corpus (partition
                    # discovery rejects trees that mix
                    # __rows__/__table__=T with
                    # __rows__/batch=N/__table__=T).
                    if self.exactly_once:
                        allrows.write.mode("overwrite").partitionBy(
                            "__table__"
                        ).text(f"{self.base_path}/__rows__/batch={batch_id}")
                    else:
                        allrows.write.mode("append").partitionBy(
                            "__table__"
                        ).text(f"{self.base_path}/__rows__/batch=-1")
            elif self.write_concurrency > 1 and len(names) > 1:
                # ... the per-table writes are independent (disjoint
                # directories, shared persisted parse) and
                # driver-latency bound, so they overlap on a pool.
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(
                    max_workers=min(self.write_concurrency, len(names))
                ) as ex:
                    # list() drains the map so the first failure
                    # raises AFTER the pool joins (no stranded tasks)
                    list(ex.map(write_one, names))
            else:
                for t in names:
                    write_one(t)
        finally:
            spark.conf.set("spark.sql.caseSensitive", prev_case)
            out.unpersist()

    def _table_lines(self, spark: SparkSession, t: str) -> DataFrame:
        """One ``value`` column of table ``t``'s raw JSONL from
        whichever layouts hold rows — the per-table directory (flat
        appends AND exactly_once ``batch=N`` subdirs, read with
        recursiveFileLookup so ``_``-prefixed metadata is skipped)
        unioned with the single-job ``__rows__`` tree (read through
        partition discovery so the ``__table__`` filter prunes to
        ``t``'s directories at plan time and escaped partition values
        decode back to the real table name). A demux that has only
        ever used one layout reads only that one; a corpus migrated
        between layouts reads both."""
        parts: list[DataFrame] = []
        if _fs_has_data_files(spark, f"{self.base_path}/{t}"):
            parts.append(
                spark.read.option("recursiveFileLookup", "true").text(
                    f"{self.base_path}/{t}"
                )
            )
        rows_root = f"{self.base_path}/__rows__"
        fs, p = _fs_for(spark, rows_root)
        if fs.exists(p):
            # The tree may hold TWO single-job generations: the
            # legacy flat append shape (__rows__/__table__=T, written
            # before r11 moved appends under batch=-1) and the
            # uniform batch=N shape. Partition discovery rejects a
            # tree mixing the two depths, so each consistent
            # generation is read as its own root (basePath keeps the
            # partition columns resolving against __rows__) and the
            # results union — old corpora stay readable after the
            # layout change.
            kids = _fs_list_dirs(spark, rows_root)
            legacy = [k for k in kids if k.startswith("__table__=")]
            batched = [k for k in kids if k.startswith("batch=")]
            if legacy and batched:
                for gen in (legacy, batched):
                    parts.append(
                        spark.read.option("basePath", rows_root)
                        .text([f"{rows_root}/{k}" for k in gen])
                        .where(F.col("__table__") == t)
                        .select("value")
                    )
            else:
                parts.append(
                    spark.read.text(rows_root)
                    .where(F.col("__table__") == t)
                    .select("value")
                )
        if not parts:
            return spark.createDataFrame([], "value string")
        out = parts[0]
        for extra in parts[1:]:
            out = out.unionByName(extra)
        return out

    def attach(self, stream_df: DataFrame) -> DataStreamWriter:
        """Wire onto a stream; caller picks trigger/checkpoint."""
        return stream_df.writeStream.foreachBatch(self.process_batch)

    def finalize(
        self, spark: SparkSession, *, dedup_replays: bool = False
    ) -> dict[str, DataFrame]:
        """Typed view of everything appended so far: per table, parse
        the JSONL back to one variant column per merged-schema key and
        split choice columns — the reference's convert pass with the
        cross-batch schema.

        ``dedup_replays=True`` restores exactly-once semantics over
        the at-least-once appends by dropping byte-identical JSONL
        lines: a replayed batch re-appends the SAME lines (rows and
        their hash-mode rids are deterministic functions of the data
        and key_cols), so line-level dedup removes exactly the replay
        copies — one dedup-shuffle per table, keyed on a 192-bit
        line digest (xxhash64 + md5) rather than the full line bytes,
        so hash/sort comparisons at shuffle time touch 24-byte keys
        instead of whole documents (collision across BOTH digests is
        ~2^-96 — negligible against corpus sizes). Leave it off when
        (a) rid_mode would be uuid (replays then differ per line and
        dedup on rid columns downstream is needed instead) or (b) the
        stream legitimately carries full-duplicate rows WITHIN the
        key columns (those collapse too — the same caveat
        ``relationalize``'s key_cols default documents for duplicate
        rows sharing rids, operators/relationalize.py).

        With ``exactly_once=True`` the layout is already replay-proof
        (per-batch overwrite), so ``dedup_replays`` is unnecessary —
        it still runs if asked, but the digest shuffle buys nothing."""
        from ..operators.infer import convert_choice_columns
        from ..sources.jsonl import VNode, _cast_ddl

        self._recover(spark)
        tables: dict[str, DataFrame] = {}
        prev_case = spark.conf.get("spark.sql.caseSensitive")
        spark.conf.set("spark.sql.caseSensitive", "true")
        try:
            for t, schema in self.schemas.items():
                lines = self._table_lines(spark, t).where(
                    F.length(F.trim("value")) > 0
                )
                if dedup_replays:
                    vdf = _dedup_lines(lines).select(
                        F.parse_json("value").alias("v")
                    )
                else:
                    vdf = lines.select(F.parse_json("value").alias("v"))
                node = VNode(
                    kind="object",
                    fields={
                        c: VNode(kind="leaf", leaf_type="VARIANT")
                        for c in schema.columns
                    },
                )
                flat = vdf.select(
                    F.try_variant_get(F.col("v"), "$", _cast_ddl(node)).alias(
                        "__r__"
                    )
                ).select("__r__.*")
                tables[t] = convert_choice_columns(flat, schema.columns)
        finally:
            spark.conf.set("spark.sql.caseSensitive", prev_case)
        return tables

    def read_quarantine(
        self, spark: SparkSession, *, dedup_replays: bool = True
    ) -> DataFrame:
        """The quarantined raw lines as a one-column (``value``)
        DataFrame. Delivery into ``_quarantine`` is AT-LEAST-ONCE
        (the append in process_batch replays on retry exactly like the
        table appends), so the default dedups byte-identical lines on
        read-back — the same digest-keyed dedup finalize applies to
        table rows. Pass ``dedup_replays=False`` to audit raw delivery
        (e.g. to count replay amplification)."""
        qpath = f"{self.base_path}/_quarantine"
        fs, p = _fs_for(spark, qpath)
        if not fs.exists(p):
            # no quarantined line yet (quarantine=False, or no batch
            # has misparsed): the natural answer is 0 rows, not a
            # PATH_NOT_FOUND crash at the monitoring caller.
            return spark.createDataFrame([], "value string")
        q = spark.read.option("recursiveFileLookup", "true").text(qpath)
        if dedup_replays:
            q = _dedup_lines(q)
        return q


def parquet_table_sink(base_path: str) -> TableSink:
    """A TableSink appending each derived table under its own
    directory — the streaming counterpart of the reference's
    local-file output factory (reference utils.py:5-17)."""

    def sink(table_name: str, df: DataFrame, batch_id: int) -> None:
        df.write.mode("append").parquet(f"{base_path}/{table_name}")

    return sink


def _instant_ts(df: DataFrame, ts_col: str) -> DataFrame:
    """Event-time watermarks reject TIMESTAMP_NTZ
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE); coerce NTZ event time to an
    instant (wall clock taken as UTC, session-timezone-independent)."""
    from pyspark.sql import types as T

    from ..functions.timeutil import as_instant

    dtype = df.schema[ts_col].dataType
    if isinstance(dtype, T.TimestampNTZType):
        df = df.withColumn(ts_col, as_instant(F.col(ts_col), dtype))
    return df


def windowed_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Watermarked tumbling-window counts; state for windows older
    than the watermark is evicted, so memory is bounded regardless of
    stream length."""
    stream_df = _instant_ts(stream_df, ts_col)
    groups = [F.window(F.col(ts_col), window).alias("win")] + [
        F.col(c) for c in (group_cols or [])
    ]
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(*groups)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *[F.col(c) for c in (group_cols or [])],
            "n_events",
        )
    )


def sessionize_stream(
    stream_df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based sessions with native session_window state."""
    stream_df = _instant_ts(stream_df, ts_col)
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sess"), F.col(user_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(user_col),
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
        )
    )
