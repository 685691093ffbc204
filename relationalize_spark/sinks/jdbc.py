"""Warehouse sinks: JDBC write with schema-driven DDL, plus the
stage-to-object-store + COPY pattern the reference uses for Redshift
(reference examples/s3_redshift_example.py:138-184) and Postgres
(examples/full_pokemon_psql_pipeline.py:130-170).

No database drivers ship in this environment, so ``write_jdbc`` only
assembles the plan (options + DDL); issuing it requires the target's
JDBC jar on the Spark classpath. The COPY statement generators are
pure string templating and fully tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .. import types as T
from ..schema import Schema


def jdbc_column_types(schema: Schema) -> str:
    """``createTableColumnTypes`` option value from a choice Schema:
    choice columns are split per member type, names sorted — the same
    layout generate_ddl produces."""
    defs: list[str] = []
    for key, tag in schema.columns.items():
        if not T.is_choice(tag):
            defs.append(f'"{key}" {schema.dialect.type_map[tag]}')
            continue
        for member in T.choice_members(tag):
            if member != T.NONE:
                defs.append(f'"{key}_{member}" {schema.dialect.type_map[member]}')
    return ", ".join(sorted(defs))


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    schema: Schema,
    mode: str = "overwrite",
    properties: dict[str, str] | None = None,
    batchsize: int = 10_000,
):
    """Configure (and start, if a driver is available) a JDBC write
    with warehouse types pre-declared from the inferred Schema."""
    writer = (
        df.write.mode(mode)
        .format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .option("createTableColumnTypes", jdbc_column_types(schema))
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    return writer


def redshift_copy_sql(
    table: str,
    s3_path: str,
    iam_role: str,
    region: str = "us-east-1",
    gzip: bool = True,
    json_format: str = "auto ignorecase",
) -> str:
    """COPY statement for parquet/JSONL staged on S3 — the reference's
    bulk-load path with TRUNCATECOLUMNS + GZIP."""
    opts = f"json '{json_format}' TRUNCATECOLUMNS region '{region}'"
    if gzip:
        opts += " GZIP"
    return (
        f"COPY {table} FROM '{s3_path}' IAM_ROLE '{iam_role}' {opts};"
    )


def postgres_load_plan(schema: Schema, table: str, db_schema: str = "public") -> list[str]:
    """The reference's DROP -> CREATE -> (COPY) -> ANALYZE sequence as
    statements; COPY itself streams client-side via the driver."""
    return [
        f'DROP TABLE IF EXISTS "{db_schema}"."{table}";',
        schema.generate_ddl(table, db_schema),
        f'ANALYZE "{db_schema}"."{table}";',
    ]
