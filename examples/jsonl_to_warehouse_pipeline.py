"""Full JSONL -> warehouse pipeline (plan-only without a live DB).

Counterpart of the reference's end-to-end Postgres/Redshift pipelines
(reference examples/full_pokemon_psql_pipeline.py,
examples/s3_redshift_example.py): relationalize, apply column hygiene,
generate DDL + load plans, and stage gzip JSONL. The JDBC execution
itself needs a driver jar + live database; everything up to that
point runs here.

    python examples/jsonl_to_warehouse_pipeline.py
"""

import json
import sys
import tempfile

sys.path.insert(0, ".")

from relationalize_spark.plans.session import get_spark
from relationalize_spark.sinks.jdbc import (
    jdbc_column_types,
    postgres_load_plan,
    redshift_copy_sql,
    write_jdbc,
)
from relationalize_spark.sinks.writers import write_jsonl
from relationalize_spark.sources.jsonl import relationalize_json

ROWS = [
    {"id": 1, "name": "a", "score": 9.5, "events": [{"k": "x"}], "bad col?": 1},
    {"id": 2, "name": "b", "score": "unrated", "events": [], "Bad Col?": 2},
]


def main() -> None:
    src = tempfile.mktemp(suffix=".jsonl")
    with open(src, "w") as f:
        f.writelines(json.dumps(r) + "\n" for r in ROWS)
    stage_dir = tempfile.mkdtemp()

    spark = get_spark(app="warehouse-pipeline-example")
    result = relationalize_json(src, "records", spark=spark, key_cols=["id"])

    for name, df in result.tables.items():
        schema = result.schemas[name]
        dropped = (
            schema.drop_null_columns()
            + schema.drop_special_char_columns()
            + schema.drop_duplicate_columns()
        )
        keep = [c for c in df.columns if c in set(schema.output_columns())]
        df = df.select(*keep)
        print(f"== {name} (dropped {dropped} columns)")
        for stmt in postgres_load_plan(schema, name):
            print(stmt)
        print("-- createTableColumnTypes:", jdbc_column_types(schema))
        print("-- redshift:", redshift_copy_sql(name, f"s3://bucket/{name}/", "arn:aws:iam::0:role/loader"))
        # Stage gzip JSONL (the reference's S3 staging tier).
        write_jsonl(df, f"{stage_dir}/{name}", compression="gzip")
        # JDBC write plan (starts only when a driver jar is present):
        writer = write_jdbc(df, "jdbc:postgresql://localhost/db", name, schema)
        print("-- jdbc writer configured:", writer is not None)
    print("staged under", stage_dir)


if __name__ == "__main__":
    main()
