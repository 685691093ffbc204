"""Incremental JSONL ingest: relationalize -> audit -> partition upsert.

The reference's end-to-end shape (JSONL export -> relationalize ->
load into a warehouse, reference examples/full_mongodb_psql_pipeline.py)
re-expressed as an *incremental* Spark pipeline: each day's export is
relationalized, data-quality-audited, and merged into a partitioned
parquet table with dynamic partition overwrite — re-running a day is
idempotent, other days are never rewritten, and key collisions within
a day replace the old row (late corrections).

    python examples/incremental_ingest_pipeline.py
"""

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, ".")

import pyspark.sql.functions as F

from relationalize_spark.operators.audit import fk_violations, profile_columns
from relationalize_spark.operators.relationalize import relationalize
from relationalize_spark.plans.session import get_spark
from relationalize_spark.sinks.upsert import upsert_keys, write_partitioned


def day_batch(day: str, users: list[dict]) -> list[str]:
    return [json.dumps({**u, "day": day}) for u in users]


def main() -> None:
    spark = get_spark(app="incremental-ingest")
    spark.sparkContext.setLogLevel("ERROR")
    root = Path(tempfile.mkdtemp(prefix="ingest_"))
    table = str(root / "users_table")

    schema = (
        "user_id string, day string, plan string, "
        "orders array<struct<sku: string, qty: bigint>>"
    )

    # --- day 1: initial load ------------------------------------------
    d1 = root / "d1.jsonl"
    d1.write_text(
        "\n".join(
            day_batch(
                "2026-08-01",
                [
                    {"user_id": "u1", "plan": "pro", "orders": [{"sku": "a", "qty": 1}]},
                    {"user_id": "u2", "plan": "free", "orders": []},
                ],
            )
        )
    )
    tables = relationalize(
        spark.read.schema(schema).json(str(d1)), "users", key_cols=["user_id"]
    )
    write_partitioned(tables["users"], table, ["day"])

    # --- day 2 arrives, plus a CORRECTION for day 1 -------------------
    d2 = root / "d2.jsonl"
    d2.write_text(
        "\n".join(
            day_batch("2026-08-02", [{"user_id": "u3", "plan": "pro", "orders": []}])
            + day_batch("2026-08-01", [{"user_id": "u1", "plan": "team", "orders": []}])
        )
    )
    batch = relationalize(
        spark.read.schema(schema).json(str(d2)), "users", key_cols=["user_id"]
    )["users"]

    # audit before merge: column profile + key uniqueness inside batch
    profile_columns(batch, ["user_id", "plan"]).show(truncate=False)
    dupes = batch.groupBy("user_id", "day").count().filter("count > 1").count()
    assert dupes == 0, "batch carries duplicate keys"

    upsert_keys(batch, table, "day", ["user_id", "day"])

    final = spark.read.parquet(table)
    final.orderBy("day", "user_id").show(truncate=False)
    assert final.count() == 3
    assert (
        final.filter("user_id = 'u1'").select("plan").collect()[0][0] == "team"
    ), "day-1 correction must replace the original row"
    print("incremental ingest OK:", table)


if __name__ == "__main__":
    main()
