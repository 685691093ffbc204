"""Non-destructive warehouse maintenance: snapshots -> SCD2 history.

The reference's warehouse examples reload destructively every run
(DROP -> CREATE -> COPY, reference
examples/full_pokemon_psql_pipeline.py:130-170) and validate with a
bare COUNT(1). This pipeline is the production counterpart over the
same shapes:

1. build the initial type-2 dimension from a backfill of snapshots
   (`scd2_from_snapshots`);
2. per new batch: diff the incoming snapshot against the previous
   state (`snapshot_diff`) and apply only the changeset
   (`scd2_merge`) — history rows are never rewritten, cost is bound
   by change volume;
3. validate the incremental result against a batch rebuild with an
   order-insensitive `table_checksum` — the strong form of the
   reference's COUNT(1) check: equal counts AND equal checksum means
   value-identical tables.

    python examples/scd2_warehouse_pipeline.py [sf_dir]
"""

import sys

sys.path.insert(0, ".")

import pyspark.sql.functions as F
from pyspark.sql import Window

from relationalize_spark.operators.audit import table_checksum
from relationalize_spark.operators.scd2 import (
    scd2_from_snapshots,
    scd2_merge,
    snapshot_diff,
)
from relationalize_spark.plans.session import get_spark
from relationalize_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app="scd2-warehouse-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    # Tracked entity: each user's latest event_type, snapshotted
    # daily. (Any keyed attribute stream works the same way.)
    e = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    daily = (
        e.withColumn("__d__", day)
        .withColumn("__rn__", F.row_number().over(
            Window.partitionBy("user_id", "__d__").orderBy(
                F.col("ts").desc(), F.col("event_id").desc())))
        .where("__rn__ = 1")
        .select("user_id", F.col("__d__").alias("snap_ts"),
                F.col("event_type").alias("state"))
    )

    days = sorted(r.snap_ts for r in daily.select("snap_ts").distinct().collect())
    backfill_days, live_days = days[: len(days) // 2], days[len(days) // 2:]
    print(f"snapshots: {len(days)} days "
          f"({len(backfill_days)} backfill + {len(live_days)} incremental)")

    # 1. Backfill.
    backfill = daily.where(F.col("snap_ts").isin(backfill_days))
    dim = scd2_from_snapshots(backfill, ["user_id"], ["state"], "snap_ts")
    dim = spark.createDataFrame(dim.collect(), dim.schema)  # materialize

    # 2. Incremental batches. State-as-of must carry forward users
    # absent from a day's snapshot, so diff against the dimension's
    # own current rows.
    for d in live_days:
        batch = daily.where(F.col("snap_ts") == d).select("user_id", "state")
        current = dim.where("is_current").select("user_id", "state")
        changes = snapshot_diff(current, batch, ["user_id"]).where(
            # a user missing from today's snapshot is "no news", not
            # a delete — keep deletes out of this feed
            F.col("change") != "delete"
        )
        dim = scd2_merge(dim, changes, ["user_id"], ["state"], F.lit(d))
        dim = spark.createDataFrame(dim.collect(), dim.schema)

    # 3. Validate: incremental == batch rebuild, by checksum.
    batch_dim = scd2_from_snapshots(daily, ["user_id"], ["state"], "snap_ts")
    cols = ["user_id", "state", "valid_from", "valid_to", "is_current"]
    inc_chk = table_checksum(dim, cols).first()
    bat_chk = table_checksum(batch_dim, cols).first()
    print(f"incremental dim: rows={inc_chk.n_rows} checksum={inc_chk.checksum}")
    print(f"batch-rebuilt  : rows={bat_chk.n_rows} checksum={bat_chk.checksum}")
    ok = tuple(inc_chk) == tuple(bat_chk)
    print(f"incremental == batch rebuild: {ok}")
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
