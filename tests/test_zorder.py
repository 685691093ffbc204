"""Z-order layout: the Morton key interleaves correctly, and z-ordered
files carry tight per-file min/max bounds on BOTH columns (the property
parquet skipping exploits), where a single-column sort leaves the other
column's bounds spanning the whole domain."""

import pyspark.sql.functions as F

from relationalize_spark.plans.zorder import add_zorder_key, write_zordered


def _morton_ref(x: int, y: int, bits: int) -> int:
    out = 0
    for b in range(bits):
        out |= ((x >> b) & 1) << (2 * b)       # col 0 -> even bits
        out |= ((y >> b) & 1) << (2 * b + 1)   # col 1 -> odd bits
    return out


def test_zorder_key_matches_reference_interleave(spark):
    n, bits = 1 << 6, 6
    df = spark.createDataFrame(
        [(i, (i * 37) % n) for i in range(n)], "x long, y long"
    )
    got = {
        (r["x"], r["y"]): r["zkey"]
        for r in add_zorder_key(df, ["x", "y"], bits=bits).collect()
    }
    top = n - 1
    for (x, y), z in got.items():
        # ranks: min/max normalize maps [0, top] onto itself here
        assert z == _morton_ref(x, y, bits), (x, y, z)
    assert len(set(got.values())) == n * 1  # keys distinct on this grid


def test_zordered_files_have_tight_bounds_on_both_columns(spark, tmp_path):
    rows = [(i // 100, i % 100) for i in range(10_000)]  # full 100x100 grid
    df = spark.createDataFrame(rows, "x int, y int")

    zpath, xpath = str(tmp_path / "z"), str(tmp_path / "x")
    write_zordered(df, zpath, ["x", "y"], num_files=16)
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(xpath)
    )

    def mean_span(path, col):
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name())
            .agg((F.max(col) - F.min(col)).alias("span"))
            .agg(F.avg("span"))
            .collect()[0][0]
        )
        return per_file

    # x-sorted layout: x is tight, y spans ~the whole [0,100) domain
    assert mean_span(xpath, "x") < 15
    assert mean_span(xpath, "y") > 90
    # z-ordered layout: BOTH columns' per-file spans are a fraction of
    # the domain -> min/max skipping works for filters on either
    assert mean_span(zpath, "x") < 60
    assert mean_span(zpath, "y") < 60
