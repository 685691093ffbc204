"""UDTF (python table function) and Observation-metrics members of
the UDF surface."""

from pyspark.sql import functions as F


def test_sentence_chunks_udtf_lateral(spark):
    from relationalize_spark.functions.udfs import sentence_chunks_udtf

    spark.udtf.register("sentence_chunks_t", sentence_chunks_udtf())
    spark.createDataFrame(
        [(1, "Hello world. How are you? Fine!"), (2, None), (3, "One.")],
        "id long, t string",
    ).createOrReplaceTempView("udtf_in")
    rows = spark.sql(
        "SELECT id, s.chunk_idx, s.sentence, s.n_tokens "
        "FROM udtf_in, LATERAL sentence_chunks_t(t) s ORDER BY id, chunk_idx"
    ).collect()
    assert [(r.id, r.sentence, r.n_tokens) for r in rows] == [
        (1, "Hello world", 2),
        (1, "How are you", 3),
        (1, "Fine", 1),
        (3, "One", 1),
    ]  # NULL input emits no rows


def test_observed_write_collects_metrics_during_action(spark, sf_dir):
    from relationalize_spark.functions.udfs import observed_write

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    odf, obs = observed_write(
        orders,
        {
            "rows": F.count(F.lit(1)),
            "nulls": F.sum(F.col("o_custkey").isNull().cast("long")),
            "total_price": F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2),
        },
    )
    odf.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert got["rows"] == orders.count()
    assert got["nulls"] == 0
    assert float(got["total_price"]) > 0
