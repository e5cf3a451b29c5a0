"""Co-located bucketed join (X7): two tables bucketed on the same key must
join with no shuffle Exchange on either side, and identically to the plain
join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weather_data_pipeline_sv_spark.sources.writers import write_bucketed_table


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("wh")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bdb LOCATION '{wh}'")
    a = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 2000, 2).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    write_bucketed_table(a, "bdb.fact_a", ["k"], n_buckets=8, sort_cols=["k"])
    write_bucketed_table(b, "bdb.fact_b", ["k"], n_buckets=8, sort_cols=["k"])
    yield spark.table("bdb.fact_a"), spark.table("bdb.fact_b")
    spark.sql("DROP TABLE IF EXISTS bdb.fact_a")
    spark.sql("DROP TABLE IF EXISTS bdb.fact_b")
    spark.sql("DROP DATABASE IF EXISTS bdb")


def test_cobucketed_join_has_no_shuffle(spark, bucketed):
    ta, tb = bucketed
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = ta.join(tb, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "co-bucketed join must not shuffle"
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_plain_join(spark, bucketed):
    ta, tb = bucketed
    got = {(r["k"], r["va"], r["vb"]) for r in ta.join(tb, "k").collect()}
    want = {(k, k * 2, k * 3) for k in range(0, 2000, 2)}
    assert got == want
