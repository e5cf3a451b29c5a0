"""functions/caching: mode selection + semantic equivalence of the three
durability modes, and the semantic-dedup dense-id precondition guard."""

from __future__ import annotations

import os

import pytest
from pyspark import StorageLevel
from pyspark.sql import functions as F

from weather_data_pipeline_sv_spark.functions.caching import (
    cache_mode,
    loop_cache,
    release_stage_caches,
    stage_cache,
)


@pytest.fixture
def mode_env(monkeypatch):
    def set_mode(mode):
        if mode is None:
            monkeypatch.delenv("SPARK_GRAFT_CACHE_MODE", raising=False)
        else:
            monkeypatch.setenv("SPARK_GRAFT_CACHE_MODE", mode)

    return set_mode


def test_default_mode_is_local(mode_env):
    mode_env(None)
    assert cache_mode() == "local"


def test_bad_mode_raises(mode_env):
    mode_env("s3-magic")
    with pytest.raises(ValueError, match="SPARK_GRAFT_CACHE_MODE"):
        cache_mode()


def test_local_and_persist_modes_agree(spark, mode_env):
    df = spark.range(1000).withColumn("g", F.col("id") % 7)
    expected = sorted(
        df.groupBy("g").count().collect(), key=lambda r: r["g"]
    )
    for mode in (None, "persist"):
        mode_env(mode)
        out = stage_cache(df)
        got = sorted(out.groupBy("g").count().collect(), key=lambda r: r["g"])
        assert got == expected
        out.unpersist()


def test_persist_mode_uses_persist_and_keeps_lineage(spark, mode_env):
    mode_env("persist")
    df = spark.range(100)
    out = stage_cache(df)
    assert out.storageLevel == StorageLevel.MEMORY_AND_DISK
    out.unpersist()


def test_persist_mode_eager_materializes(spark, mode_env):
    mode_env("persist")
    out = stage_cache(spark.range(50), eager=True)
    # eager persist must have computed the blocks already
    assert out.rdd.getNumPartitions() >= 1
    assert out.count() == 50
    out.unpersist()


def test_release_stage_caches_unpersists_tracked_frames(spark, mode_env):
    # the session-level release hook for long-lived sessions: every frame
    # stage_cache pinned in persist mode is tracked and unpersisted
    mode_env("persist")
    release_stage_caches()  # clear anything earlier tests left behind
    a = stage_cache(spark.range(10), eager=True)
    b = stage_cache(spark.range(20), eager=True)
    assert a.storageLevel.useMemory and b.storageLevel.useMemory
    assert release_stage_caches() == 2
    assert not a.storageLevel.useMemory and not b.storageLevel.useMemory
    # idempotent: nothing left to release
    assert release_stage_caches() == 0


def test_release_stage_caches_ignores_local_mode(spark, mode_env):
    mode_env(None)  # local mode: blocks die with their handles, untracked
    out = stage_cache(spark.range(10), eager=True)
    assert out.count() == 10
    assert release_stage_caches() == 0


def test_loop_cache_truncates_under_persist_mode(spark, mode_env):
    # loop state must be plan-truncating even in persist mode (iterative
    # plans otherwise nest) — loop_cache falls back to localCheckpoint,
    # whose result is NOT marked with the persist storage level
    mode_env("persist")
    out = loop_cache(spark.range(10), eager=True)
    assert out.storageLevel != StorageLevel.MEMORY_AND_DISK
    assert out.count() == 10


def test_reliable_mode_checkpoints(spark, mode_env, tmp_path, monkeypatch):
    mode_env("reliable")
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", str(tmp_path / "ck"))
    # note: first caller to set a checkpoint dir wins for the JVM session;
    # this still exercises the checkpoint() path either way
    out = stage_cache(spark.range(25), eager=True)
    assert out.count() == 25


def test_dense_count_accepts_dense_rejects_sparse(spark):
    from weather_data_pipeline_sv_spark.catalog.vector import _dense_count

    dense = spark.range(10).select(F.col("id").alias("vec_id"))
    assert _dense_count(dense) == 10
    sparse = spark.range(10).select((F.col("id") * 2).alias("vec_id"))
    with pytest.raises(ValueError, match="dense UNIQUE vec_id"):
        _dense_count(sparse)
    # {0,1,1,3} passes a min/max/count-only check — the distinct count
    # is what catches it
    dup = spark.createDataFrame([(0,), (1,), (1,), (3,)], "vec_id long")
    with pytest.raises(ValueError, match="dense UNIQUE vec_id"):
        _dense_count(dup)
