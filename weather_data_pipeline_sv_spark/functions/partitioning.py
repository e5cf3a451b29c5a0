"""Parallelism guards for fan-out operators.

A corpus read from few parquet files (locally: ONE file per table) enters
the plan with that few partitions, so a tokenize/explode/mapInPandas
fan-out — where per-row compute dwarfs per-row bytes — runs on a fraction
of the cluster. The standard fix is a round-robin repartition *before* the
fan-out.

The guard is conditional: on a real cluster a 100 TB corpus already scans
with >= defaultParallelism splits and the repartition (a full shuffle of
raw text) would be pure waste — so it only fires when the input is
UNDER-partitioned. AQE cannot do this for us: it only coalesces
(post-shuffle, downward); it never splits a narrow under-partitioned scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame) -> DataFrame:
    """Round-robin repartition ``df`` up to the session's default
    parallelism — only when it is under-partitioned, and never for
    streaming frames (no getNumPartitions there; micro-batch sizing is the
    trigger's job)."""
    if df.isStreaming:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    # Partition count via the JVM internal-row RDD, NOT ``df.rdd``: the
    # PySpark ``.rdd`` property additionally builds the Python-serializer
    # RDD wrapper (a JavaRDD + batched-pickle conversion plan) per call,
    # which is pure overhead when all we need is the split count. Both
    # force physical planning only; this guard is applied to narrow
    # post-scan plans (no shuffle stages), so under AQE neither triggers
    # any job execution.
    n_parts = df._jdf.queryExecution().toRdd().getNumPartitions()
    if n_parts < target:
        return df.repartition(target)
    return df


def one_partition_df(spark, rows, schema: str) -> DataFrame:
    """Tiny DRIVER-SIDE table (centroid sets, codebooks, probe batches,
    1-row stats) as a ONE-partition DataFrame.

    ``spark.createDataFrame(list, schema)`` splits the list into
    defaultParallelism pickled slices; every action then pays one Python
    worker round trip per SLICE to unpickle — parallel that is ~0.35 s at
    local[32], but the moment a consumer serializes it through one task
    (the ``coalesce(1)`` single-file side-table writes, a broadcast
    build) the 32 round trips run SEQUENTIALLY: measured 4–5 s per tiny
    write vs 0.27 s for a 1-slice parallelize, steady state. A table
    that is driver-resident by construction is one partition of data;
    create it that way."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema
    )
