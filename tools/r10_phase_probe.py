"""Round-10 phase probe: time isolated phases of the hot entries.

Usage: python tools/r10_phase_probe.py [sf_dir] [entry ...]

For each requested probe, runs the phase callables with the noop sink
and prints wall + process-tree CPU per phase — the decomposition the
bench's per-entry totals can't show. Not part of the bench contract;
a diagnostic tool only (guide §1.1: decide WHERE the time goes before
touching anything).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _tree_cpu_seconds  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from weather_data_pipeline_sv_spark.session import get_spark  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, fn):
    spark.sparkContext.setJobDescription(label)
    c0 = _tree_cpu_seconds()
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    dc = _tree_cpu_seconds() - c0
    print(f"  {label:<42s} {dt:7.2f} s wall {dc:8.2f} s cpu", flush=True)
    spark.sparkContext.setJobDescription(None)
    return out


def probe_v5(spark, sf_dir):
    from weather_data_pipeline_sv_spark.catalog.vector import (
        _corpus_and_queries,
    )
    from weather_data_pipeline_sv_spark.operators import similarity as sim

    emb, _ = _corpus_and_queries(spark, sf_dir)
    timed(spark, "v5: corpus scan only", lambda: noop(emb))
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("emb").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("emb").alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    timed(spark, "v5: pair join, no cosine", lambda: noop(pairs))
    full = sim.cosine_near_dup_pairs(emb, "vec_id", "emb", threshold=0.45)
    timed(spark, "v5: full (pairs + cosine + filter)", lambda: noop(full))


def probe_v13(spark, sf_dir):
    from weather_data_pipeline_sv_spark.catalog.vector import (
        _PQ_K,
        _PQ_SUB,
        _PQ_SUBDIM,
        _corpus_and_queries,
    )
    from weather_data_pipeline_sv_spark.operators import similarity as sim

    emb, _ = _corpus_and_queries(spark, sf_dir)
    books = timed(
        spark, "v13: pq_train (joint lloyd, 2 iter)",
        lambda: sim.pq_train(emb, _PQ_SUB, _PQ_K, _PQ_SUBDIM, n_iter=2),
    )
    enc = sim.pq_encode(emb, books, _PQ_SUBDIM)
    timed(spark, "v13: pq_encode pass", lambda: noop(enc))


def probe_v14(spark, sf_dir):
    from weather_data_pipeline_sv_spark.catalog.vector import (
        _N_QUERIES,
        _PQ_K,
        _PQ_SUB,
        _PQ_SUBDIM,
        _TOP_K,
        _corpus_and_queries,
    )
    from weather_data_pipeline_sv_spark.operators import similarity as sim

    emb, q = _corpus_and_queries(spark, sf_dir)
    books = timed(
        spark, "v14: pq_train",
        lambda: sim.pq_train(emb, _PQ_SUB, _PQ_K, _PQ_SUBDIM, n_iter=2),
    )
    enc = sim.pq_encode(emb, books, _PQ_SUBDIM)
    timed(spark, "v14: encode pass", lambda: noop(enc))
    out = sim.pq_adc_topk(
        enc, q, books, _PQ_SUBDIM, _TOP_K,
    )
    timed(spark, "v14: full (train+encode+adc rank)", lambda: noop(out))


def probe_t26(spark, sf_dir):
    from weather_data_pipeline_sv_spark.catalog import all_queries

    q = all_queries()["t26_incremental_bm25"]
    timed(spark, "t26: full entry", lambda: noop(q(spark, sf_dir)))


def probe_pipe3(spark, sf_dir):
    from weather_data_pipeline_sv_spark.catalog import all_queries

    q = all_queries()["pipe3_incremental_corpus"]
    timed(spark, "pipe3: full entry", lambda: noop(q(spark, sf_dir)))


def probe_entry(spark, sf_dir, name):
    from weather_data_pipeline_sv_spark.catalog import all_queries

    q = all_queries()[name]
    timed(spark, f"{name}: full entry", lambda: noop(q(spark, sf_dir)))


PROBES = {
    "v5": probe_v5,
    "v13": probe_v13,
    "v14": probe_v14,
    "t26": probe_t26,
    "pipe3": probe_pipe3,
}


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    spark = get_spark(app_name="r10-phase-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # warm up workers like bench.py does
    import pandas as _pd  # noqa: F401

    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    for n in names or list(PROBES):
        print(f"[{n}]", flush=True)
        if n in PROBES:
            PROBES[n](spark, sf_dir)
        else:
            probe_entry(spark, sf_dir, n)
    spark.stop()


if __name__ == "__main__":
    main()
