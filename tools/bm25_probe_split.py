"""Measure the t25 serving claim: once a BM25 index is persisted, a
probe batch costs a small fraction of the build, and bucket pruning is
what makes it so.

Usage: python tools/bm25_probe_split.py [sf_dir] [out.json]
       (defaults: ./data_sf3  BM25_PROBE.json)

Three timed phases over the same corpus (min-of-3 via bench.measure_best
— THE shared protocol):
- build : write_bm25_index (tokenize -> tf/df/stats -> partitioned write)
- probe : probe_bm25_index over a FIXED 50-query batch (serving shape —
  a probe batch does not scale with the corpus), bucket-pruned scans
- control: the same scoring with pruning DISABLED (full postings/_df
  read) — the delta is what partition pruning buys

Also records the pruned fraction (probed buckets / total buckets) so the
wall ratio can be read against the I/O ratio it predicts.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import measure_best
from weather_data_pipeline_sv_spark.operators.retrieval import (
    N_POSTING_BUCKETS,
    _term_bucket,
    bm25_score_topk,
    probe_bm25_index,
    write_bm25_index,
)
from weather_data_pipeline_sv_spark.session import get_spark

N_PROBE_QUERIES = 50
QTERMS = 8
K = 5


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "./data_sf3"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "BM25_PROBE.json"
    spark = get_spark(app_name="bm25-probe-split")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = (
        docs.withColumn("tokens", F.expr("split(trim(lower(text)), '\\\\s+')"))
        .filter(F.size("tokens") > 0)
    )
    doc_terms = d.select(
        "doc_id", F.explode("tokens").alias("term")
    ).filter(F.col("term") != "")
    # fixed-size probe batch: the 50 smallest doc_ids' leading tokens
    qdocs = d.orderBy("doc_id").limit(N_PROBE_QUERIES)
    query_terms = (
        qdocs.select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.slice("tokens", 1, QTERMS)).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
    ).cache()
    query_terms.count()  # pin the probe batch out of every timed region

    root = tempfile.mkdtemp(prefix="wdp_bm25_probe_")
    try:
        build_s, build_cpu = measure_best(
            lambda: write_bm25_index(doc_terms, root), 3
        )

        def _probe():
            probe_bm25_index(spark, root, query_terms, k=K).write.format(
                "noop"
            ).mode("overwrite").save()

        probe_s, probe_cpu = measure_best(_probe, 3)

        stats = spark.read.parquet(f"{root}/_stats").drop("n_buckets")

        def _control():
            tf = spark.read.parquet(f"{root}/postings").drop("bucket")
            df = spark.read.parquet(f"{root}/_df").drop("bucket")
            bm25_score_topk(tf, df, stats, query_terms, k=K).write.format(
                "noop"
            ).mode("overwrite").save()

        control_s, control_cpu = measure_best(_control, 3)

        n_buckets_probed = (
            query_terms.select(
                _term_bucket(F.col("term"), N_POSTING_BUCKETS).alias("b")
            ).distinct().count()
        )
        art = {
            "metric": (
                "persisted BM25 index: build vs probe split (min of 3, "
                "shared measure_best protocol); probe batch fixed at "
                f"{N_PROBE_QUERIES} queries x <= {QTERMS} terms; control = "
                "identical scoring with bucket pruning disabled"
            ),
            "sf_dir": sf_dir,
            "n_docs": d.count(),
            "n_buckets": N_POSTING_BUCKETS,
            "n_buckets_probed": n_buckets_probed,
            "build_s": build_s,
            "build_cpu_s": build_cpu,
            "probe_pruned_s": probe_s,
            "probe_pruned_cpu_s": probe_cpu,
            "probe_unpruned_s": control_s,
            "probe_unpruned_cpu_s": control_cpu,
        }
        with open(out_path, "w") as f:
            json.dump(art, f, indent=1)
        print(json.dumps(art))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
