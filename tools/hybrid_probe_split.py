"""Measure t29's serving claim: once BOTH hybrid indexes are persisted,
a fused probe batch costs a small fraction of the build — each leg by
its own partition pruning (BM25 term-hash buckets, IVFPQ list_id).

Usage: python tools/hybrid_probe_split.py [doc_dir] [out.json]
       (defaults: ./data_sf3  HYBRID_PROBE.json)

Universe = doc_id carrying both a token stream and an embedding (the
t27/t28/t29 rule). Timed phases (min-of-3 via bench.measure_best — THE
shared protocol):
- build : write_bm25_index + write_ivfpq_index (train, encode, two
  partitioned writes)
- probe : probe_bm25_index + probe_ivfpq_index + rrf_fuse over a FIXED
  50-query batch into the noop sink — the per-batch serving cost, which
  does not scale with the corpus

Also records each leg's pruned fraction (probed buckets / 64, probed
lists / n_lists) so the probe wall can be read against the I/O it
predicts.
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
from weather_data_pipeline_sv_spark.operators import similarity as sim
from weather_data_pipeline_sv_spark.operators.retrieval import (
    N_POSTING_BUCKETS,
    _term_bucket,
    probe_bm25_index,
    rrf_fuse,
    write_bm25_index,
)
from weather_data_pipeline_sv_spark.session import get_spark

N_PROBE_QUERIES = 50
QTERMS = 8
K = 10
N_LISTS = 16
N_PROBE = 4
PQ = dict(n_sub=8, k_codes=16, sub_dim=8)
TRAIN_TARGET = 2048


def main() -> None:
    doc_dir = sys.argv[1] if len(sys.argv) > 1 else "./data_sf3"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "HYBRID_PROBE.json"
    spark = get_spark(app_name="hybrid-probe-split")
    spark.sparkContext.setLogLevel("ERROR")

    docs = (
        spark.read.parquet(f"{doc_dir}/documents.parquet")
        .withColumn("tokens", F.expr("split(trim(lower(text)), '\\\\s+')"))
        .filter(F.size("tokens") > 0)
    )
    emb = spark.read.parquet(f"{doc_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("emb"),
    )
    uni = docs.join(
        emb.select(F.col("vec_id").alias("doc_id")), "doc_id", "semi"
    )
    doc_terms = uni.select(
        "doc_id", F.explode("tokens").alias("term")
    ).filter(F.col("term") != "")
    emb_u = emb.join(
        uni.select(F.col("doc_id").alias("vec_id")), "vec_id", "semi"
    )
    n_uni = emb_u.count()
    m = max(1, n_uni // TRAIN_TARGET)
    train = emb_u.filter(F.col("vec_id") % m == 0)

    # fixed-size probe batch: the 50 smallest universe ids
    qdocs = uni.orderBy("doc_id").limit(N_PROBE_QUERIES)
    query_terms = (
        qdocs.select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.slice("tokens", 1, QTERMS)).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
    ).cache()
    query_terms.count()
    q_vecs = (
        emb_u.join(
            qdocs.select(F.col("doc_id").alias("vec_id")), "vec_id", "semi"
        ).select(F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb"))
    ).cache()
    q_vecs.count()  # probe batch pinned out of every timed region

    root = tempfile.mkdtemp(prefix="wdp_hybrid_probe_")
    try:
        def _build():
            write_bm25_index(doc_terms, f"{root}/bm25")
            sim.write_ivfpq_index(
                emb_u, f"{root}/ivfpq",
                n_lists=N_LISTS, n_iter=2, train=train, **PQ,
            )

        build_s, build_cpu = measure_best(_build, 3)

        def _probe():
            sparse = probe_bm25_index(
                spark, f"{root}/bm25", query_terms, k=K
            ).select("query_id", "doc_id", "rank")
            ann = sim.probe_ivfpq_index(
                spark, f"{root}/ivfpq", q_vecs, k=K, n_probe=N_PROBE
            ).select(
                "query_id", F.col("neighbor_id").alias("doc_id"),
                F.col("rank").cast("int").alias("rank"),
            )
            rrf_fuse([sparse, ann], k=K).write.format("noop").mode(
                "overwrite"
            ).save()

        probe_s, probe_cpu = measure_best(_probe, 3)

        n_buckets_probed = (
            query_terms.select(
                _term_bucket(F.col("term"), N_POSTING_BUCKETS).alias("b")
            ).distinct().count()
        )
        # the probed-list union over the batch, from the same helper the
        # probe itself uses (the planning-time partition filter's ids)
        coarse = sim._centroid_rows(
            spark.read.parquet(f"{root}/ivfpq/_centroids")
        )
        books = sim.read_ivfpq_codebooks(spark, f"{root}/ivfpq")
        _, probed_ids, _ = sim._ivfpq_probes(
            spark, q_vecs, coarse, books, PQ["sub_dim"], N_PROBE,
            "query_id", "qemb",
        )
        n_lists_probed = len(set(probed_ids))
        art = {
            "metric": (
                "persisted HYBRID stack (t29): build vs fused-probe split "
                "(min of 3, shared measure_best protocol); probe batch "
                f"fixed at {N_PROBE_QUERIES} queries; BM25 leg prunes to "
                "its term buckets, IVFPQ leg to n_probe lists per query; "
                "fusion adds only probe-sized work"
            ),
            "doc_dir": doc_dir,
            "n_universe": int(n_uni),
            "bm25_buckets": N_POSTING_BUCKETS,
            "bm25_buckets_probed": n_buckets_probed,
            "ivfpq_n_lists": N_LISTS,
            "ivfpq_n_probe_per_query": N_PROBE,
            "ivfpq_lists_probed_union": int(n_lists_probed),
            "build_s": build_s,
            "build_cpu_s": build_cpu,
            "probe_fused_s": probe_s,
            "probe_fused_cpu_s": probe_cpu,
        }
        with open(out_path, "w") as f:
            json.dump(art, f, indent=1)
        print(json.dumps(art))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
