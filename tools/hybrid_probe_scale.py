"""t29/t31 pruning at PRODUCTION index shape (round-10 verdict #2).

HYBRID_PROBE.json measured the serving split at the oracle constants
(n_lists=16), where a 50-query batch's probe union touches every list —
so "the probe reads n_probe/n_lists of the bytes" was extrapolation.
This tool rebuilds the persisted indexes at the sizes a deployment uses
and records, per probe-batch size, the fraction of list/bucket
partitions the batch actually reads and the probe wall:

- IVFPQ on data_emb1m (1,000,000 vectors): sqrt-N sizing via
  suggest_ivf_params (n_lists=1000), n_probe=32 — the verdict's
  production point (suggested n_probe n_lists//8=125 is also recorded;
  32 matches the measured-recall regime of RECALL_V17/RECALL_HYBRID).
- BM25 on data_sf3 documents (150,000 docs) at 256 posting buckets.

Per-QUERY pruning is the scale claim (each query reads n_probe/n_lists
or |its term buckets|/n_buckets); a BATCH's read is the union of its
queries' partitions, so the fraction is reported at batch sizes 1, 10
and 50 — batch 1 is the serving-latency shape, batch 50 matches
HYBRID_PROBE.json's throughput shape.

Usage: python tools/hybrid_probe_scale.py [emb_dir] [doc_dir] [out.json]
       (defaults: ./data_emb1m  ./data_sf3  HYBRID_PROBE_SCALE.json)
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
    _term_bucket,
    probe_bm25_index,
    write_bm25_index,
)
from weather_data_pipeline_sv_spark.operators.similarity import (
    suggest_ivf_params,
)
from weather_data_pipeline_sv_spark.session import get_spark

K = 10
N_PROBE = 32          # the verdict's production point at 1000 lists
BM25_BUCKETS = 256
QTERMS = 8
BATCHES = (1, 10, 50)
PQ = dict(n_sub=8, k_codes=16, sub_dim=8)
TRAIN_PER_LIST = 32   # Lloyd sample: ~32 vectors per coarse centroid


def main() -> None:
    emb_dir = sys.argv[1] if len(sys.argv) > 1 else "./data_emb1m"
    doc_dir = sys.argv[2] if len(sys.argv) > 2 else "./data_sf3"
    out_path = sys.argv[3] if len(sys.argv) > 3 else "HYBRID_PROBE_SCALE.json"
    spark = get_spark(app_name="hybrid-probe-scale")
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="wdp_hybrid_scale_")
    art: dict = {
        "metric": (
            "persisted-index pruning at PRODUCTION shape: IVFPQ at "
            "sqrt-N sizing on the 1M-vector dir, BM25 at 256 buckets on "
            "the 150k-doc dir; per batch size: partitions read / total "
            "and min-of-3 probe wall (vs HYBRID_PROBE.json's n_lists=16 "
            "row where a 50-query union read everything)"
        ),
    }
    try:
        # ------------------------------------------------ IVFPQ @ 1M
        emb = spark.read.parquet(f"{emb_dir}/embeddings.parquet").select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias(
                "emb"
            ),
        )
        n_vec = emb.count()
        n_lists, suggested_probe = suggest_ivf_params(n_vec)
        m = max(1, n_vec // (TRAIN_PER_LIST * n_lists))
        train = emb.filter(F.col("vec_id") % m == 0)
        ipath = f"{root}/ivfpq"

        def _build_ivf():
            sim.write_ivfpq_index(
                emb, ipath, n_lists=n_lists, n_iter=2, train=train, **PQ
            )

        build_s, build_cpu = measure_best(_build_ivf, 1)
        n_code_files = sum(
            1
            for _, _, files in os.walk(ipath)
            for f in files
            if f.endswith(".parquet")
        )
        coarse = sim._centroid_rows(
            spark.read.parquet(f"{ipath}/_centroids")
        )
        books = sim.read_ivfpq_codebooks(spark, ipath)

        ivf_rows = []
        for bs in BATCHES:
            q = (
                emb.orderBy("vec_id").limit(bs)
                .select(
                    F.col("vec_id").alias("query_id"),
                    F.col("emb").alias("qemb"),
                )
                .cache()
            )
            q.count()
            _, probed_ids, _ = sim._ivfpq_probes(
                spark, q, coarse, books, PQ["sub_dim"], N_PROBE,
                "query_id", "qemb",
            )

            def _probe():
                sim.probe_ivfpq_index(
                    spark, ipath, q, k=K, n_probe=N_PROBE
                ).write.format("noop").mode("overwrite").save()

            w, c = measure_best(_probe, 3)
            ivf_rows.append({
                "batch_queries": bs,
                "lists_probed_union": len(probed_ids),
                "fraction_read": round(len(probed_ids) / n_lists, 4),
                "probe_wall_s": w,
                "probe_cpu_s": c,
            })
            q.unpersist()
        art["ivfpq"] = {
            "emb_dir": emb_dir,
            "n_vectors": int(n_vec),
            "n_lists": int(n_lists),
            "n_probe": N_PROBE,
            "suggested_n_probe": int(suggested_probe),
            "train_rows": int(train.count()),
            "build_s": build_s,
            "build_cpu_s": build_cpu,
            "code_files": int(n_code_files),
            "batches": ivf_rows,
        }
        print(json.dumps({"ivfpq": art["ivfpq"]}))

        # ------------------------------------------------ BM25 @ 256
        docs = (
            spark.read.parquet(f"{doc_dir}/documents.parquet")
            .withColumn(
                "tokens", F.expr("split(trim(lower(text)), '\\\\s+')")
            )
            .filter(F.size("tokens") > 0)
        )
        doc_terms = docs.select(
            "doc_id", F.explode("tokens").alias("term")
        ).filter(F.col("term") != "")
        n_docs = docs.count()
        bpath = f"{root}/bm25"

        def _build_bm25():
            write_bm25_index(doc_terms, bpath, n_buckets=BM25_BUCKETS)

        bbuild_s, bbuild_cpu = measure_best(_build_bm25, 1)

        bm_rows = []
        for bs in BATCHES:
            q_terms = (
                docs.orderBy("doc_id").limit(bs)
                .select(
                    F.col("doc_id").alias("query_id"),
                    F.explode(F.slice("tokens", 1, QTERMS)).alias("term"),
                )
                .filter(F.col("term") != "")
                .distinct()
                .cache()
            )
            q_terms.count()
            n_buckets_probed = (
                q_terms.select(
                    _term_bucket(F.col("term"), BM25_BUCKETS).alias("b")
                ).distinct().count()
            )

            def _probe():
                probe_bm25_index(
                    spark, bpath, q_terms, k=K
                ).write.format("noop").mode("overwrite").save()

            w, c = measure_best(_probe, 3)
            bm_rows.append({
                "batch_queries": bs,
                "buckets_probed_union": int(n_buckets_probed),
                "fraction_read": round(n_buckets_probed / BM25_BUCKETS, 4),
                "probe_wall_s": w,
                "probe_cpu_s": c,
            })
            q_terms.unpersist()
        art["bm25"] = {
            "doc_dir": doc_dir,
            "n_docs": int(n_docs),
            "n_buckets": BM25_BUCKETS,
            "build_s": bbuild_s,
            "build_cpu_s": bbuild_cpu,
            "batches": bm_rows,
        }

        with open(out_path, "w") as f:
            json.dump(art, f, indent=1)
        print(json.dumps(art))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
