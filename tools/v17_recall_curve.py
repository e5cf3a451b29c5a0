"""Measure IVFADC retrieval quality: recall@k vs n_probe (round-6).

The v16/v17 catalog entries prove the IVFADC *definition* is computed
exactly (hash parity) and v17 hash-checks recall@k at the test dirs;
this tool measures the QUALITY-SPEED TRADE at a real corpus size — the
number the round-5 verdict said was missing. For each n_probe it runs
the same configuration as catalog v16 (16 coarse lists, 8x16 PQ,
corpus-count-derived training stride) over an embeddings dir and scores
mean recall@5 of the compressed probe-pruned answer against the EXACT
cosine top-k (v1 semantics: 6-dp-rounded cosine desc, id asc).

n_probe = n_lists isolates PQ-compression error (no pruning); smaller
n_probe adds routing error on top. Results land in RECALL_V17.json and
are recorded in SCALE.md next to the v16 speed numbers.

Usage: python tools/v17_recall_curve.py [emb_dir] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from weather_data_pipeline_sv_spark.operators import similarity as sim
from weather_data_pipeline_sv_spark.session import get_spark

N_QUERIES = 10
TOP_K = 5
N_LISTS = 16
N_SUB, K_CODES, SUB_DIM = 8, 16, 8
TRAIN_TARGET = 2048  # catalog _V16_TRAIN


def main() -> None:
    emb_dir = sys.argv[1] if len(sys.argv) > 1 else "data_emb300k"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "RECALL_V17.json"
    spark = get_spark(app_name="v17-recall-curve")
    spark.sparkContext.setLogLevel("ERROR")

    emb = (
        spark.read.parquet(f"{emb_dir}/embeddings.parquet")
        .select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("emb"),
        )
        .repartition(32)
        .persist()
    )
    n = emb.count()
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )

    # exact truth: the operator that IS the recall oracle (v1 semantics;
    # a hand-rolled copy here would silently diverge if the operator's
    # tie-break or rounding ever changed)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.brute_force_topk(emb, queries, k=TOP_K)
        .select("query_id", "neighbor_id")
        .collect()
    }
    print(f"[recall] exact truth built over n={n}", file=sys.stderr)

    m = max(1, n // TRAIN_TARGET)
    train = emb.filter(F.col("vec_id") % m == 0)

    def run(n_probe: int, k_codes: int) -> dict:
        t0 = time.perf_counter()
        ann = {
            (r["query_id"], r["neighbor_id"])
            for r in sim.ivfpq_topk(
                emb, queries, k=TOP_K,
                n_lists=N_LISTS, n_probe=n_probe,
                n_sub=N_SUB, k_codes=k_codes, sub_dim=SUB_DIM, n_iter=2,
                train=train,
            ).select("query_id", "neighbor_id").collect()
        }
        dt = time.perf_counter() - t0
        rec = len(ann & truth) / float(N_QUERIES * TOP_K)
        row = {"n_probe": n_probe, "k_codes": k_codes,
               "recall_at_5": round(rec, 4), "wall_s": round(dt, 2)}
        print(f"[recall] n_probe={n_probe} k_codes={k_codes}: "
              f"recall@5={rec:.3f} ({dt:.1f} s end-to-end incl. train)",
              file=sys.stderr)
        return row

    # routing error: n_probe sweep at the catalog config (8x16 PQ);
    # n_probe = n_lists = no pruning (PQ-compression error only)
    probe_curve = [run(p, K_CODES) for p in (1, 2, 4, 8, 16)]
    # compression error: codebook-size sweep at the default n_probe —
    # the quality knob a 100 TB deployment turns (FAISS default is 8-bit
    # codes, k=256)
    k_curve = [run(4, k) for k in (64, 256)]

    # rerank (v18 semantics): exact re-ranking of the ADC top-R
    # shortlist — rerank recall@k == shortlist coverage of the true
    # top-k, since exact re-ranking never demotes a true neighbor that
    # made the shortlist
    rerank_curve = []
    for R in (25, 100, 400):
        t0 = time.perf_counter()
        short = {
            (r["query_id"], r["neighbor_id"])
            for r in sim.ivfpq_topk(
                emb, queries, k=R, n_lists=N_LISTS, n_probe=4,
                n_sub=N_SUB, k_codes=K_CODES, sub_dim=SUB_DIM, n_iter=2,
                train=train,
            ).select("query_id", "neighbor_id").collect()
        }
        dt = time.perf_counter() - t0
        rec = len(short & truth) / float(N_QUERIES * TOP_K)
        rerank_curve.append(
            {"R": R, "recall_at_5": round(rec, 4), "wall_s": round(dt, 2)}
        )
        print(f"[recall] rerank R={R}: recall@5={rec:.3f} ({dt:.1f} s)",
              file=sys.stderr)

    # control: FLAT IVF (full-precision vectors, same routing) isolates
    # routing loss from PQ loss — if this is high while the ADC rows are
    # low, the compression is the binding constraint, not the pruning
    flat_curve = []
    for n_probe in (1, 4):
        t0 = time.perf_counter()
        ann = {
            (r["query_id"], r["neighbor_id"])
            for r in sim.ivf_ann_topk(
                emb, queries, k=TOP_K, n_lists=N_LISTS, n_probe=n_probe,
                n_iter=2,
            ).select("query_id", "neighbor_id").collect()
        }
        dt = time.perf_counter() - t0
        rec = len(ann & truth) / float(N_QUERIES * TOP_K)
        flat_curve.append(
            {"n_probe": n_probe, "recall_at_5": round(rec, 4),
             "wall_s": round(dt, 2)}
        )
        print(f"[recall] flat-ivf n_probe={n_probe}: recall@5={rec:.3f} "
              f"({dt:.1f} s)", file=sys.stderr)

    art = {
        "metric": (
            f"IVFADC recall@{TOP_K} vs exact cosine top-{TOP_K}, "
            f"{N_QUERIES} queries, n_lists={N_LISTS}, M={N_SUB} "
            f"subspaces, train stride m={m}, dir={emb_dir} (n={n}); "
            "probe_curve varies routing at k_codes=16, k_curve varies "
            "codebook size at n_probe=4"
        ),
        "n": n,
        "probe_curve": probe_curve,
        "k_curve": k_curve,
        "rerank_curve": rerank_curve,
        "flat_ivf_control": flat_curve,
    }
    with open(out_path, "w") as f:
        json.dump(art, f, indent=1)
    spark.stop()
    print(json.dumps(art))


if __name__ == "__main__":
    main()
