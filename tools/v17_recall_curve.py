"""Measure IVFADC retrieval quality: recall@k curves + decomposition.

The v16/v17 catalog entries prove the IVFADC *definition* is computed
exactly (hash parity) and v17 hash-checks recall@k at the test dirs;
this tool measures the QUALITY-SPEED TRADE at a real corpus size. For
each configuration it runs the same operator stack as catalog v16/v18
over an embeddings dir and scores mean recall@5 of the compressed
probe-pruned answer against the EXACT cosine top-k (v1 semantics:
6-dp-rounded cosine desc, id asc).

Round-7 additions (the r06 verdict's #1):
- high-precision configs (k_codes=256 / M=16 subspaces — the FAISS
  8-bit-code norm) and rerank curves per config, to locate a named
  production operating point with recall@5 >= 0.9 on a CLUSTERED corpus
  (tools/make_clustered_emb_dir.py — the near-uniform data_emb300k is
  the known-degenerate case for any compressed code);
- margin histogram: per-query exact-cosine gap at rank 5 (cos@5 -
  cos@6) and the bulk gap (cos@5 - cos@100) — how much error the code
  may add before recall@5 / shortlist coverage degrade, measured not
  argued;
- reconstruction decomposition: recall of ranking by exact L2 against
  DECODED vectors over the WHOLE corpus (numpy; no routing, no LUT) =
  the code-error ceiling of a codebook, next to the flat-IVF control
  (= routing-only) and the measured operator (= both). Plus the
  per-vector reconstruction-error distribution against the margins.

Usage: python tools/v17_recall_curve.py [emb_dir] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from weather_data_pipeline_sv_spark.operators import similarity as sim
from weather_data_pipeline_sv_spark.session import get_spark

N_QUERIES = 10
TOP_K = 5
N_LISTS = 16
# catalog v16 config (the hash-checked definition) and the production
# high-precision configs this tool exists to locate
CONFIGS = {
    "m8_k16": dict(n_sub=8, k_codes=16, sub_dim=8),     # catalog default
    "m8_k64": dict(n_sub=8, k_codes=64, sub_dim=8),
    "m8_k256": dict(n_sub=8, k_codes=256, sub_dim=8),   # FAISS 8-bit codes
    "m16_k256": dict(n_sub=16, k_codes=256, sub_dim=4),  # 2x subspaces
}
TRAIN_TARGET = 2048  # catalog _V16_TRAIN (used for the catalog config)


def _train_target(k_codes: int) -> int:
    # seeds are the k lowest-id sample rows: the sample must scale with
    # the seed count (>= 16 rows per codeword) or Lloyd starves
    return max(TRAIN_TARGET, 16 * k_codes)


def _load_np(emb_dir: str) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(emb_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    order = np.argsort(np.asarray(t["vec_id"]))
    x = np.asarray(t["embedding"].combine_chunks().flatten(),
                   dtype=np.float64)
    return x.reshape(len(order), -1)[order]


def margin_stats(x: np.ndarray, n_queries: int, k: int) -> dict:
    """Exact-cosine margins per query: gap at rank k and gap to the
    rank-100 bulk — the error budget a compressed code has to fit in."""
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    sims = xn[:n_queries] @ xn.T
    m_at_k, bulk_gap, cos_k = [], [], []
    for i in range(n_queries):
        s = np.sort(sims[i])[::-1]  # s[0] = self
        m_at_k.append(float(s[k] - s[k + 1]))
        bulk_gap.append(float(s[k] - s[100]))
        cos_k.append(float(s[k]))
    q = lambda a, p: float(np.percentile(a, p))
    return {
        "per_query_margin_at_k": [round(v, 5) for v in m_at_k],
        "margin_at_k": {"min": q(m_at_k, 0), "p25": q(m_at_k, 25),
                        "median": q(m_at_k, 50), "p75": q(m_at_k, 75),
                        "max": q(m_at_k, 100)},
        "bulk_gap_k_to_100": {"min": q(bulk_gap, 0),
                              "median": q(bulk_gap, 50),
                              "max": q(bulk_gap, 100)},
        "cos_at_k": {"min": q(cos_k, 0), "median": q(cos_k, 50),
                     "max": q(cos_k, 100)},
    }


def np_encode_decode(x: np.ndarray, books, sub_dim: int):
    """Encode+decode the whole corpus against driver-side codebooks
    (numpy twin of pq_encode's argmin — same per-dim accumulation).
    Returns (decoded [n, dim], recon_sq_err [n])."""
    n, dim = x.shape
    dec = np.empty_like(x)
    err = np.zeros(n)
    for s, book in enumerate(books):
        lo = s * sub_dim
        sub = x[:, lo:lo + sub_dim]
        cents = np.array([c for _, c in book])  # [K, sub_dim]
        # matmul identity, not a broadcast [n, K, sub_dim] temporary
        # (that is ~5 GiB at n=300k, K=256): this tool measures recall,
        # not hash parity, so the fold order is free to differ from the
        # oracle kernels
        d = (
            (sub ** 2).sum(axis=1)[:, None]
            - 2.0 * (sub @ cents.T)
            + (cents ** 2).sum(axis=1)[None, :]
        )
        code = d.argmin(axis=1)
        dec[:, lo:lo + sub_dim] = cents[code]
        err += np.maximum(d[np.arange(n), code], 0.0)
    return dec, err


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

    def train_for(k_codes: int):
        m = max(1, n // _train_target(k_codes))
        return emb.filter(F.col("vec_id") % m == 0), m

    def run(n_probe: int, cfg: str) -> dict:
        c = CONFIGS[cfg]
        train, m = train_for(c["k_codes"])
        t0 = time.perf_counter()
        ann = {
            (r["query_id"], r["neighbor_id"])
            for r in sim.ivfpq_topk(
                emb, queries, k=TOP_K,
                n_lists=N_LISTS, n_probe=n_probe, n_iter=2,
                train=train, **c,
            ).select("query_id", "neighbor_id").collect()
        }
        dt = time.perf_counter() - t0
        rec = len(ann & truth) / float(N_QUERIES * TOP_K)
        row = {"config": cfg, "n_probe": n_probe, "train_stride": m,
               "recall_at_5": round(rec, 4), "wall_s": round(dt, 2), **c}
        print(f"[recall] {cfg} n_probe={n_probe}: recall@5={rec:.3f} "
              f"({dt:.1f} s end-to-end incl. train)", file=sys.stderr)
        return row

    def run_rerank(n_probe: int, cfg: str, R: int) -> dict:
        # v18 semantics: exact re-ranking of the ADC top-R shortlist —
        # rerank recall@k == shortlist coverage of the true top-k, since
        # exact re-ranking never demotes a true neighbor on the shortlist
        c = CONFIGS[cfg]
        train, m = train_for(c["k_codes"])
        t0 = time.perf_counter()
        short = {
            (r["query_id"], r["neighbor_id"])
            for r in sim.ivfpq_topk(
                emb, queries, k=R, n_lists=N_LISTS, n_probe=n_probe,
                n_iter=2, train=train, **c,
            ).select("query_id", "neighbor_id").collect()
        }
        dt = time.perf_counter() - t0
        rec = len(short & truth) / float(N_QUERIES * TOP_K)
        row = {"config": cfg, "n_probe": n_probe, "R": R,
               "recall_at_5": round(rec, 4), "wall_s": round(dt, 2)}
        print(f"[recall] rerank {cfg} n_probe={n_probe} R={R}: "
              f"recall@5={rec:.3f} ({dt:.1f} s)", file=sys.stderr)
        return row

    # routing error: n_probe sweep at the catalog config
    probe_curve = [run(p, "m8_k16") for p in (1, 2, 4, 8, 16)]
    # compression error: codebook-size / subspace-count sweep at the
    # default n_probe — the quality knobs a 100 TB deployment turns
    k_curve = [run(4, c) for c in ("m8_k64", "m8_k256", "m16_k256")]
    # rerank: catalog config (continuity with r06) and the production
    # config the operating point comes from
    rerank_curve = [run_rerank(4, "m8_k16", R) for R in (25, 100, 400)]
    rerank_curve += [
        run_rerank(8, "m16_k256", R) for R in (25, 100, 400)
    ]

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

    # ----- margin + reconstruction decomposition (numpy, exact) -----
    x = _load_np(emb_dir)
    margins = margin_stats(x, N_QUERIES, TOP_K)
    print(f"[recall] margins@{TOP_K}: {margins['margin_at_k']}",
          file=sys.stderr)

    decomposition = []
    truth_idx = {}
    for qid, nid in truth:
        truth_idx.setdefault(qid, set()).add(nid)
    for cfg in ("m8_k16", "m16_k256"):
        c = CONFIGS[cfg]
        train, m = train_for(c["k_codes"])
        books = sim.pq_train(
            train, c["n_sub"], c["k_codes"], c["sub_dim"], n_iter=2
        )
        dec, err = np_encode_decode(x, books, c["sub_dim"])
        # reconstruction ranking: exact L2 between the query (full
        # precision) and every DECODED vector — the CODE-ONLY ranking
        # quality (ADC computes exactly this distance per candidate, so
        # any gap to the measured operator is routing). Note it is NOT a
        # ceiling on the routed number: probing prunes confusable far-
        # cluster candidates, so routed ADC can EXCEED it (measured on
        # the clustered dir: 0.44 routed vs 0.32 unrouted at m8_k16 —
        # routing is a filter that only removes competitors)
        hits = 0
        for qi in range(N_QUERIES):
            d = ((dec - x[qi]) ** 2).sum(axis=1)
            d[qi] = np.inf  # self
            top = np.argpartition(d, TOP_K)[:TOP_K]
            hits += len(set(int(t) for t in top) & truth_idx.get(qi, set()))
        rec_ceiling = hits / float(N_QUERIES * TOP_K)
        # reconstruction error in COSINE units: for unit vectors,
        # cos(q, x) - cos(q, dec(x)) is bounded by |x - dec(x)|; compare
        # its distribution to the rank-5 margin distribution
        l2 = np.sqrt(err)
        decomposition.append({
            "config": cfg, **c, "train_stride": m,
            "recall_decoded_l2_no_routing": round(rec_ceiling, 4),
            "recon_l2": {
                "median": round(float(np.median(l2)), 5),
                "p90": round(float(np.percentile(l2, 90)), 5),
            },
            "median_recon_l2_over_median_margin": round(
                float(np.median(l2))
                / max(margins["margin_at_k"]["median"], 1e-12), 1,
            ),
        })
        print(f"[recall] decomposition {cfg}: decoded-L2 recall "
              f"{rec_ceiling:.3f}, median |x-dec(x)| "
              f"{float(np.median(l2)):.4f}", file=sys.stderr)

    art = {
        "metric": (
            f"IVFADC recall@{TOP_K} vs exact cosine top-{TOP_K}, "
            f"{N_QUERIES} queries, n_lists={N_LISTS}, dir={emb_dir} "
            f"(n={n}); probe_curve varies routing at the catalog config "
            "(M=8, k=16), k_curve varies code precision at n_probe=4, "
            "rerank_curve = v18 shortlist coverage; decomposition: "
            "flat_ivf_control = routing-only loss, "
            "recall_decoded_l2_no_routing = code-only ranking quality "
            "(not a ceiling on routed ADC — probing prunes confusable "
            "far candidates)"
        ),
        "n": n,
        "probe_curve": probe_curve,
        "k_curve": k_curve,
        "rerank_curve": rerank_curve,
        "flat_ivf_control": flat_curve,
        "margins": margins,
        "decomposition": decomposition,
    }
    with open(out_path, "w") as f:
        json.dump(art, f, indent=1)
    spark.stop()
    print(json.dumps(art))


if __name__ == "__main__":
    main()
