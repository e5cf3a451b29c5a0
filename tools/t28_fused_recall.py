"""Measure t28's claim: hybrid retrieval keeps its quality when the
dense leg swaps from exact cosine (t27) to the IVFADC probe (t28).

The catalog entries pin the DEFINITIONS by hash (t27 exact fusion, t28
ANN fusion); what they cannot show is the retrieval-quality cost of the
swap at a real corpus size — round-8 verdict #2. This tool measures it
with the RECALL_CLUSTERED methodology: documents from a scaled text dir
(default data_sf3, 150k docs) paired with the CLUSTERED embedding
corpus (default data_embclust — near-uniform embeddings are the known-
degenerate case for compressed codes, so they would overstate nothing
and understate everything), universe = ids carrying both.

Per operating point (n_probe, rerank-R over the m8_k16 catalog code):
- dense_recall@k of the ANN leg vs the exact cosine leg (the v17/v18
  number, here on the hybrid universe/query set);
- FUSED recall@k of RRF(BM25, ANN-dense) vs RRF(BM25, exact-dense) —
  the number the serving stack actually cares about, with the BM25 leg
  held fixed so every difference is the dense approximation;
- fused top-1 agreement (the answer slot).

Like-for-like: the exact-dense truth EXCLUDES self-retrieval, matching
the ANN leg's convention (t27's entry includes self — that documented
divergence is a semantics choice, not approximation error, so it is
held out of the recall denominator; `fused_recall_vs_t27_self` reports
the strict-vs-t27 number for completeness).

Stack: BM25 + IVFPQ shortlists run the repo's Spark operators
(bm25_topk / ivfpq_topk with the v16 sampled-training stride); the
exact-cosine truth, the rerank step, and the RRF fold run in numpy on
the collected probe-sized lists (rank fusion over queries x k rows —
driver-scale by construction; the FOLD math mirrors
operators/retrieval.py::rrf_fuse including its 9-dp tie rounding).

Usage: python tools/t28_fused_recall.py [doc_dir] [emb_dir] [out.json]
Defaults: data_sf3 data_embclust RECALL_HYBRID.json
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
from weather_data_pipeline_sv_spark.operators.retrieval import bm25_topk
from weather_data_pipeline_sv_spark.session import get_spark

K = 10          # fused list depth (recall@10)
RRF_K = 60      # the fusion constant (catalog _T27_RRF_K)
QMOD = 1000     # query rule: universe ids % QMOD == 0 (~150 queries)
QTERMS = 8      # BM25 query = first 8 tokens (catalog _BM25_QTERMS)
N_LISTS = 16
TRAIN_TARGET = 2048  # catalog _V16_TRAIN
# operating points over the catalog code config (m8_k16) — R=0 is the
# raw v16 shape, R>0 is the v18 shortlist-then-exact-rerank shape
POINTS = [
    {"n_probe": 4, "R": 0},
    {"n_probe": 8, "R": 0},
    {"n_probe": 4, "R": 100},
    {"n_probe": 4, "R": 400},
    {"n_probe": 8, "R": 100},
    {"n_probe": 8, "R": 400},
]
PQ = dict(n_sub=8, k_codes=16, sub_dim=8)


def _rnd9(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 1e9 + 0.5 + 1e-6) / 1e9


def _fuse(legs: list[dict], qids: list[int]) -> dict[int, list[int]]:
    """RRF over per-query rank lists: legs are {qid: [doc ids ranked]};
    returns {qid: fused top-K}, mirroring rrf_fuse (sum of
    1/(RRF_K+rank), 9-dp rounded desc, doc id asc)."""
    out = {}
    for qid in qids:
        contrib: dict[int, float] = {}
        for leg in legs:
            for r, d in enumerate(leg.get(qid, [])[:K], start=1):
                contrib[d] = contrib.get(d, 0.0) + 1.0 / (RRF_K + r)
        docs = np.array(sorted(contrib), dtype=np.int64)
        scores = _rnd9(np.array([contrib[int(d)] for d in docs]))
        order = np.lexsort((docs, -scores))
        out[qid] = [int(docs[i]) for i in order[:K]]
    return out


def _to_ranklists(rows, qcol="query_id", dcol="doc_id") -> dict:
    by_q: dict[int, list[tuple[int, int]]] = {}
    for r in rows:
        by_q.setdefault(int(r[qcol]), []).append((int(r["rank"]), int(r[dcol])))
    return {q: [d for _, d in sorted(v)] for q, v in by_q.items()}


def main() -> None:
    doc_dir = sys.argv[1] if len(sys.argv) > 1 else "data_sf3"
    emb_dir = sys.argv[2] if len(sys.argv) > 2 else "data_embclust"
    out_path = sys.argv[3] if len(sys.argv) > 3 else "RECALL_HYBRID.json"

    spark = get_spark(app_name="t28-fused-recall")

    docs = (
        spark.read.parquet(os.path.join(doc_dir, "documents.parquet"))
        .select(
            "doc_id",
            F.split(F.trim(F.lower("text")), r"\s+").alias("tokens"),
        )
        .filter(F.size("tokens") > 0)
    )
    emb = spark.read.parquet(
        os.path.join(emb_dir, "embeddings.parquet")
    ).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("emb"),
    )
    uni = docs.join(
        emb.select(F.col("vec_id").alias("doc_id")), "doc_id", "semi"
    )
    uni_ids = np.array(
        sorted(r[0] for r in uni.select("doc_id").collect()), dtype=np.int64
    )
    n_uni = len(uni_ids)
    qids = [int(i) for i in uni_ids if i % QMOD == 0]
    print(f"universe={n_uni}  queries={len(qids)}", flush=True)

    # ---- sparse leg (shared by every point and by the truth) ----------
    t0 = time.time()
    doc_terms = uni.select(
        "doc_id", F.explode("tokens").alias("term")
    ).filter(F.col("term") != "")
    q_terms = (
        uni.filter(F.col("doc_id") % QMOD == 0)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.slice("tokens", 1, QTERMS)).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
    )
    sparse = _to_ranklists(
        bm25_topk(doc_terms, q_terms, k=K).collect(), dcol="doc_id"
    )
    wall_sparse = round(time.time() - t0, 2)
    print(f"sparse leg done in {wall_sparse}s", flush=True)

    # ---- exact dense truth (numpy brute cosine over the universe) -----
    emb_u = emb.join(
        uni.select(F.col("doc_id").alias("vec_id")), "vec_id", "semi"
    )
    rows = emb_u.collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    x = np.array([r["emb"] for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    ids, x = ids[order], x[order]
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    qpos = np.searchsorted(ids, np.array(qids, dtype=np.int64))
    sims = _rnd9(xn[qpos] @ xn.T)  # 6-dp in-catalog; 9-dp is finer-grained

    def dense_top(exclude_self: bool) -> dict[int, list[int]]:
        outd = {}
        for row, qid in zip(sims, qids):
            s = row.copy()
            if exclude_self:
                s[np.searchsorted(ids, qid)] = -np.inf
            # order: cosine desc, id asc  (ids are sorted ascending)
            top = np.argsort(-s, kind="stable")[: K + 1]
            outd[qid] = [int(ids[i]) for i in top if ids[i] != qid or
                         not exclude_self][:K]
        return outd

    exact_noself = dense_top(exclude_self=True)
    exact_withself = dense_top(exclude_self=False)
    truth_fused = _fuse([sparse, exact_noself], qids)
    t27_fused = _fuse([sparse, exact_withself], qids)

    # ---- ANN dense legs per operating point ---------------------------
    m = max(1, n_uni // TRAIN_TARGET)
    train = emb_u.filter(F.col("vec_id") % m == 0)
    q_df = emb_u.filter(F.col("vec_id") % QMOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    points_out = []
    for pt in POINTS:
        n_probe, R = pt["n_probe"], pt["R"]
        t0 = time.time()
        shortlist_k = R if R > 0 else K
        ann_rows = sim.ivfpq_topk(
            emb_u, q_df, k=shortlist_k,
            n_lists=N_LISTS, n_probe=n_probe, n_iter=2, train=train, **PQ,
        ).collect()
        if R > 0:
            # exact rerank of the R-shortlist (v18 shape; probe-sized)
            ann = {}
            for qid in qids:
                cand = [
                    int(r["neighbor_id"]) for r in ann_rows
                    if int(r["query_id"]) == qid
                ]
                if not cand:
                    ann[qid] = []
                    continue
                cpos = np.searchsorted(ids, np.array(sorted(cand)))
                qrow = sims[qids.index(qid)]
                cs = qrow[cpos]
                cids = ids[cpos]
                o = np.lexsort((cids, -_rnd9(cs)))
                ann[qid] = [int(cids[i]) for i in o[:K]]
        else:
            ann = _to_ranklists(ann_rows, dcol="neighbor_id")
        wall = round(time.time() - t0, 2)

        fused = _fuse([sparse, ann], qids)
        d_hits = np.mean([
            len(set(ann[q]) & set(exact_noself[q])) / K for q in qids
        ])
        f_hits = np.mean([
            len(set(fused[q]) & set(truth_fused[q])) / K for q in qids
        ])
        f27 = np.mean([
            len(set(fused[q]) & set(t27_fused[q])) / K for q in qids
        ])
        top1 = np.mean([
            1.0 if fused[q] and truth_fused[q]
            and fused[q][0] == truth_fused[q][0] else 0.0
            for q in qids
        ])
        rec = {
            "config": "m8_k16", "n_probe": n_probe, "R": R,
            "dense_recall_at_k": round(float(d_hits), 4),
            "fused_recall_at_k": round(float(f_hits), 4),
            "fused_recall_vs_t27_self": round(float(f27), 4),
            "fused_top1_agreement": round(float(top1), 4),
            "wall_s": wall,
        }
        points_out.append(rec)
        print(json.dumps(rec), flush=True)

    # sparse-only control: how much the fused list owes BM25 alone
    sparse_only = _fuse([sparse], qids)
    control = round(float(np.mean([
        len(set(sparse_only[q]) & set(truth_fused[q])) / K for q in qids
    ])), 4)

    out = {
        "metric": (
            f"hybrid fused recall@{K}: RRF(BM25, IVFADC m8_k16) vs "
            f"RRF(BM25, exact cosine) on universe={n_uni} "
            f"(docs={doc_dir}, clustered embeddings={emb_dir}), "
            f"{len(qids)} queries (id % {QMOD} == 0), rrf_k={RRF_K}; "
            "BM25 leg held fixed — every gap is the dense approximation; "
            "exact truth excludes self (the ANN-leg convention; "
            "fused_recall_vs_t27_self scores against t27's include-self "
            "fusion)"
        ),
        "n_universe": int(n_uni),
        "n_queries": len(qids),
        "k": K,
        "train_stride": int(m),
        "sparse_leg_wall_s": wall_sparse,
        "sparse_only_vs_truth_control": control,
        "points": points_out,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
