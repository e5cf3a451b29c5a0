"""Decompose where the Lloyd-dominated entries spend wall time.

Usage: python tools/lloyd_profile.py [sf_dir]

Phases timed (noop sink / collect boundaries, labelled jobs):
- v13: corpus read+persist, pq_train (seed collect, per-iteration jobs),
  encode+noop.
- pipe5 initialize: ivf_centroids on the strided sample (seed collect,
  per-iteration jobs), centroid write.

This is a measurement tool (guide §1): it runs the same functions the
entries call, with timers at the existing job boundaries. No entry code
is modified.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("lloyd-profile")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from weather_data_pipeline_sv_spark.catalog.vector import (
    _PQ_K, _PQ_SUB, _PQ_SUBDIM, _corpus_and_queries, _dense_count,
    _sem_params,
)
from weather_data_pipeline_sv_spark.operators import similarity as sim

out = {"sf_dir": sf_dir, "phases": []}


def phase(name, fn):
    t0 = time.monotonic()
    r = fn()
    dt = time.monotonic() - t0
    out["phases"].append({"phase": name, "wall_s": round(dt, 3)})
    print(f"{name:55s} {dt:7.3f} s", flush=True)
    return r


# ---- v13 decomposition ----------------------------------------------------
emb, _q = _corpus_and_queries(spark, sf_dir)
emb = phase("v13: corpus persist+count", lambda: (emb.persist(), emb.count())[0])

specs = [(s * _PQ_SUBDIM, _PQ_SUBDIM, _PQ_K) for s in range(_PQ_SUB)]
max_k = _PQ_K
seed_rows = phase(
    "v13: seed collect (orderBy+limit)",
    lambda: emb.select("vec_id", "emb").orderBy("vec_id").limit(max_k).collect(),
)
books = [
    [(i, [float(x) for x in r["emb"]][off : off + width]) for i, r in enumerate(seed_rows[:k])]
    for off, width, k in specs
]
for it in range(2):
    def one_iter(books=books):
        per_spec = [
            F.struct(
                F.lit(s).alias("s"),
                sim._slice_best("emb", off, width, books[s])["list_id"].alias("list_id"),
                F.slice(F.col("emb"), off + 1, width).alias("sub"),
            )
            for s, (off, width, _k) in enumerate(specs)
        ]
        return (
            emb.select(F.explode(F.array(*per_spec)).alias("x"))
            .select(
                F.col("x.s").alias("s"),
                F.col("x.list_id").alias("list_id"),
                F.posexplode("x.sub").alias("pos", "v"),
            )
            .groupBy("s", "list_id", "pos")
            .agg(F.avg("v").alias("m"))
            .collect()
        )
    mrows = phase(f"v13: joint-Lloyd iteration {it} (assign+means job)", one_iter)
    means = {}
    for r in mrows:
        means.setdefault((int(r["s"]), int(r["list_id"])), {})[int(r["pos"])] = float(r["m"])
    books = [
        [
            (lid, [means[(s, lid)][d] for d in range(len(old))] if (s, lid) in means else old)
            for lid, old in book
        ]
        for s, book in enumerate(books)
    ]

enc = sim.pq_encode(emb, books, _PQ_SUBDIM)
phase(
    "v13: encode pass (noop sink)",
    lambda: enc.write.format("noop").mode("overwrite").save(),
)
# emb stays persisted through the comparator phases below so the np path
# is timed against the same cache state the distributed phases had
# (round-10 ADVICE: unpersisting here skewed the decomposition)

# ---- driver-side comparator ------------------------------------------------
t0 = time.monotonic()
probed = emb.select("vec_id").limit(sim.IVFPQ_DRIVER_TRAIN_MAX_ROWS + 1).count()
t_probe = time.monotonic() - t0
t0 = time.monotonic()
rows = [
    (r["vec_id"], r["emb"])
    for r in emb.select("vec_id", "emb").orderBy("vec_id").collect()
]
t_collect = time.monotonic() - t0
t0 = time.monotonic()
books_np = sim.lloyd_np(rows, specs, 2)
t_np = time.monotonic() - t0
out["phases"] += [
    {"phase": "np: bounded probe count", "wall_s": round(t_probe, 3)},
    {"phase": "np: ordered collect", "wall_s": round(t_collect, 3)},
    {"phase": "np: lloyd_np 2 iters", "wall_s": round(t_np, 3)},
]
print(f"{'np: bounded probe count':55s} {t_probe:7.3f} s")
print(f"{'np: ordered collect':55s} {t_collect:7.3f} s")
print(f"{'np: lloyd_np 2 iters':55s} {t_np:7.3f} s")

# books equality check (books from distributed loop vs lloyd_np)
same = all(
    lid_a == lid_b and va == vb
    for ba, bb in zip(books, books_np)
    for (lid_a, va), (lid_b, vb) in zip(ba, bb)
)
out["books_bitwise_equal"] = same
print("books bitwise equal (distributed vs lloyd_np):", same)

# ---- pipe5 initialize decomposition ----------------------------------------
n = _dense_count(emb)
cut1 = (n - 1) // 3
k, m = _sem_params(cut1 + 1)
train = emb.filter((F.col("vec_id") <= cut1) & (F.col("vec_id") % m == 0))
phase(
    f"pipe5-init: ivf_centroids distributed (k={k})",
    lambda: sim.ivf_centroids(
        train, n_lists=k, n_iter=2, driver_train_max_rows=0
    ).collect(),
)
phase(
    f"pipe5-init: ivf_centroids fast path (k={k})",
    lambda: sim.ivf_centroids(train, n_lists=k, n_iter=2).collect(),
)
t0 = time.monotonic()
rows5 = [
    (r["vec_id"], r["emb"])
    for r in train.select("vec_id", "emb").orderBy("vec_id").collect()
]
if not rows5:
    sys.exit(
        "pipe5-init: empty training sample — the strided filter matched "
        f"no rows under {sf_dir}; pass a populated sf_dir."
    )
dim = len(rows5[0][1])
books5 = sim.lloyd_np(rows5, [(0, dim, k)], 2)
t_np5 = time.monotonic() - t0
out["phases"].append({"phase": "pipe5-init: collect+lloyd_np", "wall_s": round(t_np5, 3)})
print(f"{'pipe5-init: collect+lloyd_np':55s} {t_np5:7.3f} s")
emb.unpersist()

with open("/tmp/lloyd_profile.json", "w") as f:
    json.dump(out, f, indent=1)
print("wrote /tmp/lloyd_profile.json")
