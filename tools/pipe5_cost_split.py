"""Quantify pipe5's store-I/O floor (round-5 verdict #3).

pipe5_quantizer_retrain is the suite's heaviest entry (27.8 s at sf0.1,
118.9 s at 30x) and SCALE.md called its cost "a store-I/O floor" without
a measured split. This tool measures it two ways:

1. PHASE TIMING + BYTES: the exact entry lifecycle (same sizing, same
   slices) run step by step against a real on-disk store, recording per
   phase wall seconds and bytes written (du of the store root between
   phases).
2. MEDIUM CONTRAST: the identical lifecycle against a tmpfs-backed store
   (/dev/shm — RAM-speed writes, same code path, same plans). Disk run
   minus tmpfs run isolates what the storage medium costs; the tmpfs
   total is the compute+plan floor.

Usage: python tools/pipe5_cost_split.py [sf_dir] [out.json]
Writes PIPE5_SPLIT.json; numbers recorded in SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from weather_data_pipeline_sv_spark.catalog.vector import (
    _corpus_and_queries,
    _dense_count,
    _sem_params,
    _SEM_BLOCK,
    _SEM_TRAIN,
)
from weather_data_pipeline_sv_spark.operators.incremental_vectors import (
    VectorStore,
)
from weather_data_pipeline_sv_spark.session import get_spark


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def lifecycle(spark, sf_dir: str, base_dir: str) -> dict:
    emb, _ = _corpus_and_queries(spark, sf_dir)
    n = _dense_count(emb)
    cut1, cut2 = (n - 1) // 3, 2 * (n - 1) // 3
    k, m = _sem_params(cut1 + 1)
    root = tempfile.mkdtemp(prefix="wdp_pipe5_split_", dir=base_dir)
    phases = []
    prev_bytes = 0

    def phase(name, fn):
        nonlocal prev_bytes
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        b = _du(root)
        delta = b - prev_bytes
        rec = {
            # directory-size DELTA, not a write counter: a phase that
            # compacts/replaces store files (e.g. retrain rewrites the
            # quantizer) legitimately goes negative — labeled so a
            # negative value isn't read as an accounting bug (r06 note)
            "phase": name, "wall_s": round(dt, 2), "bytes_delta": delta,
        }
        if delta < 0:
            rec["note"] = "store shrank (phase replaced/compacted files)"
        phases.append(rec)
        prev_bytes = b
        print(f"[pipe5-split] {name}: {dt:.2f} s, {delta:+d} B "
              f"(total {b / 1e6:.1f} MB)", file=sys.stderr)

    try:
        vs = VectorStore(spark, root)
        phase("initialize (train quantizer gen-1)", lambda: vs.initialize(
            emb.filter(
                (F.col("vec_id") <= cut1) & (F.col("vec_id") % m == 0)
            ),
            n_lists=k, n_iter=2,
        ))
        slices = [
            emb.filter(F.col("vec_id") <= cut1),
            emb.filter((F.col("vec_id") > cut1) & (F.col("vec_id") <= cut2)),
            emb.filter(F.col("vec_id") > cut2),
        ]
        for bid, sl in enumerate(slices):
            phase(
                f"append batch {bid} (assign+dedup+publish)",
                lambda sl=sl, bid=bid: vs.process_and_append(
                    sl, batch_id=bid, broadcast_batch=False
                ),
            )
        n_surv = [0]
        phase("survivor count", lambda: n_surv.__setitem__(
            0, vs.survivors().count()
        ))
        k2 = max(8, -(-n_surv[0] // _SEM_BLOCK))
        m2 = max(1, n // max(_SEM_TRAIN, 4 * k2))
        phase("retrain (gen-2 train+reassign+rededup+swap)", lambda: vs.retrain(
            k2, train=vs.survivors().filter(F.col("vec_id") % m2 == 0)
        ))
        phase("read-back result", lambda: vs.vectors().select(
            "vec_id", "list_id", "kept"
        ).write.format("noop").mode("overwrite").save())
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return {
        "total_s": round(sum(p["wall_s"] for p in phases), 2),
        "total_bytes": prev_bytes,
        "phases": phases,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "PIPE5_SPLIT.json"
    spark = get_spark(app_name="pipe5-cost-split")
    spark.sparkContext.setLogLevel("ERROR")
    runs = {}
    # the "disk" store must really be on disk: the default tempdir
    # (TMPDIR, often /tmp) is a tmpfs mount on many distros, which would
    # silently turn the contrast into tmpfs-vs-tmpfs — anchor it next to
    # the repo (the checkout is disk-backed) and RECORD each medium's
    # filesystem type in the artifact so a reader can audit the premise
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # prefer a repo-ADJACENT scratch dir (same filesystem, outside the
    # checkout) so a SIGKILL mid-run can't leave a multi-hundred-MB
    # store tree dirtying git status; fall back into the checkout only
    # if the parent is not writable
    parent = os.path.dirname(repo_root)
    disk_base = parent if os.access(parent, os.W_OK) else repo_root

    def fstype(path: str) -> str:
        """Longest mount-point match by PATH COMPONENT (a raw prefix
        test would let /mnt/disk1 claim /mnt/disk10/...); /proc/mounts
        octal-escapes spaces as \\040."""
        best_mnt, fs_best = "", "unknown"
        try:
            with open("/proc/mounts") as f:
                for line in f:
                    _dev, mnt, fs, *_ = line.split()
                    mnt = mnt.replace("\\040", " ")
                    if (
                        path == mnt
                        or path.startswith(mnt.rstrip("/") + "/")
                    ) and len(mnt) > len(best_mnt):
                        best_mnt, fs_best = mnt, fs
        except OSError:
            pass
        return fs_best

    # warmup pass (JVM/codegen) against tmpfs, unrecorded
    lifecycle(spark, sf_dir, "/dev/shm")
    for name, base in (("disk", disk_base), ("tmpfs", "/dev/shm")):
        runs[name] = lifecycle(spark, sf_dir, base)
        runs[name]["fstype"] = fstype(base)
        print(f"[pipe5-split] {name} ({runs[name]['fstype']}): "
              f"{runs[name]['total_s']} s, "
              f"{runs[name]['total_bytes'] / 1e6:.1f} MB", file=sys.stderr)
    art = {
        "metric": (
            "pipe5 lifecycle phase split at "
            f"{sf_dir}; disk vs tmpfs store medium — the delta is the "
            "storage-medium cost, the tmpfs total is the compute+plan "
            "floor (min-of-1 per medium after a warmup pass)"
        ),
        "disk": runs["disk"],
        "tmpfs": runs["tmpfs"],
        "io_share_of_disk_total": round(
            max(0.0, runs["disk"]["total_s"] - runs["tmpfs"]["total_s"])
            / runs["disk"]["total_s"], 3,
        ),
    }
    with open(out_path, "w") as f:
        json.dump(art, f, indent=1)
    spark.stop()
    print(json.dumps(art))


if __name__ == "__main__":
    main()
