"""Dump .explain("formatted") for named catalog entries to plans/r11/.

Usage: python tools/r11_plans.py <suffix> <entry> [entry ...]
e.g.   python tools/r11_plans.py before v5_embedding_near_dup v6_knn_graph

Writes plans/r11/<entry>_<suffix>.txt. Entries whose builder runs driver
jobs (Lloyd trains, store lifecycles) execute those while constructing
the frame — expected, the plan of record is the FINAL returned frame.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weather_data_pipeline_sv_spark.catalog import all_queries  # noqa: E402
from weather_data_pipeline_sv_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r11",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="r10-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    for name in names:
        # the bench isolates queries with clearCache between entries; an
        # earlier entry's left-registered persist (e.g. ivf_ann_topk's
        # corpus cache) must not leak an InMemoryRelation into this
        # entry's plan of record
        spark.catalog.clearCache()
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
