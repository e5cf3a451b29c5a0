"""Generate a K×-scaled copy of a testdata dir for shuffle-path benching.

Usage: python tools/make_scaled_dir.py [src] [dst] [factor]
       (defaults: /root/testdata/sf0.1  ./data_sf1  10)

Scaling model: each copy i is a DISJOINT UNIVERSE —
- join/identity keys shift by i * (max_key + 1), so per-copy join
  cardinalities are exactly the originals and global fact sizes are K×;
- group-by attributes (dates, flags, segments, labels) are untouched, so
  aggregate group counts stay constant and rows-per-group grow K× — the
  realistic direction for a fixed-schema warehouse growing K×;
- `documents.text` tokens are salted per copy (``tok`` → ``tok_i`` for
  i > 0), keeping intra-copy shingle similarity identical while making
  cross-copy similarity zero — without this, replication would introduce
  K² artificial near-dup pairs per original document;
- `embeddings.embedding` components are sign-flipped by a per-(copy, dim)
  hash for i > 0. Sign flips are an orthogonal transform, so every
  intra-copy cosine is EXACTLY preserved, while cross-copy vectors
  decorrelate instead of duplicating.
- `region`/`nation` (5/25 rows) are true dimensions and stay as-is.

Output schema matches the source (key columns cast back to their original
types after shifting).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from weather_data_pipeline_sv_spark.session import get_spark

# key columns to shift, per table
SHIFT_KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
PASSTHROUGH = ["region", "nation"]


def _shift_base(df: DataFrame, keys: list[str]) -> dict[str, int]:
    row = df.agg(*[F.max(k).alias(k) for k in keys]).first()
    return {k: int(row[k]) + 1 for k in keys}


def scaled_copies(table: str, df: DataFrame, factor: int) -> DataFrame:
    keys = SHIFT_KEYS[table]
    base = _shift_base(df, keys)
    types = dict(df.dtypes)
    out = None
    for i in range(factor):
        cols = []
        for c in df.columns:
            col = F.col(c)
            if c in keys:
                col = (col.cast("long") + F.lit(i * base[c])).cast(types[c])
            elif table == "documents" and c == "text" and i > 0:
                col = F.array_join(
                    F.transform(
                        F.split(F.col(c), r"\s+"),
                        lambda t: F.concat(t, F.lit(f"_{i}")),
                    ),
                    " ",
                )
            elif table == "embeddings" and c == "embedding" and i > 0:
                # orthogonal sign flip: preserves intra-copy cosines exactly
                col = F.expr(
                    "transform(embedding, (x, d) -> "
                    f"x * cast(1 - 2 * pmod(hash(d, {i}), 2) as float))"
                )
            cols.append(col.alias(c))
        part = df.select(*cols)
        out = part if out is None else out.unionAll(part)
    return out


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data_sf1"
    )
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark(app_name="make-scaled-dir")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(dst, exist_ok=True)
    for t in PASSTHROUGH + list(SHIFT_KEYS):
        df = spark.read.parquet(f"{src}/{t}.parquet")
        out = df if t in PASSTHROUGH else scaled_copies(t, df, factor)
        # single file per table, same layout as the source dirs
        out.coalesce(1).write.mode("overwrite").parquet(f"{dst}/__tmp_{t}")
        # move the part file to <table>.parquet
        tmp = f"{dst}/__tmp_{t}"
        part = next(
            f for f in os.listdir(tmp) if f.endswith(".parquet")
        )
        os.replace(os.path.join(tmp, part), f"{dst}/{t}.parquet")
        import shutil

        shutil.rmtree(tmp)
        print(f"{t}: {out.count() if t not in PASSTHROUGH else df.count()} rows")
    print(f"done -> {dst}")


if __name__ == "__main__":
    main()
