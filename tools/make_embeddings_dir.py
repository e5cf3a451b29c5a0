"""Generate a large embeddings-only dir for the v10/v12 crossover bench.

Usage: python tools/make_embeddings_dir.py [src] [dst] [factor]
       (defaults: /root/testdata/sf0.1  ./data_emb300k  150)

Same disjoint-universe scaling model as ``make_scaled_dir.py`` (its
embeddings rules, verbatim semantics):
- ``vec_id`` shifts by ``i * (max_id + 1)`` per copy, so ids stay dense
  0..K*n-1 (the precondition ``catalog/vector._dense_count`` checks);
- components are sign-flipped by a per-(copy, dim) hash for i > 0 — an
  orthogonal transform, so intra-copy cosines are EXACTLY preserved
  while cross-copy vectors decorrelate instead of duplicating.

Implementation differs deliberately: at factor 500 the per-copy
``unionAll`` loop of ``make_scaled_dir`` builds a 500-branch plan, so
here the copy index is a ``posexplode`` column and the flip happens in
one ``transform`` lambda that captures it — a single narrow branch at
any factor. ``tests/test_scale_tools.py`` pins equality of the two
recipes at a small factor.

Only ``embeddings.parquet`` is written: the semantic-dedup entries load
nothing else, and scaling the fact tables 500x would be ~100 GB of
parquet irrelevant to the measurement.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from weather_data_pipeline_sv_spark.session import get_spark


def scaled_embeddings(emb, factor: int):
    base = int(emb.agg(F.max("vec_id")).first()[0]) + 1
    id_type = dict(emb.dtypes)["vec_id"]
    if id_type in ("int", "smallint") and factor * base > 2**31 - 1:
        raise ValueError(
            f"factor {factor} x id base {base} exceeds the source's "
            f"{id_type} vec_id range; widen the source column to bigint"
        )
    copies = F.array([F.lit(i) for i in range(factor)])
    out = emb.select(
        F.posexplode(copies).alias("__i", "__copy"),
        "vec_id",
        "embedding",
    )
    flip = F.expr(
        "transform(embedding, (x, d) -> "
        "x * cast(1 - 2 * pmod(hash(d, __copy), 2) as float))"
    )
    return out.select(
        # __copy is int; shift in long so factor*base past 2^31 can't
        # overflow (ANSI crash) or wrap (colliding ids)
        (F.col("vec_id").cast("long")
         + F.col("__copy").cast("long") * F.lit(base).cast("long"))
        .cast(dict(emb.dtypes)["vec_id"])
        .alias("vec_id"),
        F.when(F.col("__copy") == 0, F.col("embedding"))
        .otherwise(flip)
        .alias("embedding"),
    )


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "data_emb300k",
        )
    )
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 150
    spark = get_spark(app_name="make-embeddings-dir")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    out = scaled_embeddings(emb, factor)
    os.makedirs(dst, exist_ok=True)
    tmp = f"{dst}/__tmp_embeddings"
    # keep multiple part files (parallel scan); the dir layout only needs
    # <dst>/embeddings.parquet to exist as a readable parquet path
    out.repartition(16).write.mode("overwrite").parquet(tmp)
    final = f"{dst}/embeddings.parquet"
    import shutil

    if os.path.isdir(final) or os.path.isfile(final):
        shutil.rmtree(final) if os.path.isdir(final) else os.remove(final)
    os.replace(tmp, final)
    n = spark.read.parquet(final).count()
    print(f"embeddings: {n} rows -> {final}")


if __name__ == "__main__":
    main()
