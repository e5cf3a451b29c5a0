"""One-variant-per-process probe for the v8 sf0.1 anomaly.

Usage: python tools/v8_probe.py <variant>
Variants: catalog | buckets | buckets_cached | candidates | verify_only
Prints PART lines with cold and warm timings.
"""
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
from weather_data_pipeline_sv_spark.catalog import all_queries  # noqa: E402
from weather_data_pipeline_sv_spark.operators import similarity as sim  # noqa: E402
from weather_data_pipeline_sv_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    variant = sys.argv[1]
    spark = get_spark(app_name=f"v8-probe-{variant}")
    spark.sparkContext.setLogLevel("ERROR")
    q = all_queries()
    q["a10_union_report"](spark, SF).collect()

    emb = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
        .repartition(32)
    )
    bs, n_planes, dim = 6, 48, 64
    planes = sim.md5_hyperplanes(spark, n_planes, dim)

    def timed(label, thunk):
        t0 = time.perf_counter()
        thunk()
        print(f"PART {label} {round(time.perf_counter() - t0, 3)}", flush=True)

    if variant == "catalog":
        for i in range(2):
            timed(f"catalog_{i}", lambda: noop(q["v8_near_dup_lsh"](spark, SF)))
    elif variant == "buckets":
        b = sim.lsh_buckets(emb, "vec_id", "emb", planes, bs)
        for i in range(2):
            timed(f"buckets_{i}", lambda: noop(b))
    elif variant == "candidates":
        b = sim.lsh_buckets(emb, "vec_id", "emb", planes, bs)
        cand = (
            b.alias("a")
            .join(
                b.alias("b"),
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
            .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
            .distinct()
        )
        for i in range(2):
            timed(f"candidates_{i}", lambda: noop(cand))
    elif variant == "verify_only":
        b = sim.lsh_buckets(emb, "vec_id", "emb", planes, bs)
        cand = (
            b.alias("a")
            .join(
                b.alias("b"),
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
            .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
            .distinct()
        ).persist()
        cand.count()
        va = emb.select(F.col("vec_id").alias("id_a"), F.col("emb").alias("va"))
        vb = emb.select(F.col("vec_id").alias("id_b"), F.col("emb").alias("vb"))
        ver = (
            cand.join(va, "id_a")
            .join(vb, "id_b")
            .withColumn("cos", sim.cosine(F.col("va"), F.col("vb")))
            .filter(F.col("cos") >= 0.8)
            .select("id_a", "id_b")
        )
        for i in range(2):
            timed(f"verify_{i}", lambda: noop(ver))
    spark.stop()


if __name__ == "__main__":
    main()
