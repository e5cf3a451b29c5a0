"""t6's Arrow-batched winnowing kernel must be bit-identical to the
Catalyst expression chain it replaced (round-11 optimization): md5 of each
character k-gram, first-8-hex-digits as int64, sliding-window min, distinct
count + distinct sum per doc — all integer ops, so equality is exact, not
tolerance-based. ``_expression_chain`` below IS the pre-round-11 entry body.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from weather_data_pipeline_sv_spark.catalog.text import (
    _KGRAM,
    _WINNOW_W,
    _winnow_kernel,
)


def _expression_chain(d):
    kg = d.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(1), F.length("text") - (_KGRAM - 1))
        ).alias("i"),
        (F.length("text") - (_KGRAM - 1)).alias("nk"),
        "text",
    ).select(
        "doc_id",
        "i",
        "nk",
        F.conv(
            F.substring(F.md5(F.expr(f"substr(text, i, {_KGRAM})")), 1, 8),
            16, 10,
        ).cast("long").alias("h"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.currentRow, _WINNOW_W - 1)
    )
    return (
        kg.withColumn("fp", F.min("h").over(w))
        .filter(F.col("i") <= F.col("nk") - (_WINNOW_W - 1))
        .groupBy("doc_id")
        .agg(
            F.countDistinct("fp").alias("n_fingerprints"),
            F.sum_distinct(F.col("fp")).alias("fp_checksum"),
        )
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_kernel_matches_expression_chain_on_corpus(spark, sf_dir):
    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang", "text")
        .filter(F.length("text") >= _KGRAM)
    )
    assert _rows(_winnow_kernel(d)) == _rows(_expression_chain(d))


@pytest.mark.parametrize(
    "text",
    [
        "a" * 8,            # k-grams exist but no full winnow window
        "a" * 14,           # still one row short of a full window
        "a" * 15,           # exactly one full window
        "abcdefgh" * 4,     # repeated content -> duplicate fingerprints
        "héllo wörld, ünïcode text — multibyte characters here!",
    ],
)
def test_kernel_edge_lengths(spark, text):
    d = spark.createDataFrame(
        [(1, "en", text)], "doc_id long, lang string, text string"
    ).filter(F.length("text") >= _KGRAM)
    assert _rows(_winnow_kernel(d)) == _rows(_expression_chain(d))
