"""Incremental boilerplate store: streaming maintenance ≡ one-shot d11
computation (d12's algebra as a live store), exactly-once replay — the
BM25-store crash suite applied to the second PartialAggStore subclass."""

from __future__ import annotations

from pyspark.sql import functions as F

from weather_data_pipeline_sv_spark.operators.boilerplate import (
    BoilerplateStore,
    boilerplate_stream,
)
from weather_data_pipeline_sv_spark.operators.dedup import (
    boilerplate_report,
    explode_shingles,
)

# three docs share the "the cat sat" run (boilerplate at min_df=2),
# others are unique — small enough to eyeball, non-trivial thresholds
DOCS = [
    (1, "en", "the cat sat on the red mat today"),
    (2, "en", "the cat sat on a blue chair yesterday"),
    (3, "en", "the cat sat under the old tree quietly"),
    (4, "en", "weather data pipelines aggregate hourly observations"),
    (5, "en", "completely unrelated text about sailing boats"),
    (6, "en", "weather data pipelines aggregate daily forecasts"),
]
MIN_DF, FRAC = 2, 0.01


def _sh(spark, docs):
    df = spark.createDataFrame(docs, ["doc_id", "lang", "text"])
    return explode_shingles(df, "doc_id", "text", 3)


def _one_shot(spark, docs):
    sh = _sh(spark, docs)
    dfq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    tot = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    nd = tot.groupBy().agg(F.count(F.lit(1)).alias("n_docs"))
    return sorted(
        map(tuple, boilerplate_report(sh, dfq, tot, nd, MIN_DF, FRAC).collect())
    )


def _report(store):
    return sorted(map(tuple, store.report(MIN_DF, FRAC).collect()))


def test_store_matches_one_shot(spark, tmp_path):
    store = BoilerplateStore(spark, str(tmp_path / "bp"))
    for i, sl in enumerate((DOCS[:2], DOCS[2:4], DOCS[4:])):
        assert store.append(_sh(spark, sl), batch_id=i)
    got = _report(store)
    assert got == _one_shot(spark, DOCS) and len(got) == len(DOCS)
    # the rule is non-vacuous on this corpus: some boilerplate found
    assert any(r[2] > 0 for r in got)
    assert store.applied_batch_ids() == [0, 1, 2]
    # a prefix-only store answers the prefix-corpus one-shot (the
    # threshold recomputes from the stats of what is actually ingested)
    store2 = BoilerplateStore(spark, str(tmp_path / "bp2"))
    store2.append(_sh(spark, DOCS[:2]), batch_id=0)
    assert _report(store2) == _one_shot(spark, DOCS[:2])


def test_replay_and_folded_replay_are_noops(spark, tmp_path):
    store = BoilerplateStore(spark, str(tmp_path / "bp3"))
    for i, sl in enumerate((DOCS[:2], DOCS[2:4], DOCS[4:])):
        assert store.append(_sh(spark, sl), batch_id=i)
    want = _report(store)
    # plain retry: directory exists
    assert store.append(_sh(spark, DOCS[:2]), batch_id=0) is False
    # compact, then replay a FOLDED id (the round-8 watermark path)
    assert store.compact() is True
    assert store.applied_batch_ids() == [2]
    assert store.compacted_through() == 2
    assert store.append(_sh(spark, DOCS[2:4]), batch_id=1) is False
    assert _report(store) == want
    # appends continue above the watermark; full store ≡ one-shot
    extra = [(7, "en", "one more weather data pipelines document here")]
    assert store.append(_sh(spark, extra)) is True
    assert store.applied_batch_ids() == [2, 3]
    assert _report(store) == _one_shot(spark, DOCS + extra)


def test_interrupted_swap_recovery(spark, tmp_path):
    import os

    root = str(tmp_path / "bp4")
    store = BoilerplateStore(spark, root)
    for i, sl in enumerate((DOCS[:3], DOCS[3:])):
        store.append(_sh(spark, sl), batch_id=i)
    want = _report(store)
    os.rename(
        os.path.join(root, "batches"), os.path.join(root, "batches.replaced")
    )
    reopened = BoilerplateStore(spark, root)
    assert reopened.applied_batch_ids() == [0, 1]
    assert _report(reopened) == want


def test_streaming_front_end_matches_batch(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    for i, sl in enumerate((DOCS[:2], DOCS[2:4], DOCS[4:])):
        spark.createDataFrame(sl, ["doc_id", "lang", "text"]).coalesce(
            1
        ).write.parquet(str(src / f"day{i}"))
    store_root = str(tmp_path / "bp5")
    q = boilerplate_stream(
        spark, str(src / "*"), store_root, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    store = BoilerplateStore(spark, store_root)
    assert store.applied_batch_ids()
    assert _report(store) == _one_shot(spark, DOCS)
    # resume over the same input adds nothing
    q2 = boilerplate_stream(
        spark, str(src / "*"), store_root, str(tmp_path / "ckpt")
    )
    q2.awaitTermination(120)
    assert _report(BoilerplateStore(spark, store_root)) == _one_shot(
        spark, DOCS
    )
