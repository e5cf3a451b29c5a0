"""Multimodal binary-column operators, oracle-checked through text payloads.

The real multimodal surface (``operators/multimodal.py``) works on opaque
``binary`` payloads via Arrow-batched ``mapInPandas``. To give the driver an
oracle for that plumbing, these entries wrap the ``documents`` table as
media rows (payload = utf-8 bytes of ``text``, verified pure ASCII) so the
DuckDB side can recompute every byte-level result through ``ascii``/
``substr`` arithmetic. The values crossing the Arrow boundary — byte
histograms, frame slices, RMS windows — are therefore hash-compared against
an independent engine, proving the batch plumbing end to end.

Codec-dependent ops (decode/resize on fake-rgb8 images) have no testdata
table and are covered in tests/test_multimodal.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import rnd_sql
from ..operators import multimodal as mm
from ..sources import load_tables
from . import register


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    # single local file → fan out before the Arrow/mapInPandas stages
    from ..functions.partitioning import ensure_min_parallelism

    return mm.media_from_documents(
        ensure_min_parallelism(load_tables(spark, sf_dir, "documents")["documents"])
    )


# ---------------------------------------------------------------------------
# M1 — media ingest: opaque payload + typed metadata, content-hash column
# (the payload-identity primitive every multimodal dedup builds on).
# ---------------------------------------------------------------------------
@register(
    "m1_media_metadata",
    oracle="""
    SELECT doc_id AS media_id, 'text' AS kind,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           'utf-8' AS codec,
           md5(text) AS payload_md5
    FROM documents
    """,
)
def m1_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = _media(spark, sf_dir)
    return m.select(
        "media_id",
        "kind",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.codec").alias("codec"),
        F.md5("payload").alias("payload_md5"),
    )


# ---------------------------------------------------------------------------
# M2 — byte-histogram features via mapInPandas (16 buckets, long format).
# The oracle recomputes the same histogram from ascii codes — an
# independent-engine check on the Arrow batch path itself.
# ---------------------------------------------------------------------------
@register(
    "m2_byte_histogram",
    oracle=f"""
    WITH ch AS (
      SELECT d.doc_id AS media_id,
             ascii(substr(d.text, u.i, 1)) // 16 AS bucket,
             length(d.text) AS total
      FROM documents d, unnest(generate_series(1, length(d.text))) AS u(i)
      WHERE length(d.text) > 0
    )
    SELECT media_id, CAST(bucket AS INTEGER) AS bucket,
           count(*) AS n,
           {rnd_sql('count(*) * 1.0 / any_value(total)', 4)} AS frac
    FROM ch GROUP BY media_id, bucket
    """,
)
def m2_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mm.byte_histogram(_media(spark, sf_dir), n_buckets=16)


# ---------------------------------------------------------------------------
# M3 — video-style frame sampling: 16-byte frames, every 4th full frame.
# ---------------------------------------------------------------------------
@register(
    "m3_frame_sample",
    oracle="""
    SELECT d.doc_id AS media_id, CAST(f.f AS INTEGER) AS frame_id,
           md5(substr(d.text, f.f * 16 + 1, 16)) AS frame_md5
    FROM documents d,
         unnest(generate_series(0, length(d.text) // 16 - 1, 4)) AS f(f)
    """,
)
def m3_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = mm.sample_frames(_media(spark, sf_dir), frame_bytes=16, every=4)
    return frames.select("media_id", "frame_id", F.md5("frame").alias("frame_md5"))


# ---------------------------------------------------------------------------
# M4 — audio-style windowed RMS: non-overlapping 32-sample windows over the
# payload bytes (uint8 "pcm"), full windows only. Integer sums of squares
# are exact in doubles, so numpy-vs-SQL summation order cannot diverge.
# ---------------------------------------------------------------------------
@register(
    "m4_audio_rms",
    oracle=f"""
    WITH ch AS (
      SELECT d.doc_id AS media_id,
             CAST((u.i - 1) // 32 AS INTEGER) AS window_id,
             ascii(substr(d.text, u.i, 1)) AS c
      FROM documents d,
           unnest(generate_series(1, (length(d.text) // 32) * 32)) AS u(i)
    )
    SELECT media_id, window_id,
           {rnd_sql('sqrt(sum(c * c) / 32.0)', 4)} AS rms
    FROM ch GROUP BY media_id, window_id
    """,
)
def m4_audio_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mm.audio_window_rms(_media(spark, sf_dir), window=32)


# ---------------------------------------------------------------------------
# M5 — multimodal near-dup: FRAME-ANCHORED candidates + histogram-cosine
# verify. Candidates are media pairs sharing >= 1 aligned sampled frame
# (m3's 16-byte frames, position-matched md5 equality, frame groups capped
# at df <= 64 — the d2/d3 stop-shingle pattern for hot keys); only those
# get the exact 16-dim cosine check on the m2 byte-histogram vectors
# (Arrow-batched mapInPandas both stages). Candidate keys are content
# hashes whose DISTINCT count grows with the corpus, so the join stays
# linear — unlike the two rejected designs, both MEASURED at the 10x dir:
# all-pairs cosine is a 50k x 50k BNL (1.25e9 pairs, hours), and sign-LSH
# over the 16-dim histograms collapses entirely (byte profiles of text
# are so concentrated that every doc shares band keys: 8.0e9 candidate
# pairs — MORE than all-pairs). Low-dim dense features fundamentally
# cannot be bucketed by angle here; content frames can.
# ---------------------------------------------------------------------------
_NEAR_DUP_T = 0.99995
_FRAME_DF_CAP = 64


@register(
    "m5_media_near_dup",
    oracle=f"""
    WITH ch AS (
      SELECT d.doc_id, ascii(substr(d.text, u.i, 1)) // 16 AS bucket,
             length(d.text) AS total
      FROM documents d, unnest(generate_series(1, length(d.text))) AS u(i)
      WHERE length(d.text) > 0
    ), h AS (
      SELECT doc_id, bucket,
             {rnd_sql('count(*) * 1.0 / any_value(total)', 4)} AS frac
      FROM ch GROUP BY doc_id, bucket
    ), v AS (
      SELECT doc_id, list(frac ORDER BY bucket) AS fr,
             list(bucket ORDER BY bucket) AS bk
      FROM h GROUP BY doc_id
    ), dense AS (
      SELECT doc_id, list_transform(generate_series(0, 15),
               b -> coalesce(fr[list_position(bk, b)], 0.0)) AS emb
      FROM v
    ), fr2 AS (
      SELECT d.doc_id, f.f AS frame_id,
             md5(substr(d.text, f.f * 16 + 1, 16)) AS fh
      FROM documents d,
           unnest(generate_series(0, length(d.text) // 16 - 1, 4)) AS f(f)
    ), grp AS (
      SELECT frame_id, fh FROM fr2 GROUP BY frame_id, fh
      HAVING count(*) BETWEEN 2 AND {_FRAME_DF_CAP}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM fr2 a
      JOIN grp g ON g.frame_id = a.frame_id AND g.fh = a.fh
      JOIN fr2 b ON b.frame_id = a.frame_id AND b.fh = a.fh
                AND a.doc_id < b.doc_id
    ), p AS (
      SELECT cand.id_a, cand.id_b,
             list_dot_product(a.emb, b.emb)
               / (sqrt(list_dot_product(a.emb, a.emb))
                  * sqrt(list_dot_product(b.emb, b.emb))) AS cos
      FROM cand
      JOIN dense a ON a.doc_id = cand.id_a
      JOIN dense b ON b.doc_id = cand.id_b
    )
    SELECT id_a, id_b, {rnd_sql('cos', 4)} AS cosine
    FROM p WHERE {rnd_sql('cos', 6)} >= {_NEAR_DUP_T}
    """,
)
def m5_media_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mm.frame_anchored_near_dup(
        _media(spark, sf_dir),
        threshold=_NEAR_DUP_T,
        frame_bytes=16,
        every=4,
        n_buckets=16,
        frame_df_cap=_FRAME_DF_CAP,
    )
