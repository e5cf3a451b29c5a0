"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata.

Design (the shape a 100 TB training-data pipeline needs):

- payloads are **opaque bytes** in a ``binary`` column; a typed ``meta``
  struct carries what the engine must know without decoding (byte count,
  dims, sample rate, codec tag). Relational ops (filter/join/dedup by
  payload hash) never touch the bytes beyond hashing.
- per-payload compute runs as **Arrow-batched ``mapInPandas``** — bytes
  cross the JVM↔Python boundary once per batch, not per row, and each task
  processes its partition's batches independently, so the operators scale
  with partition count.
- **real codecs are import-gated**: PIL/soundfile/av are not in this
  container, so format decode raises ``NotImplementedError`` unless the
  payload uses the deterministic ``fake-*`` codecs (raw bytes with declared
  dims) that tests and fixtures use. Everything downstream of decode —
  resize math, frame slicing, byte histograms, windowed RMS — is real.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # real image codec path (absent in this container)
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

META_TYPE = T.StructType(
    [
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("codec", T.StringType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", META_TYPE),
    ]
)

FAKE_RGB8 = "fake-rgb8"  # raw W*H*C bytes, row-major
FAKE_PCM8 = "fake-pcm8"  # raw unsigned 8-bit mono samples
FAKE_V16 = "fake-v16"  # raw frames of 16 bytes each


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Wrap the text corpus as media rows (payload = utf-8 bytes) — the
    cheap way to exercise binary plumbing on driver-provided testdata."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.length(F.encode("text", "utf-8")).cast("int").alias("n_bytes"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("channels"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
            F.lit("utf-8").alias("codec"),
        ).alias("meta"),
    )


def _fake_bytes(seed: str, n: int) -> bytes:
    """Deterministic pseudo-random byte stream (md5 in counter mode)."""
    out = bytearray()
    i = 0
    while len(out) < n:
        out.extend(hashlib.md5(f"{seed}:{i}".encode()).digest())
        i += 1
    return bytes(out[:n])


def synthesize_media(
    spark: SparkSession, n: int, kind: str = "image",
    width: int = 8, height: int = 8, channels: int = 3,
    sample_rate: int = 8000, n_samples: int = 256,
    n_frames: int = 12, frame_bytes: int = 16,
) -> DataFrame:
    """Deterministic fake media table (fixtures for the codec-free paths)."""
    rows: list[tuple[Any, ...]] = []
    for i in range(n):
        if kind == "image":
            nb = width * height * channels
            payload, codec = _fake_bytes(f"img{i}", nb), FAKE_RGB8
            meta = (nb, width, height, channels, None, None, codec)
        elif kind == "audio":
            payload, codec = _fake_bytes(f"aud{i}", n_samples), FAKE_PCM8
            meta = (n_samples, None, None, None, sample_rate, None, codec)
        elif kind == "video":
            nb = n_frames * frame_bytes
            payload, codec = _fake_bytes(f"vid{i}", nb), FAKE_V16
            meta = (nb, None, None, None, None, n_frames, codec)
        else:
            raise ValueError(f"unknown kind {kind!r}")
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_image(payload: bytes, meta) -> "Any":
    """payload → HxWxC uint8 numpy array. Real formats need PIL (absent
    here → NotImplementedError); the fake-rgb8 codec is raw bytes."""
    import numpy as np

    codec = meta["codec"] if isinstance(meta, dict) else meta.codec
    if codec == FAKE_RGB8:
        w = meta["width"] if isinstance(meta, dict) else meta.width
        h = meta["height"] if isinstance(meta, dict) else meta.height
        c = meta["channels"] if isinstance(meta, dict) else meta.channels
        return np.frombuffer(payload, dtype=np.uint8).reshape(h, w, c)
    if _HAS_PIL:
        import io

        return __import__("numpy").asarray(Image.open(io.BytesIO(payload)))
    raise NotImplementedError(
        f"codec {codec!r} needs a real image library (PIL not installed)"
    )


_HIST_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("bucket", T.IntegerType()),
        T.StructField("n", T.LongType()),
        T.StructField("frac", T.DoubleType()),
    ]
)


def byte_histogram(df: DataFrame, n_buckets: int = 16) -> DataFrame:
    """Per-payload byte histogram (bucket = byte // (256/n_buckets)) in long
    format — the codec-free feature extractor. Arrow-batched; one Python
    crossing per batch. ``frac`` uses the engine-portable rounding rule."""
    width = 256 // n_buckets

    def fn(batches: Iterator["Any"]) -> Iterator["Any"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = list(pdf["payload"])
            lens = np.fromiter((len(p) for p in payloads), dtype=np.int64)
            # one flat uint8 view of the whole batch; a segment bincount over
            # (row, bucket) keys replaces the per-row / per-bucket Python loop
            flat = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            row_of_byte = np.repeat(np.arange(len(payloads)), lens)
            keys = row_of_byte * n_buckets + flat // width
            counts = np.bincount(
                keys, minlength=len(payloads) * n_buckets
            ).reshape(len(payloads), n_buckets)
            rows, cols = np.nonzero(counts)
            n = counts[rows, cols]
            frac = np.floor(n / lens[rows] * 10000.0 + 0.5 + 1e-6) / 10000.0
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy()[rows],
                    "bucket": cols,
                    "n": n,
                    "frac": frac,
                }
            )

    return df.select("media_id", "payload").mapInPandas(fn, _HIST_SCHEMA)


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", META_TYPE),
    ]
)


def resize_images(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize. Real math over the decoded array; decode
    itself needs the fake codec (or PIL when available)."""

    def fn(batches: Iterator["Any"]) -> Iterator["Any"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {"media_id": [], "payload": [], "meta": []}
            for mid, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                img = decode_image(payload, meta)
                h, w = img.shape[0], img.shape[1]
                yi = (np.arange(out_h) * h // out_h).astype(int)
                xi = (np.arange(out_w) * w // out_w).astype(int)
                small = img[np.ix_(yi, xi)]
                m = dict(meta)
                m.update(
                    n_bytes=int(small.nbytes), width=out_w, height=out_h
                )
                out["media_id"].append(mid)
                out["payload"].append(small.tobytes())
                out["meta"].append(m)
            yield pd.DataFrame(out)

    return df.mapInPandas(fn, _RESIZE_SCHEMA)


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_id", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame, frame_bytes: int = 16, every: int = 4
) -> DataFrame:
    """Video frame sampling: slice the payload into fixed-size frames and
    keep every ``every``-th full frame (frame_id % every == 0). Pure byte
    math — no codec. One input row fans out to ~n_frames/every rows."""

    def fn(batches: Iterator["Any"]) -> Iterator["Any"]:
        import pandas as pd

        for pdf in batches:
            ids, fids, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n_full = len(payload) // frame_bytes
                for f in range(0, n_full, every):
                    ids.append(mid)
                    fids.append(f)
                    frames.append(payload[f * frame_bytes : (f + 1) * frame_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_id": fids, "frame": frames})

    return df.select("media_id", "payload").mapInPandas(fn, _FRAME_SCHEMA)


_RMS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("window_id", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def audio_window_rms(df: DataFrame, window: int = 32) -> DataFrame:
    """Windowed RMS over pcm8 samples (non-overlapping full windows) —
    the audio feature-extraction shape, real numpy math, no codec."""

    def fn(batches: Iterator["Any"]) -> Iterator["Any"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = list(pdf["payload"])
            lens = np.fromiter((len(p) for p in payloads), dtype=np.int64)
            n_full = lens // window
            used = n_full * window
            # gather each payload's full-window prefix into one flat array;
            # whole windows stay contiguous, so one reshape(-1, window) sums
            # every window of the batch without a Python loop. uint8² sums
            # are exact in float64, so vectorized order can't diverge from
            # the SQL oracle's.
            offsets = np.concatenate(([0], np.cumsum(lens)))[:-1]
            starts = np.concatenate(([0], np.cumsum(used)))[:-1]
            flat = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            gi = (
                np.repeat(offsets, used)
                + np.arange(int(used.sum()))
                - np.repeat(starts, used)
            )
            vals = flat[gi].astype(np.float64)
            sums = (vals * vals).reshape(-1, window).sum(axis=1)
            win_starts = np.concatenate(([0], np.cumsum(n_full)))[:-1]
            wids = np.arange(int(n_full.sum())) - np.repeat(win_starts, n_full)
            rms = (
                np.floor(np.sqrt(sums / window) * 10000.0 + 0.5 + 1e-6) / 10000.0
            )
            yield pd.DataFrame(
                {
                    "media_id": np.repeat(pdf["media_id"].to_numpy(), n_full),
                    "window_id": wids,
                    "rms": rms,
                }
            )

    return df.select("media_id", "payload").mapInPandas(fn, _RMS_SCHEMA)


def frame_anchored_near_dup(
    media: DataFrame,
    threshold: float,
    frame_bytes: int = 16,
    every: int = 4,
    n_buckets: int = 16,
    frame_df_cap: int = 64,
) -> DataFrame:
    """Media near-dup pairs: FRAME-ANCHORED candidates + byte-histogram
    cosine verify.

    Candidates are media pairs sharing >= 1 aligned sampled frame
    (``sample_frames`` position + content-md5 equality, frame groups
    capped at df <= ``frame_df_cap`` — the stop-shingle pattern for hot
    keys); only candidates get the exact ``n_buckets``-dim cosine check
    on the ``byte_histogram`` vectors. Frame hashes are content-derived,
    so their DISTINCT count grows with the corpus and the anchor join
    stays linear. The two rejected designs — all-pairs cosine (n² BNL)
    and sign-LSH over the histograms (collapses: text byte profiles are
    so concentrated every doc shares band keys) — are documented with
    10×-dir measurements in catalog/multimodal.py's m5 entry.

    Plan: ``frames`` fans out to the df-cap aggregate and the anchored
    self-join, and ``dense`` to both verify sides — both heads pinned
    with ``stage_cache`` so the Arrow ``mapInPandas`` stages run once.
    Every join side below grows with the corpus, so each carries a
    ``shuffle_hash`` hint (never a driver broadcast)."""
    from ..functions.caching import stage_cache
    from ..functions.rounding import rnd
    from .similarity import dot, norm

    hist = byte_histogram(media, n_buckets=n_buckets)
    dense = stage_cache(
        hist.groupBy("media_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("bucket", "frac"))
            ).alias("m")
        )
        .select(
            "media_id",
            F.expr(
                f"transform(sequence(0, {n_buckets - 1}), "
                "b -> coalesce(element_at(m, b), 0.0d))"
            ).alias("emb"),
        )
    )
    frames = stage_cache(
        sample_frames(media, frame_bytes=frame_bytes, every=every).select(
            "media_id", "frame_id", F.md5("frame").alias("fh")
        )
    )
    shareable = (
        frames.groupBy("frame_id", "fh")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter((F.col("c") >= 2) & (F.col("c") <= frame_df_cap))
        .select("frame_id", "fh")
    )
    anchored = frames.join(shareable.hint("shuffle_hash"), ["frame_id", "fh"])
    cand = (
        anchored.alias("a")
        .hint("shuffle_hash")
        .join(
            anchored.alias("b").hint("shuffle_hash"),
            (F.col("a.frame_id") == F.col("b.frame_id"))
            & (F.col("a.fh") == F.col("b.fh"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
        )
        .distinct()
    )
    # per-row norms hoisted below the verify joins (see similarity.norm):
    # one interpreted fold per candidate pair instead of three,
    # bit-identical to the cosine(va, vb) form
    x = dense.select(
        F.col("media_id").alias("id_a"), F.col("emb").alias("va"),
        norm(F.col("emb")).alias("__na"),
    )
    y = dense.select(
        F.col("media_id").alias("id_b"), F.col("emb").alias("vb"),
        norm(F.col("emb")).alias("__nb"),
    )
    c = dot(F.col("va"), F.col("vb")) / (F.col("__na") * F.col("__nb"))
    return (
        cand.join(x.hint("shuffle_hash"), "id_a")
        .join(y.hint("shuffle_hash"), "id_b")
        .withColumn("cos", c)
        .filter(rnd(F.col("cos"), 6) >= F.lit(threshold))
        .select("id_a", "id_b", rnd("cos", 4).alias("cosine"))
    )
