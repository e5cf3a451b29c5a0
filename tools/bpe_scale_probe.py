"""Measure BPE training cost vs merge count (round-6, extended round-7).

The t16 catalog entry trains 24 merges (sized for the unrolled oracle);
production vocabularies need thousands. Two modes:

- distributed (default): per-merge marginal cost of `bpe_train` at a
  larger merge count over a scale dir, separating the one-time corpus
  term (word_frequencies' shuffle) from the per-round loop term (pair
  explode + argmax collect on the distinct-word table).

- ``--driver N_WORDS N_MERGES``: the round-7 verdict-#5 validation —
  the driver twin (`bpe_train_py`, the loop `bpe_train_np` runs after
  its bounded collect) at PRODUCTION vocabulary scale (>=100k distinct
  words, 30k merges), on a deterministic synthetic Zipf word table (no
  Spark session at all — the corpus term is the distributed
  word_frequencies either way). Records s/merge and peak driver RSS,
  the numbers that justify (or adjust) BPE_DRIVER_TRAIN_MAX_ROWS.

Usage: python tools/bpe_scale_probe.py [sf_dir] [n_merges]
       python tools/bpe_scale_probe.py --driver 100000 30000
Prints one JSON line; numbers recorded in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_words(n_words: int) -> dict[str, int]:
    """Deterministic word-frequency table: distinct base-26 'words' with
    Zipf-ish frequencies — the shape word_frequencies hands the driver
    twin (heavy head, long distinct tail). No RNG: word i is i spelled
    in letters, freq = n_words // (i + 1) + 1."""
    words = {}
    for i in range(n_words):
        x, s = i, []
        while True:
            s.append(chr(97 + x % 26))
            x //= 26
            if x == 0:
                break
        words["".join(reversed(s)) * 2] = n_words // (i + 1) + 1
    return words


def driver_mode(n_words: int, n_merges: int) -> None:
    import resource

    from weather_data_pipeline_sv_spark.operators.bpe import bpe_train_py

    freqs = synth_words(n_words)
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    t0 = time.perf_counter()
    merges = bpe_train_py(freqs, n_merges)
    dt = time.perf_counter() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    out = {
        "metric": (
            f"bpe_train_py (driver twin loop) at production scale: "
            f"{n_words} distinct words, {n_merges} merges"
        ),
        "n_distinct_words": n_words,
        "n_merges": n_merges,
        "train_s": round(dt, 2),
        "s_per_merge": round(dt / n_merges, 6),
        "peak_rss_mb": round(rss1 / 1024.0, 1),
        "rss_before_mb": round(rss0 / 1024.0, 1),
        "last_merge": list(merges[-1]),
    }
    print(json.dumps(out))


from weather_data_pipeline_sv_spark.operators.bpe import (  # noqa: E402
    bpe_train,
    word_frequencies,
)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--driver":
        driver_mode(int(sys.argv[2]), int(sys.argv[3]))
        return
    from weather_data_pipeline_sv_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "data_sf1"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    spark = get_spark(app_name="bpe-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(32)

    t0 = time.perf_counter()
    wf = word_frequencies(docs)
    n_words = wf.count()  # materializes the corpus shuffle
    t_wf = time.perf_counter() - t0

    t1 = time.perf_counter()
    merges = bpe_train(wf, n_merges)
    t_train = time.perf_counter() - t1

    out = {
        "metric": (
            f"bpe_train cost split at {sf_dir}: corpus term "
            "(word_frequencies shuffle+count) vs loop term "
            f"({n_merges} merge rounds on {n_words} distinct words)"
        ),
        "n_docs": docs.count(),
        "n_distinct_words": n_words,
        "n_merges": n_merges,
        "word_frequencies_s": round(t_wf, 2),
        "train_s": round(t_train, 2),
        "s_per_merge": round(t_train / n_merges, 3),
        "last_merge": list(merges[-1]),
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
