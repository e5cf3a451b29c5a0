"""Measure BPE training cost vs merge count (round-6).

The t16 catalog entry trains 24 merges (sized for the unrolled oracle);
production vocabularies need thousands. This probe measures the
per-merge marginal cost of `bpe_train` at a larger merge count over a
scale dir, separating the one-time corpus term (word_frequencies'
shuffle) from the per-round loop term (pair explode + argmax collect on
the distinct-word table) — the number that extrapolates to a 30k-merge
vocabulary.

Usage: python tools/bpe_scale_probe.py [sf_dir] [n_merges]
Prints one JSON line; numbers recorded in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weather_data_pipeline_sv_spark.operators.bpe import (
    bpe_train,
    word_frequencies,
)
from weather_data_pipeline_sv_spark.session import get_spark


def main() -> None:
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
