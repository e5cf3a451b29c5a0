"""Property tests for the round-7 surfaces: the chunking window
algebra must cover every token and agree with DuckDB's
generate_series, the BM25 partial-merge must equal the one-shot index
on ANY disjoint slicing, the two-level global-order reconstruction
must equal the naive global sort for every power-of-two bucket count,
and d11's corpus-relative threshold must agree between Python and
DuckDB doubles everywhere.

All references here are pure Python / DuckDB (no per-example Spark
jobs — the repo's property-test rule); the Spark twins are pinned
separately in tests/test_round7_entries.py and by the driver oracles.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st


# ---------------------------------------------------------------------------
# t24 chunking: coverage + count algebra, and the starts-sequence must be
# exactly what both engines generate
# ---------------------------------------------------------------------------
@given(
    n=st.integers(min_value=1, max_value=500),
    window=st.integers(min_value=1, max_value=64),
    data=st.data(),
)
@settings(max_examples=200, deadline=None)
def test_chunk_windows_cover_every_token(n, window, data):
    stride = data.draw(st.integers(min_value=1, max_value=window))
    starts = list(range(1, n + 1, stride))
    # chunk count is exactly ceil(n / stride)
    assert len(starts) == -(-n // stride)
    covered = set()
    for s in starts:
        covered.update(range(s, min(s + window, n + 1)))
    assert covered == set(range(1, n + 1))  # every token, no gaps
    # last chunk length: min(window, n - last_start + 1), always >= 1
    last_len = min(window, n - starts[-1] + 1)
    assert 1 <= last_len <= window


@given(
    n=st.integers(min_value=1, max_value=300),
    stride=st.integers(min_value=1, max_value=40),
)
@settings(max_examples=100, deadline=None)
def test_chunk_starts_match_duckdb_generate_series(n, stride):
    got = [
        r[0]
        for r in duckdb.query(
            f"SELECT unnest(generate_series(1, {n}, {stride}))"
        ).fetchall()
    ]
    assert got == list(range(1, n + 1, stride))


# ---------------------------------------------------------------------------
# t26 merge algebra: for ANY disjoint slicing of a corpus, per-slice
# (df, n_docs, total_len) partials sum to the one-shot values
# ---------------------------------------------------------------------------
_corpus_strategy = st.dictionaries(
    keys=st.integers(min_value=0, max_value=50),  # doc_id
    values=st.lists(
        st.sampled_from(["a", "b", "c", "d", "e", "f"]),
        min_size=1, max_size=12,
    ),
    min_size=1, max_size=20,
)


@given(corpus=_corpus_strategy, n_slices=st.integers(min_value=1, max_value=5))
@settings(max_examples=200, deadline=None)
def test_bm25_partials_merge_to_one_shot(corpus, n_slices):
    def stats(docs):
        df = Counter()
        total_len = 0
        for toks in docs.values():
            total_len += len(toks)
            for t in set(toks):
                df[t] += 1
        return df, len(docs), total_len

    g_df, g_n, g_len = stats(corpus)
    m_df, m_n, m_len = Counter(), 0, 0
    for i in range(n_slices):
        sl = {d: t for d, t in corpus.items() if d % n_slices == i}
        s_df, s_n, s_len = stats(sl)
        m_df += s_df
        m_n += s_n
        m_len += s_len
    assert (m_df, m_n, m_len) == (g_df, g_n, g_len)
    # and avgdl recomposes exactly from the (count, sum) decomposition
    assert m_len / m_n == g_len / g_n


# ---------------------------------------------------------------------------
# smp9: the two-level bucket/offset reconstruction equals the naive
# global sort for every power-of-two bucket count — the bucket must be a
# PREFIX of the sort key for the offsets to concatenate correctly
# ---------------------------------------------------------------------------
def _h32(salt: str, key: int) -> int:
    return int(
        hashlib.md5(f"{salt}:{key}".encode()).hexdigest()[:8], 16
    )


@given(
    keys=st.sets(st.integers(min_value=0, max_value=10_000),
                 min_size=1, max_size=200),
    log_buckets=st.integers(min_value=0, max_value=8),
)
@settings(max_examples=100, deadline=None)
def test_two_level_order_equals_global_sort(keys, log_buckets):
    n_buckets = 1 << log_buckets
    shift = 32 - n_buckets.bit_length() + 1
    rows = [( _h32("s", k), k) for k in keys]
    naive = {k: i + 1 for i, (_, k) in enumerate(sorted(rows))}
    # two-level: per-bucket rank + cumulative offsets
    by_bucket: dict[int, list] = {}
    for h, k in rows:
        by_bucket.setdefault(h >> shift, []).append((h, k))
    offsets, acc = {}, 0
    for b in sorted(by_bucket):
        offsets[b] = acc
        acc += len(by_bucket[b])
    two_level = {}
    for b, grp in by_bucket.items():
        for rank, (h, k) in enumerate(sorted(grp), start=1):
            two_level[k] = offsets[b] + rank
    assert two_level == naive


# ---------------------------------------------------------------------------
# d11: the corpus-relative threshold must agree between what Spark
# computes (DOUBLE — F.lit(0.01) is a Python float) and what the oracle
# computes (DuckDB parses the literal 0.01 as DECIMAL(3,2), so its
# ceil(0.01*n) is the EXACT ceil(n/100)). These are different number
# systems; the property pins that double(0.01)*n never rounds across a
# ceil boundary for any corpus size the oracle could see (verified
# exhaustively to 2e7 during review; sampled here).
# ---------------------------------------------------------------------------
@given(n=st.integers(min_value=1, max_value=20_000_000))
@settings(max_examples=300, deadline=None)
def test_d11_threshold_spark_double_vs_duckdb_decimal(n):
    decimal_side = duckdb.query(
        f"SELECT greatest(5, ceil(0.01 * {n}))"  # DECIMAL path, exact
    ).fetchone()[0]
    spark_side = max(5, math.ceil(0.01 * n))  # IEEE-double path
    assert int(decimal_side) == spark_side
    # and the exact-arithmetic identity the decimal side implements
    assert int(decimal_side) == max(5, -(-n // 100))
