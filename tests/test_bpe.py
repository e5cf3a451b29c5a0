"""operators/bpe.py — distributed BPE training/encoding vs an in-test
pure-Python reference (same tie-break, same greedy left-to-right merge),
plus the loop-edge properties the string-sentinel encoding relies on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weather_data_pipeline_sv_spark.operators.bpe import (
    EOT,
    SOT,
    bpe_token_counts,
    bpe_train,
    merge_pattern,
    token_count,
    word_frequencies,
)


# --- pure-Python reference: same representation, same semantics --------
def _wrap(word: str) -> str:
    return "".join(f"{SOT}{c}{EOT}" for c in word)


def _py_train_full(freqs: dict[str, int], n_merges: int):
    state = {w: (_wrap(w), f) for w, f in freqs.items()}
    merges = []
    for step in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for sym, f in state.values():
            toks = sym[1:-1].split(f"{EOT}{SOT}") if sym else []
            for x, y in zip(toks, toks[1:]):
                counts[(x, y)] = counts.get((x, y), 0) + f
        if not counts:
            return merges
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, a, b, a + b, cnt))
        pat, rep = merge_pattern(a, b)
        state = {w: (s.replace(pat, rep), f) for w, (s, f) in state.items()}
    return merges


def _py_encode_count(word: str, merges) -> int:
    s = _wrap(word)
    for m in merges:
        pat, rep = merge_pattern(m[1], m[2])
        s = s.replace(pat, rep)
    return s.count(EOT)


SENNRICH = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def _wf_df(spark, freqs):
    return spark.createDataFrame(
        [(w, f) for w, f in freqs.items()], "word string, freq long"
    )


def test_train_matches_python_reference(spark):
    got = bpe_train(_wf_df(spark, SENNRICH), 8)
    assert got == _py_train_full(SENNRICH, 8)
    # sanity on the classic corpus: 'es' (newest+widest = 9) merges first
    assert got[0][1:4] == ("e", "s", "es")


def test_greedy_left_to_right_on_runs(spark):
    # 'aaaa' has 3 (a,a) pairs; the merge realizes as (aa)(aa), and the
    # next round's top pair is (aa, aa) with count 1
    got = bpe_train(_wf_df(spark, {"aaaa": 1}), 2)
    assert got == [(1, "a", "a", "aa", 3), (2, "aa", "aa", "aaaa", 1)]


def test_tie_break_is_lexicographic(spark):
    # 'ab' and 'ba' pairs both appear twice; (a,b) < (b,a)
    got = bpe_train(_wf_df(spark, {"ab": 2, "ba": 2}), 1)
    assert got[0][1:4] == ("a", "b", "ab")


def test_vocabulary_exhaustion_raises(spark):
    # single-char words have no adjacent pairs after 1 merge of 'aa'
    with pytest.raises(ValueError, match="exhausted"):
        bpe_train(_wf_df(spark, {"aa": 3, "b": 1}), 3)


def test_train_partition_invariant(spark):
    base = _wf_df(spark, SENNRICH)
    assert bpe_train(base, 6) == bpe_train(base.repartition(7), 6)


def test_encode_matches_python_reference(spark):
    docs = spark.createDataFrame(
        [
            (0, "low lower newest"),
            (1, "the widest newest newest low"),
            (2, "  Low\tLOWER  "),  # case/whitespace normalization
        ],
        "doc_id long, text string",
    )
    merges = _py_train_full(SENNRICH, 8)
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_token_counts(docs, merges).collect()
    }
    for did, text in [(0, "low lower newest"),
                      (1, "the widest newest newest low"),
                      (2, "low lower")]:
        words = text.split()
        exp = sum(_py_encode_count(w, merges) for w in words)
        assert got[did] == (len(words), exp)


def test_word_frequencies_filters_and_min_freq(spark):
    docs = spark.createDataFrame(
        [(0, f"keep keep keep once {SOT}bad{EOT} "), (1, "keep  ")],
        "doc_id long, text string",
    )
    wf = {r["word"]: r["freq"]
          for r in word_frequencies(docs).collect()}
    assert wf == {"keep": 4, "once": 1}  # sentinel word excluded
    wf2 = {r["word"]: r["freq"]
           for r in word_frequencies(docs, min_freq=2).collect()}
    assert wf2 == {"keep": 4}


def test_token_count_expression(spark):
    df = spark.range(1).select(
        token_count(F.lit(_wrap("hello"))).alias("n"),
        token_count(F.lit("")).alias("z"),
    )
    row = df.collect()[0]
    assert row["n"] == 5 and row["z"] == 0


def test_train_np_matches_distributed(spark):
    from weather_data_pipeline_sv_spark.operators.bpe import bpe_train_np

    wf = _wf_df(spark, SENNRICH)
    assert bpe_train_np(wf, 8) == bpe_train(wf, 8)
    # runs-and-ties corpus too
    wf2 = _wf_df(spark, {"aaaa": 1, "ab": 2, "ba": 2})
    assert bpe_train_np(wf2, 3) == bpe_train(wf2, 3)


def test_train_np_guard_and_exhaustion(spark):
    from weather_data_pipeline_sv_spark.operators.bpe import bpe_train_np

    with pytest.raises(ValueError, match="max_rows"):
        bpe_train_np(_wf_df(spark, SENNRICH), 2, max_rows=2)
    with pytest.raises(ValueError, match="exhausted"):
        bpe_train_np(_wf_df(spark, {"aa": 3}), 5)


def test_train_np_sums_duplicate_word_rows(spark):
    """An ungrouped (word, freq) table must train exactly like the
    distributed loop, which SUMS duplicate rows' frequencies — a dict
    overwrite would keep only the last row (round-6 review finding)."""
    from weather_data_pipeline_sv_spark.operators.bpe import bpe_train_np

    dup = spark.createDataFrame(
        [("low", 3), ("low", 2), ("newest", 6), ("widest", 3),
         ("lower", 2)],
        "word string, freq long",
    )
    assert bpe_train_np(dup, 6) == _py_train_full(SENNRICH, 6)
    assert bpe_train_np(dup, 6) == bpe_train(dup, 6)


def test_train_auto_dispatches_and_falls_back(spark):
    """bpe_train_auto: driver loop under the cap, DISTRIBUTED fallback
    (not a hard failure) over it — both bit-identical (round-6 review:
    t17 previously hard-failed on vocabularies over the collect
    ceiling)."""
    from weather_data_pipeline_sv_spark.operators.bpe import bpe_train_auto

    wf = _wf_df(spark, SENNRICH)
    expect = _py_train_full(SENNRICH, 6)
    assert bpe_train_auto(wf, 6) == expect                 # np path
    assert bpe_train_auto(wf, 6, max_rows=2) == expect     # fallback path


def test_train_auto_fallback_is_typed_not_message_matched(spark):
    """The auto dispatch catches WordTableTooLarge (a dedicated type),
    not 'max_rows' substrings — so an unrelated ValueError that happens
    to mention max_rows propagates instead of triggering a silent full
    distributed retrain, and rewording the guard message can't break
    the fallback (round-6 advice)."""
    from weather_data_pipeline_sv_spark.operators.bpe import (
        WordTableTooLarge,
        bpe_train_auto,
        bpe_train_np,
    )

    with pytest.raises(WordTableTooLarge):
        bpe_train_np(_wf_df(spark, SENNRICH), 2, max_rows=2)
    assert issubclass(WordTableTooLarge, ValueError)  # back-compat
    # an exhaustion ValueError is NOT a size problem: auto must raise,
    # not quietly dispatch to the distributed trainer
    with pytest.raises(ValueError, match="exhausted"):
        bpe_train_auto(_wf_df(spark, {"aa": 3}), 5)


def test_train_py_incremental_equals_full_recount():
    """Round-7: bpe_train_py's heap+index incremental loop is
    bit-identical to the round-6 full-recount algorithm (reimplemented
    here as the reference) on a 500-word Zipf vocabulary with runs,
    ties, and chained merges — the property that lets the driver twin
    run 30k-merge production vocabularies (tools/bpe_scale_probe.py
    --driver)."""
    import sys as _sys
    from pathlib import Path

    from weather_data_pipeline_sv_spark.operators.bpe import bpe_train_py

    _sys.path.insert(
        0, str(Path(__file__).resolve().parent.parent / "tools")
    )
    from bpe_scale_probe import synth_words

    def full_recount(freqs, n_merges):
        state = {w: (list(w), f) for w, f in freqs.items()}
        merges = []
        for step in range(1, n_merges + 1):
            counts = {}
            for toks, f in state.values():
                for p in zip(toks, toks[1:]):
                    counts[p] = counts.get(p, 0) + f
            if not counts:
                raise ValueError("exhausted")
            (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            merges.append((step, a, b, a + b, cnt))
            new_state = {}
            for w, (toks, f) in state.items():
                out, i = [], 0
                while i < len(toks):
                    if i < len(toks) - 1 and toks[i] == a and toks[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(toks[i])
                        i += 1
                new_state[w] = (out, f)
            state = new_state
        return merges

    freqs = synth_words(500)
    assert bpe_train_py(freqs, 300) == full_recount(freqs, 300)
    # runs + ties (the aaaa overlap rule and lexicographic tie-break);
    # this vocabulary is fully merged after exactly 5 steps
    tricky = {"aaaa": 3, "ab": 5, "ba": 5, "abab": 2}
    assert bpe_train_py(tricky, 5) == full_recount(tricky, 5)
    with pytest.raises(ValueError, match="exhausted"):
        bpe_train_py(tricky, 6)
    # exhaustion propagates with the same contract
    with pytest.raises(ValueError, match="exhausted"):
        bpe_train_py({"aa": 3}, 5)
