"""Tokenizer operator (operators/tokenize.py): builtin JVM lexer parity,
the import-gate contract for real tokenizers, and the Arrow plumbing via a
callable batch encoder (no optional libraries needed)."""

from __future__ import annotations

import re

import pytest

from weather_data_pipeline_sv_spark.operators import tokenize as tok

DOCS = [
    (0, "Hello, world! 42 times"),
    (1, "foo_bar v1.2.3 -- done"),
    (2, ""),
    (3, None),
    (4, "    spaces   everywhere\t\nand lines"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_builtin_matches_python_re(spark, docs):
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in tok.count_tokens(docs, "text", "n_tokens").collect()
    }
    pat = re.compile(tok.BUILTIN_TOKEN_RE)
    for doc_id, text in DOCS:
        want = len(pat.findall(text)) if text else 0
        assert got[doc_id] == want, (doc_id, text)


def test_callable_path_exercises_arrow_plumbing(spark, docs):
    # whitespace-split batch encoder: proves the mapInPandas path (schema
    # append, null handling, batch API) without tiktoken/transformers
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in tok.count_tokens(
            docs, "text", "n_tokens",
            tokenizer=lambda texts: [len(t.split()) for t in texts],
        ).collect()
    }
    assert got == {0: 4, 1: 4, 2: 0, 3: 0, 4: 4}


def test_callable_path_preserves_input_columns(spark, docs):
    out = tok.count_tokens(
        docs, "text", "n", tokenizer=lambda ts: [0 for _ in ts]
    )
    assert out.columns == ["doc_id", "text", "n"]
    assert out.schema["n"].dataType.typeName() == "long"


def test_missing_library_fails_at_plan_time(spark, docs):
    has = tok.available_tokenizers()
    if has["tiktoken"]:  # pragma: no cover - env-dependent branch
        pytest.skip("tiktoken installed in this environment")
    with pytest.raises(NotImplementedError, match="tiktoken"):
        tok.count_tokens(docs, tokenizer="tiktoken:cl100k_base")
    if not has["hf"]:
        with pytest.raises(NotImplementedError, match="transformers"):
            tok.count_tokens(docs, tokenizer="hf:gpt2")


def test_unknown_spec_rejected(spark, docs):
    with pytest.raises(ValueError, match="unknown tokenizer"):
        tok.count_tokens(docs, tokenizer="bogus")
    with pytest.raises(ValueError, match="unknown tokenizer"):
        tok.count_tokens(docs, tokenizer="tiktoken:")


@pytest.mark.skipif(
    not tok.available_tokenizers().get("tiktoken"),
    reason="tiktoken not installed (import-gated path)",
)
def test_tiktoken_gated_path(spark, docs):  # pragma: no cover - needs lib
    out = {
        r["doc_id"]: r["n_tokens"]
        for r in tok.count_tokens(
            docs, tokenizer="tiktoken:cl100k_base"
        ).collect()
    }
    import tiktoken

    enc = tiktoken.get_encoding("cl100k_base")
    for doc_id, text in DOCS:
        want = len(enc.encode_ordinary(text)) if text else 0
        assert out[doc_id] == want
