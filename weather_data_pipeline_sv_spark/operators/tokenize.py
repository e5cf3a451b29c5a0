"""Token counting for corpus accounting — a JVM builtin path plus
import-gated REAL tokenizer paths (tiktoken BPE / HuggingFace).

Reference scope: the reference pipeline has no tokenizer (its "records"
are weather observations), but a training-data engine needs per-document
token counts for packing/sampling budgets (catalog entries t1/t2/smp*).
The builtin path is what those entries oracle-check; this module adds the
honest production path for REAL BPE vocabularies, gated exactly like the
image codecs in operators/multimodal.py: the Spark-side plumbing (schema,
Arrow batching, worker-local model cache) is real and tested, the heavy
third-party dependency is optional.

Scale design:
- builtin: one ``regexp_count`` expression — narrow map inside whole-stage
  codegen, zero Python, zero shuffles.
- real tokenizers: Arrow-batched ``mapInPandas``; the tokenizer object is
  constructed ONCE per Python worker process (module-global cache keyed by
  spec — Spark reuses workers across batches/tasks) and applied with the
  library's batch API (`encode_ordinary_batch` / fast-tokenizer __call__),
  so per-batch Python cost is one native call, not a per-row loop. The
  fan-out guard (`ensure_min_parallelism`) widens single-file local scans
  before the CPU-bound encode, same as every other corpus operator.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.partitioning import ensure_min_parallelism

BUILTIN = "builtin"

#: BPE-ish lexer: letter runs | digit runs | any single non-space symbol.
#: Mirrors the t1/t2 accounting family; identical semantics in DuckDB via
#: len(regexp_extract_all(text, ...)).
BUILTIN_TOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

# process-global: one tokenizer instance per (kind, name) per Python worker
_TOKENIZER_CACHE: dict[tuple[str, str], Any] = {}


def _load(kind: str, name: str) -> Any:
    key = (kind, name)
    if key not in _TOKENIZER_CACHE:
        if kind == "tiktoken":
            import tiktoken

            _TOKENIZER_CACHE[key] = tiktoken.get_encoding(name)
        else:  # "hf"
            from transformers import AutoTokenizer

            _TOKENIZER_CACHE[key] = AutoTokenizer.from_pretrained(name)
    return _TOKENIZER_CACHE[key]


def _batch_counts(kind: str, name: str, texts: list[str]) -> list[int]:
    tok = _load(kind, name)
    if kind == "tiktoken":
        return [len(ids) for ids in tok.encode_ordinary_batch(texts)]
    return [
        len(ids)
        for ids in tok(texts, add_special_tokens=False)["input_ids"]
    ]


def _gate(spec: str) -> tuple[str, str]:
    """Validate a ``tiktoken:<encoding>`` / ``hf:<model>`` spec and that
    its library imports — at PLAN TIME, so a missing dependency fails the
    driver immediately instead of 10k executor tasks later."""
    kind, _, name = spec.partition(":")
    if kind not in ("tiktoken", "hf") or not name:
        raise ValueError(
            f"unknown tokenizer {spec!r}: expected 'builtin', "
            "'tiktoken:<encoding>', 'hf:<model>', or a callable"
        )
    try:
        __import__("tiktoken" if kind == "tiktoken" else "transformers")
    except ImportError as e:
        raise NotImplementedError(
            f"tokenizer {spec!r} needs the "
            f"{'tiktoken' if kind == 'tiktoken' else 'transformers'} "
            "package, which is not installed; use tokenizer='builtin' for "
            "the dependency-free path"
        ) from e
    return kind, name


def count_tokens(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "n_tokens",
    tokenizer: str | Callable[[list[str]], list[int]] = BUILTIN,
) -> DataFrame:
    """Append ``out_col`` = token count of ``text_col``.

    ``tokenizer``:
      - ``"builtin"`` — JVM regex lexer (default; zero Python, the path
        the catalog oracle-checks)
      - ``"tiktoken:<encoding>"`` (e.g. ``tiktoken:cl100k_base``) or
        ``"hf:<model>"`` — real BPE via Arrow-batched ``mapInPandas``;
        raises :class:`NotImplementedError` at plan time when the library
        is absent
      - a callable ``list[str] -> list[int]`` — custom batch encoder,
        shipped by closure; this is also how tests exercise the Arrow
        plumbing without the optional libraries
    """
    if tokenizer == BUILTIN:
        # NULL text counts as 0, matching the Arrow path (which feeds the
        # encoder "" for NULLs) — a NULL doc has no tokens, not unknown-many
        return df.withColumn(
            out_col,
            F.coalesce(
                F.regexp_count(F.col(text_col), F.lit(BUILTIN_TOKEN_RE)),
                F.lit(0),
            ).cast("long"),
        )

    if callable(tokenizer):
        encode: Callable[[list[str]], list[int]] = tokenizer
    else:
        kind, name = _gate(tokenizer)

        def encode(texts: list[str], _k: str = kind, _n: str = name) -> list[int]:
            return _batch_counts(_k, _n, texts)

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.LongType())]
    )

    def fn(batches: Iterator[Any]) -> Iterator[Any]:
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            counts = encode(["" if t is None else str(t) for t in pdf[text_col]])
            pdf[out_col] = pd.Series(counts, index=pdf.index, dtype="int64")
            yield pdf

    return ensure_min_parallelism(df).mapInPandas(fn, out_schema)


def available_tokenizers() -> dict[str, bool]:
    """Capability report: which tokenizer families this environment can
    actually run (the import-gate surface, for operators UIs / logs)."""
    out = {"builtin": True}
    for mod, label in (("tiktoken", "tiktoken"), ("transformers", "hf")):
        try:
            __import__(mod)
            out[label] = True
        except ImportError:
            out[label] = False
    return out
