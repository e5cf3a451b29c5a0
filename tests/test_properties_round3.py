"""Property tests for the round-3 surfaces: the scale-sizing formulas
(semantic-dedup cluster count, kNN sub-bucketing) must agree between
Python and SQL everywhere, the EWMA fold must match a straight-line
Python reference on arbitrary series, the substring rewrite must obey
its containment algebra on random corpora, and PageRank mass must be
conserved on arbitrary 3-regular graphs.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from weather_data_pipeline_sv_spark.catalog.vector import (
    _BLOCK_CAP,
    _SEM_BLOCK,
    _SEM_TRAIN,
)


# ---------------------------------------------------------------------------
# v10 sizing: the Python knobs and the oracle `prm` CTE must agree
# ---------------------------------------------------------------------------

@given(st.integers(min_value=1, max_value=10_000_000))
@settings(max_examples=200, deadline=None)
def test_v10_sizing_python_sql_equivalence(n):
    k_sql, m_sql = duckdb.query(
        f"SELECT CAST(greatest(8, ceil(n / {_SEM_BLOCK}.0)) AS BIGINT),"
        f"       CAST(greatest(1, n // {_SEM_TRAIN}) AS BIGINT)"
        f" FROM (SELECT {n} AS n)"
    ).fetchone()
    assert k_sql == max(8, -(-n // _SEM_BLOCK))
    assert m_sql == max(1, n // _SEM_TRAIN)


@given(st.integers(min_value=1, max_value=5_000_000))
@settings(max_examples=200, deadline=None)
def test_v6_bucket_count_python_sql_equivalence(nl):
    nb_sql = duckdb.query(
        f"SELECT CAST(greatest(1, ceil(nl / {_BLOCK_CAP}.0)) AS BIGINT)"
        f" FROM (SELECT {nl} AS nl)"
    ).fetchone()[0]
    nb_py = max(1, -(-nl // _BLOCK_CAP))
    assert nb_sql == nb_py
    # the resulting expected block size is bounded by the cap (+1 for
    # modulo imbalance over consecutive ids)
    assert nl / nb_py <= _BLOCK_CAP + 1


# ---------------------------------------------------------------------------
# w6 EWMA fold == straight-line Python reference
# ---------------------------------------------------------------------------

def _ref_ewma(series, alpha=0.3, win=20):
    out = []
    for i in range(len(series)):
        frame = series[max(0, i - win + 1) : i + 1]
        acc = 0.0
        for x in frame:
            acc = acc * (1 - alpha) + alpha * x
        out.append(acc)
    return out


@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=25, deadline=None)
def test_w6_duckdb_fold_matches_reference(series):
    rows = ", ".join(f"({i}, {v!r}::DOUBLE)" for i, v in enumerate(series))
    got = [
        r[0]
        for r in duckdb.query(
            f"""
            SELECT list_reduce(list_prepend(0.0, w), (a, b) -> a * 0.7 + 0.3 * b)
            FROM (
              SELECT i, list(v) OVER (
                ORDER BY i ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS w
              FROM (VALUES {rows}) t(i, v)
            ) q ORDER BY i
            """
        ).fetchall()
    ]
    ref = _ref_ewma(series)
    for g, r in zip(got, ref):
        assert math.isclose(g, r, rel_tol=1e-12, abs_tol=1e-12)


# ---------------------------------------------------------------------------
# d9 rewrite algebra on random corpora (pure-Python model of the operator)
# ---------------------------------------------------------------------------

def _model_d9(texts, L=8):
    """Reference implementation of the d9 semantics."""
    tok = {i: t.strip().lower().split() for i, t in enumerate(texts)}
    owners: dict[str, set[int]] = {}
    for i, toks in tok.items():
        for j in range(len(toks) - L + 1):
            owners.setdefault(" ".join(toks[j : j + L]), set()).add(i)
    dup = {w for w, o in owners.items() if len(o) > 1}
    out = {}
    for i, toks in tok.items():
        covered = set()
        for j in range(len(toks) - L + 1):
            if " ".join(toks[j : j + L]) in dup:
                covered.update(range(j, j + L))
        out[i] = (len(toks), len(covered))
    return out


@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=24
        ).map(" ".join),
        min_size=2,
        max_size=8,
    )
)
@settings(max_examples=50, deadline=None)
def test_d9_model_containment_properties(texts):
    res = _model_d9(texts)
    # removing a document can only shrink other documents' removed sets
    sub = _model_d9(texts[:-1])
    for i in sub:
        assert sub[i][1] <= res[i][1]
    # duplicated-window coverage never exceeds the doc and is 0 for docs
    # shorter than the window
    for i, (n, rm) in res.items():
        assert 0 <= rm <= n
        if n < 8:
            assert rm == 0
    # two identical documents erase each other completely (if long enough)
    twin = _model_d9(["x y z w v u t s r q", "x y z w v u t s r q"])
    assert all(rm == n for n, rm in twin.values())


# ---------------------------------------------------------------------------
# g1 PageRank mass conservation on arbitrary out-degree-1..3 graphs
# ---------------------------------------------------------------------------

@given(st.data())
@settings(max_examples=25, deadline=None)
def test_g1_unrolled_iteration_conserves_mass(data):
    n = data.draw(st.integers(min_value=2, max_value=12))
    edges = []
    for src in range(n):
        outs = data.draw(
            st.lists(
                st.integers(min_value=0, max_value=n - 1)
                .filter(lambda d, s=src: d != s),
                min_size=1,
                max_size=3,
                unique=True,
            )
        )
        edges += [(src, d) for d in outs]
    ranks = [1.0 / n] * n
    outdeg = [sum(1 for s, _ in edges if s == i) for i in range(n)]
    for _ in range(3):
        contrib = [0.0] * n
        for s, d in edges:
            contrib[d] += ranks[s] / outdeg[s]
        ranks = [0.15 / n + 0.85 * c for c in contrib]
        # every node has out-degree >= 1 here, so no dangling correction:
        # total mass stays exactly 1 up to fp error
        assert math.isclose(sum(ranks), 1.0, rel_tol=1e-9)
