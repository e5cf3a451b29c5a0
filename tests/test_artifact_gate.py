"""tools/artifact_gate.py — the round-close staleness gate (round-6):
an artifact generated before the last entry landed must FAIL the gate,
which is exactly the failure class that shipped twice (r4 plan audit,
r5 oracle sweep)."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

from artifact_gate import check, live_query_keys


def _green(keys):
    return {
        k: {"rows_match": True, "schema_match": True, "hash_match": True,
            "spark_rows": 1, "oracle_rows": 1, "err": None}
        for k in keys
    }


def _write(tmp_path, name, obj):
    p = tmp_path / name
    p.write_text(json.dumps(obj))
    return str(p)


def test_complete_green_sweep_passes(tmp_path):
    keys = live_query_keys()
    assert len(keys) > 100
    p = _write(tmp_path, "ok.json", _green(keys))
    assert check(p, keys) == []


def test_missing_entry_fails(tmp_path):
    keys = live_query_keys()
    sub = _green(keys)
    dropped = sorted(keys)[-1]
    del sub[dropped]
    p = _write(tmp_path, "stale.json", sub)
    problems = check(p, keys)
    assert problems and "MISSING" in problems[0] and dropped in problems[0]


def test_renamed_leftover_and_red_entry_fail(tmp_path):
    keys = {"a", "b"}
    art = _green({"a", "zz_old_name"})
    art["a"]["hash_match"] = False
    p = _write(tmp_path, "bad.json", art)
    problems = "\n".join(check(p, keys))
    assert "MISSING" in problems          # b absent
    assert "unknown entries" in problems  # zz_old_name leftover
    assert "hash_match is False" in problems


def test_err_and_plan_audit_shapes(tmp_path):
    keys = {"a"}
    p = _write(tmp_path, "err.json", {"a": {"err": "spark: boom"}})
    assert any("err=spark: boom" in s for s in check(p, keys))
    audit = {"summary": {}, "per_query": {"a": {"hash_exchange": 2}}}
    p2 = _write(tmp_path, "audit.json", audit)
    assert check(p2, keys) == []
    audit["per_query"]["a"]["error"] = "plan build failed"
    p3 = _write(tmp_path, "audit_bad.json", audit)
    assert any("plan build failed" in s for s in check(p3, keys))


def test_null_matches_entry_fails(tmp_path):
    # round-6 advice: an entry that crashed mid-sweep and wrote nulls
    # (or empty-string err) must NOT pass as green — greenness requires
    # the match fields to be exactly True and err exactly None
    keys = {"a", "b"}
    art = _green(keys)
    art["a"] = {"rows_match": None, "schema_match": None,
                "hash_match": None, "spark_rows": None,
                "oracle_rows": None, "err": None}
    p = _write(tmp_path, "nulls.json", art)
    problems = "\n".join(check(p, keys))
    assert "rows_match is None, not True" in problems
    # err='' (falsy but not None) also fails
    art["a"] = dict(_green({"a"})["a"], err="")
    p2 = _write(tmp_path, "emptyerr.json", art)
    assert any("err is ''" in s for s in check(p2, keys))


def test_rows_only_entry_passes_both_shapes(tmp_path):
    keys = {"a", "b"}
    art = _green(keys)
    # new shape: explicit mode marker from driver_sim
    art["a"] = {"rows_match": True, "schema_match": None,
                "hash_match": None, "spark_rows": 5,
                "oracle_rows": None, "err": None, "mode": "rows_only"}
    # legacy shape: no marker, recognizable by null oracle columns
    art["b"] = {"rows_match": True, "schema_match": None,
                "hash_match": None, "spark_rows": 5,
                "oracle_rows": None, "err": None}
    p = _write(tmp_path, "rowsonly.json", art)
    assert check(p, keys) == []


def test_prose_counts_match_live_catalog():
    # SURVEY.md shipped stale at 141-vs-142 in round 6; the gate now
    # greps the count-bearing prose lines against the live catalog
    from artifact_gate import check_prose, live_query_keys as lqk
    n = len(lqk())
    assert check_prose(n) == []
    # and a wrong count is detected (regexes actually match the files)
    problems = check_prose(n + 1)
    assert problems and any("SURVEY.md" in s for s in problems)
