"""Round-close completeness gate for committed artifacts.

Two rounds running, a close-out artifact shipped STALE against the final
catalog: round 4's plan audit missed g3/t15, round 5's oracle sweep
missed smp6 (each landed in the round's last commit, after the artifact
was generated). The content was re-proven green by the judge both times
— the gap is purely "artifact generated before the last entry landed",
and it recurs because nothing mechanical fails when it happens.

This gate makes it fail. For each given artifact it asserts:

- the artifact's entry keys == the LIVE ``__spark_entry__.queries()``
  keys (no missing, no extra/renamed leftovers);
- every entry is green for its artifact kind:
  * correctness sweeps (``driver_sim --json``): ``err`` null and no
    explicit False among rows/schema/hash matches;
  * plan audits: no ``error`` recorded for the entry.

Usage:
    python tools/artifact_gate.py CORRECTNESS_LOCAL_r06.json \
        [PLAN_AUDIT_r06.json ...]

Exit 0 iff every artifact is complete and green. Run it AFTER the last
entry-adding commit, as the final step of the round-close protocol
(SCALE.md), alongside the bench_diff and plan-audit gates.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def live_query_keys() -> set[str]:
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return set(mod.queries())


def check(path: str, expected: set[str]) -> list[str]:
    problems: list[str] = []
    with open(path) as f:
        art = json.load(f)
    # plan_audit artifacts nest per-entry records under "per_query"
    entries = art.get("per_query", art) if isinstance(art, dict) else None
    if not isinstance(entries, dict):
        return [f"{path}: not a per-entry dict artifact"]
    keys = set(entries)
    missing = sorted(expected - keys)
    extra = sorted(keys - expected)
    if missing:
        problems.append(f"{path}: MISSING {len(missing)} entries "
                        f"(stale artifact): {', '.join(missing)}")
    if extra:
        problems.append(f"{path}: {len(extra)} unknown entries "
                        f"(renamed/removed since generation): "
                        f"{', '.join(extra)}")
    for name in sorted(keys & expected):
        rec = entries[name]
        if not isinstance(rec, dict):
            continue
        if rec.get("err") or rec.get("error"):
            problems.append(
                f"{path}: {name}: err={rec.get('err') or rec.get('error')}"
            )
        for fld in ("rows_match", "schema_match", "hash_match"):
            if rec.get(fld) is False:
                problems.append(f"{path}: {name}: {fld} is False")
    return problems


def main() -> int:
    paths = sys.argv[1:]
    if not paths:
        print(__doc__)
        return 2
    expected = live_query_keys()
    print(f"live catalog: {len(expected)} queries() entries")
    rc = 0
    for path in paths:
        problems = check(path, expected)
        if problems:
            rc = 1
            for p in problems:
                print(f"FAIL {p}")
        else:
            print(f"OK   {path}: complete ({len(expected)} entries) "
                  f"and green")
    return rc


if __name__ == "__main__":
    sys.exit(main())
