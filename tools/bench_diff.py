"""Per-query bench regression gate: diff two bench JSON artifacts.

Usage: python tools/bench_diff.py OLD.json NEW.json [--threshold 1.5]

Compares the shared query set of two `bench.py` artifacts (e.g.
``BENCH_r03.json`` vs ``BENCH_r04.json``) and:

- prints a per-query table of old/new seconds and the ratio, worst first;
- prints totals over the SHARED set (new entries are listed separately —
  a grown suite must not masquerade as a slowdown);
- exits non-zero if any shared query regressed more than ``--threshold``
  (default 1.5x) AND slowed by more than an absolute noise floor
  (default 0.5 s — sub-second entries flap ±30% on this shared box and a
  0.3→0.5 s wobble is not a regression worth failing a round over).

Run each round as part of the close-out artifacts; this gate would have
flagged the round-2 v8 anomaly (4.5→13.5 s) automatically.
"""

from __future__ import annotations

import argparse
import json
import sys


def load(path: str) -> dict[str, float]:
    with open(path) as f:
        art = json.load(f)
    # the driver's BENCH_r{N}.json wraps bench.py's line under "parsed"
    if isinstance(art.get("parsed"), dict):
        art = art["parsed"]
    q = art.get("queries")
    if not isinstance(q, dict) or not q:
        raise SystemExit(f"{path}: no 'queries' dict — not a bench artifact")
    return {k: float(v) for k, v in q.items()}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5,
                    help="fail ratio for shared queries (default 1.5x)")
    ap.add_argument("--min-delta", type=float, default=0.5,
                    help="absolute slowdown (sec) below which a ratio "
                         "breach is reported but not fatal (default 0.5)")
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    # a 0-second baseline means the OLD artifact entry is bogus (a bench
    # can't complete in 0.000 s), not that the new run regressed
    # infinitely — warn and exclude rather than flag a fake REGRESSION
    bogus = sorted(n for n in set(old) & set(new) if old[n] <= 0)
    for n in bogus:
        print(f"WARNING: {n}: old time {old[n]} s is not a valid baseline "
              f"— excluded from the shared set", file=sys.stderr)
    shared = sorted((set(old) & set(new)) - set(bogus))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))

    rows = [(n, old[n], new[n], new[n] / old[n]) for n in shared]
    rows.sort(key=lambda r: -r[3])

    print(f"{'query':<34} {'old':>8} {'new':>8} {'ratio':>7}")
    failures = []
    for name, o, nw, r in rows:
        flag = ""
        if r > args.threshold and (nw - o) > args.min_delta:
            flag = "  << REGRESSION"
            failures.append((name, o, nw, r))
        elif r > args.threshold:
            flag = "  (ratio breach under noise floor)"
        print(f"{name:<34} {o:>8.3f} {nw:>8.3f} {r:>6.2f}x{flag}")

    to, tn = sum(old[n] for n in shared), sum(new[n] for n in shared)
    print(f"\nshared {len(shared)} queries: {to:.1f} -> {tn:.1f} s "
          f"({tn / to:.2f}x)" if to else "")
    if added:
        print(f"new-only ({len(added)}): "
              + ", ".join(f"{n}={new[n]:.2f}s" for n in added))
    if removed:
        print(f"dropped ({len(removed)}): " + ", ".join(removed))

    if failures:
        print(f"\nFAIL: {len(failures)} quer{'y' if len(failures)==1 else 'ies'} "
              f"regressed >{args.threshold}x (and >{args.min_delta}s):")
        for name, o, nw, r in failures:
            print(f"  {name}: {o:.3f} -> {nw:.3f} s ({r:.2f}x)")
        return 1
    print("\nOK: no regression beyond threshold")
    return 0


if __name__ == "__main__":
    sys.exit(main())
