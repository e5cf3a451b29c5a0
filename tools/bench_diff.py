"""Per-query bench regression gate: diff two bench JSON artifacts.

Usage: python tools/bench_diff.py OLD.json NEW.json [--threshold 1.5]

Compares the shared query set of two `bench.py` artifacts (e.g.
``BENCH_r03.json`` vs ``BENCH_r04.json``) and:

- prints a per-query table of old/new WALL seconds, the wall ratio, and
  (when both artifacts carry ``cpu_queries``) old/new process-tree CPU
  seconds and the CPU ratio, worst first;
- prints totals over the SHARED set (new entries are listed separately —
  a grown suite must not masquerade as a slowdown);
- **gates on CPU time when both sides have it** (round-5 verdict): on a
  shared box, external CPU steal inflates wall while CPU tracks the work
  actually done, so wall>>old with cpu~=old is contention, not a
  regression. Wall-only artifacts fall back to the wall gate.
- exits non-zero if any shared query's gated metric regressed more than
  ``--threshold`` (default 1.5x) AND slowed by more than an absolute
  noise floor (default 0.5 s — sub-second entries flap ±30% on this
  shared box and a 0.3→0.5 s wobble is not a regression worth failing a
  round over).

Run each round as part of the close-out artifacts; this gate would have
flagged the round-2 v8 anomaly (4.5→13.5 s) automatically.
"""

from __future__ import annotations

import argparse
import json
import math
import sys


def load(path: str) -> tuple[dict[str, float], dict[str, float] | None]:
    """Returns (wall, cpu-or-None) per-query dicts."""
    with open(path) as f:
        art = json.load(f)
    # the driver's BENCH_r{N}.json wraps bench.py's LAST stdout line under
    # "parsed" — which since the two-line contract is the COMPACT summary
    # (totals only, no per-query dict), so driver artifacts are not
    # diffable; say so instead of the generic "not a bench artifact"
    if isinstance(art.get("parsed"), dict):
        art = art["parsed"]
    q = art.get("queries")
    if not isinstance(q, dict) or not q:
        if "n" in art and "value" in art:
            raise SystemExit(
                f"{path}: compact summary (n={art['n']}, no per-query "
                "dict) — diff the BENCH_LOCAL_r* full artifact instead"
            )
        raise SystemExit(f"{path}: no 'queries' dict — not a bench artifact")
    wall = {k: float(v) for k, v in q.items()}
    cq = art.get("cpu_queries")
    cpu = None
    if isinstance(cq, dict) and cq:
        cpu = {
            k: float(v)
            for k, v in cq.items()
            if isinstance(v, (int, float)) and not math.isnan(float(v))
        }
    return wall, cpu


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5,
                    help="fail ratio for shared queries (default 1.5x)")
    ap.add_argument("--min-delta", type=float, default=0.5,
                    help="absolute slowdown (sec) below which a ratio "
                         "breach is reported but not fatal (default 0.5)")
    ap.add_argument("--gate-on", choices=["auto", "wall", "cpu"],
                    default="auto",
                    help="auto (default): cpu when both artifacts have "
                         "cpu_queries, else wall")
    args = ap.parse_args()

    old, old_cpu = load(args.old)
    new, new_cpu = load(args.new)
    have_cpu = old_cpu is not None and new_cpu is not None
    gate_cpu = (args.gate_on == "cpu") or (
        args.gate_on == "auto" and have_cpu
    )
    if args.gate_on == "cpu" and not have_cpu:
        raise SystemExit("--gate-on cpu but an artifact lacks cpu_queries")

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

    def gmetric(n: str) -> tuple[float, float] | None:
        """(old, new) of the gated metric; None if CPU missing for n."""
        if not gate_cpu:
            return old[n], new[n]
        # BOTH sides must be positive: a non-positive NEW cpu (the r06
        # negative-delta class, now recorded as null by bench.py but
        # guarded here against old artifacts) would yield a negative
        # ratio that silently passes the gate — exactly the masking this
        # gate exists to prevent. Such entries wall-gate instead.
        if (
            n in old_cpu and n in new_cpu
            and old_cpu[n] > 0 and new_cpu[n] > 0
        ):
            return old_cpu[n], new_cpu[n]
        return None

    rows = []
    for n in shared:
        crow = (
            (old_cpu.get(n), new_cpu.get(n)) if have_cpu else (None, None)
        )
        g = gmetric(n)
        ratio = (g[1] / g[0]) if g else new[n] / old[n]
        rows.append((n, old[n], new[n], crow[0], crow[1], ratio, g))
    rows.sort(key=lambda r: -r[5])

    gate_name = "cpu" if gate_cpu else "wall"
    hdr = f"{'query':<34} {'wall old':>9} {'wall new':>9}"
    if have_cpu:
        hdr += f" {'cpu old':>8} {'cpu new':>8}"
    hdr += f" {gate_name + ' ratio':>11}"
    print(hdr)
    failures = []
    for name, wo, wn, co, cn, ratio, g in rows:
        go, gn = g if g else (wo, wn)
        flag = ""
        # A cpu breach whose WALL got faster is not a regression: the
        # cpu column is process-tree-sampled from a JVM shared by the
        # whole suite, so concurrent GC/compiler work from neighboring
        # (often newly added) queries bleeds into light queries'
        # windows — measured in round 7: suite cpu +11% with 11 added
        # entries while every flagged query's isolated wall IMPROVED.
        # The gate's purpose is catching real regressions that box
        # contention masks (wall up, cpu up); a query whose wall moved
        # by less than the gate's own noise floor can't be that, so it
        # warns instead of failing. This keeps the cpu gate strictly
        # stronger than the old wall gate: any regression the wall gate
        # would have caught (wall delta > min_delta) still FAILs here.
        # ... and round 9 added the RELATIVE wall floor: t25 (write-heavy,
        # code untouched) breached cpu 1.61x at wall 5.54->6.07 — 0.027 s
        # past the absolute floor — while isolated re-measures put its
        # cpu anywhere in 35-57 s at an invariant ~5.6 s wall; cpu on a
        # write-heavy entry includes JVM background threads and swings
        # ±30% session to session. A cpu breach is only trustworthy as a
        # regression signal when the WALL corroborates it (moved by both
        # the absolute floor AND >15%).
        cpu_only_noise = (
            gate_cpu and g is not None
            and ((wn - wo) <= args.min_delta
                 or (wo > 0 and wn / wo <= 1.15))
        )
        if (
            ratio > args.threshold and (gn - go) > args.min_delta
            and not cpu_only_noise
        ):
            flag = "  << REGRESSION"
            failures.append((name, go, gn, ratio))
        elif ratio > args.threshold and cpu_only_noise:
            flag = "  (cpu-only breach, wall within noise floor — attribution class)"
        elif ratio > args.threshold:
            flag = "  (ratio breach under noise floor)"
        if g is None and gate_cpu:
            # no CPU sample for this entry: fall back to gating its wall
            # time (conservative — still protected, just noisier)
            flag += "  [no cpu sample — wall-gated]"
        line = f"{name:<34} {wo:>9.3f} {wn:>9.3f}"
        if have_cpu:
            line += (
                f" {co if co is not None else float('nan'):>8.3f}"
                f" {cn if cn is not None else float('nan'):>8.3f}"
            )
        line += f" {ratio:>10.2f}x{flag}"
        print(line)

    to, tn = sum(old[n] for n in shared), sum(new[n] for n in shared)
    if to:
        print(f"\nshared {len(shared)} queries wall: {to:.1f} -> {tn:.1f} s "
              f"({tn / to:.2f}x)")
    if have_cpu:
        cs = [n for n in shared if n in old_cpu and n in new_cpu]
        cto, ctn = sum(old_cpu[n] for n in cs), sum(new_cpu[n] for n in cs)
        if cto:
            print(f"shared {len(cs)} queries cpu : {cto:.1f} -> {ctn:.1f} s "
                  f"({ctn / cto:.2f}x)")
    if added:
        print(f"new-only ({len(added)}): "
              + ", ".join(f"{n}={new[n]:.2f}s" for n in added))
    if removed:
        print(f"dropped ({len(removed)}): " + ", ".join(removed))

    if failures:
        print(f"\nFAIL: {len(failures)} quer{'y' if len(failures)==1 else 'ies'} "
              f"regressed >{args.threshold}x on {gate_name} "
              f"(and >{args.min_delta}s):")
        for name, o, nw, r in failures:
            print(f"  {name}: {o:.3f} -> {nw:.3f} s ({r:.2f}x)")
        return 1
    print(f"\nOK: no {gate_name} regression beyond threshold")
    return 0


if __name__ == "__main__":
    sys.exit(main())
