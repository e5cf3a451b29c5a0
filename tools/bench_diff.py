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
  round over);
- **normalizes for host speed** (round-10): when both artifacts carry
  ``host_calibration_s`` (bench.py's fixed microkernels), the threshold
  is scaled by the worst slower-host component ratio (floor 1.0, cap
  3.0) — cross-host drift that tracks the calibration is attribution,
  not regression. ``--no-calibration`` restores raw thresholds.

Run each round as part of the close-out artifacts; this gate would have
flagged the round-2 v8 anomaly (4.5→13.5 s) automatically.
"""

from __future__ import annotations

import argparse
import json
import math
import sys


def load(
    path: str,
) -> tuple[dict[str, float], dict[str, float] | None, dict | None]:
    """Returns (wall, cpu-or-None, host_calibration-or-None)."""
    with open(path) as f:
        text = f.read()
    try:
        art = json.loads(text)
    except json.JSONDecodeError:
        # a redirect of bench.py's 3-line stdout (full / walls-only topK /
        # compact): pick the line with the largest per-query dict — the
        # FULL line when present, the walls line otherwise
        best: dict | None = None
        for line in text.splitlines():
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                cand = json.loads(line)
            except json.JSONDecodeError:
                continue
            q = cand.get("queries") if isinstance(cand, dict) else None
            if isinstance(q, dict) and (
                best is None or len(q) > len(best.get("queries", {}))
            ):
                best = cand
        if best is None:
            raise SystemExit(f"{path}: no parseable bench JSON line")
        art = best
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
    cal = art.get("host_calibration_s")
    return wall, cpu, cal if isinstance(cal, dict) else None


def calibration_factor(
    old_cal: dict | None, new_cal: dict | None
) -> tuple[float, str]:
    """Host-speed normalization for the regression threshold (round-9
    verdict #1 / round-10 item #4): ``bench.py`` stamps each artifact
    with the wall time of two fixed microkernels (a pure-Python loop and
    a numpy matmul). When the NEW host ran those slower, every entry's
    cpu/wall inflates by roughly that ratio with zero code change —
    measured in round 9: the driver host's numpy calibration was 2.08x
    the clean run's, and exactly the numpy-bound entries drifted
    1.2–1.3x. Scaling the threshold by the worst component ratio settles
    that drift mechanically instead of re-litigating it in prose.

    Only SLOWER-host ratios loosen the gate (floor 1.0 — a faster host
    must not hide a real regression), capped at 3.0 so a garbage
    calibration sample cannot disable the gate. Missing calibration on
    either side (pre-round-9 artifacts) → 1.0, the previous behavior."""
    if not (isinstance(old_cal, dict) and isinstance(new_cal, dict)):
        return 1.0, "absent"
    ratios = {}
    for k in ("python_loop_s", "numpy_matmul_s"):
        o, n = old_cal.get(k), new_cal.get(k)
        if (
            isinstance(o, (int, float)) and isinstance(n, (int, float))
            and o > 0 and n > 0
        ):
            ratios[k] = n / o
    if not ratios:
        return 1.0, "absent"
    worst_k = max(ratios, key=lambda k: ratios[k])
    f = min(max(1.0, ratios[worst_k]), 3.0)
    detail = ", ".join(f"{k}={v:.2f}x" for k, v in sorted(ratios.items()))
    return f, detail


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
    ap.add_argument("--max-wall-noise", type=float, default=8.0,
                    help="absolute wall-delta ceiling (sec) on the "
                         "relative wall floor: a cpu breach whose wall "
                         "grew <=15%% is attribution-class noise ONLY "
                         "while the absolute growth is also under this "
                         "(default 8 s) — on a 100 s entry a corroborated "
                         "+14 s is a regression, not noise")
    ap.add_argument("--no-calibration", action="store_true",
                    help="ignore host_calibration_s even when both "
                         "artifacts carry it")
    args = ap.parse_args()

    old, old_cpu, old_cal = load(args.old)
    new, new_cpu, new_cal = load(args.new)
    if args.no_calibration:
        cal_f, cal_detail = 1.0, "disabled"
    else:
        cal_f, cal_detail = calibration_factor(old_cal, new_cal)
    eff_threshold = args.threshold * cal_f
    if cal_f > 1.0:
        print(f"host calibration: {cal_detail} — threshold "
              f"{args.threshold:.2f}x scaled to {eff_threshold:.2f}x "
              f"(new host measured slower on fixed microkernels)")
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
        # ... round-10 (ADVICE): the relative floor gets an ABSOLUTE
        # ceiling — on a long entry a corroborated cpu breach with, say,
        # +14 s of wall growth at 1.14x is exactly where regressions are
        # most expensive, so <=15% only exempts while the absolute wall
        # delta also stays under --max-wall-noise.
        cpu_only_noise = (
            gate_cpu and g is not None
            and ((wn - wo) <= args.min_delta
                 or (wo > 0 and wn / wo <= 1.15
                     and (wn - wo) <= args.max_wall_noise))
        )
        if (
            ratio > eff_threshold and (gn - go) > args.min_delta
            and not cpu_only_noise
        ):
            flag = "  << REGRESSION"
            failures.append((name, go, gn, ratio))
        elif ratio > eff_threshold and cpu_only_noise:
            flag = "  (cpu-only breach, wall within noise floor — attribution class)"
        elif ratio > eff_threshold:
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
              f"regressed >{eff_threshold:.2f}x on {gate_name} "
              f"(and >{args.min_delta}s):")
        for name, o, nw, r in failures:
            print(f"  {name}: {o:.3f} -> {nw:.3f} s ({r:.2f}x)")
        return 1
    print(f"\nOK: no {gate_name} regression beyond threshold")
    return 0


if __name__ == "__main__":
    sys.exit(main())
