"""tools/bench_diff.py gate semantics — especially the round-6 CPU gate:
wall inflation with flat CPU is box contention, not a regression."""

from __future__ import annotations

import json
import os
import subprocess
import sys

TOOL = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools", "bench_diff.py",
)


def _art(path, queries, cpu=None):
    art = {"metric": "m", "value": sum(queries.values()), "unit": "sec",
           "queries": queries, "sf": 0.1}
    if cpu is not None:
        art["cpu_queries"] = cpu
    with open(path, "w") as f:
        json.dump(art, f)
    return str(path)


def _run(*argv):
    return subprocess.run(
        [sys.executable, TOOL, *argv], capture_output=True, text=True
    )


def test_wall_regression_with_flat_cpu_is_not_fatal(tmp_path):
    old = _art(tmp_path / "o.json", {"q": 2.0}, {"q": 8.0})
    new = _art(tmp_path / "n.json", {"q": 7.0}, {"q": 8.2})  # steal shape
    r = _run(old, new)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "OK: no cpu regression" in r.stdout


def test_cpu_regression_is_fatal(tmp_path):
    old = _art(tmp_path / "o.json", {"q": 2.0}, {"q": 8.0})
    new = _art(tmp_path / "n.json", {"q": 3.5}, {"q": 16.0})
    r = _run(old, new)
    assert r.returncode == 1
    assert "REGRESSION" in r.stdout


def test_wall_gate_when_cpu_missing(tmp_path):
    # pre-round-6 artifacts have no cpu_queries — the old wall gate holds
    old = _art(tmp_path / "o.json", {"q": 2.0})
    new = _art(tmp_path / "n.json", {"q": 7.0})
    r = _run(old, new)
    assert r.returncode == 1
    assert "wall" in r.stdout
    ok = _run(old, _art(tmp_path / "n2.json", {"q": 2.2}))
    assert ok.returncode == 0


def test_noise_floor_still_applies_to_cpu(tmp_path):
    # 2x CPU ratio but only +0.3 s absolute — under the floor, not fatal
    old = _art(tmp_path / "o.json", {"q": 0.2}, {"q": 0.3})
    new = _art(tmp_path / "n.json", {"q": 0.4}, {"q": 0.6})
    r = _run(old, new)
    assert r.returncode == 0
    assert "noise floor" in r.stdout


def test_negative_new_cpu_wall_gates_not_negative_ratio(tmp_path):
    # r06 defect class: a PID exiting mid-window made the NEW cpu
    # negative; the old gate used it and produced a negative ratio that
    # silently passed. Such entries must fall back to the wall gate —
    # here wall regressed 4x, so the run must FAIL despite the bogus cpu.
    old = _art(tmp_path / "o.json", {"q": 2.0}, {"q": 8.0})
    new = _art(tmp_path / "n.json", {"q": 8.0}, {"q": -4.0})
    r = _run(old, new)
    assert r.returncode == 1, r.stdout + r.stderr
    assert "no cpu sample — wall-gated" in r.stdout
    # and the symmetric case: wall fine, cpu negative -> OK, wall-gated
    new2 = _art(tmp_path / "n2.json", {"q": 2.1}, {"q": -4.0})
    r2 = _run(old, new2)
    assert r2.returncode == 0, r2.stdout + r2.stderr


def test_compact_summary_artifact_rejected_with_pointer(tmp_path):
    # the driver's BENCH_r*.json "parsed" holds bench.py's LAST stdout
    # line — the compact totals-only summary; load() must say so rather
    # than the generic "not a bench artifact"
    p = tmp_path / "driver.json"
    with open(p, "w") as f:
        json.dump({"parsed": {"metric": "m", "value": 170.0,
                              "unit": "sec", "n": 82, "cpu_value": 850.0,
                              "sf": 0.1}}, f)
    old = _art(tmp_path / "o.json", {"q": 2.0})
    r = _run(str(p), old)
    assert r.returncode != 0
    assert "compact summary" in r.stderr
    assert "BENCH_LOCAL" in r.stderr


def test_cpu_breach_with_wall_in_noise_floor_is_not_fatal(tmp_path):
    """Round-7 attribution class: suite-shared-JVM GC bleeds CPU into a
    light query's window while its wall stays flat (or improves) — warn,
    don't fail. Any regression the old wall gate would catch (wall delta
    > min_delta) still fails (see test_cpu_regression_is_fatal)."""
    old = _art(tmp_path / "o.json", {"q": 0.70}, {"q": 1.1})
    new = _art(tmp_path / "n.json", {"q": 0.71}, {"q": 3.6})  # c15 shape
    r = _run(old, new)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "attribution class" in r.stdout
    assert "OK: no cpu regression" in r.stdout
    # wall improved outright: same class
    new2 = _art(tmp_path / "n2.json", {"q": 0.42}, {"q": 2.3})
    r = _run(old, new2)
    assert r.returncode == 0
    assert "attribution class" in r.stdout


def test_cpu_breach_with_wall_past_noise_floor_is_fatal(tmp_path):
    old = _art(tmp_path / "o.json", {"q": 0.70}, {"q": 1.1})
    new = _art(tmp_path / "n.json", {"q": 1.40}, {"q": 3.6})  # wall +0.7
    r = _run(old, new)
    assert r.returncode == 1
    assert "REGRESSION" in r.stdout


def test_cpu_breach_with_wall_within_relative_floor_is_not_fatal(tmp_path):
    """Round-9 attribution class (t25 shape): a write-heavy entry's
    process-tree cpu swings ±30% session to session (JVM background
    threads) while its wall stays within 15% — even when the absolute
    wall delta exceeds min_delta. The cpu breach warns, doesn't fail."""
    old = _art(tmp_path / "o.json", {"q": 5.54}, {"q": 35.4})
    new = _art(tmp_path / "n.json", {"q": 6.07}, {"q": 56.9})  # t25 shape
    r = _run(old, new)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "attribution class" in r.stdout


def test_cpu_breach_with_wall_past_relative_floor_is_fatal(tmp_path):
    """Both floors breached (wall 1.3x AND delta > min_delta) with cpu
    over threshold: a real regression, still fatal."""
    old = _art(tmp_path / "o.json", {"q": 5.0}, {"q": 30.0})
    new = _art(tmp_path / "n.json", {"q": 6.5}, {"q": 50.0})
    r = _run(old, new)
    assert r.returncode == 1
    assert "REGRESSION" in r.stdout


def _art_cal(path, queries, cpu, cal):
    art = {"metric": "m", "value": sum(queries.values()), "unit": "sec",
           "queries": queries, "sf": 0.1, "cpu_queries": cpu,
           "host_calibration_s": cal}
    with open(path, "w") as f:
        json.dump(art, f)
    return str(path)


# ---------------------------------------------------------------------------
# Round-10 #4: host_calibration_s scales the threshold — cross-host
# drift that tracks the fixed microkernels is attribution, not
# regression (the round-9 driver artifact's v5/m3/m4 story).
# ---------------------------------------------------------------------------
def test_inflated_calibration_suppresses_fake_flag(tmp_path):
    # cpu 1.8x, wall fully corroborated (+15 s) — a hard FAIL on equal
    # hosts, but the new host measured its numpy kernel 2x slower, so
    # the effective threshold is 3.0x and the drift is attributed.
    old = _art_cal(tmp_path / "o.json", {"q": 10.0}, {"q": 20.0},
                   {"python_loop_s": 0.1, "numpy_matmul_s": 5.0})
    new = _art_cal(tmp_path / "n.json", {"q": 25.0}, {"q": 36.0},
                   {"python_loop_s": 0.1, "numpy_matmul_s": 10.0})
    r = _run(old, new)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "scaled to 3.00x" in r.stdout
    # --no-calibration restores the raw gate: same artifacts now FAIL
    raw = _run(old, new, "--no-calibration")
    assert raw.returncode == 1
    assert "REGRESSION" in raw.stdout


def test_missing_calibration_keeps_previous_behavior(tmp_path):
    old = _art(tmp_path / "o.json", {"q": 10.0}, {"q": 20.0})
    new = _art(tmp_path / "n.json", {"q": 25.0}, {"q": 36.0})
    r = _run(old, new)
    assert r.returncode == 1
    assert "scaled to" not in r.stdout


def test_faster_host_does_not_loosen_or_tighten(tmp_path):
    # new host FASTER on the kernels: factor floors at 1.0 — a real
    # regression is still flagged at the raw threshold
    old = _art_cal(tmp_path / "o.json", {"q": 10.0}, {"q": 20.0},
                   {"python_loop_s": 0.2, "numpy_matmul_s": 10.0})
    new = _art_cal(tmp_path / "n.json", {"q": 25.0}, {"q": 36.0},
                   {"python_loop_s": 0.1, "numpy_matmul_s": 5.0})
    r = _run(old, new)
    assert r.returncode == 1
    assert "REGRESSION" in r.stdout


def test_calibration_factor_capped_at_3x(tmp_path):
    # a garbage calibration sample (10x) must not disable the gate: the
    # factor caps at 3.0, so a 5x corroborated cpu regression still fails
    old = _art_cal(tmp_path / "o.json", {"q": 10.0}, {"q": 20.0},
                   {"python_loop_s": 0.1, "numpy_matmul_s": 5.0})
    new = _art_cal(tmp_path / "n.json", {"q": 60.0}, {"q": 100.0},
                   {"python_loop_s": 0.1, "numpy_matmul_s": 50.0})
    r = _run(old, new)
    assert r.returncode == 1
    assert "scaled to 4.50x" in r.stdout  # 1.5 * capped 3.0


# ---------------------------------------------------------------------------
# Round-10 ADVICE: the relative wall floor (<=15%) needs an absolute
# ceiling — +14 s on a 100 s entry is a regression, not noise.
# ---------------------------------------------------------------------------
def test_relative_wall_floor_has_absolute_ceiling(tmp_path):
    # cpu 2x breach; wall 100 -> 114 s = 1.14x (inside the relative
    # floor) but +14 s (past the 8 s ceiling) -> FAIL
    old = _art(tmp_path / "o.json", {"q": 100.0}, {"q": 100.0})
    new = _art(tmp_path / "n.json", {"q": 114.0}, {"q": 200.0})
    r = _run(old, new)
    assert r.returncode == 1, r.stdout + r.stderr
    assert "REGRESSION" in r.stdout
    # under both the relative floor AND the ceiling stays exempt
    old2 = _art(tmp_path / "o2.json", {"q": 40.0}, {"q": 40.0})
    new2 = _art(tmp_path / "n2.json", {"q": 44.0}, {"q": 80.0})
    ok = _run(old2, new2)
    assert ok.returncode == 0, ok.stdout + ok.stderr
    assert "attribution class" in ok.stdout
