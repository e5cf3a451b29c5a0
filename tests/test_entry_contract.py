"""End-to-end driver-contract check: run tools/driver_sim.py in a fresh
process with a VANILLA SparkSession (none of this repo's tuned configs) and
under a non-UTC host timezone — the adversarial conditions the external
correctness driver may impose. See .claude/skills/verify/SKILL.md.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SIM = os.path.join(REPO, "tools", "driver_sim.py")
SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_driver_contract_non_utc_host():
    # local[4] + generous timeout: this subprocess competes with the
    # suite's own local[8] session for the same cores; the real driver
    # runs alone. Semantics are unaffected by the core count.
    env = dict(os.environ, TZ="America/New_York", DRIVER_SIM_MASTER="local[4]")
    proc = subprocess.run(
        [sys.executable, SIM, SF],
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    tail = "\n".join(proc.stdout.splitlines()[-40:])
    assert proc.returncode == 0, f"driver sim failed:\n{tail}\n{proc.stderr[-2000:]}"
    assert "0 fail" in tail, tail
