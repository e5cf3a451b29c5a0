"""End-to-end driver-contract check: run tools/driver_sim.py in a fresh
process with a VANILLA SparkSession (none of this repo's tuned configs) and
under a non-UTC host timezone — the adversarial conditions the external
correctness driver may impose. See .claude/skills/verify/SKILL.md.

Sharded (round-10 verdict #3): one monolithic 162-entry sweep no longer
fits a 900 s subprocess timeout on a contended host, and its single
timeout aborted the whole suite under ``-x`` — ~610 tests never ran in
the round-10 verify. Four round-robin shards (sorted names striped, so
the expensive t2x/pipe entries spread out) each get their own subprocess
and timeout; a straggler costs one shard, not the suite.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SIM = os.path.join(REPO, "tools", "driver_sim.py")
SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
N_SHARDS = 4


def _shard_names(shard: int) -> str:
    # import the entry module the way driver_sim does (no Spark session —
    # queries() only returns callables)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    names = sorted(mod.queries())
    return ",".join(names[shard::N_SHARDS])


@pytest.mark.parametrize("shard", range(N_SHARDS))
def test_driver_contract_non_utc_host(shard):
    # local[4] + generous timeout: this subprocess competes with the
    # suite's own local[8] session for the same cores; the real driver
    # runs alone. Semantics are unaffected by the core count.
    env = dict(
        os.environ,
        TZ="America/New_York",
        DRIVER_SIM_MASTER="local[4]",
        ONLY=_shard_names(shard),
    )
    proc = subprocess.run(
        [sys.executable, SIM, SF],
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    tail = "\n".join(proc.stdout.splitlines()[-40:])
    assert proc.returncode == 0, f"driver sim failed:\n{tail}\n{proc.stderr[-2000:]}"
    assert "0 fail" in tail, tail
