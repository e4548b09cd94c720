"""bench.py smoke: the driver runs it per round — make sure the contract
(ONE JSON line with the required keys) holds at tiny scale."""

import json
import os
import subprocess
import sys

import pytest


@pytest.mark.timeout(280)
def test_bench_json_contract(tmp_path):
    env = dict(
        os.environ,
        RAY_GRAFT_CPUS="4",
        GRAFT_BENCH_DOCS="2000",
        GRAFT_BENCH_DIR=str(tmp_path / "bench"),
        GRAFT_SF_DIR="/root/testdata/sf0.001",
    )
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        env=env,
        capture_output=True,
        text=True,
        timeout=260,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = proc.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    for key in ["metric", "value", "unit", "queries", "sf", "num_cpus", "docs_per_s"]:
        assert key in out, key
    assert out["unit"] == "sec" and out["value"] > 0
    assert out["docs_assigned"] == 2000
