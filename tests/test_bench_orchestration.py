"""bench.py orchestration: the jax-free parent must relay child output,
tolerate skipped/empty runs, and ALWAYS end with a parseable headline
line at rc=0 — the driver records the last JSON line of `python bench.py`
as the round's result, so this surface is release-critical."""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(extra_env, timeout=300):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # never grab the TPU grant from tests
    env["JAX_PLATFORMS"] = "cpu"
    env.update(extra_env)
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=timeout)


def test_all_legs_skipped_still_emits_headline_rc0():
    # BENCH_ONLY with an unknown leg name skips everything; the parent
    # must still exit 0 with a final JSON metric line.
    p = _run_bench({"BENCH_ONLY": "no_such_leg", "BENCH_BUDGET_S": "240"})
    assert p.returncode == 0, p.stderr[-2000:]
    lines = [l for l in p.stdout.strip().splitlines() if l.startswith("{")]
    assert lines, p.stdout
    last = json.loads(lines[-1])
    assert "metric" in last and "value" in last


def test_child_crash_restart_skips_completed_legs():
    # Child completes the test-only leg then hard-exits (simulating the
    # tunneled TPU worker crashing and poisoning the process).  The
    # parent must restart it with BENCH_SKIP carrying the completed leg
    # (no duplicate leg_done), and still end rc=0 with a headline line.
    p = _run_bench({
        "BENCH_TEST_LEG": "1",
        "BENCH_ONLY": "test_noop",
        "BENCH_CRASH_AFTER": "test_noop",
        "BENCH_BUDGET_S": "600",
    })
    assert p.returncode == 0, p.stderr[-2000:]
    lines = [json.loads(l) for l in p.stdout.strip().splitlines() if l.startswith("{")]
    restarts = [l for l in lines if l.get("metric") == "bench_child_restart"]
    assert len(restarts) == 1 and restarts[0]["child_rc"] == 17, p.stdout
    dones = [l for l in lines if l.get("leg_done") == "test_noop"]
    assert len(dones) == 1, p.stdout  # second child skipped it via BENCH_SKIP
    assert "metric" in lines[-1] and "value" in lines[-1]


def test_budget_exhausted_emits_skip_records_and_headline():
    # Restrict to one expensive leg with a budget the child setup alone
    # (~30 s CPU) outspends: the leg must skip-and-say-so, and the parent
    # still ends rc=0 with a final metric line.  (The primary leg is
    # excluded via BENCH_ONLY — its est is 0 so it would RUN on CPU.)
    p = _run_bench({"BENCH_ONLY": "stage2_train", "BENCH_BUDGET_S": "150"})
    assert p.returncode == 0, p.stderr[-2000:]
    lines = [json.loads(l) for l in p.stdout.strip().splitlines() if l.startswith("{")]
    skips = [l for l in lines if l.get("skipped") == "budget"]
    assert skips, p.stdout
    assert "metric" in lines[-1] and "value" in lines[-1]
