"""Driver-bench orchestrator contract (bench.py): the round-4 artifact
died rc=124 with 5 of 8 metrics lost; these pin the properties that
prevent that — always rc=0, budget skips are graceful, JSON lines are
well-formed, and the final line is the canonical headline metric."""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(extra_env, timeout=300):
    env = dict(os.environ)
    env.update(extra_env)
    env["BENCH_PLATFORM"] = "cpu"
    env["BENCH_SMOKE"] = "1"
    return subprocess.run(
        [sys.executable, os.path.join(HERE, "bench.py")],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=HERE,
        env=env,
    )


def test_headline_leg_lands_and_is_final_line():
    proc = _run(
        {
            "BENCH_LEGS": "headline",
            "BENCH_BUDGET_S": "240",
            "BENCH_N": "512",
            "BENCH_ITERS": "1",
            "BENCH_NB": "256",
        }
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert lines, proc.stderr[-2000:]
    records = [json.loads(l) for l in lines]
    for r in records:
        assert {"metric", "value", "unit", "vs_baseline"} <= set(r)
    # the driver parses the FINAL json line: must be the headline metric
    assert "gpr_nlml_grad_n" in records[-1]["metric"]
    assert records[-1]["unit"] == "steps/s"


def test_exhausted_budget_still_exits_zero():
    proc = _run({"BENCH_BUDGET_S": "0"}, timeout=60)
    assert proc.returncode == 0
    assert not [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert "SKIPPED" in proc.stderr
