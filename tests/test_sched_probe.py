"""Scheduler-probe quality gate.

Seed-path and scheduler changes move both quality and throughput, so
the canonical probe (tools/sched_probe.py) runs under the FFN_QUALITY
gate on the real chip and must hold its agreement floor. The CPU-sized
variant (PROBE_TINY) runs in CI so the probe harness itself cannot rot.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_probe(env):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/sched_probe.py")],
        capture_output=True, text=True, timeout=2400,
        env={**os.environ, **env}, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-2000:]
    result = None
    for line in proc.stdout.splitlines():
        try:
            d = json.loads(line)
        except ValueError:
            continue
        if d.get("metric") == "e2e_fused_250":
            result = d
    assert result is not None, proc.stdout[-2000:]
    return result


@pytest.mark.quality
@pytest.mark.skipif(os.environ.get("FFN_QUALITY") != "1",
                    reason="full-scale probe needs the real chip "
                           "(FFN_QUALITY=1)")
def test_sched_probe_quality_floor():
    """Canonical probe on the shipped flagship checkpoint: any
    scheduler change that trades quality for speed fails here."""
    result = _run_probe({"JAX_PLATFORMS": ""})
    assert result["agreement"] >= 0.98, result
    assert result["saved"] == 8, result


def test_sched_probe_tiny_cpu(tmp_path):
    """CI-sized probe: exercises the full fused path (decompose ->
    fused hops -> stitch -> score) with the tiny checkpoint on CPU."""
    result = _run_probe({
        "PROBE_TINY": "1",
        "JAX_PLATFORMS": "cpu",
        "F_MAX_ITERS": "600",
        "F_WORKDIR": str(tmp_path),
    })
    # 0.875 = the tiny fov-17 model's capability ceiling at 40^3 (one
    # GT object is consistently unreachable regardless of scheduler,
    # screen policy, or iteration cap — verified by sweeping all
    # three); the floor sits just under it so ANY additional lost
    # object fails.
    assert result["agreement"] >= 0.86, result
    assert result["saved"] == 8, result
