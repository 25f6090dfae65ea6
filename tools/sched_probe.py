#!/usr/bin/env python3
"""Fast seed/scheduler regression probe for the fused driver.

Scheduler and seed-path changes move BOTH quality and throughput (round
3 measured exactly that), so every such change must run this probe
before it lands: a small fixed-RNG fused run (held-out phantom,
reflect-padded, overlapping subvolumes — the production shape in
miniature) that prints ONE JSON line with object-level GT agreement and
sustained FOV/s. ~1-3 min on the TPU tunnel; also runs on CPU with the
tiny checkpoint (PROBE_TINY=1) for CI.

Canonical configuration (fixed so numbers are comparable across
changes): 120^3 eval phantom, pad 16, 2x2x2 subvolumes of 100^3 with
overlap 44, 96 lanes, 8 slots, 16 hops, shipped model-r2 bf16.

Env: PROBE_TINY=1 switches to the model-ci-tiny checkpoint + 64^3
volume for CPU runs; any F_* override is passed through to
tools/e2e_fused_bench.py (the probe is a pinned configuration of it).

The FFN_QUALITY-gated regression test (tests/test_sched_probe.py)
asserts the probe's agreement floor so a scheduler change cannot
silently trade quality for speed.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CANONICAL = {
    "F_SIZE": "120",
    "F_PAD_IMAGE": "16",
    "F_SUB": "100",
    "F_OVERLAP": "44",
    "F_LANES": "96",
    "F_SLOTS": "8",
    "F_HOPS": "16",
    "F_DTYPE": "bf16",
    "F_CKPT": os.path.join(REPO, "models/phantom/model-r2.npz"),
    "F_WORKDIR": "/tmp/ffn_tpu_sched_probe",
}

TINY = {
    # CPU-feasible: tiny model (fov 17, deltas 6), small volume.
    "F_SIZE": "40",
    "F_PAD_IMAGE": "8",
    "F_SUB": "36",
    "F_OVERLAP": "16",
    "F_LANES": "8",
    "F_SLOTS": "4",
    "F_HOPS": "8",
    "F_DTYPE": "f32",
    "F_CKPT": os.path.join(REPO, "models/phantom/model-ci-tiny.npz"),
    "F_WORKDIR": "/tmp/ffn_tpu_sched_probe_tiny",
    "Q_DEPTH": "2", "Q_FOV": "17", "Q_DELTAS": "6", "Q_FEATURES": "16",
    # The tiny fov can't bridge min_segment_size=1000 objects at 64^3;
    # match the CI quality floor's settings.
    "Q_MIN_SIZE": "300",
}


def main():
    base = TINY if os.environ.get("PROBE_TINY") == "1" else CANONICAL
    for k, v in base.items():
        os.environ.setdefault(k, v)
    from tools import e2e_fused_bench
    e2e_fused_bench.main()


if __name__ == "__main__":
    main()
