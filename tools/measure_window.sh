#!/bin/bash
# Uncontended TPU measurement window: pause the phantom trainer (clean
# SIGTERM checkpoint-and-exit), run the benchmark + quality suite, then
# print the resume command. Usage: bash tools/measure_window.sh [ckpt]
set -u
cd "$(dirname "$0")/.."

# Find the trainer PID by scanning /proc cmdlines (no pkill patterns).
trainer_pid=""
for p in /proc/[0-9]*; do
    cmd=$(tr '\0' ' ' < "$p/cmdline" 2>/dev/null)
    case "$cmd" in
        *python*train_phantom.py*) trainer_pid="${p#/proc/}";;
    esac
done

if [ -n "$trainer_pid" ]; then
    echo "pausing trainer pid=$trainer_pid (SIGTERM -> checkpoint+exit)"
    kill -TERM "$trainer_pid"
    while kill -0 "$trainer_pid" 2>/dev/null; do sleep 2; done
    echo "trainer exited"
fi

CKPT="${1:-$(ls -t /tmp/ph_r2/train/ckpt/model.ckpt-*.npz | head -1)}"
echo "== checkpoint: $CKPT"

echo "== bench.py (default: 120 lanes, f32 seeds, hops)"
timeout 900 python bench.py

echo "== bench.py (bf16 seeds, 240 lanes)"
BENCH_SEED_DTYPE=bf16 BENCH_BATCH=240 timeout 900 python bench.py

echo "== e2e 250^3 (phantom ckpt, 120 lanes)"
E2E_CKPT="$CKPT" E2E_LANES=120 E2E_MAX_ITERS=4000 E2E_DEPTH=12 \
    timeout 1800 python tools/e2e_bench.py

echo "== quality sweep (80^3 probes)"
for t in 0.9 0.8 0.7 0.6; do
    echo "-- move_t=$t"
    Q_CKPT="$CKPT" Q_SIZE=80 Q_LANES=16 Q_SMALL=0 Q_MOVE_T=$t \
        Q_MAX_ITERS=4000 timeout 900 python tools/quality_eval.py \
        2>/dev/null | grep phantom_gt
done

echo "== window done; resume training with:"
echo "PH_TRAINER=scan PH_BATCH=128 PH_PRECISION=bf16 PH_REMAT=0" \
     "PH_INIT=he PH_WORKDIR=/tmp/ph_r2 PH_STEPS=6000 PH_CKPT_EVERY=250" \
     "python tools/train_phantom.py >> /tmp/ph_r2/train.log 2>&1"
