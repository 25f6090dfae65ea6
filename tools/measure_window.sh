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

echo "== bench.py (default config)"
timeout 900 python bench.py 2>/dev/null

echo "== e2e 250^3 (120 lanes, bf16 seeds)"
FFN_TPU_SEED_DTYPE=bf16 E2E_CKPT="$CKPT" E2E_LANES=120 \
    E2E_MAX_ITERS=4000 timeout 1800 python tools/e2e_bench.py 2>/dev/null \
    | grep -a "wallclock_proxy\|breakdown"

echo "== e2e 250^3 (48 lanes, bf16 seeds)"
FFN_TPU_SEED_DTYPE=bf16 E2E_CKPT="$CKPT" E2E_LANES=48 \
    E2E_MAX_ITERS=4000 timeout 1800 python tools/e2e_bench.py 2>/dev/null \
    | grep -a "wallclock_proxy\|breakdown"

echo "== quality: 250^3 padded GT agreement + lanes-vs-serial (100^3)"
Q_CKPT="$CKPT" Q_SIZE=250 Q_LANES=120 Q_SMALL=100 Q_PAD_IMAGE=16 \
    Q_MAX_ITERS=4000 timeout 3000 python tools/quality_eval.py 2>/dev/null

echo "== window done; resume training with:"
echo "PH_TRAINER=scan PH_BATCH=128 PH_PRECISION=bf16 PH_REMAT=0" \
     "PH_INIT=he PH_WORKDIR=/tmp/ph_r2 PH_STEPS=6000 PH_CKPT_EVERY=250" \
     "python tools/train_phantom.py >> /tmp/ph_r2/train.log 2>&1"
