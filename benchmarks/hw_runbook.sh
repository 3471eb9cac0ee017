#!/bin/bash
# Hardware measurement runbook (PERF_NOTES "pending hardware measurement").
#
# Polls the axon TPU tunnel until it answers (it wedges for hours after an
# OOM-crashed worker — CLAUDE.md), then runs the serialized measurement
# sequence.  Every stage is timeout-bounded; ONE TPU process at a time.
#
#   usage: bash benchmarks/hw_runbook.sh [logdir]
#
# Stages:
#   1. probe             jax.devices() answers within 90 s
#   2. hw_parity         Mosaic-compiled kernel == XLA chain on hardware
#   3. bench --quick     fast sanity number
#   4. kernel_probe      skin/cap/springs decomposition grid
#   5. bench (full)      the BENCH_r03 headline number
#   6. config6 --quick   1M-bead scale-out headroom
#
# Each stage logs to $LOG/<stage>.log; a stage failure stops the sequence
# (a wedged worker would cascade).  Exit 0 only if all stages pass.

set -u
LOG=${1:-/tmp/hw_runbook}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."
# scripts live in benchmarks/: python puts THAT dir on sys.path, not the
# repo root — export the root so `import lammps_le_tpu` resolves
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

stamp() { date +%H:%M:%S; }

echo "$(stamp) runbook start, logs in $LOG"

# ---- stage 1: poll the tunnel (up to 6 h, 5 min between probes) ----
for i in $(seq 1 72); do
    if timeout 90 python -c "import jax; print(jax.devices())" \
        > "$LOG/probe.log" 2>&1; then
        echo "$(stamp) tunnel UP: $(cat "$LOG/probe.log")"
        break
    fi
    echo "$(stamp) probe $i/72: tunnel still down"
    [ "$i" -eq 72 ] && { echo "$(stamp) giving up"; exit 2; }
    sleep 300
done

run_stage() {
    local name=$1 tmo=$2; shift 2
    echo "$(stamp) stage $name: $*"
    if timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1; then
        echo "$(stamp) stage $name OK"
        tail -3 "$LOG/$name.log"
    else
        echo "$(stamp) stage $name FAILED (see $LOG/$name.log)"
        tail -15 "$LOG/$name.log"
        exit 1
    fi
}

# Mosaic remote compiles take ~1-5 min each; parity compiles two kernels.
# bench runs its bench-geometry probe subprocess first (compile-heavy on
# a cold cache), so its stages get the widest budgets.
run_stage hw_parity 1800 python benchmarks/hw_parity.py
run_stage bench_quick 3600 python bench.py --quick
run_stage kernel_probe 2400 python benchmarks/kernel_probe.py
run_stage bench_full 5400 python bench.py
run_stage config6 1800 python benchmarks/configs.py 6 --quick

echo "$(stamp) runbook COMPLETE"
