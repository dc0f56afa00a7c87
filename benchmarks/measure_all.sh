#!/bin/bash
# One-shot TPU measurement sweep (run when the axon tunnel is up).
# Sequential — only ONE TPU process may run at a time (see
# .claude/skills/verify). Appends everything to benchmarks/measure_all.log.
# Order: correctness first, then the cheap microbenches, then end-to-end.
set -u
cd "$(dirname "$0")/.."
LOG=benchmarks/measure_all.log
run() {
  echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"
  timeout 1500 "$@" 2>&1 | tail -40 | tee -a "$LOG"
  echo "--- rc=$? ---" | tee -a "$LOG"
}
export PYTHONPATH=/root/repo:/root/.axon_site

run python benchmarks/tpu_validation.py
run python benchmarks/kernel_bench.py --reps 3 --json benchmarks/kernel_bench.json
run python benchmarks/kernel_bench.py --reps 3 --dual --json benchmarks/kernel_bench_dual.json
run python benchmarks/kernel_bench.py --reps 3 --pair --json benchmarks/kernel_bench_pair.json
run python benchmarks/profile_phases.py --rows 256 --row0 400 --waves 8
run python bench.py
