#!/bin/bash
# Round-3 TPU measurement sweep (run when the axon tunnel is up).
# Sequential — only ONE TPU process may run at a time.
# Appends everything to benchmarks/measure_r3.log.
# Order: correctness first, descend A/B microbench, startup profile,
# then end-to-end.
set -u
cd "$(dirname "$0")/.."
LOG=benchmarks/measure_r3.log
run() {
  echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"
  timeout 2400 "$@" 2>&1 | tail -50 | tee -a "$LOG"
  echo "--- rc=$? ---" | tee -a "$LOG"
}
export PYTHONPATH=/root/repo:/root/.axon_site

run python benchmarks/tpu_validation.py
run python benchmarks/kernel_bench.py --reps 3 --json benchmarks/kernel_bench_r3_base.json
run python benchmarks/kernel_bench.py --reps 3 --descend --json benchmarks/kernel_bench_r3_descend.json
run python benchmarks/profile_sceneload.py
run python bench.py
run python benchmarks/profile_phases.py --rows 256 --row0 400 --waves 8
