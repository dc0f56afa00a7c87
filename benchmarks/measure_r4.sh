#!/bin/bash
# Round-4 TPU measurement sweep (run when the axon tunnel is up).
# Sequential — only ONE TPU process may run at a time.
# Appends everything to benchmarks/measure_r4.log.
# Order: correctness first, then the round-4 A/Bs (in-kernel closest
# any-hit via profile_machinery; multi-walk kernel via kernel_bench
# --octet), then end-to-end. bench.py last also primes .xla_cache for
# the driver's own bench run.
set -u
cd "$(dirname "$0")/.."
LOG=benchmarks/measure_r4.log
run() {
  echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"
  timeout 2400 "$@" 2>&1 | tail -60 | tee -a "$LOG"
  echo "--- rc=$? ---" | tee -a "$LOG"
}
export PYTHONPATH=/root/repo:/root/.axon_site

run python benchmarks/tpu_validation.py
run python benchmarks/kernel_bench.py --reps 3 --json benchmarks/kernel_bench_r4_base.json
run python benchmarks/kernel_bench.py --reps 3 --octet 8 --json benchmarks/kernel_bench_r4_octet8.json
run python benchmarks/kernel_bench.py --reps 3 --octet 4 --json benchmarks/kernel_bench_r4_octet4.json
run python benchmarks/kernel_bench.py --reps 3 --octet 2 --json benchmarks/kernel_bench_r4_octet2.json
run python benchmarks/profile_machinery.py
run python bench.py
