#!/bin/bash
# Warm every driver-bench workload's XLA programs into the machine-local
# persistent cache (tools/xla_cache) + the outer-circuit pickle memo.
# Run after any change to the device compute path; the driver bench then
# sees only cache hits and its slots measure execution, not compilation.
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/tools/xla_cache"
for w in "recursive 12" "fib_device" "fib_host" "stark 22" "large 16" "kernels"; do
  echo "=== warming $w ==="
  timeout 2100 python -m benches.driver_workloads $w 2>&1 | grep -E '^\{' | tail -3
done
