#!/usr/bin/env bash
# Sharded test runner: one pytest process per test file.
#
# Why sharded: XLA:CPU on small hosts accumulates in-process compile
# state and can segfault after enough compilations in one interpreter
# (same fragility class as the fusion-pass miscompile worked around in
# tests/conftest.py). Each file passes in isolation; CI shards the same
# way. conftest.py forces JAX_PLATFORMS=cpu and the 8-device virtual
# mesh regardless of the ambient environment.
#
# Usage: tools/run_sharded.sh [extra pytest args...]
set -u
cd "$(dirname "$0")/.."
pass=0; fail=0; failed_files=()
for f in tests/test_*.py; do
  timeout "${SHARD_TIMEOUT:-2400}" python -m pytest "$f" -q "$@" >/tmp/shard_out.txt 2>&1
  rc=$?
  # rc 5 = no tests collected in this file (e.g. -m slow filters) — fine
  if [ $rc -eq 0 ] || [ $rc -eq 5 ]; then
    tail -1 /tmp/shard_out.txt | sed "s|^|$f: |"
    pass=$((pass+1))
  else
    tail -3 /tmp/shard_out.txt | sed "s|^|$f: |"
    fail=$((fail+1)); failed_files+=("$f")
  fi
done
echo "=== sharded suite: $pass files green, $fail failed ==="
if [ $fail -gt 0 ]; then printf 'FAILED: %s\n' "${failed_files[@]}"; exit 1; fi
