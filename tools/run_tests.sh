#!/bin/bash
# Per-file test runner: the XLA:CPU backend compiler segfaults
# nondeterministically after many compilations in one long process
# (observed twice mid-suite in r6, different tests, eager-op compile in
# backend_compile_and_load; each crashed test passes in isolation).
# Fresh process per test file bounds compile-cache growth and isolates
# any crash to one file's worth of tests.
cd "$(dirname "$0")/.."
fail=0
for f in tests/test_*.py; do
  if ! timeout 2700 python -m pytest "$f" -q 2>&1 | tail -2 | sed "s|^|[$f] |"; then
    fail=1
  fi
  status=${PIPESTATUS[0]}
  if [ "$status" -ne 0 ]; then
    echo "[$f] FAILED (exit $status)"
    fail=1
  fi
done
exit $fail
