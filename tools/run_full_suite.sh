#!/bin/bash
# Full test suite with process isolation against an XLA:CPU compiler bug.
#
# Why: a long pytest process accumulates XLA:CPU compile state (pallas
# interpret-mode programs are large); with enough accumulation the CPU
# compiler segfaults inside backend_compile_and_load — always on the
# largest programs (the two-loop reorder_from engine traces). Reproduced
# at round-4 HEAD, with jax.clear_caches() between modules, and with an
# unlimited stack — an upstream XLA state bug, not a repo regression
# (STATUS.md round 5). The same tests pass with less accumulated state
# (the quick suite is green in one process).
#
# Strategy: one pytest process per test module; if a module's process
# CRASHES (rc >= 128, e.g. 139 = SIGSEGV), rerun that module one test
# at a time in separate processes. Plain test failures (rc 1) are never
# retried — only process deaths.
#
#   bash tools/run_full_suite.sh                 # full suite
#   bash tools/run_full_suite.sh -m "not slow"   # extra pytest args pass through
set -u
cd "$(dirname "$0")/.."
fail=0
declare -a failed
for f in tests/test_*.py; do
  echo "=== $f ==="
  python -m pytest "$f" -q "$@"
  rc=$?
  if [ $rc -ge 128 ]; then
    echo "--- $f: process crashed (rc=$rc) — retrying one process per test"
    mapfile -t ids < <(python -m pytest "$f" --collect-only -q 2>/dev/null \
                       | grep "::")
    rc=0
    for id in "${ids[@]}"; do
      python -m pytest "$id" -q "$@"
      t=$?
      if [ $t -ne 0 ] && [ $t -ne 5 ]; then rc=1; fi
    done
  fi
  # pytest exit 5 = no tests collected (e.g. all deselected) — not a failure
  if [ $rc -ne 0 ] && [ $rc -ne 5 ]; then
    fail=1
    failed+=("$f (rc=$rc)")
  fi
done
echo
if [ $fail -ne 0 ]; then
  echo "FULL SUITE: FAILURES in: ${failed[*]}"
else
  echo "FULL SUITE: all modules passed"
fi
exit $fail
