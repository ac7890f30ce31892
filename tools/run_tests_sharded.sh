#!/bin/bash
# Run the test suite in N serial shards (for 1-core boxes where one pytest
# process exceeds a wall-clock window — e.g. CI judges with 10-min limits).
# Shards are file-level round-robin; each shard reports its own summary and
# the script exits nonzero if ANY shard fails.
#
#   tools/run_tests_sharded.sh [N_SHARDS] [EXTRA_PYTEST_ARGS...]
#
# Multi-host cluster tests (tests/test_multihost.py) spawn their own
# processes and dominate one shard's time; they stay included — drop them
# with: tools/run_tests_sharded.sh 4 --ignore=tests/test_multihost.py

set -u
cd "$(dirname "$0")/.."
N=${1:-4}
shift || true

mapfile -t FILES < <(ls tests/test_*.py)
rc=0
for ((s = 0; s < N; s++)); do
  shard=()
  for ((i = s; i < ${#FILES[@]}; i += N)); do
    shard+=("${FILES[$i]}")
  done
  # an empty shard would make pytest fall back to full discovery
  ((${#shard[@]})) || continue
  echo "=== shard $((s + 1))/$N: ${#shard[@]} files"
  python -m pytest "${shard[@]}" -q "$@" || rc=1
done
exit $rc
