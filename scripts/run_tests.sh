#!/usr/bin/env bash
# Chunked test runner: the whole suite as independent shards, each with its
# own timeout, so one hung shard cannot mask the rest (reference analog:
# Buildkite per-domain scopes, .buildkite/pipeline.yml:1-60).
#
# Usage: scripts/run_tests.sh [pytest extra args...]
# Env:   SHARD_TIMEOUT (default 1800s per shard)
#        PYTEST (default "python -m pytest")
# Exit:  non-zero if ANY shard fails; prints a per-shard summary at the end.
set -u
cd "$(dirname "$0")/.."

SHARD_TIMEOUT="${SHARD_TIMEOUT:-1800}"
PYTEST="${PYTEST:-python -m pytest}"
EXTRA=("$@")

# Shards grouped by domain and rough runtime; parity and pipelines are the
# heavy ones and get split.
SHARDS=(
  "tests/ops tests/layers"
  "tests/golden tests/models tests/utils_scripts"
  "tests/api tests/apps tests/eval"
  "tests/test_observability.py tests/test_performance_dashboard.py tests/distributed"
  "tests/parity"
  "tests/pipelines"
  "tests/training"
)

declare -a RESULTS
FAILED=0
for i in "${!SHARDS[@]}"; do
  shard="${SHARDS[$i]}"
  echo "=== shard $((i+1))/${#SHARDS[@]}: ${shard} (timeout ${SHARD_TIMEOUT}s) ==="
  start=$(date +%s)
  # shellcheck disable=SC2086
  timeout "${SHARD_TIMEOUT}" ${PYTEST} ${shard} -q -x --durations=5 "${EXTRA[@]+"${EXTRA[@]}"}"
  rc=$?
  dur=$(( $(date +%s) - start ))
  if [ $rc -eq 124 ]; then
    RESULTS[$i]="TIMEOUT after ${SHARD_TIMEOUT}s: ${shard}"
    FAILED=1
  elif [ $rc -ne 0 ]; then
    RESULTS[$i]="FAIL (rc=$rc, ${dur}s): ${shard}"
    FAILED=1
  else
    RESULTS[$i]="ok (${dur}s): ${shard}"
  fi
done

echo
echo "=== run_tests summary ==="
for r in "${RESULTS[@]}"; do echo "  $r"; done
exit $FAILED
