#!/bin/sh
# Two-shard test runner (VERDICT r6 item 8): the full suite single-process
# is ~11 min; the two shards below run CONCURRENTLY as separate pytest
# processes (each builds its own local[4] Spark session with its own
# scratch dir), bringing everything-runs wall-clock under 8 min.
#
#   shard A: everything except the oracle-parity sweep   (pytest -m "not sweep")
#   shard B: the full-inventory oracle-parity sweep       (pytest -m sweep)
#
# Usage: scripts/run_tests.sh [extra pytest args for both shards]
set -u
cd "$(dirname "$0")/.."

mkdir -p /tmp/feast_ibm_spark_tests_a /tmp/feast_ibm_spark_tests_b

TMPDIR=/tmp/feast_ibm_spark_tests_a python -m pytest tests/ -q -m "not sweep" "$@" &
A=$!
TMPDIR=/tmp/feast_ibm_spark_tests_b python -m pytest tests/ -q -m sweep "$@" &
B=$!

rc=0
wait "$A" || rc=1
wait "$B" || rc=1
exit "$rc"
