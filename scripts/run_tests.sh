#!/bin/sh
# Three-shard test runner (VERDICT r6 item 8): the full suite
# single-process is ~13 min; the shards below run CONCURRENTLY as
# separate pytest processes (each builds its own local[4] Spark session
# with its own scratch dir), bringing everything-runs wall-clock under
# 8 min on the 32-core box. Balanced from a measured --durations run
# (NOTES.md round 7 "test-suite sharding"): north_star + streaming are
# ~half of the non-sweep time, the oracle-parity sweep is ~3.5 min solo.
#
#   shard A: unit/property/plan tests minus the two heavy modules
#   shard B: the full-inventory oracle-parity sweep (pytest -m sweep)
#   shard C: test_north_star.py + test_streaming.py
#
# Usage: scripts/run_tests.sh [extra pytest args for all shards]
set -u
cd "$(dirname "$0")/.."

mkdir -p /tmp/feast_ibm_spark_tests_a /tmp/feast_ibm_spark_tests_b \
         /tmp/feast_ibm_spark_tests_c

TMPDIR=/tmp/feast_ibm_spark_tests_a python -m pytest tests/ -q -m "not sweep" \
    --ignore=tests/test_north_star.py --ignore=tests/test_streaming.py "$@" &
A=$!
TMPDIR=/tmp/feast_ibm_spark_tests_b python -m pytest tests/ -q -m sweep "$@" &
B=$!
TMPDIR=/tmp/feast_ibm_spark_tests_c python -m pytest \
    tests/test_north_star.py tests/test_streaming.py -q -m "not sweep" "$@" &
C=$!

# pytest exit 5 = "no tests ran": tolerated ONLY when the caller passed
# extra -k/-m args that can legitimately deselect a whole shard; with no
# extra args an empty shard means the suite layout broke (renamed marker,
# emptied module) and must stay red
rc=0
for pid in "$A" "$B" "$C"; do
    wait "$pid"
    s=$?
    if [ "$s" -ne 0 ]; then
        if [ "$#" -eq 0 ] || [ "$s" -ne 5 ]; then
            rc=1
        fi
    fi
done
exit "$rc"
