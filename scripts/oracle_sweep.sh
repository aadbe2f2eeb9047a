#!/bin/sh
# Standing sf0.1 oracle sweep (round-4 verdict #8: this sweep caught
# the only real correctness bug of round 4 — the prefix-sum
# exchange-reuse break under AQE — so it is now standing
# infrastructure, run at least once per round before the snapshot).
#
# Runs the full engine-vs-DuckDB parity suite at 10x the driver's
# gate scale.  ~15-25 min on local[32].
#
#   ./scripts/oracle_sweep.sh              # sf0.1 (default)
#   ./scripts/oracle_sweep.sh sf0.01       # other scale
set -e
SF="${1:-sf0.1}"
[ $# -gt 0 ] && shift
cd "$(dirname "$0")/.."
SPARK_GRAFT_TEST_SF_DIR="/root/testdata/${SF}" \
    exec python -m pytest tests/test_oracle_parity.py -q --no-header "$@"
