#!/usr/bin/env bash
# Full-registry differential sweep at an arbitrary SF (default sf0.1 — 10x
# the driver's correctness gate). Skips the 5-node pattern rows at sf0.1:
# the sparse-graph generator saturates there (symmetrized graph is
# complete), making any 5-node enumeration ~90^5 intermediates in BOTH
# engines. 32g driver heap: the 4-node patterns at sf0.1 OOM the 1g default.
# Round-10 runs: first pass found 3 real scale-boundary bugs (float32
# decimal-tie rounding, zero-variance assortativity, LSH-vs-exact cluster
# oracle) — rerun after any change to the affected recipes.
set -euo pipefail
SF_DIR="${1:-/root/testdata/sf0.1}"
SKIP="g_ring5_chords g_ring5_chords_b g_house_count g_c1_pentagon_agg g_c2_pentagon_agg g_c3_pentagon_wsum g_c4_pentagon_wsum"
cd "$(dirname "$0")/.."
NAMES=$(python -c "
from seccosql_spark.registry import REGISTRY
skip = set('''$SKIP'''.split())
print(' '.join(n for n in REGISTRY if n not in skip))")
PYSPARK_SUBMIT_ARGS="--driver-memory 32g pyspark-shell" \
  exec python scripts/verify_queries.py $NAMES --sf "$SF_DIR"
