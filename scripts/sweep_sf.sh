#!/usr/bin/env bash
# Full-registry differential sweep at an arbitrary SF (default sf0.1 — 10x
# the driver's correctness gate). No skips as of round 11: the 5-node
# pattern rows run on the degree-capped EDGES_SPARSE5 set (bounded at
# 60*cap edges at any SF), so they no longer blow up when the underlying
# mod-60 graph saturates. 32g driver heap: the 4-node patterns at sf0.1
# OOM the 1g default. Round-10 runs: first pass found 3 real
# scale-boundary bugs (float32 decimal-tie rounding, zero-variance
# assortativity, LSH-vs-exact cluster oracle) — rerun after any change to
# the affected recipes.
set -euo pipefail
SF_DIR="${1:-/root/testdata/sf0.1}"
cd "$(dirname "$0")/.."
NAMES=$(python -c "
from seccosql_spark.registry import REGISTRY
print(' '.join(REGISTRY))")
PYSPARK_SUBMIT_ARGS="--driver-memory 32g pyspark-shell" \
  exec python scripts/verify_queries.py $NAMES --sf "$SF_DIR"
