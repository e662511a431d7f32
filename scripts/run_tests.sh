#!/usr/bin/env bash
# Test runner tiers.
#
#   scripts/run_tests.sh smoke      — fast tier (-m "not slow"), < ~4.5 min on 1 CPU
#   scripts/run_tests.sh slow       — heavy tier only (interpret-mode Pallas,
#                                     shard_map pipelines; ~30+ min on 1 CPU)
#   scripts/run_tests.sh all        — everything, in 3 shards mirroring how the
#                                     suite is CI-sharded (fail fast per shard)
#
# All tiers run on the CPU backend with an 8-device virtual mesh
# (tests/conftest.py sets JAX_PLATFORMS/XLA_FLAGS before jax import).
set -euo pipefail
cd "$(dirname "$0")/.."

tier="${1:-smoke}"
shift || true

case "$tier" in
  smoke)
    exec python -m pytest tests/ -m "not slow" -q "$@"
    ;;
  slow)
    exec python -m pytest tests/ -m slow -q "$@"
    ;;
  all)
    python -m pytest tests/ops tests/core tests/util tests/test_runtime.py -q "$@"
    python -m pytest tests/io tests/cli tests/motion_generation -q "$@"
    exec python -m pytest tests/pipeline tests/parallel -q "$@"
    ;;
  *)
    echo "usage: $0 {smoke|slow|all} [pytest args...]" >&2
    exit 2
    ;;
esac
