#!/usr/bin/env bash
# Run the test suite without touching the single-client TPU tunnel.
#
# The container's sitecustomize claims the TPU tunnel at interpreter start
# when PALLAS_AXON_POOL_IPS is set — even for CPU-only runs — which starves
# any concurrently-running real TPU job. Always run tests with the trigger
# env var stripped (tests force jax_platforms=cpu anyway).
#
# Tiers:
#   dev/run_tests.sh fast   -> everything not marked slow (<~2 min target)
#   dev/run_tests.sh slow   -> only the slow tier (big compiles, e2e loops)
#   dev/run_tests.sh        -> full suite
set -euo pipefail
cd "$(dirname "$0")/.."
case "${1:-all}" in
  fast) shift || true
        exec env -u PALLAS_AXON_POOL_IPS python -m pytest tests/ -m "not slow" -q "$@";;
  slow) shift || true
        exec env -u PALLAS_AXON_POOL_IPS python -m pytest tests/ -m slow -q "$@";;
  all)  shift || true
        exec env -u PALLAS_AXON_POOL_IPS python -m pytest tests/ -q "$@";;
  *)    exec env -u PALLAS_AXON_POOL_IPS python -m pytest tests/ "$@";;
esac
