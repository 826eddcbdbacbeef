#!/usr/bin/env bash
# Run the test suite without touching the single-client TPU tunnel.
#
# The container's sitecustomize claims the TPU tunnel at interpreter start
# when PALLAS_AXON_POOL_IPS is set — even for CPU-only runs — which starves
# any concurrently-running real TPU job. Always run tests with the trigger
# env var stripped (tests force jax_platforms=cpu anyway).
#
# Tiers (the verification ladder — stamp results with
# dev/stamp_tests_green.py):
#   dev/run_tests.sh fast    -> everything not marked slow (<~5 min)
#   dev/run_tests.sh medium  -> slow tier minus xslow big compiles (<~10 min)
#   dev/run_tests.sh slow    -> the full slow tier (~30 min)
#   dev/run_tests.sh         -> full suite
set -euo pipefail
cd "$(dirname "$0")/.."
case "${1:-all}" in
  fast)   shift || true
          exec env -u PALLAS_AXON_POOL_IPS python -m pytest tests/ -m "not slow" -q "$@";;
  medium) shift || true
          exec env -u PALLAS_AXON_POOL_IPS python -m pytest tests/ -m "slow and not xslow" -q --durations=25 "$@";;
  slow)   shift || true
          exec env -u PALLAS_AXON_POOL_IPS python -m pytest tests/ -m slow -q --durations=25 "$@";;
  all)    shift || true
          exec env -u PALLAS_AXON_POOL_IPS python -m pytest tests/ -q "$@";;
  *)      exec env -u PALLAS_AXON_POOL_IPS python -m pytest tests/ "$@";;
esac
