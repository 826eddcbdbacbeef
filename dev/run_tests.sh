#!/usr/bin/env bash
# Run the test suite without touching the single-client TPU tunnel.
#
# The container's sitecustomize claims the TPU tunnel at interpreter start
# when PALLAS_AXON_POOL_IPS is set — even for CPU-only runs — which starves
# any concurrently-running real TPU job. Always run tests with the trigger
# env var stripped (tests force jax_platforms=cpu anyway).
set -euo pipefail
cd "$(dirname "$0")/.."
exec env -u PALLAS_AXON_POOL_IPS python -m pytest tests/ "${@:--x -q}"
