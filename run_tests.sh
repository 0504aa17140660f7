#!/bin/bash
# Run the test suite on CPU WITHOUT claiming the TPU tunnel.
# The container's sitecustomize registers the axon TPU backend in every
# python process when PALLAS_AXON_POOL_IPS is set; clearing it keeps test
# processes off the (single-tenant) TPU so benches can run concurrently.
# xdist workers are configured via pyproject addopts (single-process runs
# segfault in XLA CPU compile after ~150 tests — see pyproject.toml).
exec env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests/ -q "$@"
