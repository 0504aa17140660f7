#!/bin/bash
# Run the test suite on CPU WITHOUT claiming the TPU tunnel.
# The container's sitecustomize registers the axon TPU backend in every
# python process when PALLAS_AXON_POOL_IPS is set; clearing it keeps test
# processes off the (single-tenant) TPU so benches can run concurrently.
exec env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests/ -q "$@"
