#!/bin/sh
# Run the test suite on CPU (virtual 8-device mesh), skipping the axon TPU
# tunnel registration that sitecustomize performs on interpreter start —
# tests never need the real chip and the tunnel serializes processes.
exec env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python -m pytest tests/ -q "$@"
