"""Test harness: run everything on a virtual 8-device CPU mesh.

NOTE: this environment's axon TPU plugin overrides the JAX_PLATFORMS env var,
so we must force CPU via jax.config *after* import (before any computation).
Pallas kernels run in interpreter mode on CPU (selected automatically by
syzygy_tpu.kernels.common.use_interpret). Real-TPU execution is exercised by
bench.py / __graft_entry__.py, which the driver runs on hardware.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
