"""Test harness: run everything on a virtual 8-device CPU mesh.

Pallas kernels run in interpreter mode on CPU (selected automatically by
syzygy_tpu.kernels helpers via backend check). Real-TPU execution is exercised
by bench.py / __graft_entry__.py, which the driver runs on hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
