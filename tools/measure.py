"""The canonical chained-group device timing harness.

Encodes the hard-won honest-measurement rules for this tunneled backend
(CLAUDE.md landmines 7/11/13) in ONE place — session tools must import
from here, not re-paste:

* ``block_until_ready`` acks early: every group is FORCED by fetching a
  4-byte scalar derived from the frames (fetch latency measured and
  subtracted).
* the first execution of a fresh program lazily uploads the executable:
  a full compile+force DISCARD pass runs before timing.
* XLA DCEs outputs a scalar doesn't depend on: callers' frame functions
  must return a FULL-REDUCTION tail (e.g. ``img.sum() * 1e-30``), never a
  single element.
* frames chain through a data dependency (fold the previous scalar into
  the next frame's params) so one fetch forces the whole group without
  deep queues.
"""

import time

import numpy as np


def measure_chained(frame_scalar_fn, n=24, group=8, label="", quiet=False):
    """Median ms/iter of ``frame_scalar_fn(prev_scalar) -> scalar`` over
    ``n`` frames in groups of ``group``, each group forced by one fetch."""
    import jax
    import jax.numpy as jnp

    def fetch(x):
        return float(np.asarray(jax.device_get(x)).reshape(-1)[0])

    t0 = time.perf_counter()
    v = fetch(frame_scalar_fn(jnp.zeros((), jnp.float32)))
    if not quiet:
        print(
            f"  {label}: compile+first force {time.perf_counter()-t0:.1f} s",
            flush=True,
        )
    assert np.isfinite(v)
    v = fetch(frame_scalar_fn(jnp.zeros((), jnp.float32)))  # discard pass

    small = jax.jit(lambda x: x + 1)(jnp.zeros(()))
    jax.block_until_ready(small)
    t0 = time.perf_counter()
    fetch(small)
    fetch_s = time.perf_counter() - t0

    times = []
    prev = jnp.zeros((), jnp.float32)
    for g0 in range(0, n, group):
        m = min(group, n - g0)
        t0 = time.perf_counter()
        for _ in range(m):
            prev = frame_scalar_fn(prev)
        fetch(prev)
        times.append((time.perf_counter() - t0 - fetch_s) / m)
    ms = float(np.median(times)) * 1000.0
    if not quiet:
        print(f"  {label}: {ms:.2f} ms/frame", flush=True)
    return ms


def perturb_params(params, s):
    """Fold a (zero-valued but data-dependent) scalar into FrameParams so
    chained frames depend on the previous frame's output."""
    import jax.numpy as jnp

    return params._replace(
        cam_position=params.cam_position + jnp.minimum(s * 1e-30, 0.0)
    )
