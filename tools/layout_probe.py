"""Probe TPU layout efficiency of channels-last (H, W, C) pixel math.

Hypothesis (from the 47.7 ms zero-light lighting floor): XLA tiles the two
minormost dims into (8 sublanes, 128 lanes); a trailing C=3/4 channel axis
lands on the lane dimension, wasting ~97% of each VPU op. If channel-first
(C, H, W) or flat (H, W) per-channel planes run the same op chain ~10-30x
faster, the per-pixel passes should be restructured.

Chained-scalar timing (CLAUDE.md item 7). Usage: python tools/layout_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tpu_session import wait_healthy  # noqa: E402


def main():
    import jax

    smoke = os.environ.get("SZG_BUDGET_CPU") == "1"
    if smoke:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    if not smoke and not wait_healthy():
        print("DEVICE UNAVAILABLE", flush=True)
        sys.exit(1)

    H, W = (128, 256) if smoke else (1080, 1920)
    n = 8
    REPS = 25  # elementwise chain length per call

    def fetch(x):
        return float(np.asarray(jax.device_get(x)).reshape(-1)[0])

    small = jax.jit(lambda x: x + 1)(jnp.zeros(()))
    jax.block_until_ready(small)
    t0 = time.perf_counter()
    fetch(small)
    fetch_s = time.perf_counter() - t0

    rng = np.random.default_rng(0)

    def chain_ops(x):
        # ~6 ops per rep: the flavor of lighting/sky math
        for _ in range(REPS):
            x = x * 1.000001 + 0.25
            x = jnp.maximum(x * x, 0.1)
            x = jax.lax.rsqrt(x + 0.3)
        return x

    def timed(name, make, index_out):
        arr = jnp.asarray(make())

        @jax.jit
        def f(a, eps):
            out = chain_ops(a + eps * 1e-30)
            return index_out(out) * 1e-30

        prev = jnp.zeros(())
        prev = f(arr, prev)
        fetch(prev)  # compile+warm
        t0 = time.perf_counter()
        for _ in range(n):
            prev = f(arr, prev)
        v = fetch(prev)
        dt = (time.perf_counter() - t0 - fetch_s) / n * 1000
        px_ops = H * W * REPS * 6
        print(
            f"{name}: {dt:8.3f} ms  ({px_ops / (dt * 1e-3) / 1e9:7.1f} G elem-ops/s, chk {v})",
            flush=True,
        )
        return dt

    timed(
        "HWC4 (1080,1920,4) ",
        lambda: rng.random((H, W, 4), np.float32),
        lambda o: o[0, 0, 0],
    )
    timed(
        "HWC3 (1080,1920,3) ",
        lambda: rng.random((H, W, 3), np.float32),
        lambda o: o[0, 0, 0],
    )
    timed(
        "CHW  (4,1080,1920) ",
        lambda: rng.random((4, H, W), np.float32),
        lambda o: o[0, 0, 0],
    )
    timed(
        "HW   (1080,1920)x4 seq",
        lambda: rng.random((4, H, W), np.float32),
        # same data, but op chain per plane to mimic 4 separate planes
        lambda o: o[0, 0, 0],
    )
    timed(
        "flat (1080*1920*4,) ",
        lambda: rng.random((H * W * 4,), np.float32),
        lambda o: o[0],
    )

    # a where-select chain (the lighting mask flavor) on HWC vs CHW
    def select_chain(x):
        m = x > 0.5
        for _ in range(REPS):
            x = jnp.where(m, x * 1.000001, x + 0.1)
            x = jnp.where(~m, jnp.maximum(x, 0.2), x)
        return x

    for name, shape in [("sel HWC4", (H, W, 4)), ("sel CHW", (4, H, W))]:
        arr = jnp.asarray(rng.random(shape, np.float32))

        @jax.jit
        def g(a, eps):
            out = select_chain(a + eps * 1e-30)
            return out.reshape(-1)[0] * 1e-30

        prev = jnp.zeros(())
        prev = g(arr, prev)
        fetch(prev)
        t0 = time.perf_counter()
        for _ in range(n):
            prev = g(arr, prev)
        v = fetch(prev)
        dt = (time.perf_counter() - t0 - fetch_s) / n * 1000
        print(f"{name}: {dt:8.3f} ms (chk {v})", flush=True)

    print("layout probe complete", flush=True)


if __name__ == "__main__":
    main()
