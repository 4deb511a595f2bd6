"""Standalone device probe for the 2D-window PCF: compile time + run cost
of JUST sample_shadow_map at 1080p scale, isolated from the fused frame.

The full-frame A/B (tools/pcf_window2d_ab.py) hit a >40-minute compile on
the window2d leg (killed; the 1D leg of the same tool compiles in
minutes). This probe times, per variant:
  1. trace+compile (jax.jit(...).lower().compile() wall time)
  2. one warm discard pass (lazy executable upload)
  3. n chained evaluations, forced by a scalar fetch

on a (1088, 1920) coordinate grid against a 1024^2 map — the production
shading shape. If compile alone explodes, window2d is dead on compile
time regardless of runtime; if compile is fine here, the pathology is an
interaction with the fused frame program.

Usage: python tools/pcf_window2d_probe.py [n_iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _wait_healthy  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    if not _wait_healthy():
        print("device unavailable")
        return
    import jax
    import jax.numpy as jnp
    import numpy as np

    from syzygy_tpu.kernels.lighting import sample_shadow_map
    from syzygy_tpu.runtime import accelerator_device

    dev = accelerator_device()
    rng = np.random.default_rng(5)
    size = 1024
    h, w = 1088, 1920
    smap = jax.device_put(
        jnp.asarray(rng.random((size, size), np.float32)), dev
    )
    coord = jax.device_put(
        jnp.asarray(rng.random((h, w, 4), np.float32)), dev
    )
    dx = jax.device_put(jnp.asarray(rng.random((h, w), np.float32)), dev)
    dy = jax.device_put(jnp.asarray(rng.random((h, w), np.float32)), dev)

    print("gate passed", flush=True)
    for label, kwargs in (
        ("seg16", {}),
        ("window2d", {"window2d": True}),
        ("seg8", {"seg8": True}),
    ):
        print(f"{label}: tracing...", flush=True)
        def step(carry, smap, coord, dx, dy):
            # perturb the receiver depth so chained iterations can't CSE;
            # consume the full output so nothing is DCE'd (landmine 13)
            c = coord.at[..., 2].add(carry * 1e-12)
            s = sample_shadow_map(smap, c, dx, dy, f16=True, **kwargs)
            return jnp.sum(s)

        fn = jax.jit(step)
        t0 = time.perf_counter()
        compiled = fn.lower(
            jnp.float32(0.0), smap, coord, dx, dy
        ).compile()
        t_compile = time.perf_counter() - t0
        print(f"  compiled in {t_compile:.1f}s; warming...", flush=True)

        t0 = time.perf_counter()
        carry = compiled(jnp.float32(0.0), smap, coord, dx, dy)
        float(carry)  # force: upload + first run
        t_warm = time.perf_counter() - t0

        t0 = time.perf_counter()
        for _ in range(n):
            carry = compiled(carry * 1e-20, smap, coord, dx, dy)
        float(carry)
        t_run = (time.perf_counter() - t0) / n * 1e3

        print(
            f"{label}: compile {t_compile:.1f}s, "
            f"warm {t_warm:.1f}s, {t_run:.2f} ms/eval (n={n})",
            flush=True,
        )


if __name__ == "__main__":
    main()
