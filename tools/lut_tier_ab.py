"""A/B the LUT gather-tier optimizations on device, one session.

tools/gather_width_probe2.py established the table-size cost tiers on this
TPU (per 2M random samples): <=16,384-row tables ~8 ms regardless of row
width; 32k-row..32 MB tables ~25 ms; 2M-row tables bytes-bound (47.5 ms
f32 / 33.9 ms f16 at 12ch). This script measures the frame-level payoff:

  a. froxel-shaped micro gather (16,384 rows x 72ch f32 = 4.7 MB) —
     discriminates whether the cheap tier is row-count-bound (froxel
     already cheap) or byte-bound (shrinking the froxel would pay);
  b. full bench frame (default scene, fused, 1080p) for the 2x2 of
     {transmittance 512x128 vs 256x64} x {skyview f32 vs f16}. The
     transmittance LUT (64k rows, 3 MB packed) serves ~3 gathers/px in
     the sky stage; 256x64 is 16,384 rows = the cheap tier. The skyview
     quad (2M rows, 100 MB) serves 1 gather/px.

Usage: python tools/lut_tier_ab.py
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from bench import _flagship_scene, _measure_scene, _wait_healthy  # noqa: E402


def micro_froxel_gather():
    import jax
    import jax.numpy as jnp

    from syzygy_tpu.runtime import accelerator_device

    dev = accelerator_device()
    S = 2_073_600
    REPS = 10
    rng = np.random.default_rng(0)
    for rows, ch in ((16_384, 72), (16_384, 12), (8_192, 72)):
        table = jax.device_put(
            jnp.asarray(rng.random((rows, ch)).astype(np.float32)), dev
        )
        idx = jax.device_put(
            jnp.asarray(rng.integers(0, rows, S).astype(np.int32)), dev
        )

        @jax.jit
        def run(t, ix, s0):
            def body(c, _):
                s, ix = c
                g = t[ix]
                s = s + g.sum() * 1e-12
                ix = (ix + jnp.int32(s * 0) + 1) % t.shape[0]
                return (s, ix), None

            (s, _), _ = jax.lax.scan(body, (s0, ix), None, length=REPS)
            return s

        float(np.asarray(jax.device_get(run(table, idx, jnp.float32(0.0)))))
        t0 = time.perf_counter()
        float(np.asarray(jax.device_get(run(table, idx, jnp.float32(1e-6)))))
        dt = time.perf_counter() - t0
        print(
            f"micro rows={rows:>6,} ch={ch}: {dt / REPS * 1e3:7.2f} ms per "
            f"2M-sample gather",
            flush=True,
        )


def main():
    if not _wait_healthy():
        print("device unavailable")
        return
    micro_froxel_gather()

    from syzygy_tpu.renderer import RenderConfig

    base = RenderConfig(
        width=1920, height=1080, n_shadow_maps=4, fuse_lighting_sky=True
    )
    for t_dims, f16 in (
        ((512, 128), False),  # current default
        ((256, 64), False),
        ((256, 64), True),
        ((512, 128), True),
    ):
        config = dataclasses.replace(
            base,
            transmittance_width=t_dims[0],
            transmittance_height=t_dims[1],
            skyview_f16=f16,
        )
        scene, library = _flagship_scene()
        ms = _measure_scene(scene, library, config, frames=16)
        print(
            f"transmittance={t_dims[0]}x{t_dims[1]} skyview_f16={f16}: "
            f"{ms:.1f} ms/frame",
            flush=True,
        )


if __name__ == "__main__":
    main()
