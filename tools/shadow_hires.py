"""High-resolution shadow-map demonstration on device (VERDICT r2 item 7).

The reference allocates 10 x 8192^2 D32 maps (deferred.cpp:179-180); the
repo default is 1024^2 for HBM + software-raster cost reasons. This runs
the flagship-style default scene at shadow_dim 1024 / 4096 / (8192 if it
survives), records compile + per-frame raster time, and quantifies the
image-quality delta (RMSE of the final frame vs the 1024 run — shadow
resolution only affects shadowed texels).

HBM notes: one 8192^2 f32 map = 268 MB; the raster allocates per-light
setup + the map. n_shadow_maps stays 10 but only active lights raster
(frame.py); the persistent output is n_maps * dim^2 * 4 B = 2.7 GB at
8192 — within v5e's 16 GB but the transient tile grids decide survival.

Usage: python tools/shadow_hires.py [dims...]
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

    from syzygy_tpu.math.geometry import eulers_from_forward
    from syzygy_tpu.renderer import RenderConfig
    from syzygy_tpu.renderer.frame import _stage_geometry, _stage_lighting
    from syzygy_tpu.runtime import place_on_accelerator
    from syzygy_tpu.scene import default_scene, pack_frame_params, pack_geometry

    if not smoke and not wait_healthy():
        print("DEVICE UNAVAILABLE", flush=True)
        sys.exit(1)

    dims = [int(a) for a in sys.argv[1:]] or ([256, 512] if smoke else [1024, 4096, 8192])
    W, H = (256, 128) if smoke else (1920, 1080)

    scene, lib = default_scene()
    scene.sun_animation.time = 0.35
    scene.tick(0.0)
    eye = np.array([18.0, -16.0, -22.0], np.float32)
    target = np.array([0.0, -6.0, 0.0], np.float32)
    scene.camera.position = tuple(eye)
    scene.camera.euler_angles = tuple(
        np.asarray(eulers_from_forward(target - eye))
    )
    geo = place_on_accelerator(pack_geometry(scene, lib))
    params = pack_frame_params(scene, W / H)

    def fetch(x):
        return float(np.asarray(jax.device_get(x)).reshape(-1)[0])

    small = jax.jit(lambda x: x + 1)(jnp.zeros((1,)))
    jax.block_until_ready(small)
    t0 = time.perf_counter()
    fetch(small)
    fetch_s = time.perf_counter() - t0

    lit_ref = None
    for dim in dims:
        cfg = RenderConfig(
            width=W,
            height=H,
            shadow_dim=dim,
            **(dict(skyview_width=128, skyview_height=64) if smoke else {}),
        )

        @jax.jit
        def lit_frame(geo, params, eps, _cfg=cfg):
            p2 = params._replace(
                cam_position=jnp.asarray(params.cam_position) + eps * 1e-30
            )
            state, vis, gb, smaps = _stage_geometry.__wrapped__(
                geo, p2, _cfg
            )
            lit = _stage_lighting.__wrapped__(state, gb, smaps)
            return lit

        try:
            t_c = time.perf_counter()
            lit = lit_frame(geo, params, jnp.float32(0.0))
            chk = fetch(lit[0, 0, 0])
            compile_s = time.perf_counter() - t_c
            # timed pass (chained via eps on a fresh scalar)
            t0 = time.perf_counter()
            lit2 = lit_frame(geo, params, jnp.float32(chk) * 1e-30)
            fetch(lit2[0, 0, 0])
            run_s = time.perf_counter() - t0 - fetch_s
            # quality: mean lit-image delta vs the first (reference) dim
            if lit_ref is None:
                lit_ref = lit2
                rmse = 0.0
            else:
                rmse = float(
                    jax.device_get(
                        jnp.sqrt(jnp.mean((lit2 - lit_ref) ** 2))
                    )
                )
            print(
                f"shadow_dim {dim:5d}: compile+upload {compile_s:6.1f} s, "
                f"geometry+lighting {run_s * 1000:8.1f} ms, "
                f"lit-RMSE vs {dims[0]}: {rmse:.2e}",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 — record the failure mode
            print(f"shadow_dim {dim:5d}: FAILED {type(e).__name__}: {e}", flush=True)
            break
    print("shadow hires session complete", flush=True)


if __name__ == "__main__":
    main()
