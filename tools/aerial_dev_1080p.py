"""Aerial-LUT-mode deviation at full 1080p, measured ON the TPU.

Renders the flagship frame twice (exact per-pixel integrals vs the
default aerial froxel + skyview-reuse mode) and reduces the difference on
device — only two scalars (RMSE, max) are fetched, avoiding the fragile
bulk D2H path.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tpu_session import wait_healthy  # noqa: E402


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from syzygy_tpu.assets.chess import flagship_scene
    from syzygy_tpu.math.geometry import eulers_from_forward
    from syzygy_tpu.renderer import RenderConfig, render_frame
    from syzygy_tpu.runtime import place_on_accelerator
    from syzygy_tpu.scene import pack_frame_params, pack_geometry

    if not wait_healthy():
        print("DEVICE UNAVAILABLE", flush=True)
        sys.exit(1)

    W, H = 1920, 1080
    scene, lib = flagship_scene()
    scene.tick(0.0)
    eye = np.array([13.0, -8.0, -14.0], np.float32)
    target = np.array([0.0, -1.0, 0.0], np.float32)
    scene.camera.position = tuple(eye)
    scene.camera.euler_angles = tuple(
        np.asarray(eulers_from_forward(target - eye))
    )
    geometry = place_on_accelerator(pack_geometry(scene, lib))
    params = pack_frame_params(scene, W / H)

    base = RenderConfig(width=W, height=H, n_shadow_maps=4)
    exact = dataclasses.replace(
        base, aerial_lut=False, fast_sky_reflection=False
    )
    img_a = render_frame(geometry, params, base)
    img_b = render_frame(geometry, params, exact)

    @jax.jit
    def stats(a, b):
        d = a - b
        return jnp.sqrt(jnp.mean(d * d)), jnp.abs(d).max()

    rmse, mx = stats(img_a, img_b)
    rmse = float(np.asarray(jax.device_get(rmse)))
    mx = float(np.asarray(jax.device_get(mx)))
    print(
        f"1080p flagship aerial-vs-exact (both TPU): RMSE {rmse:.6f} "
        f"max {mx:.4f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
