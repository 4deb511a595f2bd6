"""CPU quality probe for the dim-directional shadow skip
(RenderConfig.shadowless_strength_eps) at realistic frame dims.

The reference's clamp-transposition quirk (scene.cpp:603-610) keeps the
moon active at midday at strength 0.02; the fast mode lights it
unshadowed and skips its PCF + raster. This renders the bench default
scene at 960x540 (or 1920x1080 with --full) exact vs eps=0.025 and
reports the whole-frame deviation against the 1e-3 RMSE parity budget,
plus the same for the chess flagship.

Usage: python tools/shadowless_probe.py [--full]
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def _run(name, scene, lib, w, h):
    from syzygy_tpu.renderer import RenderConfig, render_frame
    from syzygy_tpu.scene import pack_frame_params, pack_geometry

    base = RenderConfig(width=w, height=h, n_shadow_maps=4)
    geo = pack_geometry(scene, lib)
    params = pack_frame_params(scene, w / h)
    from syzygy_tpu.scene import prepare_frame_state

    state = prepare_frame_state(params)
    moon = float(np.asarray(state.directional_lights.strength)[1])
    outs = {}
    for eps in (0.0, 0.025):
        config = dataclasses.replace(base, shadowless_strength_eps=eps)
        t0 = time.perf_counter()
        outs[eps] = np.asarray(render_frame(geo, params, config))
        print(
            f"{name} eps={eps}: rendered in {time.perf_counter() - t0:.0f}s",
            flush=True,
        )
    d = np.abs(outs[0.0] - outs[0.025])
    rmse = float(np.sqrt((d**2).mean()))
    print(
        f"{name}: moon strength {moon:.4f}, RMSE {rmse:.2e}, "
        f"max {d.max():.2e}, px>1e-3: {(d.max(axis=-1) > 1e-3).mean():.2%}",
        flush=True,
    )


def main():
    full = "--full" in sys.argv
    w, h = (1920, 1080) if full else (960, 540)

    from bench import _flagship_scene

    scene, lib = _flagship_scene()
    _run("default", scene, lib, w, h)

    from syzygy_tpu.assets.chess import flagship_scene
    from syzygy_tpu.math.geometry import eulers_from_forward

    chess, chess_lib = flagship_scene()
    chess.tick(0.0)
    eye = np.array([13.0, -8.0, -14.0], np.float32)
    target = np.array([0.0, -1.0, 0.0], np.float32)
    chess.camera.position = tuple(eye)
    chess.camera.euler_angles = tuple(
        np.asarray(eulers_from_forward(target - eye))
    )
    _run("chess", chess, chess_lib, w, h)


if __name__ == "__main__":
    main()
