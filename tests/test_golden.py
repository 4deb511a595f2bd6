"""Golden-frame regression: the full frame against a stored CPU render.

Catches unintended changes in any pass. RMSE tolerance allows cross-version
XLA rounding drift but flags real behavioral changes. Regenerate after
intentional changes:

    python tools/regen_goldens.py
"""

import os

import numpy as np

from syzygy_tpu.math.geometry import eulers_from_forward
from syzygy_tpu.renderer import RenderConfig, render_frame
from syzygy_tpu.scene import default_scene, pack_frame_params, pack_geometry
from syzygy_tpu.utils import read_png

GOLDEN = os.path.join(
    os.path.dirname(__file__), "goldens", "default_scene_256x128.png"
)


def golden_scene_setup():
    W, H = 256, 128
    scene, lib = default_scene()
    scene.sun_animation.time = 0.35
    scene.sun_animation.frozen = True
    scene.tick(0.0)
    eye = np.array([18.0, -16.0, -22.0], np.float32)
    target = np.array([0.0, -6.0, 0.0], np.float32)
    scene.camera.position = tuple(eye)
    scene.camera.euler_angles = tuple(
        np.asarray(eulers_from_forward(target - eye))
    )
    config = RenderConfig(
        width=W, height=H, shadow_dim=256, skyview_width=128, skyview_height=64
    )
    return scene, lib, config


def test_default_scene_matches_golden():
    scene, lib, config = golden_scene_setup()
    geo = pack_geometry(scene, lib)
    img = np.asarray(
        render_frame(geo, pack_frame_params(scene, config.width / config.height), config)
    )
    golden = read_png(GOLDEN)[..., :3].astype(np.float32) / 255.0
    rmse = float(np.sqrt(np.mean((img - golden) ** 2)))
    assert rmse < 5e-3, f"frame deviates from golden: RMSE {rmse:.5f}"
