"""A/B the skyview-tseg optimization on device, one session.

Measures the full bench frame (default scene, fused lighting+sky, 1080p)
with RenderConfig.skyview_tseg False vs True using bench.py's honest
chained-group method, so the delta is the env branch's 2 per-pixel
transmittance-segment gathers riding the skyview LUT instead
(kernels/sky.py::compute_skyview_tseg).

Usage: python tools/tseg_ab.py
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _flagship_scene, _measure_scene, _wait_healthy  # noqa: E402


def main():
    if not _wait_healthy():
        print("device unavailable")
        return
    from syzygy_tpu.renderer import RenderConfig

    base = RenderConfig(
        width=1920, height=1080, n_shadow_maps=4, fuse_lighting_sky=True
    )
    for tseg in (False, True):
        config = dataclasses.replace(base, skyview_tseg=tseg)
        scene, library = _flagship_scene()
        ms = _measure_scene(scene, library, config, frames=16)
        print(f"skyview_tseg={tseg}: {ms:.1f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
