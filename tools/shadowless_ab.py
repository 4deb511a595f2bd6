"""Device A/B: dim-directional shadow skip (shadowless_strength_eps).

The midday moon (reference clamp quirk, scene.cpp:603-610) pays a full
5x5 PCF evaluation (~45 ms/frame at 1080p — the frame's biggest single
line) + a depth raster for a <=2% contribution. eps=0.025 lights it
unshadowed and skips both. Quality pinned by tests/test_lighting.py::
test_shadowless_eps_frame_close + tools/shadowless_probe.py.

BABA on the bench default scene, then the dense stress field once (its
lighting stage is moon-only, so it should collapse). Usage:
python tools/shadowless_ab.py
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _flagship_scene, _measure_scene, _wait_healthy  # noqa: E402
from dense_depth_probe import _dense  # noqa: E402


def main():
    if not _wait_healthy():
        print("device unavailable")
        return
    from syzygy_tpu.renderer import RenderConfig

    base = RenderConfig(
        width=1920, height=1080, n_shadow_maps=4, fuse_lighting_sky=True
    )
    for eps in (0.025, 0.0, 0.025, 0.0):
        config = dataclasses.replace(base, shadowless_strength_eps=eps)
        scene, library = _flagship_scene()
        ms = _measure_scene(scene, library, config, frames=16)
        print(f"default eps={eps}: {ms:.1f} ms/frame", flush=True)
    for eps in (0.025, 0.0):
        config = dataclasses.replace(base, shadowless_strength_eps=eps)
        scene, library = _dense()
        ms = _measure_scene(scene, library, config, frames=8)
        print(f"dense eps={eps}: {ms:.1f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
