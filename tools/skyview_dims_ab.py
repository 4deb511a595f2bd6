"""Device A/B: skyview LUT dims below the reference 2048x1024.

Quality pinned by tools/skyview_dims_probe.py (CPU, 960x540 frame):
1536x768 / 1024x512 / 768x384 all land at frame RMSE ~2.5e-4, max <4e-3 —
far inside the 1e-3 RMSE parity budget — because the skyview field is
smooth and its nonlinear elevation mapping concentrates rows at the
horizon. Shrinking the LUT quarters the touched working set of the
frame's one remaining big-tier gather (2M rows -> 524k/295k), which the
r4/r5 tier model says is the cost driver (storage narrowing alone — q8 —
won only ~2.5 ms).

BABA on the bench default scene + config. Usage:
python tools/skyview_dims_ab.py
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
    for dims in ((1024, 512), (2048, 1024), (768, 384), (2048, 1024), (1024, 512)):
        config = dataclasses.replace(
            base, skyview_width=dims[0], skyview_height=dims[1]
        )
        scene, library = _flagship_scene()
        ms = _measure_scene(scene, library, config, frames=16)
        print(f"skyview {dims}: {ms:.1f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
