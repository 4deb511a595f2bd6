"""A/B the u8 block-scaled skyview quad vs the f16 quad, one session.

The skyview quad is the frame's one remaining bytes-bound big-tier
table (2M rows; a sky-filling camera touches ~half). f32 -> f16 storage
measured -29 ms (r4); q8 block-scaling cuts rows 24 -> 16 bytes with a
shift-by-constant decode (per-lane constant shifts are fine; the PCF
bitmask disaster was VARIABLE shifts). Quality pinned on CPU
(tests/test_sky.py::test_skyview_q8_frame_close, frame RMSE < 5e-4).

B/A/B/A on the bench default scene. Usage: python tools/skyview_q8_ab.py
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
    for q8 in (True, False, True, False):
        config = dataclasses.replace(base, skyview_q8=q8)
        scene, library = _flagship_scene()
        ms = _measure_scene(scene, library, config, frames=16)
        print(f"skyview_q8={q8}: {ms:.1f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
