"""A/B the PCF tap-extraction variants on device, one session.

Measures the full bench frame (default scene, fused, 1080p) with
RenderConfig.pcf_bitmask False (per-tap 4-level binary select tree) vs True
(per-row compare bitmask + variable-shift extraction) — bitwise-identical
math (tests/test_lighting.py::test_pcf_bitmask_matches_select_tree), so the
delta is pure arithmetic cost. The frame has 3 PCF evaluations (sun in the
sky pass, moon + spot in lighting).

Runs B/A/B/A to separate the variant effect from in-session drift.

Usage: python tools/pcf_ab.py
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
    for bm in (True, False, True, False):
        config = dataclasses.replace(base, pcf_bitmask=bm)
        scene, library = _flagship_scene()
        ms = _measure_scene(scene, library, config, frames=16)
        print(f"pcf_bitmask={bm}: {ms:.1f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
