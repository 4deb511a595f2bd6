"""A/B the one-gather 2D-window PCF on device, one session.

Measures the full bench frame (default scene, bench config, 1080p) with
RenderConfig.pcf_window2d False (five 16-channel per-tap-row gathers on
the 1D segment table) vs True (ONE 128-channel gather on the 8x16
2D-window table + a 3-level row select tree). Taps are bitwise-identical
(tests/test_lighting.py::test_pcf_window2d_bitwise); this measures speed
only.

The bet: the q8 negative result showed post-f16 PCF gathers are
SAMPLE-COUNT-bound (saving 12 B/row bought nothing), so cutting
5 samples/px to 1 should pay ~4x the per-sample rate, against +96
fetched B/px (at the pcf_f16-fitted ~0.06 ms/B that is ~6 ms) and a 4x
side table (17 MB f16 at 1024^2). Runs B/A/B/A to separate variant
effect from session drift.

Usage: python tools/pcf_window2d_ab.py
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

    base = RenderConfig(width=1920, height=1080, n_shadow_maps=4)
    for w2d in (True, False, True, False):
        config = dataclasses.replace(base, pcf_window2d=w2d)
        scene, library = _flagship_scene()
        ms = _measure_scene(scene, library, config, frames=16)
        print(f"pcf_window2d={w2d}: {ms:.1f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
