"""A/B f16 PCF segment-table storage on device, one session.

Measures the full bench frame (default scene, fused, 1080p) with
RenderConfig.pcf_f16 False (f32 segment rows) vs True (f16 rows through
the 5 row gathers AND the select trees — half the bytes in both). The
frame has 3 PCF evaluations (sun in the sky pass, moon + spot in
lighting), each 5 row gathers on the (size*n_w, 16) table, so if the
in-frame gather cost is bytes-bound this should show ~linear savings;
if it is row-count/latency-bound, nothing.

Quality is NOT at stake here (pinned on CPU by
tests/test_lighting.py::test_pcf_f16_{close,frame_close}); this measures
speed only. Runs B/A/B/A to separate variant effect from session drift.

Usage: python tools/pcf_f16_ab.py
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
    for f16 in (True, False, True, False):
        config = dataclasses.replace(base, pcf_f16=f16)
        scene, library = _flagship_scene()
        ms = _measure_scene(scene, library, config, frames=16)
        print(f"pcf_f16={f16}: {ms:.1f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
