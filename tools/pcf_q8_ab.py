"""Device A/B: u8 block-scaled PCF segment tables (pcf_q8) vs pcf_f16.

The PCF row gathers are 15 of the frame's ~21 gathers/px and measured
bytes-bound (pcf_f16's 64 -> 32 B/row won -29 ms). q8 packs each 16-tap
segment into 5 uint32 words (u8 taps vs the segment's own [min,max]
range + an f16 min/step pair) = 20 B/row; byte extraction is all
constant shifts + select levels (no per-lane variable shift). Quality
pinned by tests/test_lighting.py::test_pcf_q8_{close,frame_close}.

BABA on the bench default scene + config. Usage: python tools/pcf_q8_ab.py
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
        config = dataclasses.replace(base, pcf_q8=q8)
        scene, library = _flagship_scene()
        ms = _measure_scene(scene, library, config, frames=16)
        print(f"pcf_q8={q8}: {ms:.1f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
