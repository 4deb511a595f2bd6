"""A/B f16 sampling copies of the transmittance quad + froxel volume.

pcf_f16 proved the in-frame gather cost bytes-bound; this measures the
same narrowing on the remaining f32 per-pixel tables (RenderConfig.
lut_f16): the env branch's transmittance gather (~7.5 ms in-frame) and
the geometry branch's 72ch froxel gather (~8 ms). LUT builds keep f32
inputs; quality pinned by tests/test_sky.py::test_lut_f16_frame_close.

B/A/B/A on the bench default scene. Usage: python tools/lut2_f16_ab.py
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
        config = dataclasses.replace(base, lut_f16=f16)
        scene, library = _flagship_scene()
        ms = _measure_scene(scene, library, config, frames=16)
        print(f"lut_f16={f16}: {ms:.1f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
