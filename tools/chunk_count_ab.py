"""Device A/B: sky row-chunk COUNT under the fully-chunked merged program.

With resolve+lighting+sky all riding the row chunks (r6), the chunk
count is a scheduling knob: auto picks 4 (272 rows) at 1080p — more,
smaller chunks could improve VMEM locality of the per-chunk gather
tables, or just add loop overhead. 1088 = 2^6 * 17, so 4/8/16 divide.

Usage: python tools/chunk_count_ab.py
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
        width=1920, height=1080, n_shadow_maps=4, fuse_lighting_sky=True,
        fuse_lighting_sky_chunks=True, resolve_in_sky_chunks=True,
    )
    for n in (4, 8, 16, 4):  # trailing 4 re-checks drift
        config = dataclasses.replace(base, sky_row_chunks=n)
        scene, library = _flagship_scene()
        ms = _measure_scene(scene, library, config, frames=16)
        print(f"default chunks={n}: {ms:.1f} ms/frame", flush=True)
    for n in (4, 8):
        config = dataclasses.replace(base, sky_row_chunks=n)
        scene, library = _dense()
        ms = _measure_scene(scene, library, config, frames=8)
        print(f"dense chunks={n}: {ms:.1f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
