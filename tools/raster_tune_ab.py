"""Device A/B: raster work granularity on the dense field.

The dense scene's remaining geometry-program lines are the camera
raster (65 ms) and the sun shadow raster (~53 ms post-moon-skip)
(tools/geom_budget_probe.py). Smaller coefficient chunks cull wasted
per-tile triangle evaluations at the cost of more list entries; smaller
tiles waste fewer lanes on partially-covered tiles. The knobs are now
threaded end-to-end (setup_triangles + _dispatch_raster share dims).

tile_w stays 128 (the VPU lane width; narrower tiles under-fill lanes).
Usage: python tools/raster_tune_ab.py
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
    combos = [
        (64, 64),   # baseline (tile_h, chunk)
        (64, 32),
        (32, 64),
        (32, 32),
        (64, 128),
        (64, 64),   # baseline re-check (drift guard)
    ]
    for tile_h, chunk in combos:
        config = dataclasses.replace(
            base, raster_tile_h=tile_h, raster_chunk=chunk
        )
        scene, library = _dense()
        ms = _measure_scene(scene, library, config, frames=8)
        print(
            f"dense tile_h={tile_h} chunk={chunk}: {ms:.1f} ms/frame",
            flush=True,
        )
    # default scene sanity: the knobs shouldn't hurt the 26-tri scene
    for tile_h, chunk in [(64, 64), (32, 32)]:
        config = dataclasses.replace(
            base, raster_tile_h=tile_h, raster_chunk=chunk
        )
        scene, library = _flagship_scene()
        ms = _measure_scene(scene, library, config, frames=16)
        print(
            f"default tile_h={tile_h} chunk={chunk}: {ms:.1f} ms/frame",
            flush=True,
        )


if __name__ == "__main__":
    main()
