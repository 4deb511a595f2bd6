"""Device A/B: coefficient chunk size UNDER raster_vector on the dense
field.

The serial-loop sweep (tools/raster_tune_ab.py, r6) found chunk size a
dead end — the ~205 ns/step scalar cost doesn't care how triangles are
grouped. The vector formulation changes the regime: every triangle in a
touched chunk is evaluated against the full tile, so wasted evals scale
with (1 - occupancy), and occupancy rises as chunks shrink (the 64-tri
union bbox is looser than four 16-tri bboxes — dense camera occupancy
is 0.40 at chunk=64, tools/raster_occupancy_probe.py). Cost of finer
chunks: 4x chunk-mask rows, 4x listed-table slots (tile_list_capacity
scaled to keep the no-overflow guarantee), shallower select trees.

tile_h stays 64 (tile_h=32 is a measured catastrophe, r6).
Usage: python tools/raster_vector_chunk_ab.py
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _flagship_scene, _measure_scene, _wait_healthy  # noqa: E402
from syzygy_tpu.renderer import RenderConfig  # noqa: E402
from tools.dense_depth_probe import _dense  # noqa: E402


def main():
    if not _wait_healthy():
        print("device unavailable")
        return
    base = RenderConfig(
        width=1920, height=1080, n_shadow_maps=4, raster_vector=True
    )
    combos = [
        (64, 448),   # baseline chunk (chunk, tile_list_capacity)
        (32, 896),
        (16, 1792),
        (64, 448),   # baseline re-check (drift guard)
    ]
    for chunk, cap in combos:
        config = dataclasses.replace(
            base, raster_chunk=chunk, tile_list_capacity=cap
        )
        scene, library = _dense()
        ms = _measure_scene(scene, library, config, frames=16, group=16)
        print(
            f"dense vector chunk={chunk} cap={cap}: {ms:.1f} ms/frame",
            flush=True,
        )
    # default scene sanity at the dense winner's shape
    for chunk, cap in [(64, 448), (16, 1792)]:
        config = dataclasses.replace(
            base, raster_chunk=chunk, tile_list_capacity=cap
        )
        scene, library = _flagship_scene()
        ms = _measure_scene(scene, library, config, frames=16, group=16)
        print(
            f"default vector chunk={chunk} cap={cap}: {ms:.1f} ms/frame",
            flush=True,
        )


if __name__ == "__main__":
    main()
