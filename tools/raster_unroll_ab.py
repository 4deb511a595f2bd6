"""Device BABA A/B: raster_unroll (full fori unroll of the per-chunk
triangle loop) on the dense 254k-tri scene + the default scene.

Motivation (tools/raster_occupancy_probe.py, r4): the two-raster fit puts
the listed raster's serial step at ~205 ns against ~30 ns of visible
scalar work; the dense camera raster spends ~48 of its 65 ms there. Full
unroll is the only Mosaic-supported variant (landmine 8) and is bitwise
(CPU-checked). If Mosaic schedules the unrolled scalar loads/branches
across steps, dense should drop materially; if the 205 ns is DMA-bound or
branch-flush-bound, this is a documented negative result.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses  # noqa: E402

from bench import _flagship_scene, _measure_scene, _wait_healthy  # noqa: E402
from syzygy_tpu.renderer import RenderConfig  # noqa: E402
from tools.dense_depth_probe import _dense  # noqa: E402


def main():
    if not _wait_healthy():
        print("device unavailable", flush=True)
        return
    base = RenderConfig(width=1920, height=1080, n_shadow_maps=4)
    on = dataclasses.replace(base, raster_unroll=True)

    def run(tag, mk_scene, config, frames=32):
        scene, lib = mk_scene()
        t0 = time.perf_counter()
        ms = _measure_scene(scene, lib, config, frames=frames, group=frames)
        print(
            f"{tag}: {ms:8.2f} ms/frame (wall {time.perf_counter() - t0:.0f}s)",
            flush=True,
        )
        return ms

    # BABA on dense (the raster-dominated scene)
    run("dense  unroll=0 (A)", _dense, base)
    run("dense  unroll=1 (B)", _dense, on)
    run("dense  unroll=0 (A)", _dense, base)
    run("dense  unroll=1 (B)", _dense, on)
    # default scene: raster is small there; sanity that unroll doesn't hurt
    run("default unroll=0", _flagship_scene, base)
    run("default unroll=1", _flagship_scene, on)


if __name__ == "__main__":
    main()
