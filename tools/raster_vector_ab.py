"""Device BABA A/B: raster_vector (branch-free unrolled plane evals + a
depth select tree, kernels/raster.py::_chunk_loop_vector) on the dense
254k-tri scene + the default scene.

Motivation (tools/raster_occupancy_probe.py, r8): the serial chunk loop
costs 13.1 us per chunk ITERATION (~205 ns/step scalar bbox scan) plus
174 ns per full-tile vector eval; full unroll recovered only ~3 ms on
dense because the per-step branch + depth read-modify-write chain still
serialize. The vector formulation evals EVERY chunk triangle against the
tile (iterations x 64 evals — camera 237k, sun 150k on dense) but the
evals are independent, so if they sustain the measured 174 ns rate the
dense rasters bound at ~41 + ~26 ms vs the serial 65 + 53 ms. If the
always-eval cost swamps the saved scalar loop (plausible on the DEFAULT
scene where occupancy is low), this is a documented negative result.

Equivalence: tri/depth exact away from knife-edge z ties, barycentrics
within fma-contraction noise <= ~8e-6
(tests/test_raster.py::test_vector_chunk_equivalence).
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
    on = dataclasses.replace(base, raster_vector=True)

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
    run("dense  vector=0 (A)", _dense, base)
    run("dense  vector=1 (B)", _dense, on)
    run("dense  vector=0 (A)", _dense, base)
    run("dense  vector=1 (B)", _dense, on)
    # default scene: rasters are small there; sanity that always-eval
    # doesn't hurt (low occupancy means many wasted evals)
    run("default vector=0", _flagship_scene, base)
    run("default vector=1", _flagship_scene, on)


if __name__ == "__main__":
    main()
