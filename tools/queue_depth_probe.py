"""Queue-depth device probe (r5 ladder continuation; VERDICT r3 ask #2).

r5 measured 8/12/16 = 215.4/209.5/206.2 ms/frame — still improving at 16.
The r8 session extended the ladder to 20/24/32 (129.2 at 32, adopted by
bench.py); this extends to 40/48 under the raster_vector defaults. 50 in
flight is known pathological (worker wedge, ~41.5 s/frame from HBM
exhaustion); ordering is safest-first so a deep-depth wedge still leaves
the shallow numbers on stdout. Also takes a chess flagship leg at the
current bench depth (raster_vector's first chess number).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from syzygy_tpu.renderer import RenderConfig  # noqa: E402


def main():
    if not bench._wait_healthy():
        print("device unavailable", flush=True)
        return
    config = RenderConfig(
        width=1920,
        height=1080,
        n_shadow_maps=4,
        fuse_lighting_sky=True,
        fuse_lighting_sky_chunks=True,
        resolve_in_sky_chunks=True,
        sky_row_chunks=16,
    )
    for group in (32, 40, 48):
        scene, library = bench._flagship_scene()
        t0 = time.perf_counter()
        ms = bench._measure_scene(
            scene, library, config, frames=2 * group, group=group
        )
        print(
            f"depth {group}: {ms:8.2f} ms/frame "
            f"(wall {time.perf_counter() - t0:.0f}s)",
            flush=True,
        )
    # chess at the bench depth: raster_vector's first chess measurement
    import numpy as np
    from syzygy_tpu.assets.chess import flagship_scene
    from syzygy_tpu.math.geometry import eulers_from_forward

    scene, library = flagship_scene()
    scene.tick(0.0)
    eye = np.array([13.0, -8.0, -14.0], np.float32)
    target = np.array([0.0, -1.0, 0.0], np.float32)
    scene.camera.position = tuple(eye)
    scene.camera.euler_angles = tuple(
        np.asarray(eulers_from_forward(target - eye))
    )
    t0 = time.perf_counter()
    ms = bench._measure_scene(scene, library, config, frames=32, group=32)
    print(
        f"chess depth 32: {ms:8.2f} ms/frame "
        f"(wall {time.perf_counter() - t0:.0f}s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
