"""Queue-depth device probe (r5 ladder continuation; VERDICT r3 ask #2).

r5 measured 8/12/16 = 215.4/209.5/206.2 ms/frame — still improving at 16.
This session extends the ladder to 20/24/32 under the CURRENT bench config
(fused chunks + resolve-in-chunks + 16 row chunks) so the finding transfers
to bench.py directly. 50 in flight is known pathological (worker wedge,
~41.5 s/frame from HBM exhaustion); ordering is safest-first so a deep-depth
wedge still leaves the shallow numbers on stdout.
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
    for group in (16, 20, 24, 32):
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


if __name__ == "__main__":
    main()
