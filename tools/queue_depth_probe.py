"""Queue-depth + joint-atlas device probe (r3 continuation).

One health-gated session answering two questions:
1. What does the default 1080p frame cost with the joint material atlas
   (expected ~2 fewer gathers/px vs the 282 ms r3 number)?
2. Does deepening the bench's chained-group depth from 4 to 6/8 cut the
   amortized forcing RTT without wedging the worker (50 in flight is known
   pathological; 4 is the proven-safe bound)?

Ordering is deliberate: depth 4 first so a depth-8 wedge still leaves the
safe numbers on stdout.
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
        width=1920, height=1080, n_shadow_maps=4, fuse_lighting_sky=True
    )
    for group in (8, 12, 16):
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
