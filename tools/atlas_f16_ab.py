"""A/B f16 atlas storage on the textured chess flagship, one session.

The chess scene's quad-packed atlas is ~852k rows x 16ch f32 (54 MB); the
resolve issues 3 atlas gathers/px (mixed-dimension materials keep the
3-gather path). r4's gather-tier model says big-table gathers are
bytes-bound, and the frame-level cost of this atlas was measured at
~33 ms over the tiny-atlas default scene — if that cost is bytes-bound
in the touched working set, f16 should return roughly half of it.

Quality is pinned on CPU (tests/test_resolve.py::test_atlas_f16_frame
_close — f16 rounding sits below the source textures' 8-bit
quantization); this measures speed only. B/A/B/A ordering vs drift.

Usage: python tools/atlas_f16_ab.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _measure_scene, _wait_healthy  # noqa: E402


def _chess():
    from syzygy_tpu.assets.chess import flagship_scene
    from syzygy_tpu.math.geometry import eulers_from_forward

    chess, chess_lib = flagship_scene()
    chess.tick(0.0)
    eye = np.array([13.0, -8.0, -14.0], np.float32)
    target = np.array([0.0, -1.0, 0.0], np.float32)
    chess.camera.position = tuple(eye)
    chess.camera.euler_angles = tuple(
        np.asarray(eulers_from_forward(target - eye))
    )
    return chess, chess_lib


def main():
    if not _wait_healthy():
        print("device unavailable")
        return
    from syzygy_tpu.renderer import RenderConfig

    config = RenderConfig(
        width=1920, height=1080, n_shadow_maps=4, fuse_lighting_sky=True
    )
    for f16 in (True, False, True, False):
        scene, library = _chess()
        ms = _measure_scene(
            scene,
            library,
            config,
            frames=16,
            pack_kwargs={"atlas_f16": f16},
        )
        print(f"atlas_f16={f16}: {ms:.1f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
