"""Device BABA A/B: mixed-dim neighborhood joint atlas on the chess
flagship (VERDICT r3 #4).

Chess pays 3 atlas gathers/px (512/256/128 board + 256/256/64 pieces
defeat the equal-dims 48ch joint atlas); joint_pack_mixed=True replaces
them with ONE 108ch gather + per-role 2x2-of-3x3 selects — bitwise
(tests/test_resolve.py::test_sample_atlas_rect_joint_nbhd_bitwise).
Uncertainty this measures: the 108ch row is 216 B f16 (vs 3x32 B), and
the chess-scale joint atlas (~90 MB) sits in the bytes-sensitive big
gather tier, while the select tree adds ~16 4ch-wide selects/px.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from bench import _measure_scene, _wait_healthy  # noqa: E402
from syzygy_tpu.renderer import RenderConfig  # noqa: E402


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
        print("device unavailable", flush=True)
        return
    config = RenderConfig(width=1920, height=1080, n_shadow_maps=4)

    def run(tag, mixed, frames=32):
        scene, lib = _chess()
        t0 = time.perf_counter()
        ms = _measure_scene(
            scene, lib, config, frames=frames, group=frames,
            pack_kwargs={"joint_pack_mixed": mixed},
        )
        print(
            f"chess joint_pack_mixed={int(mixed)} ({tag}): {ms:8.2f} ms/frame"
            f" (wall {time.perf_counter() - t0:.0f}s)",
            flush=True,
        )
        return ms

    run("A", False)
    run("B", True)
    run("A", False)
    run("B", True)


if __name__ == "__main__":
    main()
