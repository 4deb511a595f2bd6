"""Complete the sp=1 anchors for the multi-chip model: dense + chess.

r5b's dense sp=1 number (3531 ms) was the frame-batch-vmap pathology,
since fixed (_map_frames); r5c re-measured only the default scene. This
session measures the PRODUCTION split sharded path at (dp=1, sp=1) vs the
staged single-chip path on the dense 254k-tri field and the chess
flagship — the two scenes whose model rows were estimates.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    from bench import _wait_healthy
    from r5b_session import _dense_scene, probe_scene

    assert _wait_healthy(), "device unavailable"
    results = {"session": time.strftime("%Y-%m-%d %H:%M")}

    try:
        dense, dlib = _dense_scene()
        probe_scene(dense, dlib, "dense_1080p", results)
    except Exception as e:
        results["dense_1080p"] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
        _wait_healthy()
    try:
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
        probe_scene(chess, chess_lib, "chess_1080p", results)
    except Exception as e:
        results["chess_1080p"] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}

    with open("/tmp/r5d_session.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
