"""Interactive drag-rate A/B: progressive preview on vs off (real TPU).

Simulates a browser drag at the r9 viewer shape (512x256, app-default
config, pipeline on): every iteration nudges the camera (handle_input)
and requests a frame, exactly like the page's input loop. Legs run BABA
in one session. Drains the pipeline before exit (landmine: a process
that dies with a frame in flight wedges the worker).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def drag_leg(state, n=30):
    # warm: first frames compile both configs
    state.handle_input("w", (0.0, 0.0), 0.02)
    state.render_png()
    state.handle_input("w", (0.0, 0.0), 0.02)
    state.render_png()
    t0 = time.perf_counter()
    for _ in range(n):
        state.handle_input("w", (1.0, 0.0), 0.02)
        state.render_png()
    dt = (time.perf_counter() - t0) / n * 1e3
    # drain (also lets the refinement land; never exit with in-flight work)
    for _ in range(8):
        if not state.stats()["pending"]:
            break
        state.render_png()
    return dt


def main():
    from tools.tpu_session import wait_healthy

    if not wait_healthy():
        print(json.dumps({"error": "device unhealthy"}))
        return

    from syzygy_tpu.app.serve import _State
    from syzygy_tpu.renderer import RenderConfig
    from syzygy_tpu.scene import default_scene

    legs = []
    states = {}
    for scale in (2, 1, 2, 1):  # BABA
        if scale not in states:
            scene, library = default_scene()
            scene.tick(0.0)
            states[scale] = _State(
                scene, library, RenderConfig(width=512, height=256),
                pipeline=True, preview_scale=scale,
            )
        ms = drag_leg(states[scale])
        legs.append({"preview_scale": scale, "drag_ms_per_frame": round(ms, 1)})
        print(legs[-1], flush=True)
    print(json.dumps({"legs": legs}))


if __name__ == "__main__":
    main()
