"""Viewer time-to-first-frame with the persistent compile cache (r11).

Runs _State.render_png once at the app-default viewer shape (512x256,
full skyview/shadow dims) and reports wall time to the first PNG plus
whether the persistent cache had the programs. Run it twice in a row:
run 1 may be cold (populates ~/.cache/syzygy_tpu/xla), run 2 measures the
cross-session warm start a user actually experiences.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    t_import = time.perf_counter()
    from tools.tpu_session import wait_healthy

    if not wait_healthy():
        print(json.dumps({"error": "device unhealthy"}))
        return

    import jax

    from syzygy_tpu.app.serve import _State
    from syzygy_tpu.renderer import RenderConfig
    from syzygy_tpu.scene import default_scene

    cache_dir = jax.config.jax_compilation_cache_dir
    entries = 0
    if cache_dir and os.path.isdir(cache_dir):
        entries = len(os.listdir(cache_dir))

    scene, library = default_scene()
    scene.tick(0.0)
    state = _State(
        scene, library, RenderConfig(width=512, height=256), pipeline=True
    )
    t_setup_done = time.perf_counter()
    png = state.render_png()
    first_s = time.perf_counter() - t_setup_done

    # steady frame (dirty via a camera nudge, like a browser drag).
    # NOTE: with pipeline=True the dirty request returns the PREVIOUS
    # frame after dispatch only — time the full dispatch+drain pair.
    state.handle_input("w", (0.0, 0.0), 0.05)
    t0 = time.perf_counter()
    state.render_png()  # dispatch, returns stale frame
    state.render_png()  # drain: fetches the in-flight frame
    steady_s = time.perf_counter() - t0

    # CRITICAL: never exit with a pipelined frame in flight — a process
    # that dies mid-RPC wedges the remote worker for 5-20 min (landmine
    # 5; the first version of this probe did exactly that and its second
    # run measured a garbage 1239 s "first frame" against the wedge).
    while state.stats()["pending"]:
        state.render_png()

    print(json.dumps({
        "cache_dir": cache_dir,
        "cache_entries_before": entries,
        "setup_s": round(t_setup_done - t_import, 1),
        "first_frame_s": round(first_s, 1),
        "steady_frame_ms": round(steady_s * 1e3, 1),
        "png_bytes": len(png),
    }))


if __name__ == "__main__":
    main()
