"""Interactive-viewer frame-rate probe: f32 vs on-device-u8 presentation.

Drives app.serve._State's render path directly (no HTTP) at the r9 viewer
shape (512x256, default scene, app-default config) and times the
steady-state interactive frame both ways IN ONE SESSION:

  A) old path: fetch the f32 frame, quantize on host, PNG-encode
  B) new path: quantize to u8 on device (runtime.fetch_frame_u8), fetch
     1 byte/channel, PNG-encode

Each leg marks the scene dirty via handle_input (a one-key camera nudge),
so every iteration re-renders exactly like a browser drag does. The first
frame of each leg (compile + executable upload) is reported separately.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from tools.tpu_session import wait_healthy

    if not wait_healthy():
        print("device unhealthy; aborting")
        return

    from syzygy_tpu.app.serve import _State, _png_bytes
    from syzygy_tpu.renderer import RenderConfig
    from syzygy_tpu.scene import default_scene

    scene, library = default_scene()
    scene.tick(0.0)
    config = RenderConfig(width=512, height=256, shadow_dim=1024)

    state = _State(scene, library, config)

    def leg(name, use_u8, n=30):
        from syzygy_tpu.renderer import render_frame_packed
        from syzygy_tpu.runtime import fetch_frame_u8
        from syzygy_tpu.scene import (
            flatten_frame_params,
            frame_param_spec,
            pack_frame_params,
        )

        times = []
        first = None
        for i in range(n):
            state.handle_input("w" if i % 2 else "s", (0.0, 0.0), 1 / 60)
            with state.lock:
                params = pack_frame_params(state.scene, state.aspect)
                spec = frame_param_spec(params)
                flat = flatten_frame_params(
                    params, spec, np.empty(spec.total, np.float32)
                )
                t0 = time.perf_counter()
                out = render_frame_packed(
                    state.geometry, flat, spec, state.config
                )
                if use_u8:
                    image = fetch_frame_u8(out)
                else:
                    image = np.asarray(out)
                png = _png_bytes(image)
                dt = (time.perf_counter() - t0) * 1e3
            if i == 0:
                first = dt
            else:
                times.append(dt)
        mean = float(np.mean(times))
        print(
            f"{name}: first {first:.0f} ms; steady {mean:.1f} ms/frame "
            f"({1e3 / mean:.1f} FPS), min {min(times):.1f}, "
            f"png {len(png)} B",
            flush=True,
        )
        return mean

    def leg_pipelined(name, n=30):
        """The actually-served path: _State.render_png with 2-frames-in-
        flight double buffering (request-to-request time; frames lag input
        by one)."""
        st = _State(scene, library, config, pipeline=True)
        st.geometry = state.geometry  # share the uploaded tables
        times = []
        first = None
        for i in range(n):
            st.handle_input("w" if i % 2 else "s", (0.0, 0.0), 1 / 60)
            t0 = time.perf_counter()
            png = st.render_png()
            dt = (time.perf_counter() - t0) * 1e3
            if i == 0:
                first = dt
            else:
                times.append(dt)
        mean = float(np.mean(times))
        print(
            f"{name}: first {first:.0f} ms; steady {mean:.1f} ms/frame "
            f"({1e3 / mean:.1f} FPS), min {min(times):.1f}, "
            f"png {len(png)} B",
            flush=True,
        )
        return mean

    # BABA order so session drift cannot masquerade as the effect
    a1 = leg("A f32-fetch", False)
    b1 = leg("B u8-fetch ", True)
    c1 = leg_pipelined("C pipelined")
    c2 = leg_pipelined("C pipelined")
    b2 = leg("B u8-fetch ", True)
    a2 = leg("A f32-fetch", False)
    print(
        f"mean A {np.mean([a1, a2]):.1f} ms vs B {np.mean([b1, b2]):.1f} ms"
        f" vs C {np.mean([c1, c2]):.1f} ms"
    )


if __name__ == "__main__":
    main()
