"""Decompose the per-frame dispatch/sync overhead through the TPU tunnel.

r2 found a ~160-200 ms gap between the honest stage sum (~330 ms) and
bench's end-to-end number (~490-527 ms) and attributed it to per-program
dispatch — never decomposed. This measures, in ONE health-gated session:

  D1 empty-program dispatch cost: a chain of n trivial jitted programs,
     forced once at the end (per-program enqueue+dispatch latency).
  D2 3-program frame (geometry | lighting | sky), chained scalar, depth 1.
  D3 2-program frame (geometry | lighting+sky fused), chained scalar.
  D4 3-program frame at queue depth 2 and 4 (frames in flight before the
     forcing fetch — the measured-safe bound is <= 4, CLAUDE.md item 7).
  Also prints wall-clock compile+upload time for the fused program (the
  platform compiles big programs pathologically slowly; landmine 9).

Usage: python tools/dispatch_probe.py [n_frames]
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tpu_session import wait_healthy  # noqa: E402


def main():
    import jax

    smoke = os.environ.get("SZG_BUDGET_CPU") == "1"
    if smoke:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from syzygy_tpu.math.geometry import eulers_from_forward
    from syzygy_tpu.renderer import RenderConfig
    from syzygy_tpu.renderer.frame import (
        _stage_geometry,
        _stage_lighting,
        _stage_lighting_sky,
        _stage_sky,
    )
    from syzygy_tpu.runtime import place_on_accelerator
    from syzygy_tpu.scene import default_scene, pack_frame_params, pack_geometry

    if not smoke and not wait_healthy():
        print("DEVICE UNAVAILABLE", flush=True)
        sys.exit(1)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    W, H = (256, 128) if smoke else (1920, 1080)
    cfg = RenderConfig(
        width=W,
        height=H,
        **(
            dict(shadow_dim=128, skyview_width=128, skyview_height=64)
            if smoke
            else {}
        ),
    )
    cfg_fused = dataclasses.replace(cfg, fuse_lighting_sky=True)

    scene, lib = default_scene()
    scene.sun_animation.time = 0.35
    scene.tick(0.0)
    eye = np.array([18.0, -16.0, -22.0], np.float32)
    target = np.array([0.0, -6.0, 0.0], np.float32)
    scene.camera.position = tuple(eye)
    scene.camera.euler_angles = tuple(
        np.asarray(eulers_from_forward(target - eye))
    )
    geo = place_on_accelerator(pack_geometry(scene, lib))
    params = pack_frame_params(scene, W / H)

    def fetch(x):
        return float(np.asarray(jax.device_get(x)).reshape(-1)[0])

    small = jax.jit(lambda x: x + 1)(jnp.zeros((1,)))
    jax.block_until_ready(small)
    t0 = time.perf_counter()
    fetch(small)
    fetch_s = time.perf_counter() - t0
    print(f"fetch latency ~{fetch_s * 1000:.0f} ms", flush=True)

    # D1: per-program dispatch cost of trivial programs
    @jax.jit
    def tiny(x):
        return x * 1.0000001 + 1e-30

    prev = jnp.zeros((), jnp.float32)
    prev = tiny(prev)
    fetch(prev)
    for depth in (10, 100):
        t0 = time.perf_counter()
        for _ in range(depth):
            prev = tiny(prev)
        fetch(prev)
        dt = (time.perf_counter() - t0 - fetch_s) / depth * 1000
        print(f"D1 trivial-program dispatch x{depth}: {dt:7.3f} ms/prog", flush=True)

    def frame3(params, eps):
        p2 = params._replace(
            cam_position=np.asarray(params.cam_position, np.float32)
        )
        state, vis, gb, smaps = _stage_geometry(geo, p2, cfg)
        lit = _stage_lighting(state, gb, smaps)
        img = _stage_sky(state, lit, vis.depth, gb, smaps, cfg)
        return img[0, 0, 0] * 1e-30 + eps * 0.0

    def frame2(params, eps):
        state, vis, gb, smaps = _stage_geometry(geo, params, cfg_fused)
        img = _stage_lighting_sky(state, vis.depth, gb, smaps, cfg_fused)
        return img[0, 0, 0] * 1e-30 + eps * 0.0

    def timed_frames(name, fn, depth=1):
        prev = jnp.zeros((), jnp.float32)
        t_c = time.perf_counter()
        prev = fn(params, prev)
        fetch(prev)
        compile_s = time.perf_counter() - t_c
        prev = fn(params, prev)
        fetch(prev)  # warm pass, forced
        t0 = time.perf_counter()
        done = 0
        while done < n:
            for _ in range(depth):
                prev = fn(params, prev)
            done += depth
            fetch(prev)
        dt = (time.perf_counter() - t0 - fetch_s * (done // depth)) / done * 1000
        print(
            f"{name} (queue depth {depth}): {dt:8.2f} ms/frame "
            f"(first-call compile+upload {compile_s:.1f} s)",
            flush=True,
        )
        return dt

    timed_frames("D2 3-program frame", frame3, depth=1)
    timed_frames("D3 2-program fused", frame2, depth=1)
    timed_frames("D4 3-program", frame3, depth=2)
    timed_frames("D4 3-program", frame3, depth=4)
    timed_frames("D4 2-program fused", frame2, depth=4)
    print("dispatch probe complete", flush=True)


if __name__ == "__main__":
    main()
