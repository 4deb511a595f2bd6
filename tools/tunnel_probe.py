"""Decompose the chained-scalar overhead on the tunneled TPU (one session).

bench.py's chained method reported 41.5 s/frame while r1 deep-queue methods
said ~1-2 ms — this probe separates:
  A. per-program chaining overhead (trivial scalar -> scalar programs)
  B. + a small committed H2D per step (bench's `fold` pattern)
  C. frame-sized (1088x1920x3) elementwise program, chained
  D. deep-queue enqueue rate of the full frame (no chaining): r1 method (a)

Usage: python tools/tunnel_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tpu_session import wait_healthy  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from syzygy_tpu.math.geometry import eulers_from_forward
    from syzygy_tpu.renderer import RenderConfig
    from syzygy_tpu.renderer.frame import render_frame_packed
    from syzygy_tpu.runtime import accelerator_device, place_on_accelerator
    from syzygy_tpu.scene import (
        default_scene,
        flatten_frame_params,
        frame_param_spec,
        pack_frame_params,
        pack_geometry,
    )

    if not wait_healthy():
        print("DEVICE UNAVAILABLE", flush=True)
        sys.exit(1)

    dev = accelerator_device()

    def fetch(x):
        return float(np.asarray(jax.device_get(x)).reshape(-1)[0])

    small = jax.jit(lambda x: x + 1)(jnp.zeros((1,)))
    jax.block_until_ready(small)
    t0 = time.perf_counter()
    fetch(small)
    fetch_s = time.perf_counter() - t0
    print(f"fetch latency ~{fetch_s * 1000:.0f} ms", flush=True)

    def phase(tag, make_prev, step, n):
        """Chained loop with INCREMENTAL prints (enqueue time per call, then
        one fetch). Partial output stays informative if the session dies."""
        prev = make_prev()
        t0 = time.perf_counter()
        prev = jax.block_until_ready(step(prev))
        print(f"{tag}: warm call {time.perf_counter() - t0:.2f} s", flush=True)
        t0 = time.perf_counter()
        for i in range(n):
            t1 = time.perf_counter()
            prev = step(prev)
            if i < 3:
                print(
                    f"  enqueue[{i}] {(time.perf_counter() - t1) * 1000:.1f} ms",
                    flush=True,
                )
        tq = time.perf_counter() - t0
        v = fetch(prev)
        tt = time.perf_counter() - t0 - fetch_s
        print(
            f"{tag}: enqueue {tq / n * 1000:.1f} ms/call, "
            f"enqueue+drain {tt / n * 1000:.1f} ms/call (chk {v})",
            flush=True,
        )

    zero = lambda: jnp.zeros((), jnp.float32)

    # --- A: trivial chained scalar programs ---
    triv = jax.jit(lambda p: p * 0.5 + 1.0)
    phase("A trivial chained", zero, triv, 20)

    # --- B: chained + one small committed H2D per step ---
    buf = np.zeros(4096, np.float32)
    foldp = jax.jit(lambda f, p: f[0] * 1e-30 + p * 0.5 + 1.0)
    phase(
        "B chained + H2D 16KB",
        zero,
        lambda p: foldp(jax.device_put(buf, dev), p),
        20,
    )

    # --- C: frame-sized elementwise program, chained ---
    big = jax.jit(
        lambda p: (
            jnp.full((1088, 1920, 3), 1.0, jnp.float32) * (p * 1e-30 + 1.0)
        ).sum()
        * 1e-30
    )
    phase("C frame-sized chained", zero, big, 10)

    # --- D: deep-queue full frame (submission backpressure; no chaining) ---
    scene, library = default_scene()
    scene.sun_animation.time = 0.35
    scene.tick(0.0)
    eye = np.array([18.0, -16.0, -22.0], np.float32)
    target = np.array([0.0, -6.0, 0.0], np.float32)
    scene.camera.position = tuple(eye)
    scene.camera.euler_angles = tuple(
        np.asarray(eulers_from_forward(target - eye))
    )
    config = RenderConfig(width=1920, height=1080, n_shadow_maps=4)
    aspect = config.width / config.height
    geometry = place_on_accelerator(pack_geometry(scene, library))
    params0 = pack_frame_params(scene, aspect)
    spec = frame_param_spec(params0)
    hbuf = np.empty(spec.total, np.float32)
    flat = jax.device_put(flatten_frame_params(params0, spec, hbuf), dev)

    t0 = time.perf_counter()
    img = render_frame_packed(geometry, flat, spec, config)
    jax.block_until_ready(img)  # compile + first run
    print(
        f"D compile+first frame: {time.perf_counter() - t0:.1f} s", flush=True
    )
    t_first0 = time.perf_counter()
    chk = jax.jit(lambda im: im[0, 0, 0] * 1e-30)(img)
    v = fetch(chk)
    print(
        f"D0 one warm frame, forced via fetch: "
        f"{(time.perf_counter() - t_first0 - fetch_s) * 1000:.1f} ms (chk {v})",
        flush=True,
    )

    for n3 in (50, 200):
        t0 = time.perf_counter()
        outs = None
        for i in range(n3):
            t1 = time.perf_counter()
            outs = render_frame_packed(geometry, flat, spec, config)
            if i % 25 == 0:
                print(
                    f"  enqueue[{i}] {(time.perf_counter() - t1) * 1000:.1f} ms",
                    flush=True,
                )
        enq = time.perf_counter() - t0
        chk = jax.jit(lambda im: im[0, 0, 0] * 1e-30)(outs)
        v = fetch(chk)
        total = time.perf_counter() - t0 - fetch_s
        print(
            f"D deep-queue {n3} frames: enqueue {enq / n3 * 1000:.2f} ms/frame,"
            f" enqueue+drain {total / n3 * 1000:.2f} ms/frame (chk {v})",
            flush=True,
        )
    print("probe complete", flush=True)


if __name__ == "__main__":
    main()
