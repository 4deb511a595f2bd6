"""Decompose deferred_lighting's cost on the TPU (one batched session).

Variants at 1920x1080, default 3-light scene:
  L1 full lighting stage
  L2 PCF stubbed to 1.0 (no shadow gathers, no selects) -> BRDF+frame cost
  L3 PCF with row gathers but channel select replaced by row[.., 0]
     (gathers kept, one-hot removed) -> isolates the select cost
  L4 shadow-frame transform only (no PCF, no BRDF accumulate)

Usage: python tools/light_probe.py [n]
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

    from syzygy_tpu.kernels import lighting as L
    from syzygy_tpu.math.geometry import eulers_from_forward
    from syzygy_tpu.renderer import RenderConfig
    from syzygy_tpu.renderer.frame import _stage_geometry
    from syzygy_tpu.runtime import place_on_accelerator
    from syzygy_tpu.scene import default_scene, pack_frame_params, pack_geometry

    if not wait_healthy():
        print("DEVICE UNAVAILABLE", flush=True)
        sys.exit(1)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    W, H = 1920, 1080
    cfg = RenderConfig(width=W, height=H)

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
    state, vis, gb, smaps = jax.block_until_ready(
        _stage_geometry(geo, params, cfg)
    )

    def fetch(x):
        return float(np.asarray(jax.device_get(x)).reshape(-1)[0])

    small = jax.jit(lambda x: x + 1)(jnp.zeros((1,)))
    jax.block_until_ready(small)
    t0 = time.perf_counter()
    fetch(small)
    fetch_s = time.perf_counter() - t0

    def timed_chain(name, fn):
        prev = jnp.zeros((), jnp.float32)
        prev = fn(prev)
        for _ in range(2):
            prev = fn(prev)
        fetch(prev)  # discard: compile + executable upload + warm
        t0 = time.perf_counter()
        for _ in range(n):
            prev = fn(prev)
        v = fetch(prev)
        dt = (time.perf_counter() - t0 - fetch_s) / n * 1000
        print(f"  {name}: {dt:9.3f} ms (chk {v})", flush=True)
        return dt

    def light_chain():
        @jax.jit
        def f(state, gb, smaps, eps):
            gb2 = gb._replace(diffuse=gb.diffuse.at[0, 0, 0].add(eps * 1e-30))
            lit = L.deferred_lighting(
                gb2,
                state.camera,
                state.directional_lights,
                state.directional_count,
                state.directional_skip_count,
                state.spot_lights,
                state.spot_count,
                smaps,
            )
            return jnp.minimum(lit[0, 0, 0] * 1e-30, 0.0)

        return lambda eps: f(state, gb, smaps, eps)

    orig_sample = L.sample_shadow_map
    print("== lighting decomposition (1080p, 3 lights) ==", flush=True)
    timed_chain("L1 full            ", light_chain())

    L.sample_shadow_map = lambda sm, coord, dx, dy: jnp.ones_like(
        coord[..., 2]
    )
    timed_chain("L2 PCF stubbed     ", light_chain())

    def pcf_no_select(shadow_map, coord, dx, dy):
        size = shadow_map.shape[-1]
        frag_depth = coord[..., 2]
        du = 1.5 * dx / size
        dv = 1.5 * dy / size
        u, v = coord[..., 0], coord[..., 1]
        pad = 8
        n_w = (size + 2 * pad) // 8
        padded = jnp.zeros((size, n_w * 8 + 8), shadow_map.dtype)
        padded = padded.at[:, pad : pad + size].set(shadow_map)
        seg = (jnp.arange(n_w) * 8)[:, None] + jnp.arange(16)[None, :]
        windows = padded[:, seg].reshape(size * n_w, 16)
        base = jnp.floor(u * size).astype(jnp.int32)
        w = jnp.clip(jnp.floor_divide(base - 3 + pad, 8), 0, n_w - 1)
        occluded = jnp.zeros_like(frag_depth)
        for oy in range(-2, 3):
            iy = jnp.floor((v + oy * dv) * size).astype(jnp.int32)
            row = windows[jnp.clip(iy, 0, size - 1) * n_w + w]
            for ox in range(-2, 3):
                occ = row[..., (ox + 2) % 16] * (1.0 + 0.0 * du)
                occluded += jnp.where(
                    (occ > 0.0) & (occ > frag_depth), 1.0, 0.0
                )
        return 1.0 - occluded / 25.0

    L.sample_shadow_map = pcf_no_select
    timed_chain("L3 gathers no-select", light_chain())
    L.sample_shadow_map = orig_sample
    print("probe complete", flush=True)


if __name__ == "__main__":
    main()
