"""Bisect the 4096^2 shadow compile crash: raster-only vs lighting-only.

shadow_hires showed shadow_dim=4096 fails remote_compile (HTTP 500,
tpu_compile_helper exit 1) with BOTH PCF formulations. This isolates:
  B1 depth-only shadow raster at dim (no lighting)
  B2 lighting consuming a PREBUILT (dim, dim) map (no raster)

Usage: python tools/shadow_bisect.py [dim]
"""

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
    from syzygy_tpu.renderer.frame import _shadow_pass, _stage_geometry, _stage_lighting
    from syzygy_tpu.kernels.resolve import transform_positions
    from syzygy_tpu.runtime import place_on_accelerator
    from syzygy_tpu.scene import default_scene, pack_frame_params, pack_geometry
    from syzygy_tpu.scene.pack import prepare_frame_state

    if not smoke and not wait_healthy():
        print("DEVICE UNAVAILABLE", flush=True)
        sys.exit(1)

    dim = int(sys.argv[1]) if len(sys.argv) > 1 else (512 if smoke else 4096)
    W, H = (256, 128) if smoke else (1920, 1080)
    base = RenderConfig(
        width=W, height=H, shadow_dim=dim,
        **(dict(skyview_width=128, skyview_height=64) if smoke else {}),
    )
    cfg_small = RenderConfig(
        width=W, height=H, shadow_dim=256,
        **(dict(skyview_width=128, skyview_height=64) if smoke else {}),
    )

    scene, lib = default_scene()
    scene.sun_animation.time = 0.35
    scene.tick(0.0)
    eye = np.array([18.0, -16.0, -22.0], np.float32)
    target = np.array([0.0, -6.0, 0.0], np.float32)
    scene.camera.position = tuple(eye)
    scene.camera.euler_angles = tuple(np.asarray(eulers_from_forward(target - eye)))
    geo = place_on_accelerator(pack_geometry(scene, lib))
    params = pack_frame_params(scene, W / H)

    def fetch(x):
        return float(np.asarray(jax.device_get(x)).reshape(-1)[0])

    def attempt(name, fn):
        t0 = time.perf_counter()
        try:
            v = fetch(fn())
            print(
                f"{name}: OK in {time.perf_counter() - t0:.1f} s (chk {v})",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(
                f"{name}: FAILED after {time.perf_counter() - t0:.1f} s — "
                f"{type(e).__name__}: {str(e)[:140]}",
                flush=True,
            )

    @jax.jit
    def raster_only(geo, params):
        st = prepare_frame_state(params)
        proj_view = st.camera.projection @ st.camera.view
        _, world = transform_positions(
            geo.positions, geo.vert_instance, st.models, proj_view
        )
        world_h = jnp.concatenate(
            [world, jnp.ones((world.shape[0], 1), jnp.float32)], axis=-1
        )
        maps = _shadow_pass(geo, world_h, st, base)
        return maps.sum() * 1e-30

    attempt(f"B1 raster-only dim={dim}", lambda: raster_only(geo, params))

    # B2: lighting with a synthetic (dim, dim) map stack (no raster)
    state, vis, gb, _ = _stage_geometry(geo, params, cfg_small)
    n_maps = 18
    fake = jnp.zeros((n_maps, dim, dim), jnp.float32)

    @jax.jit
    def lighting_only(state, gb, fake):
        lit = _stage_lighting.__wrapped__(state, gb, fake)
        return lit[0, 0, 0] * 1e-30

    attempt(f"B2 lighting-only dim={dim}", lambda: lighting_only(state, gb, fake))

    # B3: ONE depth raster at dim, no light loop, no update_slice
    from syzygy_tpu.kernels.raster import setup_triangles
    from syzygy_tpu.renderer.frame import _dispatch_raster

    @jax.jit
    def one_raster(geo, params):
        st = prepare_frame_state(params)
        proj_view = st.camera.projection @ st.camera.view
        _, world = transform_positions(
            geo.positions, geo.vert_instance, st.models, proj_view
        )
        world_h = jnp.concatenate(
            [world, jnp.ones((world.shape[0], 1), jnp.float32)], axis=-1
        )
        corners = world_h[geo.triangles]
        pv = st.directional_lights.projection[0] @ st.directional_lights.view[0]
        corner_clip = jnp.einsum("tcj,ij->tci", corners, pv)
        setup = setup_triangles(
            None, geo.triangles, geo.tri_valid, dim, dim,
            cull_keep_sign=-1, corner_clip=corner_clip,
        )
        vis = _dispatch_raster(setup, dim, dim, base, depth_only=True)
        return vis.depth.sum() * 1e-30

    attempt(f"B3 one-raster dim={dim}", lambda: one_raster(geo, params))

    # B4: the light loop's dynamic_update_slice shape, no pallas raster
    @jax.jit
    def loop_only(params):
        st = prepare_frame_state(params)

        def body(i, maps):
            dmap = jnp.full((dim, dim), 0.5, jnp.float32) * (i + 1)
            return jax.lax.dynamic_update_slice(maps, dmap[None], (i, 0, 0))

        maps = jax.lax.fori_loop(
            0, jnp.int32(3), body,
            jnp.zeros((base.n_shadow_maps, dim, dim), jnp.float32),
        )
        return maps.sum() * 1e-30

    attempt(f"B4 loop+update_slice dim={dim}", lambda: loop_only(params))
    print("bisect complete", flush=True)


if __name__ == "__main__":
    main()
