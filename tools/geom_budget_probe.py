"""Decompose the geometry stage with FULL-REDUCTION forcing (one session).

tools/dense_gap_probe.py proved the dense frame is ~80% geometry stage
(399.6 ms of 506.3 full-forced; the old scalar-forced table had DCE'd
most of it away). This probe splits that 400 ms into its real parts:

  1. vertex transforms (positions + normals)
  2. shadow pass (shadow setups + depth rasters, active lights only)
  3. camera setup_triangles (clip -> coeffs/chunk masks)
  4. camera raster (listed or full-iteration)
  5. G-buffer resolve (records + atlas samples)

Each part's inputs are materialized device arguments; every output is
consumed via a sum reduction so nothing is DCE-able or slice-pushable.
Runs the dense sphere field, then the default scene for contrast.

Usage: python tools/geom_budget_probe.py [n_frames]
"""

import functools
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

    if not smoke and not wait_healthy():
        print("DEVICE UNAVAILABLE", flush=True)
        sys.exit(1)

    import jax.numpy as jnp

    from bench import _flagship_scene
    from dense_depth_probe import _dense
    from syzygy_tpu.kernels.raster import setup_triangles
    from syzygy_tpu.kernels.resolve import (
        resolve_gbuffer,
        transform_normals,
        transform_positions,
    )
    from syzygy_tpu.renderer import RenderConfig
    from syzygy_tpu.renderer.frame import (
        _dispatch_raster,
        _shadow_pass,
        _stage_geometry,
    )
    from syzygy_tpu.runtime import place_on_accelerator
    from syzygy_tpu.scene import (
        pack_frame_params,
        pack_geometry,
        prepare_frame_state,
    )

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    W, H = (256, 128) if smoke else (1920, 1080)
    cfg = RenderConfig(
        width=W,
        height=H,
        n_shadow_maps=4,
        fuse_lighting_sky=True,
        metallic_reflection=False,
        **(
            dict(shadow_dim=128, skyview_width=128, skyview_height=64)
            if smoke
            else {}
        ),
    )

    def fetch(x):
        return float(np.asarray(jax.device_get(x)).reshape(-1)[0])

    small = jax.jit(lambda x: x + 1)(jnp.zeros(()))
    jax.block_until_ready(small)
    t0 = time.perf_counter()
    fetch(small)
    fetch_s = time.perf_counter() - t0

    def timed_chain(name, fn, *args):
        prev = jnp.zeros((), jnp.float32)
        prev = fn(prev, *args)
        for _ in range(2):
            prev = fn(prev, *args)
        t_warm = time.perf_counter()
        fetch(prev)
        warm_s = time.perf_counter() - t_warm
        t0 = time.perf_counter()
        for _ in range(n):
            prev = fn(prev, *args)
        v = fetch(prev)
        dt = (time.perf_counter() - t0 - fetch_s) / n * 1000
        print(
            f"  {name}: {dt:9.3f} ms  (warm drain {warm_s:.1f} s, chk {v})",
            flush=True,
        )
        return dt

    def _tree_sum(t):
        leaves = [
            jnp.sum(x.astype(jnp.float32))
            for x in jax.tree.leaves(t)
            if hasattr(x, "dtype")
        ]
        return functools.reduce(jnp.add, leaves)

    def scene_rows(tag, scene, lib):
        print(f"== {tag}", flush=True)
        geo = place_on_accelerator(pack_geometry(scene, lib))
        params = pack_frame_params(scene, W / H)
        state = jax.block_until_ready(
            jax.jit(prepare_frame_state)(params)
        )

        @jax.jit
        def transforms(eps, geo, state):
            models = state.models + eps * 1e-30
            proj_view = state.camera.projection @ state.camera.view
            clip, world = transform_positions(
                geo.positions, geo.vert_instance, models, proj_view
            )
            normals = transform_normals(
                geo.normals, geo.vert_instance, state.model_inv_transpose
            )
            return jnp.minimum(
                (jnp.sum(clip) + jnp.sum(world) + jnp.sum(normals)) * 1e-30,
                0.0,
            )

        @jax.jit
        def shadow(eps, geo, state, world_h):
            wh = world_h.at[0, 0].add(eps * 1e-30)
            maps = _shadow_pass(geo, wh, state, cfg)
            return jnp.minimum(jnp.sum(maps) * 1e-30, 0.0)

        @jax.jit
        def cam_setup(eps, geo, clip):
            c = clip.at[0, 0].add(eps * 1e-30)
            setup = setup_triangles(
                c,
                geo.triangles,
                geo.tri_valid,
                cfg.render_width,
                cfg.render_height,
                cull_keep_sign=+1,
                grid_width=cfg.padded_width,
                grid_height=cfg.padded_height,
                grid_origin=(0, 0),
            )
            return jnp.minimum(_tree_sum(setup) * 1e-30, 0.0)

        @jax.jit
        def cam_raster(eps, setup):
            s = setup._replace(
                coeffs=setup.coeffs.at[0, 0].add(eps * 1e-30)
            )
            vis = _dispatch_raster(s, cfg.padded_width, cfg.padded_height, cfg)
            return jnp.minimum(_tree_sum(vis) * 1e-30, 0.0)

        @jax.jit
        def resolve(eps, vis, setup, geo, world, normals):
            v = vis._replace(depth=vis.depth.at[0, 0].add(eps * 1e-30))
            gb = resolve_gbuffer(v, setup, geo, world, normals)
            return jnp.minimum(_tree_sum(gb) * 1e-30, 0.0)

        # materialize intermediates once (not timed)
        @functools.partial(jax.jit, static_argnames=())
        def mats(geo, state):
            proj_view = state.camera.projection @ state.camera.view
            clip, world = transform_positions(
                geo.positions, geo.vert_instance, state.models, proj_view
            )
            normals = transform_normals(
                geo.normals, geo.vert_instance, state.model_inv_transpose
            )
            world_h = jnp.concatenate(
                [world, jnp.ones((world.shape[0], 1), jnp.float32)], axis=-1
            )
            setup = setup_triangles(
                clip,
                geo.triangles,
                geo.tri_valid,
                cfg.render_width,
                cfg.render_height,
                cull_keep_sign=+1,
                grid_width=cfg.padded_width,
                grid_height=cfg.padded_height,
                grid_origin=(0, 0),
            )
            vis = _dispatch_raster(
                setup, cfg.padded_width, cfg.padded_height, cfg
            )
            return clip, world, normals, world_h, setup, vis

        clip, world, normals, world_h, setup, vis = jax.block_until_ready(
            mats(geo, state)
        )

        parts = [
            timed_chain("vertex transforms ", transforms, geo, state),
            timed_chain("shadow pass       ", shadow, geo, state, world_h),
            timed_chain("camera setup      ", cam_setup, geo, clip),
            timed_chain("camera raster     ", cam_raster, setup),
            timed_chain(
                "g-buffer resolve  ", resolve, vis, setup, geo, world, normals
            ),
        ]

        @jax.jit
        def geom_all(eps, geo, state):
            models = state.models + eps * 1e-30
            st = state._replace(models=models)
            # mirror _stage_geometry exactly
            proj_view = st.camera.projection @ st.camera.view
            clip, world = transform_positions(
                geo.positions, geo.vert_instance, st.models, proj_view
            )
            normals = transform_normals(
                geo.normals, geo.vert_instance, st.model_inv_transpose
            )
            world_h = jnp.concatenate(
                [world, jnp.ones((world.shape[0], 1), jnp.float32)], axis=-1
            )
            maps = _shadow_pass(geo, world_h, st, cfg)
            setup = setup_triangles(
                clip,
                geo.triangles,
                geo.tri_valid,
                cfg.render_width,
                cfg.render_height,
                cull_keep_sign=+1,
                grid_width=cfg.padded_width,
                grid_height=cfg.padded_height,
                grid_origin=(0, 0),
            )
            vis = _dispatch_raster(
                setup, cfg.padded_width, cfg.padded_height, cfg
            )
            gb = resolve_gbuffer(vis, setup, geo, world, normals)
            return jnp.minimum(
                (_tree_sum(vis) + _tree_sum(gb) + jnp.sum(maps)) * 1e-30, 0.0
            )

        whole = timed_chain("whole stage       ", geom_all, geo, state)
        print(
            f"  parts sum {sum(parts):.1f} ms vs whole stage {whole:.1f} ms",
            flush=True,
        )

    s2, lib2 = _dense()
    scene_rows("dense sphere field", s2, lib2)
    scene, lib = _flagship_scene()
    scene_rows("default editor scene", scene, lib)


if __name__ == "__main__":
    main()
