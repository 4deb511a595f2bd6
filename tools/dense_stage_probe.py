"""Decompose the PRODUCTION dense frame (records path) by chained stage.

tools/geom_budget_probe.py (r9 session, vector raster) showed the UNFUSED
geometry stage's parts sum 160.3 ms vs 255.1 whole — a ~95 ms gap inside
one XLA program. But the production frame is 2 chained programs:

  P1 = _stage_geometry: prepare + transforms + shadow rasters + setup +
       camera raster + build_resolve_records          (records path)
  P2 = _stage_lighting_sky: per-row-chunk resolve-from-records +
       lighting + sky

This probe times, on the dense 254k-tri field at 1920x1080 (bench config):

  1. P1 whole (production program, all outputs force-reduced)
  2. P1 split into sub-programs with materialized intermediates:
       a. pre     = prepare + transforms + world_h + shadow maps
       b. raster  = setup + camera raster
       c. records = build_resolve_records
  3. P2 with materialized P1 outputs
  4. the full 2-program frame (reference point for the sum)

If 1 >> 2a+2b+2c the gap lives inside the production P1 and a chained
split (dispatch is free — r3 dispatch_probe) should recover it.

Usage: python tools/dense_stage_probe.py [n_frames]
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

    import dataclasses

    import jax.numpy as jnp

    from dense_depth_probe import _dense
    from syzygy_tpu.kernels.raster import setup_triangles
    from syzygy_tpu.kernels.resolve import (
        build_resolve_records,
        transform_normals,
        transform_positions,
    )
    from syzygy_tpu.renderer import RenderConfig
    from syzygy_tpu.renderer.frame import (
        _dispatch_raster,
        _shadow_pass,
        _stage_geometry,
        _stage_lighting_sky,
        prepare_frame_state,
    )
    from syzygy_tpu.runtime import place_on_accelerator
    from syzygy_tpu.scene import pack_frame_params, pack_geometry

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    W, H = (256, 128) if smoke else (1920, 1080)
    cfg = RenderConfig(
        width=W,
        height=H,
        n_shadow_maps=4,
        metallic_reflection=False,  # bench parity: dense scene is dielectric
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

    scene, lib = _dense()
    geo = place_on_accelerator(pack_geometry(scene, lib))
    params = pack_frame_params(scene, W / H)

    # ---- 1. production P1, whole -------------------------------------
    @jax.jit
    def p1_whole(eps, geo, params):
        p = params._replace(cam_position=params.cam_position + eps * 1e-30)
        state, vis, records, smaps = _stage_geometry.__wrapped__(geo, p, cfg)
        return jnp.minimum(
            (_tree_sum(vis) + jnp.sum(records) + jnp.sum(smaps)) * 1e-30, 0.0
        )

    # ---- 2. split sub-programs ---------------------------------------
    @jax.jit
    def p1a_pre(eps, geo, params):
        p = params._replace(cam_position=params.cam_position + eps * 1e-30)
        state = prepare_frame_state(p)
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
        maps = _shadow_pass(geo, world_h, state, cfg)
        return jnp.minimum(
            (jnp.sum(clip) + jnp.sum(normals) + jnp.sum(maps)) * 1e-30, 0.0
        )

    @jax.jit
    def p1b_raster(eps, geo, clip):
        c = clip.at[0, 0].add(eps * 1e-30)
        setup = setup_triangles(
            c,
            geo.triangles,
            geo.tri_valid,
            cfg.render_width,
            cfg.render_height,
            cull_keep_sign=+1,
            tile_h=cfg.raster_tile_h,
            tile_w=cfg.raster_tile_w,
            chunk=cfg.raster_chunk,
            grid_width=cfg.padded_width,
            grid_height=cfg.padded_height,
            grid_origin=(0, 0),
        )
        vis = _dispatch_raster(setup, cfg.padded_width, cfg.padded_height, cfg)
        return jnp.minimum(_tree_sum(vis) * 1e-30, 0.0)

    @jax.jit
    def p1c_records(eps, geo, setup, world, normals):
        s = setup._replace(corner_w=setup.corner_w.at[0, 0].add(eps * 1e-30))
        rec = build_resolve_records(s, geo, world, normals)
        return jnp.minimum(jnp.sum(rec) * 1e-30, 0.0)

    # materialize intermediates (untimed)
    @jax.jit
    def mats(geo, params):
        state = prepare_frame_state(params)
        proj_view = state.camera.projection @ state.camera.view
        clip, world = transform_positions(
            geo.positions, geo.vert_instance, state.models, proj_view
        )
        normals = transform_normals(
            geo.normals, geo.vert_instance, state.model_inv_transpose
        )
        setup = setup_triangles(
            clip,
            geo.triangles,
            geo.tri_valid,
            cfg.render_width,
            cfg.render_height,
            cull_keep_sign=+1,
            tile_h=cfg.raster_tile_h,
            tile_w=cfg.raster_tile_w,
            chunk=cfg.raster_chunk,
            grid_width=cfg.padded_width,
            grid_height=cfg.padded_height,
            grid_origin=(0, 0),
        )
        return clip, world, normals, setup

    # ---- 3. production P2 with materialized inputs -------------------
    @jax.jit
    def p2_whole(eps, state, vis, records, smaps, geo):
        v = vis._replace(depth=vis.depth.at[0, 0].add(eps * 1e-30))
        img = _stage_lighting_sky.__wrapped__(
            state, v.depth, None, smaps, cfg, 0, v, records, geo
        )
        return jnp.minimum(jnp.sum(img) * 1e-30, 0.0)

    if smoke:
        # Interpret-mode Pallas over 254k triangles is unrunnably slow on
        # CPU; the smoke's job is only to catch API/shape mistakes before
        # a TPU session, so trace every program instead of executing it.
        s_eps = jax.ShapeDtypeStruct((), jnp.float32)
        m = jax.eval_shape(mats, geo, params)
        clip_s, world_s, normals_s, setup_s = m
        g = jax.eval_shape(
            functools.partial(_stage_geometry.__wrapped__, config=cfg),
            geo,
            params,
        )
        state_s, vis_s, records_s, smaps_s = g
        for name, fn, a in [
            ("p1_whole", p1_whole, (s_eps, geo, params)),
            ("p1a_pre", p1a_pre, (s_eps, geo, params)),
            ("p1b_raster", p1b_raster, (s_eps, geo, clip_s)),
            ("p1c_records", p1c_records, (s_eps, geo, setup_s, world_s, normals_s)),
            ("p2_whole", p2_whole, (s_eps, state_s, vis_s, records_s, smaps_s, geo)),
        ]:
            fn.lower(*a)
            print(f"  TRACE OK {name}", flush=True)
        print("SMOKE PASS (trace-only)", flush=True)
        return

    clip, world, normals, setup = jax.block_until_ready(mats(geo, params))
    state, vis, records, smaps = jax.block_until_ready(
        _stage_geometry(geo, params, cfg)
    )

    print("== dense sphere field (production records path) ==", flush=True)
    t1 = timed_chain("P1 whole          ", p1_whole, geo, params)
    ta = timed_chain("P1a pre+shadow    ", p1a_pre, geo, params)
    tb = timed_chain("P1b setup+raster  ", p1b_raster, geo, clip)
    tc = timed_chain(
        "P1c records build ", p1c_records, geo, setup, world, normals
    )
    t2 = timed_chain("P2 chunks         ", p2_whole, state, vis, records, smaps, geo)
    print(
        f"  P1 split sum {ta + tb + tc:.1f} vs whole {t1:.1f}; "
        f"P1+P2 = {t1 + t2:.1f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
