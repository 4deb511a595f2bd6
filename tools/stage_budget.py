"""Per-stage frame budget at 1080p, honestly timed (one batched session).

Replaces tpu_session.py's per-stage table with the chained-scalar method
(CLAUDE.md item 7: ``block_until_ready`` through this tunnel acks early, so
each measured call must CONSUME the previous call's output inside its own
jitted program, with ONE 4-byte fetch at the end of each chain).

Every chain forces its stage with a FULL REDUCTION over every output
(see ``_tree_sum``): the original single-element forcing let XLA
dead-code-eliminate whole sub-passes (dense geometry measured 76.5 ms
scalar-forced vs 399.6 ms full-forced — tools/dense_gap_probe.py), which
is what produced the phantom ~200 ms "gap" between the old stage table
and the honest end-to-end bench. Numbers predating round 6 in
docs/BENCHMARKS.md carry that undercount.

Measures, on the real TPU:
  * stage_geometry / stage_lighting / stage_sky at 1920x1080 (default scene)
  * the same three stages on the dense 64-sphere field (253,952 triangles)
  * full chained frame for both scenes

Usage: python tools/stage_budget.py [n_frames]
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

    smoke = os.environ.get("SZG_BUDGET_CPU") == "1"  # CPU smoke test
    if smoke:
        jax.config.update("jax_platforms", "cpu")

    # Health-gate BEFORE importing syzygy_tpu: a down tunnel at package
    # import degrades the session to CPU-only (syzygy_tpu/__init__), which
    # would silently turn this into a CPU "budget".
    if not smoke and not wait_healthy():
        print("DEVICE UNAVAILABLE", flush=True)
        sys.exit(1)

    import jax.numpy as jnp

    from syzygy_tpu.assets import (
        TextureLibrary,
        register_default_textures,
        sphere_mesh,
    )
    from syzygy_tpu.math.geometry import eulers_from_forward
    from syzygy_tpu.renderer import RenderConfig
    from syzygy_tpu.renderer.frame import (
        _stage_geometry,
        _stage_lighting,
        _stage_sky,
    )
    from syzygy_tpu.runtime import place_on_accelerator
    from syzygy_tpu.scene import (
        Scene,
        TransformHost,
        default_scene,
        pack_frame_params,
        pack_geometry,
    )

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
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

    def cam(scene):
        eye = np.array([18.0, -16.0, -22.0], np.float32)
        target = np.array([0.0, -6.0, 0.0], np.float32)
        scene.camera.position = tuple(eye)
        scene.camera.euler_angles = tuple(
            np.asarray(eulers_from_forward(target - eye))
        )

    def fetch(x):
        return float(np.asarray(jax.device_get(x)).reshape(-1)[0])

    small = jax.jit(lambda x: x + 1)(jnp.zeros((1,)))
    jax.block_until_ready(small)
    t0 = time.perf_counter()
    fetch(small)
    fetch_s = time.perf_counter() - t0
    print(f"fetch latency ~{fetch_s * 1000:.0f} ms", flush=True)


    def _tree_sum(t):
        # FULL-REDUCTION forcing: consuming a single output element lets
        # XLA dead-code-eliminate every output the scalar doesn't depend
        # on (the old geometry chain dropped the whole resolve + shadow
        # pass: scalar-forced dense geometry measured 76.5 ms vs 399.6
        # full-forced — tools/dense_gap_probe.py). A sum over every
        # output cannot be DCE'd or slice-pushed; the reduction itself is
        # ~free on the VPU.
        leaves = [
            jnp.sum(x.astype(jnp.float32))
            for x in jax.tree.leaves(t)
            if hasattr(x, "dtype")
        ]
        return functools.reduce(jnp.add, leaves)

    def timed_chain(name, fn):
        """fn(prev_scalar) -> scalar derived from the measured program.

        Two passes: the first (discarded, forced by its own fetch) absorbs
        one-time costs — compile, lazy executable upload through the 15 MB/s
        tunnel, allocation warm-up — which otherwise leak into the timing
        because block_until_ready acks early. The second pass is reported."""
        prev = jnp.zeros((), jnp.float32)
        prev = fn(prev)  # compile
        for _ in range(2):  # discard pass, forced
            prev = fn(prev)
        t_warm = time.perf_counter()
        fetch(prev)
        warm_s = time.perf_counter() - t_warm
        t0 = time.perf_counter()
        for _ in range(n):
            prev = fn(prev)
        v = fetch(prev)
        dt = (time.perf_counter() - t0 - fetch_s) / n * 1000
        print(
            f"  {name}: {dt:9.3f} ms  (warm drain {warm_s:.1f} s, chk {v})",
            flush=True,
        )
        return dt

    def scene_stages(tag, scene, lib):
        geo = place_on_accelerator(pack_geometry(scene, lib))
        params = pack_frame_params(scene, W / H)

        # materialized inputs for the downstream stages
        state, vis, gb, smaps = jax.block_until_ready(
            _stage_geometry(geo, params, cfg)
        )
        lit = jax.block_until_ready(_stage_lighting(state, gb, smaps))

        # Device-resident inputs are explicit jit ARGUMENTS (closure capture
        # would embed them as constants -> ~30 s device->host fetch each at
        # lowering through this tunnel; CLAUDE.md landmine 3).
        @functools.partial(jax.jit, static_argnames=())
        def geom_chain(geo, params, eps):
            p2 = params._replace(
                cam_position=jnp.asarray(params.cam_position) + eps * 1e-30
            )
            _, vis2, gb2, smaps2 = _stage_geometry.__wrapped__(geo, p2, cfg)
            return jnp.minimum(
                (_tree_sum(vis2) + _tree_sum(gb2) + jnp.sum(smaps2)) * 1e-30,
                0.0,
            )

        @jax.jit
        def light_chain(state, gb, smaps, eps):
            gb2 = gb._replace(diffuse=gb.diffuse.at[0, 0, 0].add(eps * 1e-30))
            lit2 = _stage_lighting.__wrapped__(state, gb2, smaps)
            return jnp.minimum(jnp.sum(lit2) * 1e-30, 0.0)

        @jax.jit
        def sky_chain(state, lit, depth, gb, smaps, eps):
            lit2 = lit.at[0, 0, 0].add(eps * 1e-30)
            img = _stage_sky.__wrapped__(state, lit2, depth, gb, smaps, cfg)
            return jnp.minimum(jnp.sum(img) * 1e-30, 0.0)

        from syzygy_tpu.kernels.atmosphere import (
            METERS_PER_MM,
            compute_skyview_lut,
            compute_transmittance_lut,
            pack_lut,
        )

        def _origin(atmo, state):
            o = state.camera.position[:3] / METERS_PER_MM
            o = o * jnp.array([1.0, -1.0, 1.0], jnp.float32)
            return o + jnp.array(
                [0.0, atmo.planet_radius_mm, 0.0], jnp.float32
            )

        @jax.jit
        def tlut_chain(state, eps):
            atmo = state.atmosphere._replace(
                sun_intensity_spectrum=state.atmosphere.sun_intensity_spectrum
                + eps * 1e-30
            )
            t_lut = compute_transmittance_lut(atmo)
            return jnp.minimum(jnp.sum(t_lut) * 1e-30, 0.0)

        @jax.jit
        def luts_chain(state, eps):
            atmo = state.atmosphere._replace(
                sun_intensity_spectrum=state.atmosphere.sun_intensity_spectrum
                + eps * 1e-30
            )
            t_lut = pack_lut(compute_transmittance_lut(atmo))
            sky_lut = compute_skyview_lut(
                atmo,
                _origin(atmo, state),
                t_lut,
                width=cfg.skyview_width,
                height=cfg.skyview_height,
            )
            return jnp.minimum(
                (jnp.sum(t_lut.quad) + jnp.sum(sky_lut)) * 1e-30, 0.0
            )

        @jax.jit
        def raster_chain(geo, params, eps):
            from syzygy_tpu.kernels.raster import setup_triangles
            from syzygy_tpu.kernels.resolve import transform_positions
            from syzygy_tpu.renderer.frame import _dispatch_raster
            from syzygy_tpu.scene.pack import prepare_frame_state

            p2 = params._replace(
                cam_position=jnp.asarray(params.cam_position) + eps * 1e-30
            )
            st = prepare_frame_state(p2)
            proj_view = st.camera.projection @ st.camera.view
            clip, _ = transform_positions(
                geo.positions, geo.vert_instance, st.models, proj_view
            )
            setup = setup_triangles(
                clip,
                geo.triangles,
                geo.tri_valid,
                cfg.render_width,
                cfg.render_height,
                +1,
                grid_width=cfg.padded_width,
                grid_height=cfg.padded_height,
            )
            vis2 = _dispatch_raster(
                setup, cfg.padded_width, cfg.padded_height, cfg
            )
            return jnp.minimum(_tree_sum(vis2) * 1e-30, 0.0)

        @jax.jit
        def shadow_chain(geo, params, eps):
            from syzygy_tpu.kernels.resolve import transform_positions
            from syzygy_tpu.renderer.frame import _shadow_pass
            from syzygy_tpu.scene.pack import prepare_frame_state

            p2 = params._replace(
                cam_position=jnp.asarray(params.cam_position) + eps * 1e-30
            )
            st = prepare_frame_state(p2)
            proj_view = st.camera.projection @ st.camera.view
            _, world = transform_positions(
                geo.positions, geo.vert_instance, st.models, proj_view
            )
            world_h = jnp.concatenate(
                [world, jnp.ones((world.shape[0], 1), jnp.float32)], axis=-1
            )
            maps = _shadow_pass(geo, world_h, st, cfg)
            return jnp.minimum(jnp.sum(maps) * 1e-30, 0.0)

        print(f"== {tag} ==", flush=True)
        timed_chain(
            "  camera raster", lambda eps: raster_chain(geo, params, eps)
        )
        timed_chain(
            "  shadow pass  ", lambda eps: shadow_chain(geo, params, eps)
        )
        g = timed_chain(
            "stage_geometry", lambda eps: geom_chain(geo, params, eps)
        )
        l = timed_chain(
            "stage_lighting", lambda eps: light_chain(state, gb, smaps, eps)
        )
        s = timed_chain(
            "stage_sky     ",
            lambda eps: sky_chain(state, lit, vis.depth, gb, smaps, eps),
        )
        t = timed_chain(
            "  t-LUT build  ", lambda eps: tlut_chain(state, eps)
        )
        u = timed_chain(
            "  t+sky LUTs   ", lambda eps: luts_chain(state, eps)
        )
        print(
            f"  sum of stages : {g + l + s:9.3f} ms "
            f"(camera pass ~{s - u:.1f}, skyview build ~{u - t:.1f})",
            flush=True,
        )

    scene, lib = default_scene()
    scene.sun_animation.time = 0.35
    scene.tick(0.0)
    cam(scene)
    scene_stages("default editor scene (26 tris)", scene, lib)

    # dense field: 64 spheres x 3,968 tris
    s2 = Scene()
    lib2 = TextureLibrary()
    mat2 = register_default_textures(lib2)
    n_spheres = 4 if smoke else 64
    mesh = sphere_mesh(
        mat2, rings=8 if smoke else 32, segments=16 if smoke else 64
    )
    side = int(np.ceil(np.sqrt(n_spheres)))
    transforms = [
        TransformHost.make(
            (8.0 * (i % side) - 4.0 * side, -6.0, 8.0 * (i // side) - 4.0 * side)
        )
        for i in range(n_spheres)
    ]
    s2.add_mesh_instance(mesh, "spheres", transforms)
    s2.tick(0.0)
    cam(s2)
    n_tris = n_spheres * mesh.triangles.shape[0]
    scene_stages(f"dense sphere field ({n_tris} tris)", s2, lib2)
    print("budget session complete", flush=True)


if __name__ == "__main__":
    main()
