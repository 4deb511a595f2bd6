"""Decompose the dense-scene end-to-end vs stage-sum gap (one session).

Hypothesis under test: the historical per-stage table UNDERCOUNTS.
tools/stage_budget.py's chains force each stage by consuming ONE output
element (e.g. ``vis2.depth[0, 0]``) — XLA can then dead-code-eliminate
every output the scalar doesn't depend on (the geometry chain never
consumes the resolved G-buffer, so the whole resolve pass — its gathers
included — may vanish from the "geometry" number) and slice-push single
-pixel demands through elementwise tails. The honest end-to-end bench
number then looks mysteriously larger than the stage sum (~200 ms on the
dense field, docs/BENCHMARKS.md round-6 item 4).

This probe re-measures each stage with FULL-REDUCTION forcing (the
chained scalar is ``sum(every output) * 1e-30`` — a reduction cannot be
DCE'd or sliced away; elementwise reductions are ~free on the VPU, r3
dispatch_probe fact 2), next to the bench-identical chained frame, in
the SAME session, bench config (n_shadow_maps=4, fuse_lighting_sky), on
both the dense field and the default scene.

Usage: python tools/dense_gap_probe.py [n_frames]
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

    if not smoke and not wait_healthy():
        print("DEVICE UNAVAILABLE", flush=True)
        sys.exit(1)

    import jax.numpy as jnp

    from bench import _flagship_scene, _measure_scene
    from dense_depth_probe import _dense
    from syzygy_tpu.renderer import RenderConfig
    from syzygy_tpu.renderer.frame import (
        _stage_geometry,
        _stage_lighting_sky,
    )
    from syzygy_tpu.runtime import place_on_accelerator
    from syzygy_tpu.scene import pack_frame_params, pack_geometry

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    W, H = (256, 128) if smoke else (1920, 1080)
    cfg = RenderConfig(
        width=W,
        height=H,
        n_shadow_maps=4,
        fuse_lighting_sky=True,
        metallic_reflection=False,  # bench scenes have no metallic material
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
    print(f"fetch latency {fetch_s * 1000:.1f} ms", flush=True)

    def timed_chain(name, fn, *args):
        """Double-pass chained-scalar timing (CLAUDE.md item 7)."""
        prev = jnp.zeros((), jnp.float32)
        prev = fn(prev, *args)  # compile
        for _ in range(2):
            prev = fn(prev, *args)
        t_warm = time.perf_counter()
        fetch(prev)  # drain compile-upload + warm-up
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
        from syzygy_tpu.scene import (
            flatten_frame_params,
            frame_param_spec,
            unflatten_frame_params,
        )

        print(f"== {tag}", flush=True)
        geo = place_on_accelerator(pack_geometry(scene, lib))
        params = pack_frame_params(scene, W / H)
        spec = frame_param_spec(params)
        buf = np.empty(spec.total, np.float32)
        flat = jax.device_put(
            np.array(flatten_frame_params(params, spec, buf))
        )

        @jax.jit
        def geom_full(eps, geo, params_flat):
            # identical input path to bench: unflatten the packed row
            p = unflatten_frame_params(
                spec, params_flat.at[0].add(eps * 1e-30)
            )
            state, vis, gb, smaps = _stage_geometry.__wrapped__(geo, p, cfg)
            # consume EVERYTHING: no output is DCE-able
            return jnp.minimum(
                (_tree_sum(vis) + _tree_sum(gb) + jnp.sum(smaps)) * 1e-30,
                0.0,
            )

        @jax.jit
        def geom_scalar(eps, geo, params_flat):
            # stage_budget-style forcing: one depth texel (DCE-prone)
            p = unflatten_frame_params(
                spec, params_flat.at[0].add(eps * 1e-30)
            )
            state, vis, gb, smaps = _stage_geometry.__wrapped__(geo, p, cfg)
            return jnp.minimum(vis.depth[0, 0] * 1e-30, 0.0)

        @jax.jit
        def lightsky_full(eps, state, vis_depth, gb, smaps):
            gb2 = gb._replace(
                diffuse=gb.diffuse.at[0, 0, 0].add(eps * 1e-30)
            )
            img = _stage_lighting_sky.__wrapped__(
                state, vis_depth, gb2, smaps, cfg
            )
            return jnp.minimum(jnp.sum(img) * 1e-30, 0.0)

        state, vis, gb, smaps = jax.block_until_ready(
            _stage_geometry(geo, params, cfg)
        )
        g_full = timed_chain("geometry FULL-forced  ", geom_full, geo, flat)
        g_scal = timed_chain("geometry scalar-forced", geom_scalar, geo, flat)
        ls = timed_chain(
            "lighting+sky FULL     ",
            lightsky_full,
            state,
            vis.depth,
            gb,
            smaps,
        )
        e2e = _measure_scene(scene, lib, cfg, frames=n, group=min(8, n))
        print(
            f"  stage sum {g_full + ls:.1f} ms vs end-to-end {e2e:.1f} ms "
            f"(scalar-forced geometry would claim {g_scal + ls:.1f})",
            flush=True,
        )

    scene, lib = _flagship_scene()
    scene_rows("default editor scene", scene, lib)
    s2, lib2 = _dense()
    scene_rows("dense sphere field", s2, lib2)


if __name__ == "__main__":
    main()
