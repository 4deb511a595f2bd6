"""Round-5 diagnosis: WHERE does the sp=1 sharded 1.9x go? (default 1080p)

r5b measured split-sharded == mono-sharded == 229 ms vs staged 119 — so
program partitioning is NOT the penalty. Variants, one device, all the
same per-device math:

  V0 staged     : render_frame_packed (the production single-chip path)
  V1 rows-mono  : render_frame_rows jitted directly — one fused program,
                  NO shard_map, static row0=0 (this is entry()'s fn)
  V2 rows-traced: V1 with row0 passed as a TRACED scalar (isolates the
                  dynamic-slice row origin)
  V3 sharded    : render_frames_sharded (split, B=1 direct — no vmap)
  V4 sharded-nosetup: V3 with shard_triangle_setup=False (isolates the
                  sp=1 identity all_gathers of setup slots + records)

Reading: V1 vs V0 = mono-program cost without shard_map; V2-V1 = traced
origin; V3 vs V1/V2 = shard_map wrapper itself; V3-V4 = setup collectives.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _measure_chained(frame_scalar_fn, n=24, group=8, label=""):
    from measure import measure_chained

    return measure_chained(frame_scalar_fn, n=n, group=group, label=label)


def main() -> None:
    from bench import _flagship_scene, _wait_healthy

    assert _wait_healthy(), "device unavailable"
    import jax
    import jax.numpy as jnp

    import syzygy_tpu.parallel.sharding as sharding_mod
    from syzygy_tpu.parallel import (
        batch_params,
        make_mesh,
        render_frames_sharded,
        replicate_to_mesh,
    )
    from syzygy_tpu.renderer import RenderConfig
    from syzygy_tpu.renderer.frame import (
        render_frame_packed,
        render_frame_rows,
    )
    from syzygy_tpu.runtime import place_on_accelerator
    from syzygy_tpu.scene import (
        flatten_frame_params,
        frame_param_spec,
        pack_frame_params,
        pack_geometry,
        unflatten_frame_params,
    )

    results = {"session": time.strftime("%Y-%m-%d %H:%M")}
    cfg = RenderConfig(width=1920, height=1080)
    scene, library = _flagship_scene()
    geometry = place_on_accelerator(pack_geometry(scene, library))
    params = pack_frame_params(scene, cfg.width / cfg.height)
    spec = frame_param_spec(params)
    flat = place_on_accelerator(
        jnp.asarray(
            flatten_frame_params(params, spec, np.empty(spec.total, np.float32))
        )
    )
    mesh = make_mesh(dp=1, sp=1)
    geo_m = replicate_to_mesh(geometry, mesh)
    batch_dev = replicate_to_mesh(batch_params([params]), mesh)

    tail = jax.jit(lambda img: jnp.sum(img) * 1e-30)
    pert_flat = jax.jit(lambda f, s: f.at[0].add(jnp.minimum(s * 1e-30, 0.0)))

    def perturb_batch(b, s):
        return b._replace(
            cam_position=b.cam_position + jnp.minimum(s * 1e-30, 0.0)
        )

    pert_batch = jax.jit(perturb_batch)

    rows = cfg.padded_height

    @jax.jit
    def rows_mono(f):
        p = unflatten_frame_params(spec, f)
        return render_frame_rows(geometry, p, cfg, 0, rows)

    @jax.jit
    def rows_traced(f, r0):
        p = unflatten_frame_params(spec, f)
        return render_frame_rows(geometry, p, cfg, r0, rows)

    def v0(prev):
        return tail(render_frame_packed(geometry, pert_flat(flat, prev), spec, cfg))

    def v1(prev):
        return tail(rows_mono(pert_flat(flat, prev)))

    def v2(prev):
        return tail(rows_traced(pert_flat(flat, prev), jnp.int32(0)))

    def v3(prev):
        return tail(render_frames_sharded(geo_m, pert_batch(batch_dev, prev), cfg, mesh))

    cfg_ns = dataclasses.replace(cfg, shard_triangle_setup=False)

    def v4(prev):
        return tail(render_frames_sharded(geo_m, pert_batch(batch_dev, prev), cfg_ns, mesh))

    legs = []
    for name, fn in (
        ("V0_staged", v0), ("V1_rows_mono", v1), ("V2_rows_traced", v2),
        ("V3_sharded", v3), ("V4_sharded_nosetup", v4),
        ("V0_staged", v0), ("V3_sharded", v3),
    ):
        try:
            legs.append({"v": name, "ms": round(
                _measure_chained(fn, n=24, group=8, label=name), 2)})
        except Exception as e:
            legs.append({"v": name, "error": f"{type(e).__name__}: {str(e)[:150]}"})
            if not _wait_healthy(attempts=12):
                break
    results["legs"] = legs
    with open("/tmp/r5c_session.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
