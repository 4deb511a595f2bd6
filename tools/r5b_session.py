"""Round-5 follow-up TPU session: the SPLIT sharded frame at (dp=1, sp=1).

tools/r5_session.py measured the one-program sharded formulation at 1.9x
the staged single-chip path (228 vs 119 ms — the mono-program penalty).
render_frames_sharded is now two chained shard_map programs; this session
measures the REAL shard_map overhead of the production formulation:

  * 512x256 equality sanity (sharded vs staged, u8 bitwise expected)
  * 1080p BABA: split-sharded sp=1 vs staged single-chip (default scene)
  * same BABA on the dense 254k-tri field (the scene where the sharded
    O(T) setup/records all_gathers matter) — measures their sp=1 cost

The sp=1 delta + the measured per-stage decomposition feed the Amdahl
multi-chip model (docs/BENCHMARKS.md round-11).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _perturb(params, s):
    from measure import perturb_params

    return perturb_params(params, s)


def _measure_chained(frame_scalar_fn, n=24, group=8, label=""):
    from measure import measure_chained

    return measure_chained(frame_scalar_fn, n=n, group=group, label=label)


def _dense_scene():
    from syzygy_tpu.assets import (
        TextureLibrary,
        register_default_textures,
        sphere_mesh,
    )
    from syzygy_tpu.math.geometry import eulers_from_forward
    from syzygy_tpu.scene import Scene, TransformHost

    dense = Scene()
    dlib = TextureLibrary()
    mat = register_default_textures(dlib)
    mesh = sphere_mesh(mat, rings=32, segments=64)
    side = 8
    dense.add_mesh_instance(
        mesh,
        "spheres",
        [
            TransformHost.make(
                (8.0 * (i % side) - 4.0 * side, -6.0, 8.0 * (i // side) - 4.0 * side)
            )
            for i in range(64)
        ],
    )
    dense.tick(0.0)
    eye = np.array([18.0, -16.0, -22.0], np.float32)
    target = np.array([0.0, -6.0, 0.0], np.float32)
    dense.camera.position = tuple(eye)
    dense.camera.euler_angles = tuple(
        np.asarray(eulers_from_forward(target - eye))
    )
    return dense, dlib


def probe_scene(scene, library, label, results):
    import jax
    import jax.numpy as jnp

    from syzygy_tpu.parallel import (
        batch_params,
        make_mesh,
        render_frames_sharded,
        replicate_to_mesh,
    )
    from syzygy_tpu.renderer import RenderConfig
    from syzygy_tpu.renderer.frame import render_frame_packed
    from syzygy_tpu.runtime import place_on_accelerator
    from syzygy_tpu.scene import (
        flatten_frame_params,
        frame_param_spec,
        pack_frame_params,
        pack_geometry,
    )

    mesh = make_mesh(dp=1, sp=1)
    cfg = RenderConfig(width=1920, height=1080)
    geometry = place_on_accelerator(pack_geometry(scene, library))
    params = pack_frame_params(scene, cfg.width / cfg.height)
    spec = frame_param_spec(params)
    flat = place_on_accelerator(
        jnp.asarray(
            flatten_frame_params(params, spec, np.empty(spec.total, np.float32))
        )
    )
    geo_m = replicate_to_mesh(geometry, mesh)
    batch_dev = replicate_to_mesh(batch_params([params]), mesh)

    tail = jax.jit(lambda img: jnp.sum(img) * 1e-30)
    pert_flat = jax.jit(lambda f, s: f.at[0].add(jnp.minimum(s * 1e-30, 0.0)))
    pert_batch = jax.jit(_perturb)

    def single(prev):
        f = pert_flat(flat, prev)
        return tail(render_frame_packed(geometry, f, spec, cfg))

    def sharded(prev):
        b = pert_batch(batch_dev, prev)
        return tail(render_frames_sharded(geo_m, b, cfg, mesh))

    legs = []
    for name, fn in (
        ("split", sharded), ("single", single),
        ("split", sharded), ("single", single),
    ):
        legs.append({
            "path": name,
            "ms": round(_measure_chained(fn, n=24, group=8,
                                         label=f"{label}:{name}"), 2),
        })
    results[label] = legs


def main() -> None:
    from bench import _flagship_scene, _wait_healthy

    results = {"session": time.strftime("%Y-%m-%d %H:%M")}
    assert _wait_healthy(), "device unavailable"

    # small equality sanity first
    import jax

    from syzygy_tpu.parallel import (
        batch_params,
        make_mesh,
        render_frames_sharded,
        replicate_to_mesh,
    )
    from syzygy_tpu.renderer import RenderConfig
    from syzygy_tpu.renderer.frame import render_frame_packed
    from syzygy_tpu.runtime import fetch_frame_u8, place_on_accelerator
    from syzygy_tpu.scene import (
        flatten_frame_params,
        frame_param_spec,
        pack_frame_params,
        pack_geometry,
    )

    scene, library = _flagship_scene()
    cfg_s = RenderConfig(
        width=512, height=256, n_shadow_maps=4, shadow_dim=512,
        skyview_width=512, skyview_height=256,
    )
    geometry = place_on_accelerator(pack_geometry(scene, library))
    params = pack_frame_params(scene, cfg_s.width / cfg_s.height)
    spec = frame_param_spec(params)
    flat = flatten_frame_params(params, spec, np.empty(spec.total, np.float32))
    img_single = fetch_frame_u8(render_frame_packed(geometry, flat, spec, cfg_s))
    mesh = make_mesh(dp=1, sp=1)
    img_shard = fetch_frame_u8(
        render_frames_sharded(
            replicate_to_mesh(geometry, mesh),
            batch_params([params]), cfg_s, mesh,
        )[0]
    )
    d = np.abs(img_single.astype(np.int32) - img_shard.astype(np.int32))
    results["equality_512x256"] = {
        "max_lsb": int(d.max()), "mean_lsb": float(d.mean()),
    }
    print(f"split sp=1 equality: {results['equality_512x256']}", flush=True)

    try:
        scene, library = _flagship_scene()
        probe_scene(scene, library, "default_1080p", results)
    except Exception as e:
        results["default_1080p"] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
        _wait_healthy()
    try:
        dense, dlib = _dense_scene()
        probe_scene(dense, dlib, "dense_1080p", results)
    except Exception as e:
        results["dense_1080p"] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}

    with open("/tmp/r5b_session.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
