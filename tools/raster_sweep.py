"""Dense-scene raster parameter sweep on the real TPU (one batched session).

Honest timing on this tunnel (CLAUDE.md item 7): block_until_ready acks
early, so each measured call CONSUMES the previous call's output (a real
data dependency forces sequential device execution), and one scalar fetch
at the end bounds the tail. ms/call = (loop + fetch - fetch_latency) / n.

Usage: python tools/raster_sweep.py [n_spheres] [configs...]
Env: SZG_SWEEP_SORT=0 disables the pack-time Morton sort (for A/B).
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

    if os.environ.get("SZG_SWEEP_CPU") == "1":  # validation runs off-TPU
        jax.config.update("jax_platforms", "cpu")

    from syzygy_tpu.assets import (
        TextureLibrary,
        register_default_textures,
        sphere_mesh,
    )
    from syzygy_tpu.kernels.raster import (
        build_tile_lists,
        rasterize,
        rasterize_listed,
        setup_triangles,
    )
    from syzygy_tpu.math.geometry import eulers_from_forward
    from syzygy_tpu.runtime import place_on_accelerator
    from syzygy_tpu.scene import (
        Scene,
        TransformHost,
        pack_frame_params,
        pack_geometry,
    )
    from syzygy_tpu.scene.pack import prepare_frame_state
    from syzygy_tpu.kernels.resolve import transform_positions

    if not wait_healthy():
        print("DEVICE UNAVAILABLE", flush=True)
        sys.exit(1)

    W, H = 1920, 1088  # tile-multiple padded height
    n_spheres = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    spatial_sort = os.environ.get("SZG_SWEEP_SORT", "1") != "0"

    # dense sphere field (the docs/BENCHMARKS.md stress scene)
    s = Scene()
    lib = TextureLibrary()
    mat = register_default_textures(lib)
    mesh = sphere_mesh(mat, rings=32, segments=64)
    side = int(np.ceil(np.sqrt(n_spheres)))
    transforms = [
        TransformHost.make(
            (8.0 * (i % side) - 4.0 * side, -6.0, 8.0 * (i // side) - 4.0 * side)
        )
        for i in range(n_spheres)
    ]
    s.add_mesh_instance(mesh, "spheres", transforms)
    s.tick(0.0)
    eye = np.array([18.0, -16.0, -22.0], np.float32)
    target = np.array([0.0, -6.0, 0.0], np.float32)
    s.camera.position = tuple(eye)
    s.camera.euler_angles = tuple(np.asarray(eulers_from_forward(target - eye)))

    n_tris = n_spheres * mesh.triangles.shape[0]
    print(f"scene: {n_tris} triangles, morton={spatial_sort}", flush=True)

    geo = place_on_accelerator(pack_geometry(s, lib, spatial_sort=spatial_sort))
    params = pack_frame_params(s, W / H)

    @jax.jit
    def make_setup_args(geometry, params):
        state = prepare_frame_state(params)
        proj_view = state.camera.projection @ state.camera.view
        clip, _ = transform_positions(
            geometry.positions, geometry.vert_instance, state.models, proj_view
        )
        return clip

    clip = jax.block_until_ready(make_setup_args(geo, params))

    def fetch(x):
        return float(np.asarray(jax.device_get(x)).reshape(-1)[0])

    # fetch latency estimate (subtracted from chain totals)
    small = jax.jit(lambda x: x + 1)(jnp.zeros((1,)))
    jax.block_until_ready(small)
    t0 = time.perf_counter()
    fetch(small)
    fetch_s = time.perf_counter() - t0
    print(f"fetch latency ~{fetch_s * 1000:.0f} ms", flush=True)

    def timed_chain(name, fn, n=30):
        """fn(prev_scalar) -> next_scalar (inside ONE jit program, derived
        from the measured computation's output); chained by data dependency
        so the device must run the n programs sequentially."""
        prev = jnp.zeros((), jnp.float32)
        prev = jax.block_until_ready(fn(prev))  # compile+warm
        t0 = time.perf_counter()
        for _ in range(n):
            prev = fn(prev)
        v = fetch(prev)
        dt = (time.perf_counter() - t0 - fetch_s) / n * 1000
        print(f"  {name}: {dt:9.3f} ms  (chk {v})", flush=True)
        return dt

    # exact binning-quality oracle: the C++ binner (native.bin_triangles)
    # computes true per-tile TRIANGLE counts from the screen bboxes — the
    # lower bound the chunk-granularity lists approximate. One D2H of the
    # bbox array (tooling only; production binning stays on device).
    try:
        from syzygy_tpu import native

        if native.available():
            @jax.jit
            def bboxes_fn(clip, tris, tvalid):
                st = setup_triangles(clip, tris, tvalid, W, H, +1)
                c = st.coeffs
                # reconstruct conservative pixel bboxes from the packed tile
                # ranges (cols 10/11): enough for binning-quality stats
                tx0 = jnp.floor(c[:, 10] / 4096.0)
                tx1 = c[:, 10] - tx0 * 4096.0
                ty0 = jnp.floor(c[:, 11] / 4096.0)
                ty1 = c[:, 11] - ty0 * 4096.0
                from syzygy_tpu.kernels.raster import TILE_H, TILE_W
                bb = jnp.stack(
                    [tx0 * TILE_W, ty0 * TILE_H, tx1 * TILE_W, ty1 * TILE_H],
                    axis=-1,
                )
                return bb, c[:, 9] > 0
            bb, valid = jax.device_get(
                bboxes_fn(clip, geo.triangles, geo.tri_valid)
            )
            counts, _, dropped = native.bin_triangles(
                bb, valid.astype(np.uint8), W // 128, H // 64, 128, 64,
                capacity=8192,
            )
            assert dropped == 0, "raise oracle capacity"
            print(
                f"  exact binner oracle (64x128 tiles): tris/tile "
                f"max={counts.max()} mean={counts.mean():.1f} "
                f"(listed-raster work is ~chunk-granular upper bound)",
                flush=True,
            )
    except Exception as e:
        print(f"  binner oracle unavailable: {e}", flush=True)

    results = {}

    # --- setup_triangles cost (shared by all variants) ---
    # NOTE: device-resident arrays (clip, geo.*) must be explicit jit args —
    # closure capture embeds them as constants and each one costs a ~30 s
    # device->host fetch at lowering through this tunnel (CLAUDE.md item 3).
    def setup_fn(th, tw, ck):
        @jax.jit
        def f(clip, tris, tvalid, eps):
            c2 = clip.at[0, 0].add(eps)
            st = setup_triangles(
                c2,
                tris,
                tvalid,
                W,
                H,
                +1,
                tile_h=th,
                tile_w=tw,
                chunk=ck,
            )
            return jnp.minimum(st.coeffs[0, 0] * 1e-30, 0.0)
        return lambda eps: f(clip, geo.triangles, geo.tri_valid, eps)

    # --- sweep configs: (tile_h, tile_w, chunk, cap) ---
    default_cfgs = [
        (64, 128, 64, 448),
        (64, 128, 32, 448),
        (32, 128, 32, 256),
        (32, 128, 16, 256),
        (16, 128, 16, 128),
        (16, 128, 32, 128),
        (8, 128, 16, 64),
        (8, 256, 16, 32),
    ]
    if len(sys.argv) > 2:
        default_cfgs = [tuple(map(int, a.split(","))) for a in sys.argv[2:]]

    for th, tw, ck, cap in default_cfgs:
        tiles = (H // th) * (W // tw) if W % tw == 0 else None
        if tiles is None or tiles * (cap + 1) * 4 > 512 * 1024:
            print(f"  skip ({th}x{tw} c{ck} cap{cap}): SMEM", flush=True)
            continue
        try:
            @jax.jit
            def stats_fn(clip, tris, tvalid, th=th, tw=tw, ck=ck, cap=cap):
                st = setup_triangles(
                    clip, tris, tvalid, W, H, +1,
                    tile_h=th, tile_w=tw, chunk=ck,
                )
                return build_tile_lists(st, cap, ck)

            table, counts, dropped = stats_fn(
                clip, geo.triangles, geo.tri_valid
            )
            cts = np.asarray(jax.device_get(counts))
            drp = int(jax.device_get(dropped))
            print(
                f"  ({th}x{tw} c{ck} cap{cap}): counts max={cts.max()} "
                f"mean={cts.mean():.1f} dropped={drp}",
                flush=True,
            )

            @jax.jit
            def raster_jit(clip, tris, tvalid, eps, th=th, tw=tw, ck=ck, cap=cap):
                c2 = clip.at[0, 0].add(eps)
                st = setup_triangles(
                    c2, tris, tvalid, W, H, +1,
                    tile_h=th, tile_w=tw, chunk=ck,
                )
                vis, _ = rasterize_listed(
                    st, W, H, capacity=cap, tile_h=th, tile_w=tw, chunk=ck
                )
                return jnp.minimum(vis.depth[0, 0] * 1e-30, 0.0)

            def raster_fn(eps):
                return raster_jit(clip, geo.triangles, geo.tri_valid, eps)

            dt = timed_chain(f"setup+lists+raster {th}x{tw} c{ck} cap{cap}", raster_fn)
            results[(th, tw, ck, cap)] = dt
        except Exception as e:
            print(f"  FAIL ({th}x{tw} c{ck} cap{cap}): {type(e).__name__}: {str(e)[:200]}", flush=True)
            if not wait_healthy():
                print("DEVICE LOST", flush=True)
                return

    # isolate setup-only cost at the best config
    if results:
        best = min(results, key=results.get)
        th, tw, ck, cap = best
        f = setup_fn(th, tw, ck)
        timed_chain(f"setup_triangles only {th}x{tw} c{ck}", f)
        print(f"BEST: {best} -> {results[best]:.3f} ms", flush=True)
    print("sweep complete", flush=True)


if __name__ == "__main__":
    main()
