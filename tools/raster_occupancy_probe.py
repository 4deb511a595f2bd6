"""In-kernel occupancy analysis for the dense-scene rasters (VERDICT r3 #3).

CPU-only and exact: the listed raster's work decomposes into
  * chunk ITERATIONS: per (tile, chunk-in-list) grid step — a 3 KB coeff DMA
    + a SERIAL 64-step scalar fori_loop (two scalar VMEM loads + a bbox
    compare per step),
  * full-tile vector EVALS: triangles whose packed tile bbox touches the
    tile (the `pl.when(touches)` body: 2 barycentric planes + z + depth
    test over tile_h x tile_w lanes).

Both counts are computable exactly on host from setup_triangles' outputs
(coeffs cols 10/11 hold each triangle's tile bbox; build_tile_lists gives
per-tile chunk counts). Combined with the honest device stage times of the
two dense rasters (camera ~65 ms, sun shadow ~106 ms — different grids,
different mixes), the two-raster system pins down what a per-tile
compacted TRIANGLE list (100% occupancy, iterations = ceil(evals/64))
could save vs the current chunk lists BEFORE building anything.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from syzygy_tpu.kernels.raster import (  # noqa: E402
    build_tile_lists,
    setup_triangles,
)
from syzygy_tpu.renderer import RenderConfig  # noqa: E402
from syzygy_tpu.renderer.frame import _shadow_pass  # noqa: E402
from syzygy_tpu.kernels.resolve import transform_positions  # noqa: E402
from syzygy_tpu.scene import pack_frame_params, pack_geometry  # noqa: E402
from syzygy_tpu.scene.pack import prepare_frame_state  # noqa: E402
from tools.dense_depth_probe import _dense  # noqa: E402

_TILE_PACK = 4096.0


def analyze(name, setup, tiles_y, tiles_x, cap, chunk=64):
    coeffs = np.asarray(setup.coeffs)
    valid = coeffs[:, 9] > 0
    # unpack per-triangle tile bbox (cols 10/11: t0 * 4096 + (t1 + 1))
    tx0 = np.floor(coeffs[:, 10] / _TILE_PACK)
    ty0 = np.floor(coeffs[:, 11] / _TILE_PACK)
    tx1p = coeffs[:, 10] - tx0 * _TILE_PACK  # exclusive
    ty1p = coeffs[:, 11] - ty0 * _TILE_PACK
    # clip to the grid; invalid slots encode an empty range
    tx0 = np.clip(tx0, 0, tiles_x)
    ty0 = np.clip(ty0, 0, tiles_y)
    tx1p = np.clip(tx1p, 0, tiles_x)
    ty1p = np.clip(ty1p, 0, tiles_y)
    spans_x = np.maximum(tx1p - tx0, 0)
    spans_y = np.maximum(ty1p - ty0, 0)
    evals = spans_x * spans_y  # tiles each triangle's bbox touches

    # per-tile eval counts (exact): accumulate each triangle's tile-bbox
    per_tile = np.zeros((tiles_y, tiles_x), np.int64)
    for t in np.nonzero(evals > 0)[0]:
        per_tile[
            int(ty0[t]) : int(ty1p[t]), int(tx0[t]) : int(tx1p[t])
        ] += 1

    # span histogram: a per-tile compacted TRIANGLE list would store one
    # entry per (triangle, touched tile) pair; triangles spanning many
    # tiles (the floor plane spans ALL of them) need a separate big-tri
    # path, so their count bounds that tail.
    spans = (spans_x * spans_y).astype(np.int64)
    for bound in (0, 1, 2, 4):
        n = int(((spans > bound) & valid).sum())
        print(f"  valid tris with span > {bound:3d}: {n}")
    big = (spans > 1) & valid
    print(
        f"  evals from span<=1 tris: {int(evals[valid & ~big].sum())}, "
        f"from span>1: {int(evals[big].sum())}"
    )

    table, counts, dropped = jax.jit(
        build_tile_lists, static_argnames=("capacity", "chunk")
    )(setup, capacity=cap, chunk=chunk)
    counts = np.asarray(counts)
    iters = int(counts.sum())
    total_evals = int(per_tile.sum())
    ideal_iters = int(np.ceil(per_tile / chunk).sum())
    n_valid = int(valid.sum())
    print(f"== {name} ({tiles_y}x{tiles_x} tiles, chunk {chunk}) ==")
    print(f"  valid clipped tris   : {n_valid}")
    print(f"  chunk iterations     : {iters} (grid axis = per-tile list)")
    print(f"  serial scalar steps  : {iters * chunk}")
    print(f"  full-tile evals      : {total_evals}")
    print(
        f"  eval occupancy       : {total_evals / max(iters * chunk, 1):.3f}"
        " (evals per scalar step)"
    )
    print(
        f"  ideal tri-list iters : {ideal_iters} "
        f"({iters / max(ideal_iters, 1):.2f}x fewer grid steps if compacted)"
    )
    print(
        f"  per-tile evals       : max {per_tile.max()}, "
        f"median {int(np.median(per_tile))}, "
        f"p90 {int(np.percentile(per_tile, 90))}"
    )
    print(
        f"  per-tile chunk count : max {counts.max()}, "
        f"median {int(np.median(counts))}, cap {cap}, "
        f"dropped {int(dropped)}"
    )
    return {
        "iters": iters,
        "evals": total_evals,
        "ideal_iters": ideal_iters,
        "tiles": tiles_y * tiles_x,
    }


def main():
    scene, lib = _dense()
    config = RenderConfig(width=1920, height=1080, n_shadow_maps=4)
    geometry = pack_geometry(scene, lib)
    params = pack_frame_params(scene, config.width / config.height)
    state = prepare_frame_state(params)
    proj_view = state.camera.projection @ state.camera.view
    clip, world = transform_positions(
        geometry.positions, geometry.vert_instance, state.models, proj_view
    )

    # camera raster: 1920x1088 grid
    setup_cam = setup_triangles(
        clip,
        geometry.triangles,
        geometry.tri_valid,
        config.render_width,
        config.render_height,
        cull_keep_sign=+1,
        tile_h=config.raster_tile_h,
        tile_w=config.raster_tile_w,
        chunk=config.raster_chunk,
        grid_width=config.padded_width,
        grid_height=config.padded_height,
    )
    cam = analyze(
        "camera raster",
        setup_cam,
        config.padded_height // config.raster_tile_h,
        config.padded_width // config.raster_tile_w,
        cap=config.tile_list_capacity,
        chunk=config.raster_chunk,
    )

    # sun shadow raster: world corners through the sun's projView
    world_h = jnp.concatenate(
        [world, jnp.ones((world.shape[0], 1), jnp.float32)], axis=-1
    )
    d = state.directional_lights
    sun_pv = d.projection[0] @ d.view[0]
    corners_world = world_h[geometry.triangles]
    corner_clip = jnp.einsum("tcj,ij->tci", corners_world, sun_pv)
    setup_sun = setup_triangles(
        None,
        geometry.triangles,
        geometry.tri_valid & geometry.tri_casts_shadow,
        config.shadow_dim,
        config.shadow_dim,
        cull_keep_sign=-1,
        tile_h=config.raster_tile_h,
        tile_w=config.raster_tile_w,
        chunk=config.raster_chunk,
        corner_clip=corner_clip,
    )
    sun = analyze(
        "sun shadow raster",
        setup_sun,
        config.shadow_dim // config.raster_tile_h,
        config.shadow_dim // config.raster_tile_w,
        cap=config.tile_list_capacity,
        chunk=config.raster_chunk,
    )

    # Two-raster cost model: t = a * iterations + b * evals (+ fixed).
    # Honest device stage times (tools/geom_budget_probe.py, r6 session):
    # camera raster ~65 ms, sun shadow raster ~106 ms (but the shadow time
    # covers 2 active lights' rasters + setup; treat per-light ~53 ms).
    # Solve for (a, b) and report the implied split.
    import numpy.linalg as la

    A = np.array(
        [[cam["iters"], cam["evals"]], [sun["iters"], sun["evals"]]],
        np.float64,
    )
    t = np.array([65.0, 53.0])  # ms
    try:
        ab = la.solve(A, t)
        print("\n== implied cost split (ms): t = a*iters + b*evals ==")
        print(
            f"  a (per chunk-iteration) = {ab[0] * 1e6:.1f} ns, "
            f"b (per full-tile eval) = {ab[1] * 1e6:.1f} ns"
        )
        for n, r, ms in (("camera", cam, 65.0), ("sun", sun, 53.0)):
            print(
                f"  {n}: iterations {ab[0] * r['iters']:.1f} ms + "
                f"evals {ab[1] * r['evals']:.1f} ms (measured {ms})"
            )
            print(
                f"  {n} ideal tri-list bound: "
                f"{ab[0] * r['ideal_iters'] + ab[1] * r['evals']:.1f} ms"
            )
    except la.LinAlgError:
        print("singular system; report counts only")


if __name__ == "__main__":
    main()
