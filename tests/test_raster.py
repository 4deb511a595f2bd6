"""Visibility rasterizer vs a brute-force numpy reference."""

import numpy as np
import pytest

from syzygy_tpu.kernels import rasterize, setup_triangles

W, H = 256, 128


def np_reference_raster(tris, width, height):
    """tris: (N, 3, 3) screen-space (x, y, z). Same conventions as the kernel:
    pixel centers +0.5, bary inside test, reverse-Z z >= current, later tri
    wins ties. No culling."""
    depth = np.zeros((height, width), np.float32)
    tri_id = np.full((height, width), -1, np.int32)
    ys, xs = np.mgrid[0:height, 0:width]
    px = xs + 0.5
    py = ys + 0.5
    for t, tri in enumerate(tris):
        (x0, y0, z0), (x1, y1, z1), (x2, y2, z2) = tri
        area2 = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
        if abs(area2) < 1e-12:
            continue
        inv = 1.0 / area2
        b0 = (-(y2 - y1) * px + (x2 - x1) * py + ((y2 - y1) * x1 - (x2 - x1) * y1)) * inv
        b1 = (-(y0 - y2) * px + (x0 - x2) * py + ((y0 - y2) * x2 - (x0 - x2) * y2)) * inv
        b2 = 1.0 - b0 - b1
        z = b0 * z0 + b1 * z1 + b2 * z2
        hit = (b0 >= 0) & (b1 >= 0) & (b2 >= 0) & (z >= depth) & (z <= 1) & (z >= 0)
        depth = np.where(hit, z, depth)
        tri_id = np.where(hit, t, tri_id)
    return depth, tri_id


def min_edge_distance(tris, tri_ids, ys, xs):
    """For each pixel, min |bary| over all triangles' edges (f64) — how close
    the pixel center is to a coverage boundary."""
    out = np.full(len(ys), np.inf)
    px, py = xs + 0.5, ys + 0.5
    for tri in np.asarray(tris, np.float64):
        (x0, y0, _), (x1, y1, _), (x2, y2, _) = tri
        area2 = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
        if abs(area2) < 1e-12:
            continue
        inv = 1.0 / area2
        b0 = (-(y2 - y1) * px + (x2 - x1) * py + ((y2 - y1) * x1 - (x2 - x1) * y1)) * inv
        b1 = (-(y0 - y2) * px + (x0 - x2) * py + ((y0 - y2) * x2 - (x0 - x2) * y2)) * inv
        b2 = 1.0 - b0 - b1
        out = np.minimum(out, np.min(np.abs([b0, b1, b2]), axis=0))
    return out


def assert_raster_matches(vis, tris, ref_depth, ref_tri, edge_tol=1e-4):
    """Exact match away from edges; pixels within edge_tol of a coverage
    boundary may flip (f32 kernel vs f64 reference rounding)."""
    kt = np.asarray(vis.tri)
    diff = kt != ref_tri
    if diff.any():
        ys, xs = np.nonzero(diff)
        dist = min_edge_distance(tris, ref_tri, ys, xs)
        assert (dist < edge_tol).all(), (
            f"{diff.sum()} mismatches, worst edge distance {dist.max()}"
        )
    same = ~diff
    np.testing.assert_allclose(
        np.asarray(vis.depth)[same], ref_depth[same], atol=1e-5
    )


def screen_to_clip(tris_screen, width, height):
    """Inverse of the kernel's viewport transform with w=1 (no perspective)."""
    s = np.asarray(tris_screen, np.float32)
    ndc_x = s[..., 0] / width * 2.0 - 1.0
    ndc_y = s[..., 1] / height * 2.0 - 1.0
    clip = np.stack(
        [ndc_x, ndc_y, s[..., 2], np.ones_like(ndc_x)], axis=-1
    )
    return clip.reshape(-1, 4)


def run_kernel(tris_screen, cull=0):
    clip = screen_to_clip(tris_screen, W, H)
    n = len(tris_screen)
    triangles = np.arange(n * 3, dtype=np.int32).reshape(n, 3)
    setup = setup_triangles(
        clip, triangles, np.ones(n, bool), W, H, cull_keep_sign=cull
    )
    return rasterize(setup, W, H)


def test_single_triangle_coverage_and_depth():
    tris = [[[40.0, 20.0, 0.5], [200.0, 30.0, 0.5], [100.0, 110.0, 0.5]]]
    vis = run_kernel(tris)
    ref_depth, ref_tri = np_reference_raster(np.asarray(tris), W, H)
    assert_raster_matches(vis, tris, ref_depth, ref_tri)
    assert (ref_tri == 0).sum() > 1000  # sanity: it actually drew something


def test_two_triangles_depth_order():
    # Second triangle is nearer (reverse-Z: larger depth) over the overlap
    tris = [
        [[10.0, 10.0, 0.3], [240.0, 10.0, 0.3], [120.0, 120.0, 0.3]],
        [[60.0, 5.0, 0.7], [180.0, 5.0, 0.7], [120.0, 90.0, 0.7]],
    ]
    vis = run_kernel(tris)
    ref_depth, ref_tri = np_reference_raster(np.asarray(tris), W, H)
    assert_raster_matches(vis, tris, ref_depth, ref_tri)
    assert (np.asarray(vis.tri) == 1).any()
    assert (np.asarray(vis.tri) == 0).any()


def test_equal_depth_later_wins():
    tris = [
        [[10.0, 10.0, 0.5], [240.0, 10.0, 0.5], [120.0, 120.0, 0.5]],
        [[10.0, 10.0, 0.5], [240.0, 10.0, 0.5], [120.0, 120.0, 0.5]],
    ]
    vis = run_kernel(tris)
    covered = np.asarray(vis.tri)[np.asarray(vis.tri) >= 0]
    assert (covered == 1).all()  # GREATER_OR_EQUAL: later triangle wins ties


def test_backface_cull_sign():
    # CW on screen (y down) has positive doubled area -> front for gbuffer
    cw = [[[40.0, 20.0, 0.5], [200.0, 30.0, 0.5], [100.0, 110.0, 0.5]]]
    ccw = [[t[0], t[2], t[1]] for t in cw]
    assert (np.asarray(run_kernel(cw, cull=+1).tri) >= 0).any()
    assert not (np.asarray(run_kernel(ccw, cull=+1).tri) >= 0).any()
    # shadow pass keeps the other side
    assert not (np.asarray(run_kernel(cw, cull=-1).tri) >= 0).any()
    assert (np.asarray(run_kernel(ccw, cull=-1).tri) >= 0).any()


def test_bary_reconstructs_position():
    tris = [[[40.0, 20.0, 0.2], [200.0, 30.0, 0.9], [100.0, 110.0, 0.5]]]
    vis = run_kernel(tris)
    tri_np = np.asarray(tris, np.float32)[0]
    mask = np.asarray(vis.tri) == 0
    b0 = np.asarray(vis.b0)[mask]
    b1 = np.asarray(vis.b1)[mask]
    b2 = 1.0 - b0 - b1
    # interpolated x,y must land back on the pixel centers
    ys, xs = np.nonzero(mask)
    ix = b0 * tri_np[0, 0] + b1 * tri_np[1, 0] + b2 * tri_np[2, 0]
    iy = b0 * tri_np[0, 1] + b1 * tri_np[1, 1] + b2 * tri_np[2, 1]
    np.testing.assert_allclose(ix, xs + 0.5, atol=2e-2)
    np.testing.assert_allclose(iy, ys + 0.5, atol=2e-2)


def test_near_clip_no_nans_and_partial_coverage():
    # triangle crossing the w=0 plane: one vertex behind the camera
    clip = np.array(
        [
            [-0.5, -0.5, 0.5, 1.0],
            [0.5, -0.5, 0.5, 1.0],
            [0.0, 0.5, -0.5, -0.5],  # behind
        ],
        np.float32,
    )
    setup = setup_triangles(
        clip, np.array([[0, 1, 2]], np.int32), np.ones(1, bool), W, H, 0
    )
    vis = rasterize(setup, W, H)
    assert np.isfinite(np.asarray(vis.depth)).all()
    assert (np.asarray(vis.tri) >= 0).any()  # front part still drawn


def test_fully_behind_culled():
    clip = np.array(
        [[0.0, 0.0, 0.5, -1.0], [0.5, 0.0, 0.5, -1.0], [0.0, 0.5, 0.5, -2.0]],
        np.float32,
    )
    setup = setup_triangles(
        clip, np.array([[0, 1, 2]], np.int32), np.ones(1, bool), W, H, 0
    )
    vis = rasterize(setup, W, H)
    assert not (np.asarray(vis.tri) >= 0).any()


def test_depth_only_variant():
    tris = [[[40.0, 20.0, 0.5], [200.0, 30.0, 0.5], [100.0, 110.0, 0.5]]]
    clip = screen_to_clip(tris, W, H)
    setup = setup_triangles(
        clip, np.array([[0, 1, 2]], np.int32), np.ones(1, bool), W, H, 0
    )
    vis = rasterize(setup, W, H, depth_only=True)
    ref_depth, _ = np_reference_raster(np.asarray(tris), W, H)
    close = np.isclose(np.asarray(vis.depth), ref_depth, atol=1e-5)
    ys, xs = np.nonzero(~close)
    if len(ys):
        assert (min_edge_distance(tris, None, ys, xs) < 1e-4).all()


def test_many_triangles_multi_chunk():
    # >64 triangles forces multiple chunks; strips across the image
    rng = np.random.default_rng(7)
    n = 150
    tris = []
    for i in range(n):
        cx, cy = rng.uniform(10, W - 10), rng.uniform(10, H - 10)
        pts = rng.uniform(-12, 12, (3, 2)) + [cx, cy]
        z = rng.uniform(0.1, 0.9)
        tris.append([[p[0], p[1], z] for p in pts])
    vis = run_kernel(tris)
    ref_depth, ref_tri = np_reference_raster(np.asarray(tris), W, H)
    assert_raster_matches(vis, tris, ref_depth, ref_tri)


def test_listed_raster_matches_baseline():
    from syzygy_tpu.kernels.raster import rasterize_listed

    rng = np.random.default_rng(11)
    n = 200
    tris = []
    for i in range(n):
        cx, cy = rng.uniform(10, W - 10), rng.uniform(10, H - 10)
        pts = rng.uniform(-15, 15, (3, 2)) + [cx, cy]
        z = rng.uniform(0.1, 0.9)
        tris.append([[p[0], p[1], z] for p in pts])
    clip = screen_to_clip(tris, W, H)
    triangles = np.arange(n * 3, dtype=np.int32).reshape(n, 3)
    setup = setup_triangles(clip, triangles, np.ones(n, bool), W, H, 0)
    vis_a = rasterize(setup, W, H)
    vis_b, dropped = rasterize_listed(setup, W, H, capacity=16)
    assert int(dropped) == 0
    np.testing.assert_array_equal(np.asarray(vis_a.tri), np.asarray(vis_b.tri))
    np.testing.assert_array_equal(np.asarray(vis_a.depth), np.asarray(vis_b.depth))
    np.testing.assert_array_equal(np.asarray(vis_a.b0), np.asarray(vis_b.b0))


def test_listed_raster_reports_overflow():
    from syzygy_tpu.kernels.raster import rasterize_listed

    # 500 triangles all in one tile: chunks-per-tile > capacity 1
    tris = [[[10.0 + i * 0.01, 10.0, 0.5], [40.0, 12.0, 0.5], [20.0, 40.0, 0.5]]
            for i in range(500)]
    clip = screen_to_clip(tris, W, H)
    triangles = np.arange(500 * 3, dtype=np.int32).reshape(500, 3)
    setup = setup_triangles(clip, triangles, np.ones(500, bool), W, H, 0)
    _, dropped = rasterize_listed(setup, W, H, capacity=1)
    assert int(dropped) > 0


def test_dispatch_raster_lossless_on_overflow():
    """An over-capacity scene must render pixel-identical to the full kernel:
    the production dispatcher falls back instead of silently dropping."""
    import dataclasses

    from syzygy_tpu.renderer import RenderConfig
    from syzygy_tpu.renderer.frame import _dispatch_raster

    rng = np.random.default_rng(3)
    n = 500  # 1000 clipped slots -> 16 chunks, all overlapping one tile
    tris = []
    for _ in range(n):
        cx, cy = rng.uniform(10, 100), rng.uniform(10, 50)
        pts = rng.uniform(-8, 8, (3, 2)) + [cx, cy]
        z = rng.uniform(0.1, 0.9)
        tris.append([[p[0], p[1], z] for p in pts])
    clip = screen_to_clip(tris, W, H)
    triangles = np.arange(n * 3, dtype=np.int32).reshape(n, 3)
    setup = setup_triangles(clip, triangles, np.ones(n, bool), W, H, 0)

    cfg_tiny = RenderConfig(width=W, height=H, tile_list_capacity=1)
    cfg_full = RenderConfig(width=W, height=H, tile_list_capacity=0)
    vis_a = _dispatch_raster(setup, W, H, cfg_tiny)
    vis_b = _dispatch_raster(setup, W, H, cfg_full)
    np.testing.assert_array_equal(np.asarray(vis_a.tri), np.asarray(vis_b.tri))
    np.testing.assert_array_equal(
        np.asarray(vis_a.depth), np.asarray(vis_b.depth)
    )
    np.testing.assert_array_equal(np.asarray(vis_a.b0), np.asarray(vis_b.b0))


def test_vector_chunk_equivalence():
    """raster_vector (the no-serial-loop VPU formulation) vs the serial
    chunk loop: the DISCRETE visibility decisions (tri id, and depth — the
    fixture's flat-z triangles make z independent of barycentrics) must be
    bitwise, including equal-z last-wins ties, multi-chunk scenes, and the
    listed kernel. Barycentrics are allowed fma-contraction noise: the
    per-pixel expressions are textually identical, but XLA contracts
    a0 + be0*px + g0*py into fma differently across the two program
    shapes, and the terms cancel (measured <= ~8e-6 absolute — the same
    equivalence class as sky_row_chunks' documented <= 2e-5)."""
    from syzygy_tpu.kernels.raster import rasterize_listed

    rng = np.random.default_rng(13)
    n = 300
    tris = []
    for i in range(n):
        cx, cy = rng.uniform(10, W - 10), rng.uniform(10, H - 10)
        pts = rng.uniform(-14, 14, (3, 2)) + [cx, cy]
        z = rng.uniform(0.05, 0.95)
        tris.append([[p[0], p[1], z] for p in pts])
    # exact-duplicate triangles at several indices: equal-z tie coverage
    for src, dst in [(3, 77), (10, 200), (150, 299)]:
        tris[dst] = tris[src]
    clip = screen_to_clip(tris, W, H)
    triangles = np.arange(n * 3, dtype=np.int32).reshape(n, 3)
    setup = setup_triangles(clip, triangles, np.ones(n, bool), W, H, 0)

    def check(xa, xb, label):
        np.testing.assert_array_equal(
            np.asarray(xa.tri), np.asarray(xb.tri), err_msg=label + " tri"
        )
        np.testing.assert_array_equal(
            np.asarray(xa.depth), np.asarray(xb.depth),
            err_msg=label + " depth",
        )
        for field in ("b0", "b1"):
            np.testing.assert_allclose(
                np.asarray(getattr(xa, field)),
                np.asarray(getattr(xb, field)),
                atol=2e-5, rtol=0, err_msg=label + " " + field,
            )

    a = rasterize(setup, W, H)
    b = rasterize(setup, W, H, vector=True)
    check(a, b, "full")

    da = rasterize(setup, W, H, depth_only=True)
    db = rasterize(setup, W, H, depth_only=True, vector=True)
    np.testing.assert_array_equal(np.asarray(da.depth), np.asarray(db.depth))

    la, dropped_a = rasterize_listed(setup, W, H, capacity=16)
    lb, dropped_b = rasterize_listed(setup, W, H, capacity=16, vector=True)
    assert int(dropped_a) == int(dropped_b) == 0
    check(la, lb, "listed")


def test_setup_and_records_sharded_bitwise():
    """setup_triangles(shard_axis=) and build_resolve_records(shard_axis=)
    claim BITWISE equality with the replicated builds (slot order
    preserved — raster depth-tie order depends on it). Pin every TriSetup
    field and the records table exactly under a CPU shard_map at sp=2 and
    sp=4 (same grid origin on every device, so all copies must equal the
    unsharded result)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P

    from syzygy_tpu.kernels.resolve import (
        build_resolve_records,
        transform_normals,
        transform_positions,
    )
    from syzygy_tpu.scene import (
        default_scene,
        pack_frame_params,
        pack_geometry,
    )
    from syzygy_tpu.scene.pack import prepare_frame_state

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")

    scene, library = default_scene()
    scene.tick(0.0)
    geometry = pack_geometry(scene, library)
    state = prepare_frame_state(pack_frame_params(scene, 2.0))
    proj_view = state.camera.projection @ state.camera.view
    clip, world = transform_positions(
        geometry.positions, geometry.vert_instance, state.models, proj_view
    )
    normals = transform_normals(
        geometry.normals, geometry.vert_instance, state.model_inv_transpose
    )

    def build(shard_axis=None):
        setup = setup_triangles(
            clip,
            geometry.triangles,
            geometry.tri_valid,
            256,
            128,
            cull_keep_sign=+1,
            shard_axis=shard_axis,
        )
        records = build_resolve_records(
            setup, geometry, world, normals, shard_axis=shard_axis
        )
        return (*setup, records)

    ref = [np.asarray(x) for x in build()]

    for sp in (2, 4):
        mesh = Mesh(np.asarray(jax.devices()[:sp]).reshape(sp), ("sp",))
        out = jax.shard_map(
            lambda: build(shard_axis="sp"),
            mesh=mesh,
            in_specs=(),
            out_specs=P(),
            check_vma=False,
        )()
        for name, r, o in zip(
            ("coeffs", "orig_tri", "corner_bary", "corner_w", "chunk_mask",
             "records"),
            ref,
            out,
        ):
            np.testing.assert_array_equal(
                r, np.asarray(o), err_msg=f"sp={sp} {name}"
            )
