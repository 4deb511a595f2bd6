"""G-buffer resolve: perspective-correct interpolation, texturing, normals."""

import jax.numpy as jnp
import numpy as np
import pytest

from syzygy_tpu.kernels.raster import rasterize, setup_triangles
from syzygy_tpu.kernels.resolve import (
    resolve_gbuffer,
    sample_bilinear_repeat,
    transform_normals,
    transform_positions,
)
from syzygy_tpu.scene.pack import GeometryStatic

W, H = 128, 128


def quad_geometry(z_near=2.0, z_far=6.0, checker_size=8):
    """A quad tilted in depth: left edge at z_near, right edge at z_far."""
    positions = np.array(
        [
            [-1.0, -1.0, z_near],
            [1.0, -1.0, z_far],
            [1.0, 1.0, z_far],
            [-1.0, 1.0, z_near],
        ],
        np.float32,
    )
    normals = np.tile([[0.0, 0.0, -1.0]], (4, 1)).astype(np.float32)
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    colors = np.ones((4, 4), np.float32)
    triangles = np.array([[0, 1, 2], [0, 2, 3]], np.int32)

    # checkerboard texture
    s = 64
    yy, xx = np.mgrid[0:s, 0:s]
    check = (((xx // checker_size) + (yy // checker_size)) % 2).astype(np.float32)
    tex = np.stack([check, check, check, np.ones_like(check)], -1)

    geo = GeometryStatic(
        positions=jnp.asarray(positions),
        normals=jnp.asarray(normals),
        uvs=jnp.asarray(uvs),
        colors=jnp.asarray(colors),
        vert_instance=jnp.zeros(4, jnp.int32),
        triangles=jnp.asarray(triangles),
        tri_material=jnp.zeros(2, jnp.int32),
        tri_valid=jnp.ones(2, bool),
        tri_casts_shadow=jnp.ones(2, bool),
        materials=jnp.zeros((1, 3), jnp.int32),
        tex_atlas=jnp.asarray(tex),
        tex_rects=jnp.asarray([[0, 0, s, s]], jnp.int32),
    )
    return geo, positions


def perspective_proj():
    from syzygy_tpu.math.geometry import perspective_vk

    return np.asarray(perspective_vk(90.0, 1.0, 0.1, 100.0))


def test_perspective_correct_world_position():
    geo, positions = quad_geometry()
    proj = perspective_proj()
    models = jnp.eye(4)[None]
    clip, world = transform_positions(
        geo.positions, geo.vert_instance, models, jnp.asarray(proj)
    )
    setup = setup_triangles(clip, geo.triangles, geo.tri_valid, W, H, 0)
    vis = rasterize(setup, W, H)
    wn = transform_normals(geo.normals, geo.vert_instance, models)
    gb = resolve_gbuffer(vis, setup, geo, world, wn)

    covered = np.asarray(vis.tri) >= 0
    assert covered.mean() > 0.05  # small projected trapezoid
    wp = np.asarray(gb.world_position)[..., :3]
    # reproject interpolated world positions: must land on their pixel center
    ys, xs = np.nonzero(covered)
    pts = np.concatenate([wp[ys, xs], np.ones((len(ys), 1), np.float32)], -1)
    clip_r = pts @ proj.T
    ndc = clip_r[:, :2] / clip_r[:, 3:4]
    px = (ndc[:, 0] * 0.5 + 0.5) * W
    py = (ndc[:, 1] * 0.5 + 0.5) * H
    np.testing.assert_allclose(px, xs + 0.5, atol=0.05)
    np.testing.assert_allclose(py, ys + 0.5, atol=0.05)
    # depth covers the configured range (perspective-correct z span)
    z = wp[ys, xs, 2]
    assert z.min() > 1.9 and z.max() < 6.1


def test_texture_checker_frequency_compresses_with_depth():
    # perspective correctness: checker squares are wider on the near side
    geo, _ = quad_geometry()
    proj = perspective_proj()
    models = jnp.eye(4)[None]
    clip, world = transform_positions(
        geo.positions, geo.vert_instance, models, jnp.asarray(proj)
    )
    setup = setup_triangles(clip, geo.triangles, geo.tri_valid, W, H, 0)
    vis = rasterize(setup, W, H)
    wn = transform_normals(geo.normals, geo.vert_instance, models)
    gb = resolve_gbuffer(vis, setup, geo, world, wn)
    covered = np.asarray(vis.tri) >= 0
    row = H // 2
    diffuse_row = np.asarray(gb.diffuse)[row, :, 0]
    mask_row = covered[row]
    xs = np.nonzero(mask_row)[0]
    vals = diffuse_row[xs] > 0.5
    # count transitions in near half vs far half of the covered span
    half = len(xs) // 2
    trans_near = int(np.sum(vals[1:half] != vals[: half - 1]))
    trans_far = int(np.sum(vals[half + 1 :] != vals[half:-1]))
    assert trans_far > trans_near  # more squares per pixel farther away


def test_normal_mapping_flat_map_keeps_vertex_normal():
    geo, _ = quad_geometry()
    # flat normal texture (0.5, 0.5, 1) unsigned
    flat = np.zeros((64, 64, 4), np.float32)
    flat[..., 0] = 127 / 255
    flat[..., 1] = 127 / 255
    flat[..., 2] = 1.0
    geo = geo._replace(
        tex_atlas=jnp.asarray(flat),
        tex_rects=jnp.asarray([[0, 0, 64, 64]], jnp.int32),
    )
    proj = perspective_proj()
    models = jnp.eye(4)[None]
    clip, world = transform_positions(
        geo.positions, geo.vert_instance, models, jnp.asarray(proj)
    )
    setup = setup_triangles(clip, geo.triangles, geo.tri_valid, W, H, 0)
    vis = rasterize(setup, W, H)
    wn = transform_normals(geo.normals, geo.vert_instance, models)
    gb = resolve_gbuffer(vis, setup, geo, world, wn)
    covered = np.asarray(vis.tri) >= 0
    n = np.asarray(gb.normal)[..., :3][covered]
    # flat tangent-space normal -> perturbed == geometric normal (0,0,-1)
    np.testing.assert_allclose(n[:, 2], -1.0, atol=2e-2)


def test_bilinear_repeat_wraps():
    tex = np.zeros((4, 4, 4), np.float32)
    tex[0, 0] = 1.0  # single bright texel
    textures = jnp.asarray(tex)[None]
    ids = jnp.zeros((1,), jnp.int32)
    # uv = (0.125, 0.125) is the center of texel (0,0)
    v = sample_bilinear_repeat(ids, textures, jnp.asarray([[0.125, 0.125]]))
    np.testing.assert_allclose(np.asarray(v)[0, 0], 1.0, atol=1e-6)
    # uv + 1.0 wraps (REPEAT)
    v2 = sample_bilinear_repeat(ids, textures, jnp.asarray([[1.125, 2.125]]))
    np.testing.assert_allclose(np.asarray(v2)[0, 0], 1.0, atol=1e-6)
    # halfway between texels: bilinear average
    v3 = sample_bilinear_repeat(ids, textures, jnp.asarray([[0.25, 0.125]]))
    np.testing.assert_allclose(np.asarray(v3)[0, 0], 0.5, atol=1e-6)


def test_atlas_sampler_matches_array_sampler():
    """sample_atlas_repeat == sample_bilinear_repeat for a lone texture."""
    from syzygy_tpu.kernels.resolve import sample_atlas_repeat

    rng = np.random.default_rng(5)
    tex = rng.uniform(0, 1, (16, 16, 4)).astype(np.float32)
    uv = rng.uniform(-2, 3, (64, 2)).astype(np.float32)
    ids = jnp.zeros((64,), jnp.int32)
    a = sample_bilinear_repeat(ids, jnp.asarray(tex)[None], jnp.asarray(uv))
    b = sample_atlas_repeat(
        ids,
        jnp.asarray(tex),
        jnp.asarray([[0, 0, 16, 16]], jnp.int32),
        jnp.asarray(uv),
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_atlas_mixed_resolutions_and_wrap():
    """Two textures of different sizes in one atlas: native-res texel
    fetches and REPEAT wrapping stay per-texture."""
    from syzygy_tpu.assets import TextureLibrary
    from syzygy_tpu.kernels.resolve import sample_atlas_repeat

    lib = TextureLibrary()
    a8 = np.zeros((8, 8, 4), np.float32)
    a8[0, 0] = 1.0
    b32 = np.zeros((32, 32, 4), np.float32)
    b32[16, 16] = 1.0
    lib.register("a8", a8)
    lib.register("b32", b32)
    atlas, rects = lib.as_atlas()
    atlas_j, rects_j = jnp.asarray(atlas), jnp.asarray(rects)

    # texel centers: texture 0 at uv=(0.5/8, 0.5/8); texture 1 at 16.5/32
    v0 = sample_atlas_repeat(
        jnp.asarray([0]), atlas_j, rects_j, jnp.asarray([[0.5 / 8, 0.5 / 8]])
    )
    v1 = sample_atlas_repeat(
        jnp.asarray([1]), atlas_j, rects_j, jnp.asarray([[16.5 / 32, 16.5 / 32]])
    )
    np.testing.assert_allclose(np.asarray(v0)[0, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v1)[0, 0], 1.0, atol=1e-6)
    # REPEAT wraps inside each texture's own rect, not into the neighbor
    v0w = sample_atlas_repeat(
        jnp.asarray([0]), atlas_j, rects_j,
        jnp.asarray([[3.0 + 0.5 / 8, -2.0 + 0.5 / 8]]),
    )
    np.testing.assert_allclose(np.asarray(v0w)[0, 0], 1.0, atol=1e-6)
    # bilinear across texture 0's wrap seam: uv=0 mixes its 4 corner texels
    v_seam = sample_atlas_repeat(
        jnp.asarray([0]), atlas_j, rects_j, jnp.asarray([[0.0, 0.0]])
    )
    np.testing.assert_allclose(np.asarray(v_seam)[0, 0], 0.25, atol=1e-6)


def test_texture_library_native_resolution_kept():
    from syzygy_tpu.assets import TextureLibrary

    lib = TextureLibrary(max_size=64)
    i = lib.register("native", np.ones((24, 48, 4), np.float32))
    assert lib.get(i).shape == (24, 48, 4)  # NOT resampled
    j = lib.register("big", np.ones((256, 128, 4), np.float32))
    assert lib.get(j).shape == (64, 32, 4)  # capped, aspect preserved
    atlas, rects = lib.as_atlas()
    assert tuple(rects[i]) == (0, 0, 48, 24) or tuple(rects[i])[2:] == (48, 24)
    x0, y0, w, h = rects[i]
    np.testing.assert_allclose(atlas[y0 : y0 + h, x0 : x0 + w], 1.0)


def test_background_alpha_zero():
    geo, _ = quad_geometry()
    proj = perspective_proj()
    models = jnp.eye(4)[None]
    clip, world = transform_positions(
        geo.positions, geo.vert_instance, models, jnp.asarray(proj)
    )
    setup = setup_triangles(clip, geo.triangles, geo.tri_valid, W, H, 0)
    vis = rasterize(setup, W, H)
    wn = transform_normals(geo.normals, geo.vert_instance, models)
    gb = resolve_gbuffer(vis, setup, geo, world, wn)
    bg = ~(np.asarray(vis.tri) >= 0)
    assert (np.asarray(gb.diffuse)[bg][:, 3] == 0).all()
    covered = ~bg
    assert (np.asarray(gb.diffuse)[covered][:, 3] == 1).all()


def test_atlas_mips_pyramid():
    """as_atlas_mips: level 0 is the source; level l halves level l-1."""
    import numpy as np

    from syzygy_tpu.assets import TextureLibrary

    lib = TextureLibrary()
    rng = np.random.default_rng(3)
    img = rng.random((16, 32, 4)).astype(np.float32)
    lib.register("t", img)
    atlas, rects = lib.as_atlas_mips(levels=4)
    assert rects.shape == (1, 4, 4)
    x0, y0, w, h = rects[0, 0]
    np.testing.assert_array_equal(atlas[y0 : y0 + h, x0 : x0 + w], img)
    for level in range(1, 4):
        x0, y0, w, h = rects[0, level]
        assert (w, h) == (max(32 >> level, 1), max(16 >> level, 1))


def test_trilinear_lod0_matches_bilinear():
    import jax.numpy as jnp
    import numpy as np

    from syzygy_tpu.assets import TextureLibrary
    from syzygy_tpu.kernels.resolve import (
        sample_atlas_repeat,
        sample_atlas_trilinear,
    )

    lib = TextureLibrary()
    rng = np.random.default_rng(4)
    lib.register("a", rng.random((8, 8, 4)).astype(np.float32))
    lib.register("b", rng.random((16, 4, 4)).astype(np.float32))
    atlas_m, rects_m = lib.as_atlas_mips(levels=3)
    ids = jnp.asarray(rng.integers(0, 2, (5, 7)), jnp.int32)
    uv = jnp.asarray(rng.random((5, 7, 2)), jnp.float32)
    a = sample_atlas_repeat(
        ids, jnp.asarray(atlas_m), jnp.asarray(rects_m[:, 0]), uv
    )
    b = sample_atlas_trilinear(
        ids,
        jnp.asarray(atlas_m),
        jnp.asarray(rects_m),
        uv,
        jnp.zeros((5, 7), jnp.float32),
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mipmapped_frame_renders():
    """pack_geometry(mipmaps=True) renders end-to-end; distant minified
    texels pull from higher mips (no NaNs, plausible image)."""
    import numpy as np

    from syzygy_tpu.math.geometry import eulers_from_forward
    from syzygy_tpu.renderer import RenderConfig, render_frame
    from syzygy_tpu.scene import default_scene, pack_frame_params, pack_geometry

    scene, lib = default_scene()
    scene.tick(0.0)
    eye = np.array([18.0, -16.0, -22.0], np.float32)
    target = np.array([0.0, -6.0, 0.0], np.float32)
    scene.camera.position = tuple(eye)
    scene.camera.euler_angles = tuple(
        np.asarray(eulers_from_forward(target - eye))
    )
    config = RenderConfig(
        width=128, height=64, shadow_dim=128, skyview_width=128,
        skyview_height=64,
    )
    geo = pack_geometry(scene, lib, mipmaps=True)
    params = pack_frame_params(scene, 2.0)
    img = np.asarray(render_frame(geo, params, config))
    assert np.isfinite(img).all()
    assert img.max() > 0.1


def test_upsample_repeat_odd_factor_exact():
    """Odd-factor _upsample_repeat is EXACT under bilinear REPEAT sampling:
    every coarse texel center (= bilinear breakpoint) coincides with a fine
    texel center, so the fine piecewise-linear surface equals the coarse
    one everywhere, not just at fine centers."""
    from syzygy_tpu.assets.types import _upsample_repeat
    from syzygy_tpu.kernels.resolve import sample_atlas_repeat

    rng = np.random.default_rng(7)
    tex = rng.uniform(0, 1, (8, 8, 4)).astype(np.float32)
    up = _upsample_repeat(tex, 24, 24)  # 3x
    uv = rng.uniform(-1, 2, (256, 2)).astype(np.float32)
    ids = jnp.zeros((256,), jnp.int32)
    a = sample_atlas_repeat(
        ids, jnp.asarray(tex), jnp.asarray([[0, 0, 8, 8]], jnp.int32),
        jnp.asarray(uv),
    )
    b = sample_atlas_repeat(
        ids, jnp.asarray(up), jnp.asarray([[0, 0, 24, 24]], jnp.int32),
        jnp.asarray(uv),
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_upsample_repeat_even_factor_centers_exact():
    """Even factors are exact at fine texel centers and bounded by the
    coarse second difference / 8 in between (the kink bound documented in
    assets.types._upsample_repeat)."""
    from syzygy_tpu.assets.types import _upsample_repeat
    from syzygy_tpu.kernels.resolve import sample_atlas_repeat

    rng = np.random.default_rng(11)
    tex = rng.uniform(0, 1, (8, 8, 4)).astype(np.float32)
    up = _upsample_repeat(tex, 16, 16)
    # fine texel centers
    j = np.arange(16, dtype=np.float32)
    uu, vv = np.meshgrid((j + 0.5) / 16, (j + 0.5) / 16)
    uv = np.stack([uu.ravel(), vv.ravel()], axis=-1).astype(np.float32)
    ids = jnp.zeros((uv.shape[0],), jnp.int32)
    a = sample_atlas_repeat(
        ids, jnp.asarray(tex), jnp.asarray([[0, 0, 8, 8]], jnp.int32),
        jnp.asarray(uv),
    )
    np.testing.assert_allclose(
        np.asarray(a).reshape(16, 16, 4), up, atol=2e-6
    )
    # mid-cell worst case stays under the documented second-difference bound
    mid = uv + np.float32(0.5 / 16)
    am = sample_atlas_repeat(
        ids, jnp.asarray(tex), jnp.asarray([[0, 0, 8, 8]], jnp.int32),
        jnp.asarray(mid),
    )
    bm = sample_atlas_repeat(
        ids, jnp.asarray(up), jnp.asarray([[0, 0, 16, 16]], jnp.int32),
        jnp.asarray(mid),
    )
    d2x = np.abs(np.roll(tex, -1, 1) - 2 * tex + np.roll(tex, 1, 1))
    d2y = np.abs(np.roll(tex, -1, 0) - 2 * tex + np.roll(tex, 1, 0))
    bound = (d2x.max() + d2y.max()) / 8.0 + 1e-5
    assert float(np.abs(np.asarray(am) - np.asarray(bm)).max()) <= bound


def test_joint_pad_atlas_frame_close():
    """Opt-in joint_pack_pad on the mixed-dimension flagship: renders, and
    the deviation vs the exact 3-gather path stays at the measured scale
    (RMSE ~2.3e-3 / max ~0.14 at 256x128 — OUTSIDE the 1e-3 parity
    budget, which is why pad stays opt-in; this pins the trade-off from
    drifting silently)."""
    from syzygy_tpu.assets.chess import flagship_scene
    from syzygy_tpu.math.geometry import eulers_from_forward
    from syzygy_tpu.renderer import RenderConfig, render_frame
    from syzygy_tpu.scene import pack_frame_params, pack_geometry

    scene, lib = flagship_scene()
    scene.tick(0.0)
    eye = np.array([13.0, -8.0, -14.0], np.float32)
    target = np.array([0.0, -1.0, 0.0], np.float32)
    scene.camera.position = tuple(eye)
    scene.camera.euler_angles = tuple(
        np.asarray(eulers_from_forward(target - eye))
    )
    config = RenderConfig(
        width=128, height=64, shadow_dim=128, skyview_width=128,
        skyview_height=64,
    )
    params = pack_frame_params(scene, 2.0)
    geo_exact = pack_geometry(scene, lib)
    assert geo_exact.tex_atlas_joint is None  # mixed dims: stays exact
    geo_pad = pack_geometry(scene, lib, joint_pack_pad=True)
    assert geo_pad.tex_atlas_joint is not None
    assert geo_pad.tex_atlas_joint.shape[-1] == 48
    a = np.asarray(render_frame(geo_exact, params, config))
    b = np.asarray(render_frame(geo_pad, params, config))
    d = np.abs(a - b)
    rmse = float(np.sqrt((d**2).mean()))
    assert rmse < 6e-3, rmse
    assert float(d.max()) < 0.25, d.max()


def test_atlas_f16_frame_close():
    """pack_geometry(atlas_f16=True) vs f32 atlas on the textured chess
    flagship: whole-frame deviation at storage-precision scale (f16
    rounding ~5e-4 relative sits below the source textures' 8-bit
    quantization), far inside the 1e-3 RMSE parity budget."""
    import numpy as np

    from syzygy_tpu.math.geometry import eulers_from_forward
    from syzygy_tpu.renderer import RenderConfig, render_frame
    from syzygy_tpu.assets.chess import flagship_scene
    from syzygy_tpu.scene import pack_frame_params, pack_geometry

    scene, lib = flagship_scene()
    scene.tick(0.0)
    eye = np.array([13.0, -8.0, -14.0], np.float32)
    target = np.array([0.0, -1.0, 0.0], np.float32)
    scene.camera.position = tuple(eye)
    scene.camera.euler_angles = tuple(
        np.asarray(eulers_from_forward(target - eye))
    )
    config = RenderConfig(
        width=192, height=108, shadow_dim=256, skyview_width=128,
        skyview_height=64,
    )
    params = pack_frame_params(scene, config.width / config.height)
    a = np.asarray(
        render_frame(
            pack_geometry(scene, lib, atlas_f16=False), params, config
        )
    )
    b = np.asarray(
        render_frame(
            pack_geometry(scene, lib, atlas_f16=True), params, config
        )
    )
    d = np.abs(a - b)
    assert float(np.sqrt((d**2).mean())) < 3e-4, (
        d.max(),
        np.sqrt((d**2).mean()),
    )
    assert d.max() < 5e-3, d.max()


def test_sample_atlas_rect_joint_nbhd_bitwise():
    """The mixed-dim neighborhood joint sampler is BITWISE equal to three
    separate quad-packed samples — adversarial uv included (negative,
    beyond [0,1], exactly on texel centers/edges of every map). The
    power-of-two ratio construction guarantees the stored 3x3 always
    contains each role's own 2x2 footprint (assets.types.
    joint_pack_atlas_nbhd)."""
    from syzygy_tpu.assets.types import (
        TextureLibrary,
        joint_pack_atlas_nbhd,
        quad_pack_atlas,
    )
    from syzygy_tpu.kernels.resolve import (
        _sample_atlas_rect,
        _sample_atlas_rect_joint_nbhd,
    )

    rng = np.random.default_rng(3)
    lib = TextureLibrary()
    # per-axis mixed ratios: x 1/2/4, y 1/1/4
    lib.register("c", rng.uniform(0, 1, (8, 16, 4)).astype(np.float32))
    lib.register("n", rng.uniform(0, 1, (8, 8, 4)).astype(np.float32))
    lib.register("o", rng.uniform(0, 1, (2, 4, 4)).astype(np.float32))
    atlas, rects = lib.as_atlas()
    atlas16 = quad_pack_atlas(atlas, rects)
    mats = np.array([[0, 1, 2]], np.int32)
    nb = joint_pack_atlas_nbhd(atlas16, rects, mats)
    assert nb is not None
    j_atlas, j_rects, j_dims = nb
    assert j_atlas.shape[-1] == 108
    assert j_rects[0][2] == 16 and j_rects[0][3] == 8

    uv_sets = [rng.uniform(-2.0, 3.0, (512, 2)).astype(np.float32)]
    # texel centers, edges, and just-off-by-ulp of every map's grid
    for dim in (16, 8, 4, 2):
        g = (np.arange(4 * dim, dtype=np.float32) + 0.5) / (2 * dim) - 0.75
        for d in (0.0, 0.5 / dim, np.float32(1e-7), -np.float32(1e-7)):
            pts = (g + d).astype(np.float32)
            uv_sets.append(
                np.stack([pts, np.flip(pts)], axis=-1).astype(np.float32)
            )
    uv = np.concatenate(uv_sets, axis=0)

    n_s = uv.shape[0]
    sep = [
        np.asarray(
            _sample_atlas_rect(
                jnp.asarray(np.tile(rects[i], (n_s, 1)), jnp.int32),
                jnp.asarray(atlas16),
                jnp.asarray(uv),
            )
        )
        for i in range(3)
    ]
    joint = _sample_atlas_rect_joint_nbhd(
        jnp.asarray(np.tile(j_rects[0], (n_s, 1)), jnp.int32),
        jnp.asarray(np.tile(j_dims[0], (n_s, 1, 1)), jnp.int32),
        jnp.asarray(j_atlas),
        jnp.asarray(uv),
    )
    for a, b in zip(sep, joint):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_joint_pack_atlas_nbhd_rejects_non_pow2():
    """Non-power-of-two (or non-dividing) dim ratios cannot satisfy the
    bitwise proof -> the packer must refuse so callers keep the exact
    separate-gather path."""
    from syzygy_tpu.assets.types import (
        TextureLibrary,
        joint_pack_atlas_nbhd,
        quad_pack_atlas,
    )

    lib = TextureLibrary()
    lib.register("c", np.ones((12, 12, 4), np.float32))
    lib.register("n", np.ones((8, 8, 4), np.float32))  # 12/8 not integral
    lib.register("o", np.ones((4, 4, 4), np.float32))  # 12/4 = 3: not pow2
    atlas, rects = lib.as_atlas()
    atlas16 = quad_pack_atlas(atlas, rects)
    assert joint_pack_atlas_nbhd(atlas16, rects, np.array([[0, 1, 1]])) is None
    assert joint_pack_atlas_nbhd(atlas16, rects, np.array([[0, 2, 2]])) is None
    # pow2 ratios qualify
    ok = joint_pack_atlas_nbhd(atlas16, rects, np.array([[1, 1, 2]]))
    assert ok is not None and ok[0].shape[-1] == 108


def test_joint_material_atlas_mixed_frame_bitwise():
    """pack_geometry(joint_pack_mixed=True) on the mixed-dimension chess
    flagship (512/256/128 board, 256/256/64 pieces): the SAMPLED values
    are bitwise (test_sample_atlas_rect_joint_nbhd_bitwise); the whole
    frame agrees to one post-OETF ulp — the record width changes 49 -> 47,
    so XLA fuses the downstream math differently (observed max 2.1e-7 on
    0.2% of pixels; the share_sun_pcf / sky row-chunk reassociation
    precedent)."""
    from syzygy_tpu.assets.chess import flagship_scene
    from syzygy_tpu.math.geometry import eulers_from_forward
    from syzygy_tpu.renderer import RenderConfig, render_frame
    from syzygy_tpu.scene import pack_frame_params, pack_geometry

    scene, lib = flagship_scene()
    scene.tick(0.0)
    eye = np.array([13.0, -8.0, -14.0], np.float32)
    target = np.array([0.0, -1.0, 0.0], np.float32)
    scene.camera.position = tuple(eye)
    scene.camera.euler_angles = tuple(
        np.asarray(eulers_from_forward(target - eye))
    )
    config = RenderConfig(
        width=192, height=96, shadow_dim=128, skyview_width=128,
        skyview_height=64,
    )
    params = pack_frame_params(scene, config.width / config.height)
    geo_sep = pack_geometry(scene, lib)
    assert geo_sep.tex_atlas_joint is None  # mixed dims: no 48ch joint
    geo_mix = pack_geometry(scene, lib, joint_pack_mixed=True)
    assert geo_mix.tex_atlas_joint is not None
    assert geo_mix.tex_atlas_joint.shape[-1] == 108
    assert geo_mix.tex_dims_joint is not None
    a = np.asarray(render_frame(geo_sep, params, config))
    b = np.asarray(render_frame(geo_mix, params, config))
    np.testing.assert_allclose(a, b, atol=1e-6)
    assert float((a == b).mean()) > 0.99
