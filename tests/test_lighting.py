"""Deferred lighting: PBR conversion, PCF shadows, light loops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from syzygy_tpu.kernels.lighting import (
    TO_TEX_COORD,
    compute_shadow_frame,
    convert_pbr,
    deferred_lighting,
    sample_shadow_map,
)
from syzygy_tpu.kernels.resolve import GBuffer
from syzygy_tpu.scene import Camera
from syzygy_tpu.scene.lights import (
    MAX_SPOT_LIGHTS,
    SpotlightParams,
    make_directional,
    make_spot,
    spot_raw,
    make_spot_batched,
)
from syzygy_tpu.math.geometry import aabb_from_min_max


def make_gbuffer(h=8, w=8, normal=(0.0, -1.0, 0.0), orm=(1.0, 0.5, 0.0)):
    ones = np.ones((h, w, 1), np.float32)

    def plane(rgb, a=1.0):
        return jnp.asarray(
            np.concatenate([np.tile(np.asarray(rgb, np.float32), (h, w, 1)), ones * a], -1)
        )

    return GBuffer(
        diffuse=plane((0.5, 0.5, 0.5)),
        specular=plane((0.5, 0.5, 0.5)),
        normal=plane(normal, 0.0),
        world_position=plane((0.0, -1.0, 0.0)),
        orm=plane(orm),
    )


def test_convert_pbr_matches_reference_formulas():
    # pbrFunctions.glinl:3-20
    gb = make_gbuffer(orm=(0.8, 0.3, 0.6))
    mat = convert_pbr(gb)
    # specular power = 160^(1-roughness)
    np.testing.assert_allclose(
        np.asarray(mat.specular_power)[0, 0, 0], 160.0 ** (1 - 0.3), rtol=1e-5
    )
    # reflectance lerp: dielectric 0.04 -> metallic 0.5*spec/max3
    expected = 0.04 * (1 - 0.6) + (0.5 * 0.5 / 0.5) * 0.6
    np.testing.assert_allclose(
        np.asarray(mat.normal_reflectance)[0, 0], [expected] * 3, rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(mat.occlusion)[0, 0, 0], 0.8)


def test_shadow_frame_maps_ndc_to_texcoord():
    # identity projView: ndc xy in [-1,1] -> st in [0,1] (shadowmap.glinl:2-21)
    pos = jnp.asarray(np.array([[[0.0, 0.0, 0.5]]], np.float32))
    nrm = jnp.asarray(np.array([[[0.0, 0.0, 1.0]]], np.float32))
    coord, dx, dy = compute_shadow_frame(jnp.eye(4), pos, nrm)
    np.testing.assert_allclose(np.asarray(coord)[0, 0], [0.5, 0.5, 0.5, 1.0], atol=1e-6)
    pos2 = jnp.asarray(np.array([[[-1.0, 1.0, 0.25]]], np.float32))
    coord2, _, _ = compute_shadow_frame(jnp.eye(4), pos2, nrm)
    np.testing.assert_allclose(np.asarray(coord2)[0, 0, :2], [0.0, 1.0], atol=1e-6)


def test_pcf_fully_occluded_and_fully_lit():
    # occluder depth 0.9 everywhere; fragment at 0.5 (reverse-Z: occluder nearer)
    smap = jnp.full((64, 64), 0.9, jnp.float32)
    coord = jnp.tile(jnp.asarray([0.5, 0.5, 0.5, 1.0]), (4, 4, 1))
    dx = dy = jnp.ones((4, 4), jnp.float32)
    occluded = sample_shadow_map(smap, coord, dx, dy)
    np.testing.assert_allclose(np.asarray(occluded), 0.0, atol=1e-6)
    # fragment nearer than occluder -> fully lit
    coord_near = coord.at[..., 2].set(0.95)
    lit = sample_shadow_map(smap, coord_near, dx, dy)
    np.testing.assert_allclose(np.asarray(lit), 1.0, atol=1e-6)


def test_pcf_border_is_unshadowed():
    # outside the map: clamp-to-border 0 -> occluderDepth > 0 fails -> lit
    smap = jnp.full((64, 64), 0.9, jnp.float32)
    coord = jnp.tile(jnp.asarray([2.0, 2.0, 0.5, 1.0]), (2, 2, 1))
    dx = dy = jnp.ones((2, 2), jnp.float32)
    lit = sample_shadow_map(smap, coord, dx, dy)
    np.testing.assert_allclose(np.asarray(lit), 1.0)


def test_pcf_partial():
    smap = np.zeros((64, 64), np.float32)
    smap[:, :32] = 0.9  # left half occluding
    coord = jnp.tile(jnp.asarray([0.5, 0.5, 0.5, 1.0]), (1, 1, 1))
    # dx/dy max out at 1.0 in the renderer (computeShadowFrame:
    # sqrt(1 - clamp(...)) <= 1); taps then span +-3 texels across the edge
    dx = dy = jnp.full((1, 1), 1.0, jnp.float32)
    f = float(np.asarray(sample_shadow_map(jnp.asarray(smap), coord, dx, dy))[0, 0])
    assert 0.0 < f < 1.0


def _lighting_scene(skip=0, spot_count=0, n_dir=2):
    gb = make_gbuffer(h=8, w=128)
    bounds = aabb_from_min_max([-1, -2, -1], [1, 0, 1])
    # sun overhead: light looking straight down = forward (0, 1, 0) (+y down)
    sun = make_directional(
        jnp.asarray([1.0, 1.0, 1.0, 1.0]), 4.0,
        jnp.asarray([-np.pi / 2, 0.0, 0.0]), bounds,
    )
    moon = make_directional(
        jnp.asarray([0.3, 0.4, 0.6, 1.0]), 0.0,
        jnp.asarray([-np.pi / 2, 0.0, 0.0]), bounds,
    )
    dir_lights = jax.tree.map(lambda a, b: jnp.stack([a, b]), sun, moon)
    raw, n = spot_raw([SpotlightParams()] * spot_count, 2)
    spots = make_spot_batched(raw)
    smaps = jnp.zeros((2 + 2, 32, 32), jnp.float32)
    cam = Camera(position=(0.0, -5.0, 0.0)).packed(1.0)
    return gb, cam, dir_lights, spots, smaps, n


def test_directional_lighting_lambert():
    gb, cam, dirs, spots, smaps, _ = _lighting_scene()
    out = deferred_lighting(
        gb, cam, dirs, jnp.int32(2), jnp.int32(0), spots, jnp.int32(0), smaps
    )
    v = np.asarray(out)[4, 64]
    # sun (strength 4, white) on an up-facing lambertian-ish surface: positive,
    # grey-ish color
    assert v.min() > 0.01
    assert np.allclose(v[0], v[1], atol=1e-5) and np.allclose(v[1], v[2], atol=1e-5)


def test_skip_count_removes_sun():
    gb, cam, dirs, spots, smaps, _ = _lighting_scene()
    full = deferred_lighting(
        gb, cam, dirs, jnp.int32(2), jnp.int32(0), spots, jnp.int32(0), smaps
    )
    skipped = deferred_lighting(
        gb, cam, dirs, jnp.int32(2), jnp.int32(1), spots, jnp.int32(0), smaps
    )
    # moon strength is 0 here, so skipping the sun leaves nothing
    assert np.asarray(full).max() > 0.01
    np.testing.assert_allclose(np.asarray(skipped), 0.0, atol=1e-7)


def test_background_pixels_stay_black():
    gb, cam, dirs, spots, smaps, _ = _lighting_scene()
    gb = gb._replace(diffuse=gb.diffuse.at[..., 3].set(0.0))  # all background
    out = deferred_lighting(
        gb, cam, dirs, jnp.int32(2), jnp.int32(0), spots, jnp.int32(0), smaps
    )
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_spot_light_contributes():
    gb, cam, dirs, spots_none, smaps, _ = _lighting_scene()
    # one spotlight above the surface pointing down
    raw, n = spot_raw(
        [
            SpotlightParams(
                color=(1.0, 0.0, 0.0, 1.0),
                strength=10.0,
                position=(0.0, -3.0, 0.0),
                euler_angles=(-np.pi / 2, 0.0, 0.0),
                falloff_distance=10.0,
            )
        ],
        2,
    )
    spots = make_spot_batched(raw)
    zero_dirs = jax.tree.map(
        lambda x: jnp.zeros_like(x), dirs
    )._replace(strength=jnp.zeros(2))
    out = deferred_lighting(
        gb, cam, zero_dirs, jnp.int32(0), jnp.int32(0), spots, jnp.int32(n), smaps
    )
    v = np.asarray(out)
    assert v[..., 0].max() > 0.001  # red light landed
    assert v[..., 1].max() < 1e-6  # and only red


def test_pcf_windowed_matches_naive():
    """The windowed-gather PCF must be bitwise-identical to the per-texel
    25-gather formulation of shadowmap.glinl:32-63."""
    import jax.numpy as jnp

    from syzygy_tpu.kernels.lighting import sample_shadow_map

    rng = np.random.default_rng(11)
    size = 128
    shadow = jnp.asarray(rng.random((size, size), np.float32))
    h, w = 24, 32
    coord = jnp.asarray(
        np.stack(
            [
                rng.uniform(-0.2, 1.2, (h, w)),  # u incl. out-of-map taps
                rng.uniform(-0.2, 1.2, (h, w)),
                rng.random((h, w)),
                np.ones((h, w)),
            ],
            axis=-1,
        ).astype(np.float32)
    )
    dx = jnp.asarray(rng.random((h, w), np.float32))
    dy = jnp.asarray(rng.random((h, w), np.float32))

    def naive(shadow_map, coord, dx, dy):
        frag_depth = coord[..., 2]
        du = 1.5 * dx / size
        dv = 1.5 * dy / size
        u, v = coord[..., 0], coord[..., 1]
        occluded = jnp.zeros_like(frag_depth)
        for oy in range(-2, 3):
            for ox in range(-2, 3):
                ix = jnp.floor((u + ox * du) * size).astype(jnp.int32)
                iy = jnp.floor((v + oy * dv) * size).astype(jnp.int32)
                inside = (ix >= 0) & (ix < size) & (iy >= 0) & (iy < size)
                occ = jnp.where(
                    inside,
                    shadow_map[
                        jnp.clip(iy, 0, size - 1), jnp.clip(ix, 0, size - 1)
                    ],
                    0.0,
                )
                occluded += jnp.where(
                    (occ > 0.0) & (occ > frag_depth), 1.0, 0.0
                )
        return 1.0 - occluded / 25.0

    a = np.asarray(naive(shadow, coord, dx, dy))
    b = np.asarray(sample_shadow_map(shadow, coord, dx, dy))
    np.testing.assert_array_equal(a, b)


def test_pcf_large_map_path_matches_windowed():
    """The >2048 naive path returns identical values to the windowed path
    (exercised directly; real 4096 maps are device-budget territory)."""
    import jax.numpy as jnp

    from syzygy_tpu.kernels.lighting import (
        _sample_shadow_map_naive,
        sample_shadow_map,
    )

    rng = np.random.default_rng(7)
    size = 64
    shadow = jnp.asarray(rng.uniform(0, 1, (size, size)).astype(np.float32))
    coord = jnp.asarray(
        np.stack(
            [
                rng.uniform(-0.1, 1.1, (16, 16)),
                rng.uniform(-0.1, 1.1, (16, 16)),
                rng.uniform(0, 1, (16, 16)),
                np.ones((16, 16)),
            ],
            axis=-1,
        ).astype(np.float32)
    )
    dx = jnp.asarray(rng.uniform(0, 1, (16, 16)).astype(np.float32))
    dy = jnp.asarray(rng.uniform(0, 1, (16, 16)).astype(np.float32))
    a = np.asarray(sample_shadow_map(shadow, coord, dx, dy))
    b = np.asarray(_sample_shadow_map_naive(shadow, coord, dx, dy))
    np.testing.assert_array_equal(a, b)


def test_pcf_bitmask_matches_select_tree():
    """The bitmask tap extraction == the select-tree formulation, bitwise
    (compare commutes with channel select; both count identical booleans)."""
    import numpy as np

    from syzygy_tpu.kernels.lighting import sample_shadow_map

    rng = np.random.default_rng(3)
    size = 64
    smap = jnp.asarray(rng.random((size, size), np.float32))
    h, w = 33, 65
    coord = jnp.asarray(
        np.stack(
            [
                rng.uniform(-0.2, 1.2, (h, w)),  # u incl. out-of-map taps
                rng.uniform(-0.2, 1.2, (h, w)),
                rng.random((h, w)),  # frag depth
                np.ones((h, w)),
            ],
            axis=-1,
        ).astype(np.float32)
    )
    dx = jnp.asarray(rng.random((h, w), np.float32))
    dy = jnp.asarray(rng.random((h, w), np.float32))
    a = np.asarray(sample_shadow_map(smap, coord, dx, dy, bitmask=True))
    b = np.asarray(sample_shadow_map(smap, coord, dx, dy, bitmask=False))
    np.testing.assert_array_equal(a, b)


def test_pcf_window2d_bitwise():
    """The one-gather 2D-window PCF (_pcf_window2d) == the 5-row-gather
    segment path, bitwise, in both f32 and f16 storage — the row/column
    select trees extract the exact same stored texels (coords include
    out-of-map taps and dy spanning the full [0, 1] bound so the 5 tap
    rows spread over the maximal 7-row span the window must cover)."""
    import numpy as np

    from syzygy_tpu.kernels.lighting import sample_shadow_map

    rng = np.random.default_rng(17)
    for size in (64, 128):
        smap = jnp.asarray(rng.random((size, size), np.float32))
        h, w = 33, 65
        coord = jnp.asarray(
            np.stack(
                [
                    rng.uniform(-0.3, 1.3, (h, w)),
                    rng.uniform(-0.3, 1.3, (h, w)),
                    rng.random((h, w)),  # frag depth
                    np.ones((h, w)),
                ],
                axis=-1,
            ).astype(np.float32)
        )
        dx = jnp.asarray(rng.random((h, w), np.float32))
        dy = jnp.asarray(rng.random((h, w), np.float32))
        for f16 in (False, True):
            a = np.asarray(
                sample_shadow_map(
                    smap, coord, dx, dy, f16=f16, window2d=True
                )
            )
            b = np.asarray(
                sample_shadow_map(
                    smap, coord, dx, dy, f16=f16, window2d=False
                )
            )
            np.testing.assert_array_equal(a, b)


def test_pcf_seg8_bitwise():
    """The narrow-segment PCF (_pcf_seg8: 8-channel windows, stride 2)
    == the default 16-channel path, bitwise, f32 and f16 — same stored
    texels, same taps, half the fetched bytes."""
    import numpy as np

    from syzygy_tpu.kernels.lighting import sample_shadow_map

    rng = np.random.default_rng(23)
    for size in (64, 128):
        smap = jnp.asarray(rng.random((size, size), np.float32))
        h, w = 33, 65
        coord = jnp.asarray(
            np.stack(
                [
                    rng.uniform(-0.3, 1.3, (h, w)),
                    rng.uniform(-0.3, 1.3, (h, w)),
                    rng.random((h, w)),  # frag depth
                    np.ones((h, w)),
                ],
                axis=-1,
            ).astype(np.float32)
        )
        dx = jnp.asarray(rng.random((h, w), np.float32))
        dy = jnp.asarray(rng.random((h, w), np.float32))
        for f16 in (False, True):
            a = np.asarray(
                sample_shadow_map(smap, coord, dx, dy, f16=f16, seg8=True)
            )
            b = np.asarray(
                sample_shadow_map(smap, coord, dx, dy, f16=f16, seg8=False)
            )
            np.testing.assert_array_equal(a, b)


def test_pcf_f16_close():
    """f16 PCF segment storage vs f32: taps flip only where the
    occluder-receiver depth gap is below f16 rounding (~5e-4 relative),
    so the 25-tap average moves by at most a few tap weights and the
    flip population is tiny."""
    import numpy as np

    from syzygy_tpu.kernels.lighting import sample_shadow_map

    rng = np.random.default_rng(7)
    size = 128
    smap = jnp.asarray(rng.random((size, size), np.float32))
    h, w = 48, 96
    coord = jnp.asarray(
        np.stack(
            [
                rng.uniform(-0.2, 1.2, (h, w)),
                rng.uniform(-0.2, 1.2, (h, w)),
                rng.random((h, w)),
                np.ones((h, w)),
            ],
            axis=-1,
        ).astype(np.float32)
    )
    dx = jnp.asarray(rng.random((h, w), np.float32))
    dy = jnp.asarray(rng.random((h, w), np.float32))
    a = np.asarray(sample_shadow_map(smap, coord, dx, dy, f16=False))
    b = np.asarray(sample_shadow_map(smap, coord, dx, dy, f16=True))
    d = np.abs(a - b)
    # any single pixel moves by whole tap weights (k/25); the population
    # of flipped taps is bounded by the f16-rounding band of a uniform
    # depth distribution (~2 * 5e-4), so the mean moves far less
    assert d.max() <= 3.0 / 25.0 + 1e-6, d.max()
    assert float(d.mean()) < 5e-3, d.mean()


def test_pcf_f16_frame_close():
    """Whole-frame deviation with pcf_f16=True stays at shadow-rounding
    scale, far inside the 1e-3 RMSE parity budget."""
    import dataclasses

    import numpy as np

    from syzygy_tpu.math.geometry import eulers_from_forward
    from syzygy_tpu.renderer import RenderConfig, render_frame
    from syzygy_tpu.scene import default_scene, pack_frame_params, pack_geometry

    scene, lib = default_scene()
    scene.sun_animation.time = 0.35
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
    geo = pack_geometry(scene, lib)
    params = pack_frame_params(scene, 2.0)
    a = np.asarray(
        render_frame(geo, params, dataclasses.replace(config, pcf_f16=False))
    )
    b = np.asarray(
        render_frame(geo, params, dataclasses.replace(config, pcf_f16=True))
    )
    d = np.abs(a - b)
    assert float(np.sqrt((d**2).mean())) < 5e-4, (
        d.max(),
        np.sqrt((d**2).mean()),
    )


def test_pcf_q8_close():
    """u8 block-scaled PCF segments vs exact f32: a RANDOM map is the
    adversarial case (every segment spans ~the full depth range, so the
    per-tap quantization band is ~range/510 ~ 2e-3); taps flip only
    inside that band, so the flip population stays small even here.
    Real shadow maps are piecewise smooth (tiny per-segment ranges) —
    the frame-level bound below is the parity gate."""
    import numpy as np

    from syzygy_tpu.kernels.lighting import sample_shadow_map

    rng = np.random.default_rng(11)
    size = 128
    smap = jnp.asarray(rng.random((size, size), np.float32))
    h, w = 48, 96
    coord = jnp.asarray(
        np.stack(
            [
                rng.uniform(-0.2, 1.2, (h, w)),
                rng.uniform(-0.2, 1.2, (h, w)),
                rng.random((h, w)),
                np.ones((h, w)),
            ],
            axis=-1,
        ).astype(np.float32)
    )
    dx = jnp.asarray(rng.random((h, w), np.float32))
    dy = jnp.asarray(rng.random((h, w), np.float32))
    a = np.asarray(sample_shadow_map(smap, coord, dx, dy))
    b = np.asarray(sample_shadow_map(smap, coord, dx, dy, q8=True))
    d = np.abs(a - b)
    assert d.max() <= 6.0 / 25.0 + 1e-6, d.max()
    assert float(d.mean()) < 2e-2, d.mean()


def test_pcf_q8_zero_map_exact():
    """An all-zero (cleared / no-caster) map must behave exactly like the
    f32 path: zeros decode to exactly 0, the border test stays false, and
    the factor is 1.0 everywhere."""
    import numpy as np

    from syzygy_tpu.kernels.lighting import sample_shadow_map

    rng = np.random.default_rng(5)
    size = 64
    smap = jnp.zeros((size, size), jnp.float32)
    h, w = 16, 32
    coord = jnp.asarray(
        np.stack(
            [
                rng.uniform(-0.2, 1.2, (h, w)),
                rng.uniform(-0.2, 1.2, (h, w)),
                rng.random((h, w)),
                np.ones((h, w)),
            ],
            axis=-1,
        ).astype(np.float32)
    )
    dx = jnp.asarray(rng.random((h, w), np.float32))
    dy = jnp.asarray(rng.random((h, w), np.float32))
    out = np.asarray(sample_shadow_map(smap, coord, dx, dy, q8=True))
    np.testing.assert_array_equal(out, np.ones((h, w), np.float32))


def test_pcf_q8_frame_close():
    """Whole-frame deviation with pcf_q8=True: real shadow maps are
    piecewise smooth, so per-segment depth ranges (the q8 error scale)
    are tiny except at silhouettes; the frame stays inside the 1e-3 RMSE
    parity budget."""
    import dataclasses

    import numpy as np

    from syzygy_tpu.math.geometry import eulers_from_forward
    from syzygy_tpu.renderer import RenderConfig, render_frame
    from syzygy_tpu.scene import default_scene, pack_frame_params, pack_geometry

    scene, lib = default_scene()
    scene.sun_animation.time = 0.35
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
    geo = pack_geometry(scene, lib)
    params = pack_frame_params(scene, 2.0)
    a = np.asarray(
        render_frame(geo, params, dataclasses.replace(config, pcf_f16=False))
    )
    b = np.asarray(
        render_frame(geo, params, dataclasses.replace(config, pcf_q8=True))
    )
    d = np.abs(a - b)
    assert float(np.sqrt((d**2).mean())) < 1e-3, (
        d.max(),
        np.sqrt((d**2).mean()),
    )


def test_shadowless_eps_frame_close():
    """The dim-directional fast mode (shadowless_strength_eps=0.025, the
    midday-moon case): deviation exists only in pixels occluded from the
    0.02-strength moon and stays far inside the 1e-3 RMSE parity budget."""
    import dataclasses

    import numpy as np

    from syzygy_tpu.math.geometry import eulers_from_forward
    from syzygy_tpu.renderer import RenderConfig, render_frame
    from syzygy_tpu.scene import default_scene, pack_frame_params, pack_geometry

    scene, lib = default_scene()
    scene.sun_animation.time = 0.35
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
    geo = pack_geometry(scene, lib)
    params = pack_frame_params(scene, 2.0)
    a = np.asarray(
        render_frame(
            geo,
            params,
            dataclasses.replace(config, shadowless_strength_eps=0.0),
        )
    )
    b = np.asarray(
        render_frame(
            geo,
            params,
            dataclasses.replace(config, shadowless_strength_eps=0.025),
        )
    )
    d = np.abs(a - b)
    assert float(np.sqrt((d**2).mean())) < 1e-3, (
        d.max(),
        np.sqrt((d**2).mean()),
    )
    assert d.max() < 2e-2, d.max()


def test_shadowless_eps_keeps_night_moon_shadowed():
    """At night the moon is the ONLY light: the RELATIVE gate's total
    daylight-weighted intensity collapses to the moon itself (ratio 1),
    so it must stay fully shadowed — frames bitwise-equal with and
    without the fast mode. (An absolute gate would fail here: the moon's
    peak intensity never exceeds 0.012.)"""
    import dataclasses

    import numpy as np

    from syzygy_tpu.math.geometry import eulers_from_forward
    from syzygy_tpu.renderer import RenderConfig, render_frame
    from syzygy_tpu.scene import default_scene, pack_frame_params, pack_geometry

    scene, lib = default_scene()
    scene.sun_animation.time = 0.85  # night: moon up, sun down
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
    geo = pack_geometry(scene, lib)
    params = pack_frame_params(scene, 2.0)
    from syzygy_tpu.scene import prepare_frame_state

    state = prepare_frame_state(params)
    d = state.directional_lights
    # dot(WORLD_UP, to_sun) with y-DOWN: up=(0,-1,0), to_sun=-forward,
    # so the elevation is +forward_y.
    sun_up = float(np.asarray(d.forward[0, 1]))
    assert sun_up < 0.0, sun_up  # genuinely night: sun below the horizon
    a = np.asarray(
        render_frame(
            geo,
            params,
            dataclasses.replace(config, shadowless_strength_eps=0.0),
        )
    )
    b = np.asarray(
        render_frame(
            geo,
            params,
            dataclasses.replace(config, shadowless_strength_eps=0.025),
        )
    )
    np.testing.assert_array_equal(a, b)


def test_share_sun_pcf_bitwise():
    """share_sun_pcf hoists the one sun PCF evaluation both passes need
    (lighting's light-0 shadow factor + sky's sun-disk visibility) into a
    single computation. compute_shadow_frame's spread is analytic
    per-pixel, so the math is identical; hoisting it across program /
    lax.map boundaries lets XLA fuse the shadow-coord matmuls differently,
    so frames agree only to reassociation noise (observed max 1.8e-7 —
    one ulp post-OETF; same precedent as the sky row-chunk equivalence).
    Checked in four frame variants: the 3-program split, the fused
    lighting+sky program, fused-chunks (lighting inside the sky lax.map,
    where the share takes its chunk-local form), and resolve-in-sky-chunks.
    The name says 'bitwise' for the shared PCF VALUE; whole frames agree
    to the 1e-6 reassociation bound explained above."""
    import dataclasses

    import numpy as np

    from syzygy_tpu.math.geometry import eulers_from_forward
    from syzygy_tpu.renderer import RenderConfig, render_frame
    from syzygy_tpu.scene import default_scene, pack_frame_params, pack_geometry

    scene, lib = default_scene()
    scene.sun_animation.time = 0.35
    scene.tick(0.0)
    eye = np.array([18.0, -16.0, -22.0], np.float32)
    target = np.array([0.0, -6.0, 0.0], np.float32)
    scene.camera.position = tuple(eye)
    scene.camera.euler_angles = tuple(
        np.asarray(eulers_from_forward(target - eye))
    )
    geo = pack_geometry(scene, lib)
    params = pack_frame_params(scene, 2.0)
    variants = (
        dict(fuse_lighting_sky=False),
        dict(fuse_lighting_sky=True),
        # in-chunk sharing (chunk_sun_pcf): the PCF is a chunk-local value
        # inside the fused lax.map body, not a hoisted (H, W) buffer
        dict(fuse_lighting_sky=True, fuse_lighting_sky_chunks=True),
        dict(
            fuse_lighting_sky=True,
            fuse_lighting_sky_chunks=True,
            resolve_in_sky_chunks=True,
        ),
    )
    for fuse in variants:
        config = RenderConfig(
            width=128, height=64, shadow_dim=128, skyview_width=128,
            skyview_height=64, sky_row_chunks=2, **fuse,
        )
        a = np.asarray(
            render_frame(
                geo, params, dataclasses.replace(config, share_sun_pcf=False)
            )
        )
        b = np.asarray(
            render_frame(
                geo, params, dataclasses.replace(config, share_sun_pcf=True)
            )
        )
        d = np.abs(a - b)
        assert d.max() <= 1e-6, (fuse, d.max(), (d > 0).mean())
