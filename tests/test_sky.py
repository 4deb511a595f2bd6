"""Sky camera pass: environment vs geometry branches, tonemap, transfer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from syzygy_tpu.kernels import atmosphere as atm
from syzygy_tpu.kernels.resolve import GBuffer
from syzygy_tpu.kernels.sky import sky_camera_pass
from syzygy_tpu.kernels.transfer import (
    gradient_color,
    matrix_color,
    oetf_pure_gamma,
    oetf_srgb,
)
from syzygy_tpu.math.geometry import aabb_from_min_max
from syzygy_tpu.scene import Atmosphere, Camera
from syzygy_tpu.scene.lights import make_directional

H, W = 64, 128


@pytest.fixture(scope="module")
def sky_inputs():
    # noon sun
    atmo_host = Atmosphere(sun_euler_angles=(np.pi / 2 + np.pi, 0.0, 0.0))
    atmo = atmo_host.packed()
    t_lut = atm.compute_transmittance_lut(atmo)
    origin = jnp.asarray([0.0, 6.36 + 1e-5, 0.0], jnp.float32)
    sky_lut = atm.compute_skyview_lut(atmo, origin, t_lut, width=64, height=32)
    cam = Camera(position=(0.0, -10.0, 0.0), euler_angles=(0.0, 0.0, 0.0)).packed(
        W / H
    )
    sun = make_directional(
        jnp.asarray([1.0, 1.0, 1.0, 1.0]),
        4.0,
        jnp.asarray([np.pi / 2 + np.pi, 0.0, 0.0]),
        aabb_from_min_max([-10, -5, -10], [10, 0, 10]),
    )
    smap = jnp.zeros((64, 64), jnp.float32)
    return atmo, t_lut, sky_lut, cam, sun, smap


def empty_gbuffer():
    zeros = jnp.zeros((H, W, 4), jnp.float32)
    return GBuffer(
        diffuse=zeros, specular=zeros, normal=zeros, world_position=zeros, orm=zeros
    )


def test_sky_background_is_blue_daylight(sky_inputs):
    atmo, t_lut, sky_lut, cam, sun, smap = sky_inputs
    color = np.asarray(
        sky_camera_pass(
            jnp.zeros((H, W, 3)),
            jnp.zeros((H, W)),  # all background
            empty_gbuffer(),
            cam,
            atmo,
            t_lut,
            sky_lut,
            sun,
            smap,
        )
    )
    assert np.isfinite(color).all()
    top = color[:8]
    assert top[..., 2].mean() > top[..., 0].mean() > 0  # blue sky
    # ground rows (camera looks at horizon; bottom half hits planet)
    bottom = color[-8:]
    assert bottom.mean() > 0.0


def test_geometry_branch_uses_scene_color(sky_inputs):
    atmo, t_lut, sky_lut, cam, sun, smap = sky_inputs
    # a lit geometry pixel: depth > 0, position above ground (y < 0)
    gb = empty_gbuffer()
    pos = jnp.tile(jnp.asarray([0.0, -1.0, 5.0, 1.0]), (H, W, 1))
    nrm = jnp.tile(jnp.asarray([0.0, -1.0, 0.0, 0.0]), (H, W, 1))
    diffuse = jnp.tile(jnp.asarray([0.5, 0.5, 0.5, 1.0]), (H, W, 1))
    orm = jnp.tile(jnp.asarray([1.0, 0.5, 0.0, 1.0]), (H, W, 1))
    gb = gb._replace(
        world_position=pos, normal=nrm, diffuse=diffuse, specular=diffuse, orm=orm
    )
    scene_color = jnp.full((H, W, 3), 0.25, jnp.float32)
    depth = jnp.full((H, W), 0.5, jnp.float32)
    color = np.asarray(
        sky_camera_pass(
            scene_color, depth, gb, cam, atmo, t_lut, sky_lut, sun, smap
        )
    )
    assert np.isfinite(color).all()
    # the ad-hoc tonemap includes surfaceLuminance = scene color:
    # color >= pow(0.25, 1.2) > 0.18 everywhere on the geometry branch
    assert color.min() > 0.18


def test_tonemap_monotonic(sky_inputs):
    atmo, t_lut, sky_lut, cam, sun, smap = sky_inputs
    bright = sky_camera_pass(
        jnp.full((H, W, 3), 0.9), jnp.full((H, W), 0.5),
        _lit_gbuffer(), cam, atmo, t_lut, sky_lut, sun, smap,
    )
    dim = sky_camera_pass(
        jnp.full((H, W, 3), 0.1), jnp.full((H, W), 0.5),
        _lit_gbuffer(), cam, atmo, t_lut, sky_lut, sun, smap,
    )
    assert float(jnp.mean(bright)) > float(jnp.mean(dim))


def _lit_gbuffer():
    gb = empty_gbuffer()
    pos = jnp.tile(jnp.asarray([0.0, -1.0, 5.0, 1.0]), (H, W, 1))
    nrm = jnp.tile(jnp.asarray([0.0, -1.0, 0.0, 0.0]), (H, W, 1))
    diffuse = jnp.tile(jnp.asarray([0.5, 0.5, 0.5, 1.0]), (H, W, 1))
    orm = jnp.tile(jnp.asarray([1.0, 0.5, 0.0, 1.0]), (H, W, 1))
    return gb._replace(
        world_position=pos, normal=nrm, diffuse=diffuse, specular=diffuse, orm=orm
    )


# --- transfer functions ------------------------------------------------------


def test_oetf_srgb_reference_points():
    # linear 0 -> 0, 1 -> 1, piecewise boundary continuous
    x = jnp.asarray([0.0, 0.0031308, 0.5, 1.0])
    y = np.asarray(oetf_srgb(x))
    assert y[0] == 0.0
    np.testing.assert_allclose(y[1], 12.92 * 0.0031308, atol=1e-6)
    np.testing.assert_allclose(y[2], 1.055 * 0.5 ** (1 / 2.4) - 0.055, atol=1e-6)
    np.testing.assert_allclose(y[3], 1.0, atol=1e-6)


def test_oetf_pure_gamma():
    np.testing.assert_allclose(
        np.asarray(oetf_pure_gamma(jnp.asarray([0.25]))), 0.25 ** (1 / 2.2), atol=1e-6
    )


def test_gradient_color_demo():
    img = np.asarray(gradient_color(16, 32, (1, 0, 0, 1), (0, 0, 1, 1)))
    assert img.shape == (32, 16, 4)
    assert img[0, 0, 0] > img[-1, 0, 0]  # red fades down
    assert img[-1, 0, 2] > img[0, 0, 2]  # blue grows down


def test_matrix_color_demo():
    red = np.arange(16, dtype=np.float32).reshape(4, 4) / 16
    img = np.asarray(matrix_color(64, 64, red, red * 0, red * 0))
    assert img.shape == (64, 64, 4)
    # 4x4 blocks: value constant within a block, increasing across blocks
    assert np.allclose(img[0:16, 0:16, 0], red[0, 0])
    assert img[0, 48, 0] == pytest.approx(red[0, 3])
    assert img[48, 0, 0] == pytest.approx(red[3, 0])


def test_aerial_lut_mode_close():
    """aerial_lut mode (froxel volume + skyview reuse) vs the per-pixel
    32-step integrals: whole-frame deviation far inside the 1e-3 parity
    budget (measured RMSE ~1.5e-4 at 512x288 flagship / 256x128 default)."""
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
        render_frame(geo, params, dataclasses.replace(config, aerial_lut=False))
    )
    b = np.asarray(
        render_frame(geo, params, dataclasses.replace(config, aerial_lut=True))
    )
    d = np.abs(a - b)
    assert float(np.sqrt((d**2).mean())) < 5e-4, d.max()
    assert d.max() < 2e-2, d.max()


def test_sample_environment_shared_bitwise(sky_inputs):
    """sample_environment_shared == sample_environment(+skyview_ground
    aerial) per lane, bitwise: the branch-shared gathers only select input
    coordinates, never change the math."""
    from syzygy_tpu.kernels.sky import (
        sample_environment,
        sample_environment_shared,
        sample_skyview_ground,
    )

    atmo, t_lut, sky_lut, cam, sun, smap = sky_inputs
    rng = np.random.default_rng(11)
    # positions near the surface, directions spanning sky and ground hits
    pos = jnp.asarray(
        np.array([0.0, 6.36, 0.0], np.float32)
        + rng.uniform(-1e-4, 1e-4, (33, 17, 3)).astype(np.float32)
        + np.array([0.0, 1e-4, 0.0], np.float32)
    )
    d = rng.normal(size=(33, 17, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)

    aerial = sample_skyview_ground(atmo, sky_lut, pos, d)
    env_ref, disk_ref = sample_environment(
        atmo, t_lut, sky_lut, pos, d, aerial=aerial
    )
    env, disk = sample_environment_shared(atmo, t_lut, sky_lut, pos, d)
    np.testing.assert_array_equal(np.asarray(env), np.asarray(env_ref))
    np.testing.assert_array_equal(np.asarray(disk), np.asarray(disk_ref))


def test_skyview_tseg_rows_match_exact(sky_inputs):
    """compute_skyview_tseg row values == the exact segment sample at each
    row-center elevation (same math on rotation-invariant inputs)."""
    from syzygy_tpu.kernels.sky import _hit_planet, compute_skyview_tseg

    atmo, t_lut, _, _, _, _ = sky_inputs
    height = 32
    pos = jnp.asarray([0.0, 6.36 + 1e-5, 0.0], jnp.float32)
    rows = np.asarray(compute_skyview_tseg(atmo, t_lut, pos, height))
    assert rows.shape == (height, 3)

    r = float(jnp.linalg.norm(pos))
    sin_h = atmo.planet_radius_mm / r
    horizon_zenith = np.pi - np.arcsin(float(sin_h))
    for j in [height // 2, height // 2 + 3, height - 1]:
        v = (j + 0.5) / height
        frac = ((v - 0.5) * 2.0) ** 2
        vz = horizon_zenith + frac * (np.pi - horizon_zenith)
        d = jnp.asarray([np.sin(vz), np.cos(vz), 0.0], jnp.float32)[None]
        hit, dist = _hit_planet(atmo, pos[None], d)
        assert bool(hit[0]), j
        surface = pos[None] + dist[..., None] * d
        exact = np.asarray(
            atm.sample_transmittance_segment(t_lut, atmo, pos[None], surface)
        )[0]
        np.testing.assert_allclose(rows[j], exact, rtol=0, atol=1e-5)
    # above-horizon rows are the unused 1.0 filler
    np.testing.assert_array_equal(rows[0], np.ones(3, np.float32))


def test_skyview_tseg_frame_close():
    """skyview_tseg mode (t_seg rides the skyview gather) vs the exact
    per-pixel segment sample: whole-frame deviation inside the parity
    budget."""
    import dataclasses

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
            geo, params, dataclasses.replace(config, skyview_tseg=False)
        )
    )
    b = np.asarray(
        render_frame(
            geo, params, dataclasses.replace(config, skyview_tseg=True)
        )
    )
    d = np.abs(a - b)
    assert float(np.sqrt((d**2).mean())) < 5e-4, (d.max(), np.sqrt((d**2).mean()))
    assert d.max() < 2e-2, d.max()


def test_skyview_f16_frame_close():
    """skyview_f16 (f16 quad storage, f32 filtering) vs f32 storage:
    whole-frame deviation at storage-precision scale, far inside the
    parity budget."""
    import dataclasses

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
            geo, params, dataclasses.replace(config, skyview_f16=False)
        )
    )
    b = np.asarray(
        render_frame(
            geo, params, dataclasses.replace(config, skyview_f16=True)
        )
    )
    d = np.abs(a - b)
    assert float(np.sqrt((d**2).mean())) < 2e-4, (d.max(), np.sqrt((d**2).mean()))
    assert d.max() < 5e-3, d.max()


def test_transmittance_dims_frame_close():
    """A 256x64 transmittance LUT (cheap gather tier, tools/
    gather_width_probe2.py) vs the reference 512x128: whole-frame deviation
    inside the parity budget."""
    import dataclasses

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
    a = np.asarray(render_frame(geo, params, config))
    b = np.asarray(
        render_frame(
            geo,
            params,
            dataclasses.replace(
                config, transmittance_width=256, transmittance_height=64
            ),
        )
    )
    d = np.abs(a - b)
    assert float(np.sqrt((d**2).mean())) < 5e-4, (d.max(), np.sqrt((d**2).mean()))
    assert d.max() < 2e-2, d.max()


def test_lut_f16_frame_close():
    """lut_f16 (f16 per-pixel sampling copies of the transmittance quad +
    froxel volume; all LUT builds still consume the f32 originals) vs
    exact: whole-frame deviation at storage-precision scale, far inside
    the parity budget."""
    import dataclasses

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
        render_frame(geo, params, dataclasses.replace(config, lut_f16=False))
    )
    b = np.asarray(
        render_frame(geo, params, dataclasses.replace(config, lut_f16=True))
    )
    d = np.abs(a - b)
    assert float(np.sqrt((d**2).mean())) < 3e-4, (
        d.max(),
        np.sqrt((d**2).mean()),
    )
    assert d.max() < 5e-3, d.max()


def test_skyview_q8_frame_close():
    """skyview_q8 (u8 block-scaled quad, one u32[4] gather) vs exact f32
    storage: blockwise-relative quantization of a smooth luminance field
    stays far inside the parity budget at frame level."""
    import dataclasses

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
            geo, params,
            dataclasses.replace(config, skyview_f16=False, skyview_q8=False),
        )
    )
    b = np.asarray(
        render_frame(
            geo, params, dataclasses.replace(config, skyview_q8=True)
        )
    )
    d = np.abs(a - b)
    assert float(np.sqrt((d**2).mean())) < 5e-4, (
        d.max(),
        np.sqrt((d**2).mean()),
    )
    assert d.max() < 1e-2, d.max()


def test_pack_lut_q8_roundtrip():
    """PackedLUTQ8 decode reproduces each stored value to within
    local_max/510, and exact zeros stay exact."""
    from syzygy_tpu.kernels.atmosphere import (
        pack_lut_q8,
        sample_lut_bilinear,
    )

    rng = np.random.default_rng(11)
    h, w = 16, 32
    lut = jnp.asarray(rng.random((h, w, 3), np.float32) ** 3)
    lut = lut.at[0].set(0.0)  # a zero row must decode to exact zero
    q8 = pack_lut_q8(lut)
    # sample exactly at texel centers: bilinear weights collapse to the
    # stored texel, so the error is pure quantization
    us = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    vs = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    uu, vv = jnp.meshgrid(us, vs)
    got = np.asarray(sample_lut_bilinear(q8, uu, vv))
    ref = np.asarray(lut)
    # the quantization scale is the 2x2 FOOTPRINT's max (12 values:
    # this texel + right/down/diag neighbors, edge-clamped)
    xr = np.minimum(np.arange(w) + 1, w - 1)
    yd = np.minimum(np.arange(h) + 1, h - 1)
    quad_max = np.stack(
        [ref, ref[:, xr], ref[yd], ref[yd][:, xr]], axis=0
    ).max(axis=(0, -1))[..., None]
    assert np.all(np.abs(got - ref) <= quad_max / 510.0 + 1e-7), np.abs(
        got - ref
    ).max()
    assert np.all(got[0] == 0.0)
