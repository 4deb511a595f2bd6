"""End-to-end shadow mapping: a cube casts a visible shadow on the floor.

The editor default scene dilutes the sun's ortho frustum with its ±2000-unit
floor (parity behavior, shadow texels ≫ cube) — this scene keeps bounds tight
like the reference's ``Scene::defaultScene`` (floor castsShadow=false,
``scene.cpp:245-260``)."""

import numpy as np

from syzygy_tpu.assets import (
    TextureLibrary,
    cube_mesh,
    plane_mesh,
    register_default_textures,
)
from syzygy_tpu.math.geometry import eulers_from_forward
from syzygy_tpu.renderer import RenderConfig, render_frame
from syzygy_tpu.scene import Scene, TransformHost, pack_frame_params, pack_geometry


def test_cube_casts_shadow_on_floor():
    lib = TextureLibrary()
    mat = register_default_textures(lib)
    scene = Scene()
    scene.add_mesh_instance(
        cube_mesh(mat), "Cube", [TransformHost.make((0, -4.0, 0), scale=(2, 2, 2))]
    )
    scene.add_mesh_instance(
        plane_mesh(mat),
        "Floor",
        [TransformHost.make((0, 0, 0), scale=(0.15, 1.0, 0.15))],
        casts_shadow=False,
    )
    scene.sun_animation.time = 0.4
    scene.sun_animation.frozen = True
    scene.tick(0.0)
    eye = np.array([15.0, -12.0, -18.0], np.float32)
    scene.camera.position = tuple(eye)
    scene.camera.euler_angles = tuple(
        np.asarray(eulers_from_forward(np.array([0, -2.0, 0], np.float32) - eye))
    )
    cfg = RenderConfig(
        width=256, height=128, shadow_dim=512, skyview_width=128, skyview_height=64
    )
    geo = pack_geometry(scene, lib)
    img = np.asarray(render_frame(geo, pack_frame_params(scene, 2.0), cfg))

    # the shadow is far darker than even the dark checker squares: the floor
    # region next to the cube contains near-black pixels, the far floor none
    lum = img.mean(-1)
    near_cube = lum[58:80, 90:135]
    far_floor = lum[58:80, 160:210]
    assert near_cube.min() < 0.15, f"no shadow: min {near_cube.min():.3f}"
    assert far_floor.min() > 0.3, f"far floor unexpectedly dark: {far_floor.min():.3f}"


def test_five_spotlights_all_cast_shadows():
    """Shadow capacity parity: the reference rasters up to 10 maps
    (deferred.cpp:179-180); with 5 spotlights every spot (maps 2..6) must
    get a real depth raster, not silently degrade past the old 4-map cap."""
    import jax

    from syzygy_tpu.math.geometry import eulers_from_forward as _eff
    from syzygy_tpu.renderer.frame import _shadow_pass
    from syzygy_tpu.scene.pack import prepare_frame_state
    from syzygy_tpu.kernels.resolve import transform_positions
    import jax.numpy as jnp

    lib = TextureLibrary()
    mat = register_default_textures(lib)
    scene = Scene()
    scene.add_mesh_instance(
        cube_mesh(mat), "Cube", [TransformHost.make((0, -4.0, 0), scale=(2, 2, 2))]
    )
    scene.add_mesh_instance(
        plane_mesh(mat), "Floor", [TransformHost.make((0, 0, 0))],
        casts_shadow=False,
    )
    for k in range(5):  # ring of spots aimed at the cube
        ang = 2 * np.pi * k / 5
        pos = (10 * np.cos(ang), -9.0, 10 * np.sin(ang))
        fwd = np.array([0, -4.0, 0], np.float32) - np.asarray(pos, np.float32)
        scene.add_spotlight(
            (1.0, 0.8, 0.6, 1.0),
            TransformHost.make(
                pos, euler_angles=tuple(np.asarray(_eff(fwd)))
            ),
        )
    scene.tick(0.0)
    cfg = RenderConfig(
        width=128, height=64, shadow_dim=256, skyview_width=128,
        skyview_height=64,
    )
    geo = pack_geometry(scene, lib)
    params = pack_frame_params(scene, 2.0)
    state = prepare_frame_state(params)
    proj_view = state.camera.projection @ state.camera.view
    _, world = transform_positions(
        geo.positions, geo.vert_instance, state.models, proj_view
    )
    world_h = jnp.concatenate(
        [world, jnp.ones((world.shape[0], 1), jnp.float32)], axis=-1
    )
    maps = np.asarray(
        jax.jit(lambda g, w, s: _shadow_pass(g, w, s, cfg))(
            geo, world_h, state
        )
    )
    assert maps.shape[0] == 18  # 2 directional + 16 spot slots
    for j in range(5):  # every spot map rastered the caster cube
        assert maps[2 + j].max() > 0.0, f"spot {j} got no shadow raster"
    assert maps[2 + 5].max() == 0.0  # unused slots stay empty


def test_depth_bias_shifts_occluder_depth():
    """vkCmdSetDepthBias parity (pipelines.cpp:716, shadowpass.hpp:26-27):
    constant bias shifts every raster depth by constant * 2^-23; slope bias
    shifts by slope * max|dz/dxy| of the triangle; 0 bias is bitwise
    unchanged."""
    import jax.numpy as jnp

    from syzygy_tpu.kernels.raster import rasterize, setup_triangles

    # a tilted triangle so dz/dx is nonzero (slope term has something to do)
    clip = jnp.asarray(
        [
            [-0.8, -0.8, 0.30, 1.0],
            [0.8, -0.8, 0.80, 1.0],
            [0.0, 0.8, 0.55, 1.0],
        ],
        jnp.float32,
    )
    tris = jnp.asarray([[0, 1, 2]], jnp.int32)
    valid = jnp.ones(1, bool)

    def raster(constant, slope):
        setup = setup_triangles(
            clip, tris, valid, 128, 64, 0,
            depth_bias_constant=constant, depth_bias_slope=slope,
        )
        return np.asarray(rasterize(setup, 128, 64, depth_only=True).depth)

    base = raster(0.0, 0.0)
    covered = base > 0.0
    assert covered.any()

    # constant bias: exactly constant * 2^-23 everywhere on the triangle
    big = raster(1e4, 0.0)
    np.testing.assert_allclose(
        big[covered] - base[covered], 1e4 * 2.0**-23, rtol=1e-4
    )

    # slope bias: shifts by slope * max(|dz/dx|, |dz/dy|) (analytic here)
    sloped = raster(0.0, 1.0)
    # screen triangle: x spans 0.1*128..0.9*128, z spans 0.30..0.80 over it
    dzdx = (0.80 - 0.30) / (0.8 * 128)
    shift = sloped[covered] - base[covered]
    np.testing.assert_allclose(shift, shift[0], atol=1e-7)  # uniform
    np.testing.assert_allclose(shift[0], dzdx, rtol=0.2)

    # negative bias moves occluders away from the light (reverse-Z)
    neg = raster(-1e4, 0.0)
    assert (neg[covered] < base[covered]).all()

    # default-0 bias leaves the raster bitwise identical
    np.testing.assert_array_equal(raster(0.0, 0.0), base)
