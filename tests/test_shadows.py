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
