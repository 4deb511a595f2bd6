"""Scene layer: packing shapes, light construction, sun animation, defaults."""

import math

import jax
import numpy as np
import pytest

from syzygy_tpu.assets import TextureLibrary, cube_mesh, register_default_textures
from syzygy_tpu.scene import (
    MAX_SPOT_LIGHTS,
    Atmosphere,
    Camera,
    InstanceAnimation,
    Scene,
    SunAnimation,
    TransformHost,
    default_scene,
    pack_frame_params,
    pack_geometry,
    prepare_frame_state,
)


def test_multiple_cameras_switch_view():
    """Renderer camera capacity (renderer.hpp:113-121): the scene holds
    several cameras; switching camera_index changes the packed view."""
    from syzygy_tpu.scene.camera import Camera

    scene, _ = default_scene()
    idx = scene.add_camera(Camera(position=(30.0, -5.0, 0.0)))
    assert idx == 1
    p0 = pack_frame_params(scene, 16 / 9)
    scene.camera_index = idx
    p1 = pack_frame_params(scene, 16 / 9)
    assert not np.allclose(p0.cam_position, p1.cam_position)
    np.testing.assert_allclose(p1.cam_position, [30.0, -5.0, 0.0])
    # active-camera mutation goes to the selected camera only
    scene.camera.position = (1.0, 2.0, 3.0)
    assert tuple(scene.cameras[1].position) == (1.0, 2.0, 3.0)
    scene.camera_index = 0
    assert tuple(scene.cameras[0].position) != (1.0, 2.0, 3.0)
    # capacity guard
    for _ in range(Scene.MAX_CAMERAS - len(scene.cameras)):
        scene.add_camera()
    import pytest as _pytest

    with _pytest.raises(ValueError):
        scene.add_camera()


def test_per_surface_material_override():
    """Per-surface material overrides (renderer/scene.hpp:109-147) replace
    the mesh's authored material at pack time."""
    from syzygy_tpu.assets import (
        MaterialData,
        TextureLibrary,
        cube_mesh,
        register_default_textures,
    )
    from syzygy_tpu.scene import TransformHost

    lib = TextureLibrary()
    mat = register_default_textures(lib)
    red = np.zeros((8, 8, 4), np.float32)
    red[..., 0] = 0.8
    red[..., 3] = 1.0
    red_id = lib.register("override_red", red)
    override = MaterialData(color=red_id, normal=mat.normal, orm=mat.orm)

    scene = Scene()
    inst = scene.add_mesh_instance(
        cube_mesh(mat), "Cube", [TransformHost.make((0, -4, 0))]
    )
    base = pack_geometry(scene, lib)
    inst.set_material_override(0, override)
    packed = pack_geometry(scene, lib)
    assert int(base.materials[0, 0]) == mat.color
    assert int(packed.materials[0, 0]) == red_id


def test_host_pack_scales_flat_to_10k_instances():
    """pack_frame_params + tick must be SoA array math: 10k animated
    instances pack in host microseconds-per-instance, not Python-loop time."""
    import time

    from syzygy_tpu.assets import TextureLibrary, cube_mesh, register_default_textures
    from syzygy_tpu.scene import Scene, TransformHost
    from syzygy_tpu.scene.scene import InstanceAnimation

    lib = TextureLibrary()
    mat = register_default_textures(lib)
    n = 10_000
    transforms = [
        TransformHost.make((i % 100, -2.0, i // 100)) for i in range(n)
    ]
    scene = Scene()
    scene.add_mesh_instance(
        cube_mesh(mat), "Field", transforms,
        animation=InstanceAnimation.DIAGONAL_WAVE,
    )
    scene.tick(0.016)
    # per-iteration MIN, not the mean: the suite shares a 1-CPU box with
    # background jobs, and one descheduled iteration flaked the mean bound
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        scene.tick(0.016)
        params = pack_frame_params(scene, 16 / 9)
        times.append(time.perf_counter() - t0)
    dt_ms = min(times) * 1000
    assert params.translations.shape == (n, 3)
    # wave animation went through the SoA block
    assert np.std(params.translations[:, 1]) > 0.1
    # generous CI bound: vectorized path runs in ~1 ms; the old per-object
    # loop took ~100 ms at this count (bound is loose: the suite may share
    # the machine with other jobs)
    assert dt_ms < 80, f"host pack took {dt_ms:.1f} ms for 10k instances"


def test_default_scene_packs():
    scene, library = default_scene()
    geo = pack_geometry(scene, library)
    # 2 cubes (24 verts) + plane (4 verts) = 52 -> padded to 128
    assert geo.positions.shape == (128, 3)
    assert geo.triangles.shape[0] == 128  # 2*12 + 2 = 26 tris -> 128
    assert int(geo.tri_valid.sum()) == 26
    assert geo.materials.shape == (1, 3)  # all share the default material
    assert geo.tex_rects.shape[0] == 3  # orm, color, normal

    params = pack_frame_params(scene, 16 / 9)
    # host path is numpy-only
    assert all(
        isinstance(l, (np.ndarray, np.generic)) for l in jax.tree.leaves(params)
    )
    frame = jax.jit(prepare_frame_state)(params)
    assert frame.models.shape == (3, 4, 4)
    assert int(frame.directional_count) == 2  # sun + moon
    assert int(frame.spot_count) == 1
    assert frame.directional_lights.projection.shape == (2, 4, 4)
    assert frame.spot_lights.projection.shape == (MAX_SPOT_LIGHTS, 4, 4)


def test_prepare_frame_models_match_host_matrices():
    scene, library = default_scene()
    scene.tick(0.37)
    params = pack_frame_params(scene, 1.0)
    frame = jax.jit(prepare_frame_state)(params)
    host = np.concatenate(
        [i.model_matrices() for i in scene.geometry if i.mesh is not None]
    )
    np.testing.assert_allclose(np.asarray(frame.models), host, atol=1e-4)
    # inverse transposes really are inverse transposes
    for m, it in zip(host, np.asarray(frame.model_inv_transpose)):
        np.testing.assert_allclose(m.T @ it, np.eye(4), atol=2e-3)


def test_floor_plane_scale_normalization():
    # setMesh (scene.cpp:796-820): plane's flat axis floors at 0.01 -> x100
    scene, _ = default_scene()
    floor = next(i for i in scene.geometry if "Floor" in i.name)
    np.testing.assert_allclose(floor.transforms[0].scale, [2000.0, 100.0, 2000.0])
    cube1 = next(i for i in scene.geometry if "Model_1" in i.name)
    np.testing.assert_allclose(cube1.transforms[0].scale, [5.0, 5.0, 5.0])


def test_shadow_bounds_covers_floor():
    scene, _ = default_scene()
    bounds_min, bounds_max = scene.shadow_bounds()
    assert float(bounds_max[0]) >= 2000.0
    assert float(bounds_min[0]) <= -2000.0


def test_sun_animation_wrap_and_skip_night():
    anim = SunAnimation(frozen=False, time=0.999, speed=86400.0, skip_night=False)
    anim.tick(0.5)  # advances 0.5 of a day
    assert 0.0 <= anim.time < 1.0
    night = SunAnimation(frozen=False, time=0.1, speed=100.0, skip_night=True)
    night.tick(0.01)
    assert night.time == pytest.approx(0.25 - 0.015)


def test_sun_pitch_straight_down_at_midnight():
    anim = SunAnimation(time=0.0)
    assert anim.sun_pitch_radians() == pytest.approx(math.pi / 2)
    # noon: sun overhead -> pitch = pi/2 + pi
    anim.time = 0.5
    assert anim.sun_pitch_radians() == pytest.approx(math.pi / 2 + math.pi)


def test_atmosphere_packed_sun_direction_skyspace():
    # At noon the sun is straight up in engine space (-y), so sky space (+y up)
    # has direction_to_sun = +y, incident = -y.
    atmo = Atmosphere(sun_euler_angles=(math.pi / 2 + math.pi, 0.0, 0.0))
    packed = atmo.packed()
    np.testing.assert_allclose(
        np.asarray(packed.incident_direction_sun), [0, -1, 0], atol=1e-6
    )


def test_moonlight_strength_clamp():
    from syzygy_tpu.math.geometry import aabb_from_min_max
    from syzygy_tpu.scene.atmosphere import _create_moonlight

    bounds = aabb_from_min_max([-1, -1, -1], [1, 1, 1])
    # far from sunset: strength saturates at 0.02
    light = _create_moonlight(bounds, sun_cosine=1.0, sunset_cosine=0.06)
    assert float(light.strength) == pytest.approx(0.02)
    # at sunset: zero
    light = _create_moonlight(bounds, sun_cosine=0.06, sunset_cosine=0.06)
    assert float(light.strength) == pytest.approx(0.0)


def test_instance_animations():
    lib = TextureLibrary()
    mat = register_default_textures(lib)
    scene = Scene()
    inst = scene.add_mesh_instance(
        cube_mesh(mat),
        "waver",
        [TransformHost.make((1.0, 0.0, 2.0))],
        animation=InstanceAnimation.DIAGONAL_WAVE,
    )
    spin = scene.add_mesh_instance(
        cube_mesh(mat),
        "spinner",
        [TransformHost.make((0.0, 0.0, 0.0))],
        animation=InstanceAnimation.SPIN_ALONG_WORLD_UP,
    )
    scene.tick(0.25)
    expected_y = math.sin(0.25 + (1.0 + 10.0 + 2.0 + 10.0) / 3.1415)
    assert inst.transforms[0].translation[1] == pytest.approx(expected_y, abs=1e-6)
    assert spin.transforms[0].euler_angles[2] == pytest.approx(0.25)


def test_pack_frame_params_is_fast():
    import time

    scene, _ = default_scene()
    pack_frame_params(scene, 1.0)  # warm any caches
    t0 = time.perf_counter()
    for _ in range(20):
        scene.tick(0.016)
        pack_frame_params(scene, 1.0)
    per_frame_ms = (time.perf_counter() - t0) / 20 * 1000
    # Host packing must be a tiny fraction of the 16.6 ms frame budget
    assert per_frame_ms < 5.0, f"pack_frame_params too slow: {per_frame_ms:.2f} ms"


def test_camera_packed_inverse_consistency():
    cam = Camera()
    packed = cam.packed(1.5)
    proj = np.asarray(packed.projection)
    inv = np.asarray(packed.inverse_projection)
    np.testing.assert_allclose(proj @ inv, np.eye(4), atol=1e-4)
    pv_inv = np.asarray(packed.proj_view_inverse)
    pv = proj @ np.asarray(packed.view)
    np.testing.assert_allclose(pv @ pv_inv, np.eye(4), atol=1e-4)


def test_camera_fly_input():
    cam = Camera(position=(0.0, 0.0, 0.0), euler_angles=(0.0, 0.0, 0.0))
    cam.handle_input(1.0, keys=frozenset("w"), speed=2.0)
    np.testing.assert_allclose(cam.position, [0, 0, 2.0], atol=1e-6)
    # yaw 90deg right then move forward -> +x
    cam2 = Camera(position=(0.0, 0.0, 0.0), euler_angles=(0.0, 0.0, math.pi / 2))
    cam2.handle_input(1.0, keys=frozenset("w"), speed=1.0)
    np.testing.assert_allclose(cam2.position, [1.0, 0, 0], atol=1e-6)


def test_scene_uses_metallic_detection():
    from syzygy_tpu.assets import (
        TextureLibrary,
        cube_mesh,
        register_default_textures,
    )
    from syzygy_tpu.scene import Scene, TransformHost, scene_uses_metallic

    lib = TextureLibrary()
    mat = register_default_textures(lib)  # default ORM has zero metallic
    s = Scene()
    s.add_mesh_instance(cube_mesh(mat), "c", [TransformHost.make((0, 0, 0))])
    assert scene_uses_metallic(s, lib) is False

    metal_orm = np.zeros((4, 4, 4), np.float32)
    metal_orm[..., 2] = 1.0  # metallic channel
    midx = lib.register("metal_orm", metal_orm)
    from syzygy_tpu.assets.types import MaterialData

    mat2 = MaterialData(color=mat.color, normal=mat.normal, orm=midx)
    s2 = Scene()
    s2.add_mesh_instance(
        cube_mesh(mat2), "m", [TransformHost.make((0, 0, 0))]
    )
    assert scene_uses_metallic(s2, lib) is True


def test_frame_draw_stats():
    """Draw Results counters (renderer/pipelines.hpp:39-44, surfaced at
    ui/engineui.cpp:111-126): the host mirror must agree with the packed
    soup and with _shadow_pass's activity gate."""
    import numpy as np

    from syzygy_tpu.renderer import RenderConfig
    from syzygy_tpu.renderer.stats import frame_draw_stats
    from syzygy_tpu.scene import default_scene, pack_frame_params, pack_geometry

    scene, library = default_scene()
    scene.sun_animation.time = 0.35
    scene.sun_animation.frozen = True
    scene.tick(0.0)
    geometry = pack_geometry(scene, library)
    params = pack_frame_params(scene, 2.0, debug_lines=True)
    config = RenderConfig(width=256, height=128, shadow_dim=256)

    stats = frame_draw_stats(params, geometry, config)
    n_tris = int(np.asarray(geometry.tri_valid).sum())
    assert stats["gbuffer"].draw_calls == 1
    assert stats["gbuffer"].indices_drawn == 3 * n_tris
    assert stats["gbuffer"].vertices_drawn == geometry.positions.shape[0]
    # default scene: sun always + spots; the midday moon is dim enough for
    # the shadowless default gate but at t=0.35 daylight makes eps strict —
    # either way the count is bounded by the map budget and >= 1.
    assert 1 <= stats["shadows"].draw_calls <= config.n_shadow_maps
    shadow_tris = int(
        (
            np.asarray(geometry.tri_valid) & np.asarray(geometry.tri_casts_shadow)
        ).sum()
    )
    assert (
        stats["shadows"].indices_drawn
        == stats["shadows"].draw_calls * 3 * shadow_tris
    )
    # debug lines: reference-exact 2 endpoints per segment
    n_seg = int(np.asarray(params.debug_valid).sum())
    assert n_seg > 0
    assert stats["debug_lines"] == (1, 2 * n_seg, 2 * n_seg)
    assert stats["total"].draw_calls == (
        1 + stats["shadows"].draw_calls + 1
    )

    # eps=0 keeps every emitting directional: count can only grow
    config0 = RenderConfig(
        width=256, height=128, shadow_dim=256, shadowless_strength_eps=0.0
    )
    stats0 = frame_draw_stats(params, geometry, config0)
    assert stats0["shadows"].draw_calls >= stats["shadows"].draw_calls
