"""Scene save/load round-trip (checkpoint/resume; beyond-reference feature)."""

import numpy as np

from syzygy_tpu.assets import TextureLibrary, cube_mesh, plane_mesh, register_default_textures
from syzygy_tpu.scene import default_scene, pack_frame_params
from syzygy_tpu.scene.serialize import load_scene, save_scene


def test_scene_roundtrip(tmp_path):
    from syzygy_tpu.assets import MaterialData
    from syzygy_tpu.scene.camera import Camera

    scene, library = default_scene()
    scene.sun_animation.time = 0.123
    scene.camera.position = (1.0, -2.0, 3.0)
    scene.add_camera(Camera(position=(9.0, -9.0, 9.0)))
    scene.geometry[0].set_material_override(
        0, MaterialData(color=2, normal=1, orm=0)
    )
    scene.tick(0.5)
    path = str(tmp_path / "scene.json")
    save_scene(path, scene)

    material = register_default_textures(TextureLibrary())
    meshes = {
        "mesh_Cube": cube_mesh(material),
        "mesh_Plane": plane_mesh(material),
    }
    loaded = load_scene(path, meshes.__getitem__)

    assert loaded.camera.position == (1.0, -2.0, 3.0)
    assert len(loaded.cameras) == 2
    assert loaded.cameras[1].position == (9.0, -9.0, 9.0)
    assert loaded.geometry[0].material_overrides[0] == MaterialData(2, 1, 0)
    assert abs(loaded.sun_animation.time - scene.sun_animation.time) < 1e-9
    assert len(loaded.geometry) == len(scene.geometry)
    assert len(loaded.spotlights) == 1
    # the resumed scene packs to identical frame params
    a = pack_frame_params(scene, 1.5)
    b = pack_frame_params(loaded, 1.5)
    np.testing.assert_allclose(a.translations, b.translations)
    np.testing.assert_allclose(a.scales, b.scales)
    np.testing.assert_allclose(
        a.atmosphere.sun_euler_angles, b.atmosphere.sun_euler_angles
    )
    np.testing.assert_allclose(a.spots.position, b.spots.position)
    # resume: ticking both scenes advances identically
    scene.tick(1.0)
    loaded.tick(1.0)
    a2 = pack_frame_params(scene, 1.5)
    b2 = pack_frame_params(loaded, 1.5)
    np.testing.assert_allclose(
        a2.atmosphere.sun_euler_angles, b2.atmosphere.sun_euler_angles
    )
