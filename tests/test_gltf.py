"""glTF loader: GLB container, accessors, Y-flip, ORM synthesis, node TRS."""

import io
import json
import struct

import numpy as np
import pytest

from syzygy_tpu.assets.gltf import (
    GLTFFile,
    load_gltf_meshes,
    load_gltf_scene,
    parse_glb,
)


def build_test_glb(tmp_path, with_texture=True, node_translation=(0, 0, 0)):
    """A quad (+y up, glTF convention) with a 2x2 checker baseColor texture
    and a metallicRoughness texture."""
    positions = np.array(
        [[-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1]], np.float32
    )
    normals = np.tile(np.array([[0, 1, 0]], np.float32), (4, 1))
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    indices = np.array([0, 1, 2, 0, 2, 3], np.uint16)

    bin_parts = []
    views = []
    accessors = []

    def add(arr, target, acc_type, comp):
        offset = sum(len(p) for p in bin_parts)
        raw = arr.tobytes()
        bin_parts.append(raw + b"\x00" * ((-len(raw)) % 4))
        views.append(
            {"buffer": 0, "byteOffset": offset, "byteLength": len(raw)}
        )
        accessors.append(
            {
                "bufferView": len(views) - 1,
                "componentType": comp,
                "count": len(arr),
                "type": acc_type,
            }
        )
        return len(accessors) - 1

    pos_acc = add(positions, 34962, "VEC3", 5126)
    nrm_acc = add(normals, 34962, "VEC3", 5126)
    uv_acc = add(uvs, 34962, "VEC2", 5126)
    idx_acc = add(indices, 34963, "SCALAR", 5123)

    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [
            {"mesh": 0, "translation": list(node_translation)}
        ],
        "meshes": [
            {
                "name": "quad",
                "primitives": [
                    {
                        "attributes": {
                            "POSITION": pos_acc,
                            "NORMAL": nrm_acc,
                            "TEXCOORD_0": uv_acc,
                        },
                        "indices": idx_acc,
                        "material": 0 if with_texture else None,
                    }
                ],
            }
        ],
        "buffers": [{"byteLength": sum(len(p) for p in bin_parts)}],
        "bufferViews": views,
        "accessors": accessors,
    }
    if with_texture:
        from PIL import Image

        def png_bytes(arr):
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, "PNG")
            raw = buf.getvalue()
            return raw + b"\x00" * ((-len(raw)) % 4)

        checker = np.zeros((2, 2, 4), np.uint8)
        checker[0, 0] = checker[1, 1] = [255, 255, 255, 255]
        checker[0, 1] = checker[1, 0] = [0, 0, 0, 255]
        mr = np.zeros((2, 2, 4), np.uint8)
        mr[:, :] = [17, 200, 100, 255]  # r=ignored occ, g=rough, b=metal

        for img in (checker, mr):
            raw = png_bytes(img)
            offset = sum(len(p) for p in bin_parts)
            bin_parts.append(raw)
            views.append(
                {"buffer": 0, "byteOffset": offset, "byteLength": len(raw)}
            )
        gltf["images"] = [
            {"bufferView": len(views) - 2, "mimeType": "image/png"},
            {"bufferView": len(views) - 1, "mimeType": "image/png"},
        ]
        gltf["textures"] = [{"source": 0}, {"source": 1}]
        gltf["materials"] = [
            {
                "name": "mat",
                "pbrMetallicRoughness": {
                    "baseColorTexture": {"index": 0},
                    "metallicRoughnessTexture": {"index": 1},
                },
            }
        ]
        gltf["buffers"][0]["byteLength"] = sum(len(p) for p in bin_parts)
    else:
        gltf["meshes"][0]["primitives"][0].pop("material")

    json_bytes = json.dumps(gltf).encode()
    json_bytes += b" " * ((-len(json_bytes)) % 4)
    binary = b"".join(bin_parts)
    total = 12 + 8 + len(json_bytes) + 8 + len(binary)
    glb = (
        struct.pack("<III", 0x46546C67, 2, total)
        + struct.pack("<II", len(json_bytes), 0x4E4F534A)
        + json_bytes
        + struct.pack("<II", len(binary), 0x004E4942)
        + binary
    )
    path = tmp_path / "quad.glb"
    path.write_bytes(glb)
    return str(path)


def test_glb_container_roundtrip(tmp_path):
    path = build_test_glb(tmp_path)
    with open(path, "rb") as fh:
        gltf, binary = parse_glb(fh.read())
    assert gltf["meshes"][0]["name"] == "quad"
    assert len(binary) > 0


def test_mesh_load_yflip(tmp_path):
    path = build_test_glb(tmp_path)
    meshes, library = load_gltf_meshes(path)
    assert len(meshes) == 1
    mesh = meshes[0]
    assert mesh.positions.shape == (4, 3)
    # glTF +y-up quad normals (0,1,0) -> engine (0,-1,0) after Y-flip
    np.testing.assert_allclose(mesh.normals, [[0, -1, 0]] * 4)
    assert mesh.triangles.shape == (2, 3)


def test_material_orm_synthesis(tmp_path):
    path = build_test_glb(tmp_path)
    meshes, library = load_gltf_meshes(path)
    mat = meshes[0].surfaces[0].material
    orm = library.get(mat.orm)
    # occlusion channel saturated to 1.0 (assets.cpp:781), g/b preserved
    np.testing.assert_allclose(orm[..., 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(orm[..., 1], 200 / 255, atol=1e-3)
    np.testing.assert_allclose(orm[..., 2], 100 / 255, atol=1e-3)
    # color map went through sRGB decode: mid-grey != linear mid-grey
    color = library.get(mat.color)
    assert color.max() <= 1.0


def test_untextured_mesh_gets_defaults(tmp_path):
    path = build_test_glb(tmp_path, with_texture=False)
    meshes, library = load_gltf_meshes(path)
    mat = meshes[0].surfaces[0].material
    assert library.lookup("default_color") == mat.color
    assert library.lookup("default_orm") == mat.orm


def test_scene_instancing_applies_node_transform(tmp_path):
    path = build_test_glb(tmp_path, node_translation=(5.0, 2.0, 0.0))
    scene, library = load_gltf_scene(path)
    assert len(scene.geometry) == 1
    mesh = scene.geometry[0].mesh
    center = mesh.positions.mean(axis=0)
    # translation (5, 2, 0) in glTF (+y up) -> (5, -2, 0) in engine (+y down)
    np.testing.assert_allclose(center, [5.0, -2.0, 0.0], atol=1e-5)
    # scale normalization must not distort authored size
    np.testing.assert_allclose(scene.geometry[0].transforms[0].scale, 1.0)


def test_glb_writer_roundtrip(tmp_path):
    from syzygy_tpu.assets import TextureLibrary, register_default_textures, sphere_mesh
    from syzygy_tpu.assets.gltf_export import write_glb

    lib = TextureLibrary()
    mat = register_default_textures(lib)
    mesh = sphere_mesh(mat, rings=8, segments=16)
    path = str(tmp_path / "sphere.glb")
    write_glb(path, [mesh])
    loaded, _ = load_gltf_meshes(path)
    assert len(loaded) == 1
    np.testing.assert_array_equal(loaded[0].positions, mesh.positions)
    np.testing.assert_array_equal(loaded[0].normals, mesh.normals)
    np.testing.assert_array_equal(loaded[0].triangles, mesh.triangles)
    np.testing.assert_array_equal(loaded[0].uvs, mesh.uvs)


def test_repo_sphere_glb_loads_as_scene():
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "assets", "sphere.glb")
    scene, library = load_gltf_scene(path)
    assert len(scene.geometry) == 1
    mesh = scene.geometry[0].mesh
    assert mesh.triangles.shape[0] > 1000
    # unit sphere: radius ~1 everywhere
    r = np.linalg.norm(mesh.positions, axis=1)
    np.testing.assert_allclose(r, 1.0, atol=1e-5)
