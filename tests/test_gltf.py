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


# ---------------------------------------------------------------------------
# adversarial GLBs: normalized / sparse / interleaved accessors
# (fastgltf handles all of these transparently — assets.cpp:887-1091; the
# loader must match its semantics, not just round-trip self-authored files)
# ---------------------------------------------------------------------------


def _wrap_glb(tmp_path, gltf, binary, name="adv.glb"):
    json_bytes = json.dumps(gltf).encode()
    json_bytes += b" " * ((-len(json_bytes)) % 4)
    binary += b"\x00" * ((-len(binary)) % 4)
    total = 12 + 8 + len(json_bytes) + 8 + len(binary)
    glb = (
        struct.pack("<III", 0x46546C67, 2, total)
        + struct.pack("<II", len(json_bytes), 0x4E4F534A)
        + json_bytes
        + struct.pack("<II", len(binary), 0x004E4942)
        + binary
    )
    path = tmp_path / name
    path.write_bytes(glb)
    return str(path)


class _GLBBuilder:
    """Minimal hand-rolled GLB: raw control over views/accessors."""

    def __init__(self):
        self.parts = []
        self.views = []
        self.accessors = []

    def view(self, raw, stride=None):
        offset = sum(len(p) for p in self.parts)
        self.parts.append(raw + b"\x00" * ((-len(raw)) % 4))
        v = {"buffer": 0, "byteOffset": offset, "byteLength": len(raw)}
        if stride is not None:
            v["byteStride"] = stride
        self.views.append(v)
        return len(self.views) - 1

    def accessor(self, **kw):
        self.accessors.append(kw)
        return len(self.accessors) - 1

    def gltf(self, primitives):
        return {
            "asset": {"version": "2.0"},
            "scene": 0,
            "scenes": [{"nodes": [0]}],
            "nodes": [{"mesh": 0}],
            "meshes": [{"name": "adv", "primitives": primitives}],
            "buffers": [{"byteLength": sum(len(p) for p in self.parts)}],
            "bufferViews": self.views,
            "accessors": self.accessors,
        }

    def binary(self):
        return b"".join(self.parts)


def _tri_prim(b, extra_attrs):
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    idx = np.array([0, 1, 2], np.uint16)
    pos_acc = b.accessor(
        bufferView=b.view(pos.tobytes()),
        componentType=5126,
        count=3,
        type="VEC3",
    )
    idx_acc = b.accessor(
        bufferView=b.view(idx.tobytes()),
        componentType=5123,
        count=3,
        type="SCALAR",
    )
    attrs = {"POSITION": pos_acc}
    attrs.update(extra_attrs)
    return {"attributes": attrs, "indices": idx_acc}


def test_normalized_u8_uv(tmp_path):
    """normalized u8 TEXCOORD_0: raw 0/128/255 -> 0.0 / 128/255 / 1.0."""
    b = _GLBBuilder()
    uv_raw = np.array([[0, 255], [128, 0], [255, 128]], np.uint8)
    uv_acc = b.accessor(
        bufferView=b.view(uv_raw.tobytes()),
        componentType=5121,
        count=3,
        type="VEC2",
        normalized=True,
    )
    prim = _tri_prim(b, {"TEXCOORD_0": uv_acc})
    path = _wrap_glb(tmp_path, b.gltf([prim]), b.binary())
    meshes, _ = load_gltf_meshes(path)
    np.testing.assert_allclose(
        meshes[0].uvs, uv_raw.astype(np.float32) / 255.0, atol=1e-7
    )


def test_normalized_u16_color(tmp_path):
    """normalized u16 COLOR_0 (VEC3): v/65535, alpha filled with 1."""
    b = _GLBBuilder()
    col_raw = np.array(
        [[0, 65535, 32768], [65535, 0, 0], [1000, 2000, 3000]], np.uint16
    )
    col_acc = b.accessor(
        bufferView=b.view(col_raw.tobytes()),
        componentType=5123,
        count=3,
        type="VEC3",
        normalized=True,
    )
    prim = _tri_prim(b, {"COLOR_0": col_acc})
    path = _wrap_glb(tmp_path, b.gltf([prim]), b.binary())
    meshes, _ = load_gltf_meshes(path)
    np.testing.assert_allclose(
        meshes[0].colors[:, :3], col_raw.astype(np.float32) / 65535.0, atol=1e-7
    )
    np.testing.assert_allclose(meshes[0].colors[:, 3], 1.0)


def test_normalized_i8_normal(tmp_path):
    """normalized i8 NORMAL: v/127 with -128 clamped to -1 (spec)."""
    b = _GLBBuilder()
    nrm_raw = np.array(
        [[127, 0, 0], [0, -127, 0], [0, 0, -128]], np.int8
    )
    nrm_acc = b.accessor(
        bufferView=b.view(nrm_raw.tobytes()),
        componentType=5120,
        count=3,
        type="VEC3",
        normalized=True,
    )
    prim = _tri_prim(b, {"NORMAL": nrm_acc})
    path = _wrap_glb(tmp_path, b.gltf([prim]), b.binary())
    meshes, _ = load_gltf_meshes(path)
    # loader applies the engine Y-flip after conversion
    expect = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float32)
    expect[:, 1] *= -1
    np.testing.assert_allclose(meshes[0].normals, expect, atol=1e-6)


def test_sparse_position_accessor(tmp_path):
    """sparse accessor: base bufferView with index/value substitution."""
    b = _GLBBuilder()
    base = np.zeros((4, 3), np.float32)
    s_idx = np.array([1, 3], np.uint16)
    s_val = np.array([[1, 2, 3], [4, 5, 6]], np.float32)
    pos_acc = b.accessor(
        bufferView=b.view(base.tobytes()),
        componentType=5126,
        count=4,
        type="VEC3",
        sparse={
            "count": 2,
            "indices": {"bufferView": b.view(s_idx.tobytes()), "componentType": 5123},
            "values": {"bufferView": b.view(s_val.tobytes())},
        },
    )
    idx = np.array([0, 1, 2, 0, 2, 3], np.uint16)
    idx_acc = b.accessor(
        bufferView=b.view(idx.tobytes()), componentType=5123, count=6, type="SCALAR"
    )
    prim = {"attributes": {"POSITION": pos_acc}, "indices": idx_acc}
    path = _wrap_glb(tmp_path, b.gltf([prim]), b.binary())
    meshes, _ = load_gltf_meshes(path)
    expect = base.copy()
    expect[s_idx] = s_val
    expect[:, 1] *= -1  # engine Y-flip
    np.testing.assert_allclose(meshes[0].positions, expect)


def test_sparse_without_base_bufferview(tmp_path):
    """sparse accessor with no bufferView: zeros base (spec)."""
    b = _GLBBuilder()
    s_idx = np.array([2], np.uint8)
    s_val = np.array([[7, 8, 9]], np.float32)
    pos_acc = b.accessor(
        componentType=5126,
        count=3,
        type="VEC3",
        sparse={
            "count": 1,
            "indices": {"bufferView": b.view(s_idx.tobytes()), "componentType": 5121},
            "values": {"bufferView": b.view(s_val.tobytes())},
        },
    )
    idx = np.array([0, 1, 2], np.uint16)
    idx_acc = b.accessor(
        bufferView=b.view(idx.tobytes()), componentType=5123, count=3, type="SCALAR"
    )
    prim = {"attributes": {"POSITION": pos_acc}, "indices": idx_acc}
    path = _wrap_glb(tmp_path, b.gltf([prim]), b.binary())
    meshes, _ = load_gltf_meshes(path)
    expect = np.zeros((3, 3), np.float32)
    expect[2] = [7, -8, 9]  # engine Y-flip
    np.testing.assert_allclose(meshes[0].positions, expect)


def test_interleaved_normalized_attributes(tmp_path):
    """One interleaved view: f32 position + normalized u8 uv, byteStride 16."""
    b = _GLBBuilder()
    n = 3
    raw = bytearray()
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    uv8 = np.array([[0, 51], [102, 153], [204, 255]], np.uint8)
    for i in range(n):
        raw += pos[i].tobytes()  # 12 bytes
        raw += uv8[i].tobytes()  # 2 bytes
        raw += b"\x00\x00"  # pad to 16
    view = b.view(bytes(raw), stride=16)
    pos_acc = b.accessor(
        bufferView=view, byteOffset=0, componentType=5126, count=n, type="VEC3"
    )
    uv_acc = b.accessor(
        bufferView=view,
        byteOffset=12,
        componentType=5121,
        count=n,
        type="VEC2",
        normalized=True,
    )
    idx = np.array([0, 1, 2], np.uint16)
    idx_acc = b.accessor(
        bufferView=b.view(idx.tobytes()), componentType=5123, count=3, type="SCALAR"
    )
    prim = {
        "attributes": {"POSITION": pos_acc, "TEXCOORD_0": uv_acc},
        "indices": idx_acc,
    }
    path = _wrap_glb(tmp_path, b.gltf([prim]), b.binary())
    meshes, _ = load_gltf_meshes(path)
    expect_pos = pos.copy()
    expect_pos[:, 1] *= -1
    np.testing.assert_allclose(meshes[0].positions, expect_pos)
    np.testing.assert_allclose(
        meshes[0].uvs, uv8.astype(np.float32) / 255.0, atol=1e-7
    )


def test_non_indexed_primitive_rejected(tmp_path):
    """A primitive without indices is skipped (the reference requires
    indexed geometry, assets.cpp:905-917)."""
    b = _GLBBuilder()
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    pos_acc = b.accessor(
        bufferView=b.view(pos.tobytes()), componentType=5126, count=3, type="VEC3"
    )
    prim = {"attributes": {"POSITION": pos_acc}}  # no "indices"
    path = _wrap_glb(tmp_path, b.gltf([prim]), b.binary())
    meshes, _ = load_gltf_meshes(path)
    assert meshes == []


def test_u8_and_u32_index_widths(tmp_path):
    """u8 (5121) and u32 (5125) index accessors load (fastgltf accepts all
    three index widths; assets.cpp:948-961 copies them into uint32)."""
    for comp, dtype in ((5121, np.uint8), (5125, np.uint32)):
        b = _GLBBuilder()
        pos = np.array(
            [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32
        )
        idx = np.array([0, 1, 2, 2, 1, 3], dtype)
        pos_acc = b.accessor(
            bufferView=b.view(pos.tobytes()),
            componentType=5126,
            count=4,
            type="VEC3",
        )
        idx_acc = b.accessor(
            bufferView=b.view(idx.tobytes()),
            componentType=comp,
            count=6,
            type="SCALAR",
        )
        prim = {"attributes": {"POSITION": pos_acc}, "indices": idx_acc}
        path = _wrap_glb(tmp_path, b.gltf([prim]), b.binary(), f"i{comp}.glb")
        meshes, _ = load_gltf_meshes(path)
        assert meshes[0].triangles.shape == (2, 3)
        np.testing.assert_array_equal(
            meshes[0].triangles, idx.reshape(2, 3).astype(np.int32)
        )


def test_non_indexed_primitive_skipped_with_warning(tmp_path, caplog):
    """Non-indexed primitives warn and skip, fastgltf-parity
    (assets.cpp:912-917: 'no valid indices accessor. It will be
    skipped.')."""
    import logging

    b = _GLBBuilder()
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    pos_acc = b.accessor(
        bufferView=b.view(pos.tobytes()),
        componentType=5126,
        count=3,
        type="VEC3",
    )
    non_indexed = {"attributes": {"POSITION": pos_acc}}
    indexed = _tri_prim(b, {})
    path = _wrap_glb(tmp_path, b.gltf([non_indexed, indexed]), b.binary())
    with caplog.at_level(logging.WARNING, logger="syzygy"):
        meshes, _ = load_gltf_meshes(path)
    assert any("no valid indices" in r.message for r in caplog.records)
    # the indexed primitive still loads
    assert len(meshes) == 1 and meshes[0].triangles.shape == (1, 3)


def test_non_triangle_mode_loads_as_triangles(tmp_path, caplog):
    """Non-Triangles primitive modes WARN but load as triangles — the
    reference's exact behavior (assets.cpp:929-933: 'Loading glTF mesh
    primitive as Triangles mode when it is not.')."""
    import logging

    b = _GLBBuilder()
    prim = _tri_prim(b, {})
    prim["mode"] = 1  # LINES
    path = _wrap_glb(tmp_path, b.gltf([prim]), b.binary())
    with caplog.at_level(logging.WARNING, logger="syzygy"):
        meshes, _ = load_gltf_meshes(path)
    assert any("as Triangles mode" in r.message for r in caplog.records)
    assert meshes[0].triangles.shape == (1, 3)


def test_required_extension_rejected(tmp_path):
    """extensionsRequired naming an unimplemented extension must refuse the
    file (default fastgltf::Parser{} MissingExtensions semantics,
    assets.cpp:421); extensionsUsed alone is informational and loads."""
    b = _GLBBuilder()
    prim = _tri_prim(b, {})
    gltf = b.gltf([prim])
    gltf["extensionsRequired"] = ["KHR_draco_mesh_compression"]
    gltf["extensionsUsed"] = ["KHR_draco_mesh_compression"]
    path = _wrap_glb(tmp_path, gltf, b.binary())
    with pytest.raises(ValueError, match="KHR_draco_mesh_compression"):
        load_gltf_meshes(path)

    b2 = _GLBBuilder()
    prim2 = _tri_prim(b2, {})
    gltf2 = b2.gltf([prim2])
    gltf2["extensionsUsed"] = ["KHR_materials_specular"]  # used, not required
    path2 = _wrap_glb(tmp_path, gltf2, b2.binary(), "used_only.glb")
    meshes, _ = load_gltf_meshes(path2)
    assert len(meshes) == 1


def test_tangent_and_second_uv_set_tolerated(tmp_path, caplog):
    """ABeautifulGame-class content: TANGENT attributes are ignored (the
    tangent frame derives per pixel, offscreen.frag:25-43) and TEXCOORD_1
    attributes load without error; a material sampling UV set 1 warns and
    falls back to set 0."""
    import io as _io
    import logging

    from PIL import Image

    b = _GLBBuilder()
    tangent = np.tile(
        np.array([[1, 0, 0, 1]], np.float32), (3, 1)
    )
    uv1 = np.zeros((3, 2), np.float32)
    tan_acc = b.accessor(
        bufferView=b.view(tangent.tobytes()),
        componentType=5126,
        count=3,
        type="VEC4",
    )
    uv1_acc = b.accessor(
        bufferView=b.view(uv1.tobytes()),
        componentType=5126,
        count=3,
        type="VEC2",
    )
    prim = _tri_prim(b, {"TANGENT": tan_acc, "TEXCOORD_1": uv1_acc})
    prim["material"] = 0
    gltf = b.gltf([prim])
    buf = _io.BytesIO()
    Image.new("RGBA", (1, 1), (255, 128, 0, 255)).save(buf, "PNG")
    import base64

    gltf["images"] = [
        {
            "uri": "data:image/png;base64,"
            + base64.b64encode(buf.getvalue()).decode()
        }
    ]
    gltf["textures"] = [{"source": 0}]
    gltf["materials"] = [
        {
            "pbrMetallicRoughness": {
                "baseColorTexture": {"index": 0, "texCoord": 1}
            }
        }
    ]
    path = _wrap_glb(tmp_path, gltf, b.binary())
    with caplog.at_level(logging.WARNING, logger="syzygy"):
        meshes, lib = load_gltf_meshes(path)
    assert any("TEXCOORD_1" in r.message for r in caplog.records)
    assert meshes[0].triangles.shape == (1, 3)
