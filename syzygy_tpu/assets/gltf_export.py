"""Minimal GLB writer: engine meshes -> valid glTF 2.0 binary.

Beyond-reference capability (the reference only loads). Used to materialize
procedural assets as real .glb files (e.g. ``assets/sphere.glb``, which the
driver's config ladder names) and to round-trip-test the loader.

The engine is +y down; glTF is +y up — the writer flips y on positions and
normals so that ``load_gltf_meshes`` (which applies the engine's Y-flip,
``assets.cpp:1052-1060``) returns the original data.
"""

from __future__ import annotations

import json
import struct

import numpy as np

from syzygy_tpu.assets.types import Mesh


def write_glb(path: str, meshes: list[Mesh]) -> None:
    bin_parts: list[bytes] = []
    views = []
    accessors = []

    def add(arr: np.ndarray, acc_type: str, comp: int, minmax=False):
        offset = sum(len(p) for p in bin_parts)
        raw = np.ascontiguousarray(arr).tobytes()
        bin_parts.append(raw + b"\x00" * ((-len(raw)) % 4))
        views.append({"buffer": 0, "byteOffset": offset, "byteLength": len(raw)})
        acc = {
            "bufferView": len(views) - 1,
            "componentType": comp,
            "count": int(arr.shape[0]),
            "type": acc_type,
        }
        if minmax:
            acc["min"] = np.asarray(arr).min(axis=0).tolist()
            acc["max"] = np.asarray(arr).max(axis=0).tolist()
        accessors.append(acc)
        return len(accessors) - 1

    gltf_meshes = []
    nodes = []
    for mesh in meshes:
        flip = np.array([1.0, -1.0, 1.0], np.float32)
        pos = (mesh.positions * flip).astype(np.float32)
        nrm = (mesh.normals * flip).astype(np.float32)
        pos_acc = add(pos, "VEC3", 5126, minmax=True)
        nrm_acc = add(nrm, "VEC3", 5126)
        uv_acc = add(mesh.uvs.astype(np.float32), "VEC2", 5126)
        idx = mesh.triangles.reshape(-1).astype(np.uint32)
        idx_acc = add(idx[:, None], "SCALAR", 5125)
        gltf_meshes.append(
            {
                "name": mesh.name,
                "primitives": [
                    {
                        "attributes": {
                            "POSITION": pos_acc,
                            "NORMAL": nrm_acc,
                            "TEXCOORD_0": uv_acc,
                        },
                        "indices": idx_acc,
                        "mode": 4,
                    }
                ],
            }
        )
        nodes.append({"mesh": len(gltf_meshes) - 1, "name": mesh.name})

    gltf = {
        "asset": {"version": "2.0", "generator": "syzygy_tpu"},
        "scene": 0,
        "scenes": [{"nodes": list(range(len(nodes)))}],
        "nodes": nodes,
        "meshes": gltf_meshes,
        "buffers": [{"byteLength": sum(len(p) for p in bin_parts)}],
        "bufferViews": views,
        "accessors": accessors,
    }
    json_bytes = json.dumps(gltf).encode()
    json_bytes += b" " * ((-len(json_bytes)) % 4)
    binary = b"".join(bin_parts)
    total = 12 + 8 + len(json_bytes) + 8 + len(binary)
    with open(path, "wb") as f:
        f.write(struct.pack("<III", 0x46546C67, 2, total))
        f.write(struct.pack("<II", len(json_bytes), 0x4E4F534A))
        f.write(json_bytes)
        f.write(struct.pack("<II", len(binary), 0x004E4942))
        f.write(binary)
