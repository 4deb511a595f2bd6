"""Scene serialization: save/load the full editable state as JSON.

The reference has NO serialization — its README lists "Serialization for UI
and saving" as a planned feature (SURVEY.md §5, checkpoint/resume: none).
This module closes that gap: everything the ImGui property tables can edit
(camera, atmosphere, sun animation, per-instance transforms, spotlights) plus
enough mesh identity to rebuild the scene against an asset source.

Checkpoint/resume story: ``save_scene`` each N frames -> ``load_scene`` to
continue a time-of-day flythrough exactly where it stopped.
"""

from __future__ import annotations

import dataclasses
import json

import numpy as np

from syzygy_tpu.assets.types import MaterialData
from syzygy_tpu.scene.atmosphere import Atmosphere, SunAnimation
from syzygy_tpu.scene.camera import Camera
from syzygy_tpu.scene.lights import SpotlightParams
from syzygy_tpu.scene.scene import InstanceAnimation, Scene, TransformHost


def _tolist(x):
    return np.asarray(x, np.float32).tolist()


def _transform_dict(t: TransformHost) -> dict:
    return {
        "translation": _tolist(t.translation),
        "euler_angles": _tolist(t.euler_angles),
        "scale": _tolist(t.scale),
    }


def _transform_from(d: dict) -> TransformHost:
    return TransformHost.make(d["translation"], d["euler_angles"], d["scale"])


def scene_to_dict(scene: Scene) -> dict:
    return {
        "version": 1,
        "cameras": [dataclasses.asdict(c) for c in scene.cameras],
        "camera_index": scene.camera_index,
        "camera_speed": scene.camera_speed,
        "atmosphere": dataclasses.asdict(scene.atmosphere),
        "sun_animation": {
            "frozen": scene.sun_animation.frozen,
            "time": scene.sun_animation.time,
            "speed": scene.sun_animation.speed,
            "skip_night": scene.sun_animation.skip_night,
        },
        "render_atmosphere": scene.render_atmosphere,
        "time_elapsed": scene.time_elapsed,
        "spotlights": [dataclasses.asdict(p) for p in scene.spotlights],
        "spotlights_render": scene.spotlights_render,
        "geometry": [
            {
                "name": inst.name,
                "mesh": inst.mesh.name if inst.mesh is not None else None,
                "render": inst.render,
                "casts_shadow": inst.casts_shadow,
                "animation": inst.animation.name,
                "originals": [_transform_dict(t) for t in inst.originals],
                "transforms": [_transform_dict(t) for t in inst.transforms],
                "material_overrides": [
                    (dataclasses.asdict(m) if m is not None else None)
                    for m in (inst.material_overrides or [])
                ] or None,
            }
            for inst in scene.geometry
        ],
    }


def scene_from_dict(data: dict, mesh_source) -> Scene:
    """Rebuild a scene; ``mesh_source`` maps mesh name -> Mesh (e.g. a dict of
    default assets or a loaded glTF library)."""
    from syzygy_tpu.scene.scene import MeshInstance

    if data.get("version") != 1:
        raise ValueError(f"unsupported scene version {data.get('version')}")

    def _camera(d):
        return Camera(**{
            k: tuple(v) if isinstance(v, list) else v for k, v in d.items()
        })

    # "camera" is the legacy single-camera key
    camera_dicts = data.get("cameras") or [data["camera"]]
    scene = Scene(
        cameras=[_camera(d) for d in camera_dicts],
        camera_index=int(data.get("camera_index", 0)),
        camera_speed=data["camera_speed"],
        atmosphere=Atmosphere(**{
            k: tuple(v) if isinstance(v, list) else v
            for k, v in data["atmosphere"].items()
        }),
        sun_animation=SunAnimation(**data["sun_animation"]),
        render_atmosphere=data["render_atmosphere"],
        time_elapsed=data["time_elapsed"],
        spotlights=[
            SpotlightParams(**{
                k: tuple(v) if isinstance(v, list) else v
                for k, v in p.items()
            })
            for p in data["spotlights"]
        ],
        spotlights_render=data["spotlights_render"],
    )
    for g in data["geometry"]:
        mesh = mesh_source(g["mesh"]) if g["mesh"] is not None else None
        scene.geometry.append(
            MeshInstance(
                mesh=mesh,
                name=g["name"],
                render=g["render"],
                casts_shadow=g["casts_shadow"],
                animation=InstanceAnimation[g["animation"]],
                originals=[_transform_from(t) for t in g["originals"]],
                transforms=[_transform_from(t) for t in g["transforms"]],
                material_overrides=(
                    [
                        (MaterialData(**m) if m is not None else None)
                        for m in g["material_overrides"]
                    ]
                    if g.get("material_overrides")
                    else None
                ),
            )
        )
    return scene


class _NumpyEncoder(json.JSONEncoder):
    def default(self, obj):
        if isinstance(obj, np.integer):
            return int(obj)
        if isinstance(obj, np.floating):
            return float(obj)
        if isinstance(obj, np.ndarray):
            return obj.tolist()
        return super().default(obj)


def save_scene(path: str, scene: Scene) -> None:
    with open(path, "w") as f:
        json.dump(scene_to_dict(scene), f, indent=1, cls=_NumpyEncoder)


def load_scene(path: str, mesh_source) -> Scene:
    with open(path) as f:
        return scene_from_dict(json.load(f), mesh_source)
