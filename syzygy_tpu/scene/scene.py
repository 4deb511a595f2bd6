"""Scene graph: instanced meshes, lights, camera, atmosphere, animation.

Mirrors ``renderer/scene.hpp`` / ``scene.cpp``: ``MeshInstanced`` (``:109-147``
of the hpp), ``Scene::tick`` + instance animations (``scene.cpp:463-580``),
shadow-bounds AABB (``scene.cpp:95-148``), spotlight creation
(``scene.cpp:216-234``), and the default editor scene (2 cubes + floor + red
spotlight, ``editor/editor.cpp:508-568``).
"""

from __future__ import annotations

import dataclasses
import enum
import math
from typing import Optional

import numpy as np

from syzygy_tpu.assets.defaults import (
    cube_mesh,
    plane_mesh,
    register_default_textures,
)
from syzygy_tpu.assets.types import Mesh, TextureLibrary
from syzygy_tpu.scene.atmosphere import Atmosphere, SunAnimation
from syzygy_tpu.scene.camera import Camera
from syzygy_tpu.scene.lights import SpotlightParams


class InstanceAnimation(enum.Enum):
    NONE = 0
    DIAGONAL_WAVE = 1
    SPIN_ALONG_WORLD_UP = 2


@dataclasses.dataclass
class TransformHost:
    """Host-side TRS (``geometry/transform.hpp:13-22``), numpy."""

    translation: np.ndarray
    euler_angles: np.ndarray
    scale: np.ndarray

    @staticmethod
    def make(translation=(0, 0, 0), euler_angles=(0, 0, 0), scale=(1, 1, 1)):
        return TransformHost(
            np.asarray(translation, np.float32).copy(),
            np.asarray(euler_angles, np.float32).copy(),
            np.asarray(scale, np.float32).copy(),
        )

    def to_matrix(self) -> np.ndarray:
        """``Transform::toMatrix`` = T @ R @ S, numpy (host hot path)."""
        px, py, pz = self.translation
        pitch, roll, yaw = self.euler_angles
        cy, sy = math.cos(yaw), math.sin(yaw)
        cp, sp = math.cos(pitch), math.sin(pitch)
        cr, sr = math.cos(roll), math.sin(roll)
        # RotY(yaw) @ RotX(pitch) @ RotZ(roll)
        rot = np.array(
            [
                [cy * cr + sy * sp * sr, -cy * sr + sy * sp * cr, sy * cp],
                [sr * cp, cr * cp, -sp],
                [-sy * cr + cy * sp * sr, sr * sy + cy * sp * cr, cy * cp],
            ],
            np.float32,
        )
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = rot * np.asarray(self.scale, np.float32)[None, :]
        m[:3, 3] = (px, py, pz)
        return m


def look_at_transform(position, target, scale=(1.0, 1.0, 1.0)) -> TransformHost:
    """``Transform::lookAt`` (``transform.cpp:17-28``)."""
    fwd = np.asarray(target, np.float32) - np.asarray(position, np.float32)
    n = np.linalg.norm(fwd)
    if n < 1e-12:
        eulers = np.zeros(3, np.float32)
    else:
        f = fwd / n
        pitch = math.asin(np.clip(-f[1], -1.0, 1.0))
        yaw = math.atan2(f[0], f[2])
        eulers = np.array([pitch, 0.0, yaw], np.float32)
    return TransformHost.make(position, eulers, scale)


@dataclasses.dataclass
class MeshInstance:
    """``MeshInstanced`` (``renderer/scene.hpp:109-147``).

    Transforms are stored as SoA numpy blocks (``translations`` /
    ``eulers`` / ``scales``, each (N, 3)) — the per-frame host path
    (animation tick, ``pack_frame_params``) is vectorized array math, flat
    in N up to tens of thousands of animated instances. The ``transforms``
    / ``originals`` lists hold :class:`TransformHost` rows whose fields are
    VIEWS into the blocks, so element-wise edits (``t.scale[:] = 2``)
    stay coherent; never rebind a row field (``t.scale = x``) — write
    through ``[:]``.
    """

    mesh: Optional[Mesh]
    name: str
    render: bool = True
    casts_shadow: bool = True
    animation: InstanceAnimation = InstanceAnimation.NONE
    originals: list = dataclasses.field(default_factory=list)
    transforms: list = dataclasses.field(default_factory=list)
    translations: Optional[np.ndarray] = None  # (N, 3) SoA blocks
    eulers: Optional[np.ndarray] = None
    scales: Optional[np.ndarray] = None
    orig_translations: Optional[np.ndarray] = None
    # per-surface material overrides (``renderer/scene.hpp:109-147``):
    # None, or a list aligned with mesh.surfaces whose non-None entries
    # replace that surface's MaterialData at pack time
    material_overrides: Optional[list] = None

    def set_material_override(self, surface_index: int, material) -> None:
        """Override one surface's material (``MeshInstanced`` per-surface
        descriptors in the reference)."""
        n = len(self.mesh.surfaces)
        if self.material_overrides is None:
            self.material_overrides = [None] * n
        self.material_overrides[surface_index] = material

    def __post_init__(self):
        if self.translations is None:
            self.set_transforms(self.transforms, self.originals or None)

    def set_transforms(self, transforms, originals=None) -> None:
        """Adopt a list of TransformHost as SoA blocks + row views."""
        n = len(transforms)

        def block(rows, field):
            out = np.zeros((n, 3), np.float32)
            for i, t in enumerate(rows):
                out[i] = np.asarray(getattr(t, field), np.float32)
            return out

        self.translations = block(transforms, "translation")
        self.eulers = block(transforms, "euler_angles")
        self.scales = block(transforms, "scale")
        orig_rows = originals if originals is not None else transforms
        self.orig_translations = block(orig_rows, "translation")
        self.transforms = [
            TransformHost(
                self.translations[i], self.eulers[i], self.scales[i]
            )
            for i in range(n)
        ]
        self.originals = [
            TransformHost(
                self.orig_translations[i],
                self.eulers[i].copy(),
                self.scales[i].copy(),
            )
            for i in range(n)
        ]

    def tick(self, time_elapsed: float, delta_time: float) -> None:
        """Instance animations (``scene.cpp:463-527``) over the SoA blocks —
        pure vectorized numpy, no per-transform Python objects touched."""
        if self.animation == InstanceAnimation.DIAGONAL_WAVE:
            orig = self.orig_translations
            offset = (orig[:, 0] + 10.0 + orig[:, 2] + 10.0) / 3.1415
            self.translations[:, 0] = orig[:, 0]
            self.translations[:, 1] = orig[:, 1] + np.sin(
                time_elapsed + offset
            ).astype(np.float32)
            self.translations[:, 2] = orig[:, 2]
        elif self.animation == InstanceAnimation.SPIN_ALONG_WORLD_UP:
            self.eulers[:, 2] += delta_time

    def model_matrices(self) -> np.ndarray:
        return np.stack([t.to_matrix() for t in self.transforms])


@dataclasses.dataclass
class Scene:
    """``Scene`` (``renderer/scene.hpp:154-218``).

    Holds multiple cameras (the reference's Renderer keeps a 20-capacity
    camera buffer, ``renderer/renderer.hpp:113-121``); ``camera`` is the
    active one (``camera_index``).
    """

    MAX_CAMERAS = 20  # renderer.hpp:113-121

    cameras: list = dataclasses.field(default_factory=lambda: [Camera()])
    camera_index: int = 0
    camera_speed: float = 20.0  # DEFAULT_CAMERA_CONTROLLED_SPEED, scene.cpp:85
    atmosphere: Atmosphere = dataclasses.field(default_factory=Atmosphere)
    sun_animation: SunAnimation = dataclasses.field(default_factory=SunAnimation)
    spotlights: list = dataclasses.field(default_factory=list)
    spotlights_render: bool = False
    geometry: list = dataclasses.field(default_factory=list)
    render_atmosphere: bool = True
    time_elapsed: float = 0.0

    @property
    def camera(self) -> Camera:
        """The active camera (UI-selected in the reference)."""
        return self.cameras[self.camera_index]

    @camera.setter
    def camera(self, cam: Camera) -> None:
        self.cameras[self.camera_index] = cam

    def add_camera(self, camera: Optional[Camera] = None) -> int:
        """Register another camera; returns its index (capacity 20,
        ``renderer.hpp:113-121``)."""
        if len(self.cameras) >= self.MAX_CAMERAS:
            raise ValueError(f"camera capacity {self.MAX_CAMERAS} reached")
        self.cameras.append(camera if camera is not None else Camera())
        return len(self.cameras) - 1

    def add_mesh_instance(
        self,
        mesh: Optional[Mesh],
        name: str,
        transforms,
        animation: InstanceAnimation = InstanceAnimation.NONE,
        casts_shadow: bool = True,
    ) -> MeshInstance:
        """``Scene::addMeshInstance`` (``scene.cpp:157-214``)."""
        instance = MeshInstance(
            mesh=mesh,
            name=f"meshInstanced_{name}",
            casts_shadow=casts_shadow,
            animation=animation,
            originals=[TransformHost.make(t.translation, t.euler_angles, t.scale) for t in transforms],
            transforms=[TransformHost.make(t.translation, t.euler_angles, t.scale) for t in transforms],
        )
        if mesh is not None:
            # MeshInstanced::setMesh normalizes instance scale by the mesh's
            # smallest half-extent, floored at 0.01 (scene.cpp:796-820). For
            # the flat plane this is a x100 blow-up — intentional parity.
            vmin, vmax = mesh.vertex_bounds
            half_extent = (vmax - vmin) * 0.5
            factor = 1.0 / max(float(half_extent.min()), 0.01)
            instance.scales *= np.float32(factor)
        self.geometry.append(instance)
        return instance

    def add_spotlight(self, color, transform: TransformHost) -> None:
        """``Scene::addSpotlight`` (``scene.cpp:216-234``).

        Stores raw ``SpotlightParams``; packed lights are built on device
        inside the jitted frame (``make_spot_batched``)."""
        params = SpotlightParams(
            color=(float(color[0]), float(color[1]), float(color[2]), 1.0),
            strength=1000.0,
            falloff_factor=1.0,
            falloff_distance=1.0,
            vertical_fov_degrees=30.0,
            horizontal_scale=1.0,
            euler_angles=tuple(float(x) for x in transform.euler_angles),
            position=tuple(float(x) for x in transform.translation),
            near=0.1,
            far=1000.0,
        )
        self.spotlights.append(params)
        self.spotlights_render = True

    def tick(self, delta_time_seconds: float) -> None:
        """``Scene::tick`` (``scene.cpp:532-580``)."""
        self.time_elapsed += delta_time_seconds
        self.sun_animation.tick(delta_time_seconds)
        pitch = self.sun_animation.sun_pitch_radians()
        _, y, z = self.atmosphere.sun_euler_angles
        self.atmosphere.sun_euler_angles = (pitch, y, z)
        for instance in self.geometry:
            instance.tick(self.time_elapsed, delta_time_seconds)

    def shadow_bounds(self) -> tuple[np.ndarray, np.ndarray]:
        """CPU AABB over all shadow-casting geometry (``scene.cpp:95-148``).

        Returns numpy (min, max) — per-frame host path. Uses the C++ core
        (native/szg_native.cpp) when available; numpy fallback below is the
        executable spec."""
        from syzygy_tpu import native

        if native.available():
            corners, trs = [], []
            for instance in self.geometry:
                if (
                    not instance.casts_shadow
                    or not instance.render
                    or instance.mesh is None
                ):
                    continue
                vmin, vmax = instance.mesh.vertex_bounds
                cs = np.array(
                    [
                        [x, y, z]
                        for x in (vmin[0], vmax[0])
                        for y in (vmin[1], vmax[1])
                        for z in (vmin[2], vmax[2])
                    ],
                    np.float32,
                )
                for t in instance.transforms:
                    corners.append(cs)
                    trs.append((t.translation, t.euler_angles, t.scale))
            if not trs:
                return np.zeros(3, np.float32), np.zeros(3, np.float32)
            mats = native.trs_to_matrices(
                np.asarray([x[0] for x in trs], np.float32),
                np.asarray([x[1] for x in trs], np.float32),
                np.asarray([x[2] for x in trs], np.float32),
            )
            found, mn, mx = native.shadow_bounds(
                np.ones(len(trs), np.uint8), np.stack(corners), mats
            )
            return mn, mx

        mn = np.full(3, np.finfo(np.float32).max, np.float32)
        mx = np.full(3, np.finfo(np.float32).min, np.float32)
        found = False
        for instance in self.geometry:
            if not instance.casts_shadow or not instance.render or instance.mesh is None:
                continue
            vmin, vmax = instance.mesh.vertex_bounds
            corners = np.array(
                [
                    [x, y, z]
                    for x in (vmin[0], vmax[0])
                    for y in (vmin[1], vmax[1])
                    for z in (vmin[2], vmax[2])
                ],
                np.float32,
            )
            corners_h = np.concatenate(
                [corners, np.ones((8, 1), np.float32)], axis=1
            )
            for transform in instance.transforms:
                world = (transform.to_matrix() @ corners_h.T).T[:, :3]
                mn = np.minimum(mn, world.min(axis=0))
                mx = np.maximum(mx, world.max(axis=0))
                found = True
        if not found:
            return np.zeros(3, np.float32), np.zeros(3, np.float32)
        return mn, mx

    def handle_input(self, delta_time, cursor_delta=(0.0, 0.0), keys=frozenset()):
        self.camera.handle_input(
            delta_time, cursor_delta, keys, speed=self.camera_speed
        )


def default_scene(
    texture_library: Optional[TextureLibrary] = None,
) -> tuple[Scene, TextureLibrary]:
    """The editor's built-in scene (``editor/editor.cpp:507-568``):
    two 5x cubes floating at y=-8, a 20x20 floor plane, and a red spotlight
    aimed at the first cube from offset (-20,-20,-20)."""
    library = texture_library or TextureLibrary()
    material = register_default_textures(library)
    cube = cube_mesh(material)
    plane = plane_mesh(material)

    scene = Scene()
    floating = np.array([0.0, -8.0, 0.0], np.float32)
    mesh_scale = (5.0, 5.0, 5.0)
    offset = np.array([0.0, 0.0, 6.0], np.float32)

    scene.add_mesh_instance(
        cube, "Model_1", [TransformHost.make(floating + offset, scale=mesh_scale)]
    )
    scene.add_mesh_instance(
        cube, "Model_2", [TransformHost.make(floating - offset, scale=mesh_scale)]
    )
    scene.add_mesh_instance(
        plane,
        "Floor",
        [TransformHost.make((0.0, -1.0, 0.0), scale=(20.0, 1.0, 20.0))],
    )
    scene.add_spotlight(
        (1.0, 0.0, 0.0),
        look_at_transform(floating + np.float32(-20.0), floating),
    )
    return scene, library
