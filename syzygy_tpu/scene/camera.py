"""Fly camera and its packed device form.

Mirrors ``Camera`` (``renderer/scene.hpp``, methods ``scene.cpp:739-794``) and
``CameraPacked`` (``gputypes.hpp:17-36``). Input handling reproduces
``Scene::handleInput`` (``scene.cpp:401-458``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple

import jax.numpy as jnp

from syzygy_tpu.math.geometry import (
    WORLD_FORWARD,
    WORLD_RIGHT,
    WORLD_UP,
    inverse4,
    orientate4,
    perspective_vk,
    projection_ortho_vk,
    transform_vk,
    view_vk,
)


class CameraPacked(NamedTuple):
    """``CameraPacked`` (``gputypes.hpp:17-36``) as a pytree."""

    projection: jnp.ndarray
    inverse_projection: jnp.ndarray
    view: jnp.ndarray
    view_inverse_transpose: jnp.ndarray
    rotation: jnp.ndarray
    proj_view_inverse: jnp.ndarray
    forward_world: jnp.ndarray
    position: jnp.ndarray


def pack_camera(
    position,
    euler_angles,
    fov_degrees,
    near,
    far,
    aspect_ratio,
    orthographic: bool = False,
) -> CameraPacked:
    """Device-side ``Camera::toDeviceEquivalent`` (``scene.cpp:739-794``).

    All arguments may be traced jnp scalars/vectors except ``orthographic``
    (static Python bool — it selects the projection formula).
    """
    position = jnp.asarray(position, jnp.float32)
    euler_angles = jnp.asarray(euler_angles, jnp.float32)
    if orthographic:
        height = jnp.tan(jnp.radians(jnp.asarray(fov_degrees, jnp.float32)) / 2.0)
        mn = jnp.stack([-aspect_ratio * height, -height, jnp.asarray(near, jnp.float32)])
        mx = jnp.stack([aspect_ratio * height, height, jnp.asarray(far, jnp.float32)])
        proj = projection_ortho_vk(mn, mx)
    else:
        proj = perspective_vk(fov_degrees, aspect_ratio, near, far)
    view = view_vk(position, euler_angles)
    rotation = orientate4(euler_angles)
    proj_view = proj @ view
    forward4 = jnp.concatenate([WORLD_FORWARD, jnp.zeros(1, jnp.float32)])
    return CameraPacked(
        projection=proj,
        inverse_projection=inverse4(proj),
        view=view,
        view_inverse_transpose=inverse4(view).T,
        rotation=rotation,
        proj_view_inverse=inverse4(proj_view),
        forward_world=rotation @ forward4,
        position=jnp.concatenate([position, jnp.ones(1, jnp.float32)]),
    )


@dataclasses.dataclass
class Camera:
    """Defaults: ``Scene::DEFAULT_CAMERA`` (``scene.cpp:77-83``)."""

    position: tuple = (0.0, -10.0, -13.0)
    euler_angles: tuple = (0.0, 0.0, 0.0)
    fov_degrees: float = 70.0
    near: float = 0.1
    far: float = 10000.0
    orthographic: bool = False

    def rotation(self) -> jnp.ndarray:
        return orientate4(jnp.asarray(self.euler_angles, jnp.float32))

    def transform(self) -> jnp.ndarray:
        return transform_vk(
            jnp.asarray(self.position, jnp.float32),
            jnp.asarray(self.euler_angles, jnp.float32),
        )

    def view(self) -> jnp.ndarray:
        return view_vk(
            jnp.asarray(self.position, jnp.float32),
            jnp.asarray(self.euler_angles, jnp.float32),
        )

    def projection(self, aspect_ratio: float) -> jnp.ndarray:
        """``Camera::projection`` (``scene.cpp:776-794``)."""
        if self.orthographic:
            height = math.tan(math.radians(self.fov_degrees) / 2.0)
            mn = jnp.array(
                [-aspect_ratio * height, -height, self.near], jnp.float32
            )
            mx = jnp.array([aspect_ratio * height, height, self.far], jnp.float32)
            return projection_ortho_vk(mn, mx)
        return perspective_vk(self.fov_degrees, aspect_ratio, self.near, self.far)

    def packed(self, aspect_ratio: float) -> CameraPacked:
        """``Camera::toDeviceEquivalent`` (``scene.cpp:739-754``)."""
        return pack_camera(
            jnp.asarray(self.position, jnp.float32),
            jnp.asarray(self.euler_angles, jnp.float32),
            self.fov_degrees,
            self.near,
            self.far,
            aspect_ratio,
            self.orthographic,
        )

    def handle_input(
        self,
        delta_time_seconds: float,
        cursor_delta=(0.0, 0.0),
        keys: frozenset = frozenset(),
        speed: float = 20.0,
    ) -> None:
        """WASDQE fly controls + mouse look (``scene.cpp:401-458``).

        ``keys`` is a set of single-character strings from
        {"w","a","s","d","q","e"}; ``speed`` default is
        ``DEFAULT_CAMERA_CONTROLLED_SPEED`` (``scene.cpp:85``).
        """
        ex, ey, ez = self.euler_angles
        ez += cursor_delta[0] / 100.0
        ex = max(-math.pi / 2, min(math.pi / 2, ex - cursor_delta[1] / 200.0))
        self.euler_angles = (ex, ey, ez)

        rot = self.rotation()[:3, :3]
        forward = rot @ WORLD_FORWARD
        right = rot @ WORLD_RIGHT
        up = WORLD_UP  # not rotated: disorienting otherwise (scene.cpp:423-424)

        move = jnp.zeros(3, jnp.float32)
        if "w" in keys:
            move = move + forward
        if "s" in keys:
            move = move - forward
        if "d" in keys:
            move = move + right
        if "a" in keys:
            move = move - right
        if "e" in keys:
            move = move + up
        if "q" in keys:
            move = move - up
        new_pos = (
            jnp.asarray(self.position, jnp.float32)
            + speed * delta_time_seconds * move
        )
        self.position = tuple(float(x) for x in new_pos)
