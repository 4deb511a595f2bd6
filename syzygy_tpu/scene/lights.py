"""Directional and spot light construction + packed device forms.

Mirrors ``renderer/lights.cpp:9-46`` and the packed structs
``DirectionalLightPacked`` / ``SpotLightPacked`` (``gputypes.hpp:74-115``).
Packed lights are NamedTuple pytrees; fixed-capacity arrays of them (with
validity counts) are built by :func:`stack_directional` / :func:`stack_spot`
so the jitted frame sees static shapes (capacities from
``renderer/renderer.hpp:113-121`` and ``deferred.cpp:166-176``).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Sequence

import jax.numpy as jnp

from syzygy_tpu.math.geometry import (
    AABB,
    forward_from_eulers,
    ortho_aabb_vk,
    perspective_vk,
    view_vk,
)

MAX_DIRECTIONAL_LIGHTS = 16  # renderer/renderer.hpp:118
MAX_SPOT_LIGHTS = 16  # renderer/pipelines/deferred.cpp:166-176
MAX_SHADOW_MAPS = 10  # renderer/pipelines/deferred.cpp:179-180


class DirectionalLight(NamedTuple):
    """``DirectionalLightPacked`` (``gputypes.hpp:74-90``)."""

    color: jnp.ndarray  # (..., 4)
    forward: jnp.ndarray  # (..., 4)
    projection: jnp.ndarray  # (..., 4, 4)
    view: jnp.ndarray  # (..., 4, 4)
    strength: jnp.ndarray  # (...,)


class SpotLight(NamedTuple):
    """``SpotLightPacked`` (``gputypes.hpp:92-115``)."""

    color: jnp.ndarray  # (..., 4)
    forward: jnp.ndarray  # (..., 4)
    projection: jnp.ndarray  # (..., 4, 4)
    view: jnp.ndarray  # (..., 4, 4)
    position: jnp.ndarray  # (..., 4)
    strength: jnp.ndarray  # (...,)
    falloff_factor: jnp.ndarray  # (...,)
    falloff_distance: jnp.ndarray  # (...,)


def make_directional(
    color, strength, euler_angles, captured_bounds: AABB
) -> DirectionalLight:
    """``makeDirectional`` (``lights.cpp:9-27``): ortho frustum fit to an AABB."""
    eulers = jnp.asarray(euler_angles, jnp.float32)
    view = view_vk(jnp.zeros(3, jnp.float32), eulers)
    projection = ortho_aabb_vk(view, captured_bounds)
    fwd = forward_from_eulers(eulers)
    return DirectionalLight(
        color=jnp.asarray(color, jnp.float32),
        forward=jnp.concatenate([fwd, jnp.zeros(1, jnp.float32)]),
        projection=projection,
        view=view,
        strength=jnp.asarray(strength, jnp.float32),
    )


@dataclasses.dataclass
class SpotlightParams:
    """``SpotlightParams`` (``renderer/lights.hpp:14-27``); defaults are the
    values ``Scene::addSpotlight`` passes (``scene.cpp:216-229``)."""

    color: tuple = (1.0, 1.0, 1.0, 1.0)
    strength: float = 1000.0
    falloff_factor: float = 1.0
    falloff_distance: float = 1.0
    vertical_fov_degrees: float = 30.0
    horizontal_scale: float = 1.0
    euler_angles: tuple = (0.0, 0.0, 0.0)
    position: tuple = (0.0, 0.0, 0.0)
    near: float = 0.1
    far: float = 1000.0


def make_spot(params: SpotlightParams) -> SpotLight:
    """``makeSpot`` (``lights.cpp:29-46``)."""
    eulers = jnp.asarray(params.euler_angles, jnp.float32)
    position = jnp.asarray(params.position, jnp.float32)
    fwd = forward_from_eulers(eulers)
    return SpotLight(
        color=jnp.asarray(params.color, jnp.float32),
        forward=jnp.concatenate([fwd, jnp.zeros(1, jnp.float32)]),
        projection=perspective_vk(
            params.vertical_fov_degrees,
            params.horizontal_scale,
            params.near,
            params.far,
        ),
        view=view_vk(position, eulers),
        position=jnp.concatenate([position, jnp.ones(1, jnp.float32)]),
        strength=jnp.asarray(params.strength, jnp.float32),
        falloff_factor=jnp.asarray(params.falloff_factor, jnp.float32),
        falloff_distance=jnp.asarray(params.falloff_distance, jnp.float32),
    )


class SpotRaw(NamedTuple):
    """Raw spot parameters, fixed capacity — the cheap per-frame upload.

    ``make_spot_batched`` builds the packed lights on device inside the jitted
    frame (all geometry builders are batch-friendly).
    """

    color: jnp.ndarray  # (N, 4)
    strength: jnp.ndarray  # (N,)
    falloff_factor: jnp.ndarray  # (N,)
    falloff_distance: jnp.ndarray  # (N,)
    vertical_fov_degrees: jnp.ndarray  # (N,)
    horizontal_scale: jnp.ndarray  # (N,)
    euler_angles: jnp.ndarray  # (N, 3)
    position: jnp.ndarray  # (N, 3)
    near: jnp.ndarray  # (N,)
    far: jnp.ndarray  # (N,)


def spot_raw(
    params: Sequence[SpotlightParams], capacity: int = MAX_SPOT_LIGHTS
):
    """Host (numpy) fixed-capacity pack of spotlight parameters + count."""
    import numpy as np

    if len(params) > capacity:
        raise ValueError(f"{len(params)} spotlights exceeds capacity {capacity}")
    n = len(params)

    def field(getter, shape=()):
        out = np.zeros((capacity, *shape), np.float32)
        for i, p in enumerate(params):
            out[i] = np.asarray(getter(p), np.float32)
        return out

    raw = SpotRaw(
        color=field(lambda p: p.color, (4,)),
        strength=field(lambda p: p.strength),
        falloff_factor=field(lambda p: p.falloff_factor),
        falloff_distance=field(lambda p: p.falloff_distance),
        vertical_fov_degrees=field(lambda p: p.vertical_fov_degrees),
        horizontal_scale=field(lambda p: p.horizontal_scale),
        euler_angles=field(lambda p: p.euler_angles, (3,)),
        position=field(lambda p: p.position, (3,)),
        near=field(lambda p: p.near),
        far=field(lambda p: p.far),
    )
    # Defuse padded rows: identity-ish params that cannot divide by zero
    pad = np.arange(capacity) >= n
    raw = raw._replace(
        falloff_factor=np.where(pad, 1.0, raw.falloff_factor).astype(np.float32),
        falloff_distance=np.where(pad, 1.0, raw.falloff_distance).astype(np.float32),
        vertical_fov_degrees=np.where(pad, 30.0, raw.vertical_fov_degrees).astype(np.float32),
        horizontal_scale=np.where(pad, 1.0, raw.horizontal_scale).astype(np.float32),
        near=np.where(pad, 0.1, raw.near).astype(np.float32),
        far=np.where(pad, 1000.0, raw.far).astype(np.float32),
    )
    return raw, n


def make_spot_batched(raw: SpotRaw) -> SpotLight:
    """Device-side batched ``makeSpot`` (``lights.cpp:29-46``)."""
    eulers = jnp.asarray(raw.euler_angles, jnp.float32)
    position = jnp.asarray(raw.position, jnp.float32)
    fwd = forward_from_eulers(eulers)
    zeros = jnp.zeros((*fwd.shape[:-1], 1), jnp.float32)
    ones = jnp.ones_like(zeros)
    return SpotLight(
        color=jnp.asarray(raw.color, jnp.float32),
        forward=jnp.concatenate([fwd, zeros], axis=-1),
        projection=perspective_vk(
            raw.vertical_fov_degrees, raw.horizontal_scale, raw.near, raw.far
        ),
        view=view_vk(position, eulers),
        position=jnp.concatenate([position, ones], axis=-1),
        strength=jnp.asarray(raw.strength, jnp.float32),
        falloff_factor=jnp.asarray(raw.falloff_factor, jnp.float32),
        falloff_distance=jnp.asarray(raw.falloff_distance, jnp.float32),
    )


def _zero_directional() -> DirectionalLight:
    return DirectionalLight(
        color=jnp.zeros(4, jnp.float32),
        forward=jnp.array([0.0, 0.0, 1.0, 0.0], jnp.float32),
        projection=jnp.eye(4, dtype=jnp.float32),
        view=jnp.eye(4, dtype=jnp.float32),
        strength=jnp.zeros((), jnp.float32),
    )


def _zero_spot() -> SpotLight:
    return SpotLight(
        color=jnp.zeros(4, jnp.float32),
        forward=jnp.array([0.0, 0.0, 1.0, 0.0], jnp.float32),
        projection=jnp.eye(4, dtype=jnp.float32),
        view=jnp.eye(4, dtype=jnp.float32),
        position=jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32),
        strength=jnp.zeros((), jnp.float32),
        falloff_factor=jnp.ones((), jnp.float32),
        falloff_distance=jnp.ones((), jnp.float32),
    )


def _stack_padded(lights, zero, capacity):
    import jax

    if len(lights) > capacity:
        raise ValueError(f"{len(lights)} lights exceeds capacity {capacity}")
    padded = list(lights) + [zero] * (capacity - len(lights))
    return jax.tree.map(lambda *leaves: jnp.stack(leaves), *padded)


def stack_directional(
    lights: Sequence[DirectionalLight], capacity: int = MAX_DIRECTIONAL_LIGHTS
) -> tuple[DirectionalLight, jnp.ndarray]:
    """Pad to a static-capacity SoA array + count (frame-shape stability)."""
    return _stack_padded(lights, _zero_directional(), capacity), jnp.asarray(
        len(lights), jnp.int32
    )


def stack_spot(
    lights: Sequence[SpotLight], capacity: int = MAX_SPOT_LIGHTS
) -> tuple[SpotLight, jnp.ndarray]:
    return _stack_padded(lights, _zero_spot(), capacity), jnp.asarray(
        len(lights), jnp.int32
    )
