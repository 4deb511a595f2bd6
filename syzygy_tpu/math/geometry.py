"""Engine geometry conventions and matrix builders.

Re-derivation of the reference's geometry layer
(``syzygy/source/syzygy/geometry/geometryhelpers.cpp``,
``geometrystatics.hpp:7-9``, ``transform.cpp:11-15``) in JAX. All functions are
pure, float32, batched-friendly (leading batch dims allowed on every input),
and use the *math* convention (row-major matrices acting on column vectors) —
the GLM column-major storage of the reference is transposed away.

Engine conventions (``geometryhelpers.hpp:16-29``):
  * +x right, +y DOWN, +z forward; ``WORLD_UP = (0, -1, 0)``
  * reverse-Z: depth 1.0 at the near plane, 0.0 at the far plane
  * euler angles stored as (pitch, roll, yaw); GLM ``orientate4`` applies
    yaw (y) -> pitch (x) -> roll (z), i.e. ``RotY(e.z) @ RotX(e.x) @ RotZ(e.y)``
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

WORLD_FORWARD = jnp.array([0.0, 0.0, 1.0], dtype=jnp.float32)
WORLD_UP = jnp.array([0.0, -1.0, 0.0], dtype=jnp.float32)
WORLD_RIGHT = jnp.array([1.0, 0.0, 0.0], dtype=jnp.float32)


def _f32(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=jnp.float32)


def _compose4(rows) -> jnp.ndarray:
    """Stack a 4x4 from 16 (possibly batched) scalar entries, row-major."""
    entries = [_f32(e) for e in rows]
    batch = jnp.broadcast_shapes(*[e.shape for e in entries])
    flat = jnp.stack([jnp.broadcast_to(e, batch) for e in entries], axis=-1)
    return flat.reshape(*batch, 4, 4)


def rotate_x(angle) -> jnp.ndarray:
    a = _f32(angle)
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    return _compose4([o, z, z, z, z, c, -s, z, z, s, c, z, z, z, z, o])


def rotate_y(angle) -> jnp.ndarray:
    a = _f32(angle)
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    return _compose4([c, z, s, z, z, o, z, z, -s, z, c, z, z, z, z, o])


def rotate_z(angle) -> jnp.ndarray:
    a = _f32(angle)
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    return _compose4([c, -s, z, z, s, c, z, z, z, z, o, z, z, z, z, o])


def orientate4(euler_angles) -> jnp.ndarray:
    """GLM ``orientate4``: euler (pitch, roll, yaw) -> RotY(yaw)RotX(pitch)RotZ(roll).

    Matches ``glm::orientate4`` = ``yawPitchRoll(e.z, e.x, e.y)`` as used by
    ``transformVk`` (``geometryhelpers.cpp:147-151``) and ``Camera::rotation``
    (``renderer/scene.cpp:761-764``).
    """
    e = _f32(euler_angles)
    return rotate_y(e[..., 2]) @ rotate_x(e[..., 0]) @ rotate_z(e[..., 1])


def forward_from_eulers(euler_angles) -> jnp.ndarray:
    """``forwardFromEulers`` (``geometryhelpers.cpp:102-105``): orientate3(e) @ +z."""
    e = _f32(euler_angles)
    pitch, yaw = e[..., 0], e[..., 2]
    cp = jnp.cos(pitch)
    return jnp.stack([jnp.sin(yaw) * cp, -jnp.sin(pitch), jnp.cos(yaw) * cp], axis=-1)


def eulers_from_forward(forward) -> jnp.ndarray:
    """``eulersFromForward`` (``geometryhelpers.cpp:107-145``).

    Returns (pitch, roll=0, yaw); degenerate zero-length input maps to zeros.
    """
    f = _f32(forward)
    length_sq = jnp.sum(f * f, axis=-1, keepdims=True)
    safe = length_sq > jnp.finfo(jnp.float32).eps
    fn = jnp.where(safe, f * jax_rsqrt(length_sq), jnp.zeros_like(f))
    dot_forward = jnp.sum(fn * WORLD_FORWARD, axis=-1)
    dot_right = jnp.sum(fn * WORLD_RIGHT, axis=-1)
    dot_up = jnp.sum(fn * WORLD_UP, axis=-1)
    pitch = jnp.arcsin(jnp.clip(dot_up, -1.0, 1.0))
    yaw = jnp.arctan2(dot_right, dot_forward)
    zero = jnp.zeros_like(pitch)
    eulers = jnp.stack([pitch, zero, yaw], axis=-1)
    return jnp.where(safe, eulers, jnp.zeros_like(eulers))


def jax_rsqrt(x):
    return 1.0 / jnp.sqrt(x)


def inverse4(m) -> jnp.ndarray:
    """Closed-form cofactor inverse of (..., 4, 4) matrices.

    ``jnp.linalg.inv``'s LU path lowers pathologically slowly on this
    backend (minutes per trace); render matrices are tiny and
    well-conditioned, so the adjugate is both faster and jit-friendly.
    """
    m = _f32(m)
    a = [[m[..., i, j] for j in range(4)] for i in range(4)]

    def det3(r0, r1, r2, c0, c1, c2):
        return (
            a[r0][c0] * (a[r1][c1] * a[r2][c2] - a[r1][c2] * a[r2][c1])
            - a[r0][c1] * (a[r1][c0] * a[r2][c2] - a[r1][c2] * a[r2][c0])
            + a[r0][c2] * (a[r1][c0] * a[r2][c1] - a[r1][c1] * a[r2][c0])
        )

    rows = (0, 1, 2, 3)
    cof = [[None] * 4 for _ in range(4)]
    for i in range(4):
        ri = [r for r in rows if r != i]
        for j in range(4):
            cj = [c for c in rows if c != j]
            minor = det3(ri[0], ri[1], ri[2], cj[0], cj[1], cj[2])
            cof[i][j] = minor if (i + j) % 2 == 0 else -minor

    det = (
        a[0][0] * cof[0][0]
        + a[0][1] * cof[0][1]
        + a[0][2] * cof[0][2]
        + a[0][3] * cof[0][3]
    )
    inv_det = 1.0 / det
    # adjugate = transpose of cofactor matrix
    flat = jnp.stack(
        [cof[j][i] * inv_det for i in range(4) for j in range(4)], axis=-1
    )
    return flat.reshape(*m.shape[:-2], 4, 4)


def translate(v) -> jnp.ndarray:
    t = _f32(v)
    eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (*t.shape[:-1], 4, 4))
    return eye.at[..., 0:3, 3].set(t)


_batched_translate = translate


def scale_matrix(v) -> jnp.ndarray:
    s = _f32(v)
    o = jnp.ones_like(s[..., 0])
    z = jnp.zeros_like(o)
    return _compose4(
        [s[..., 0], z, z, z, z, s[..., 1], z, z, z, z, s[..., 2], z, z, z, z, o]
    )


def transform_vk(position, euler_angles) -> jnp.ndarray:
    """``transformVk`` (``geometryhelpers.cpp:147-151``): translate @ orientate4."""
    return _batched_translate(_f32(position)) @ orientate4(euler_angles)


def view_vk(position, euler_angles) -> jnp.ndarray:
    """``viewVk`` (``geometryhelpers.cpp:153-157``): inverse(transformVk).

    Computed directly as R^T @ T(-p) (the transform is rigid).
    """
    rot = orientate4(euler_angles)
    rot_t = jnp.swapaxes(rot, -1, -2)
    return rot_t @ _batched_translate(-_f32(position))


def transform_to_matrix(translation, euler_angles, scale) -> jnp.ndarray:
    """``Transform::toMatrix`` (``geometry/transform.cpp:11-15``): T @ R @ S."""
    return (
        _batched_translate(_f32(translation))
        @ orientate4(euler_angles)
        @ scale_matrix(scale)
    )


def look_at_vk(eye, center, up) -> jnp.ndarray:
    """``lookAtVk`` (``geometryhelpers.cpp:63-68``): scale(1,-1,-1) @ lookAtRH."""
    eye_v, center_v, up_v = _f32(eye), _f32(center), _f32(up)
    f = _normalize(center_v - eye_v)
    s = _normalize(jnp.cross(f, up_v))
    u = jnp.cross(s, f)
    z = jnp.zeros_like(f[..., 0])
    o = jnp.ones_like(z)
    rows = [
        s[..., 0], s[..., 1], s[..., 2], -_dot(s, eye_v),
        u[..., 0], u[..., 1], u[..., 2], -_dot(u, eye_v),
        -f[..., 0], -f[..., 1], -f[..., 2], _dot(f, eye_v),
        z, z, z, o,
    ]
    look_rh = _compose4(rows)
    flip = scale_matrix(jnp.array([1.0, -1.0, -1.0], dtype=jnp.float32))
    return flip @ look_rh


def _normalize(v, eps=1e-20):
    return v / jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), eps))


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def look_at_vk_safe(eye, center) -> jnp.ndarray:
    """``lookAtVkSafe`` (``geometryhelpers.cpp:70-81``): falls back to
    WORLD_FORWARD as up when the world axes degenerate (they never do with
    the engine's orthonormal basis — kept for API parity)."""
    cosine = jnp.sum(WORLD_FORWARD * WORLD_UP)
    up = jnp.where(
        jnp.abs(cosine) > 0.99, WORLD_FORWARD * jnp.sign(cosine), WORLD_UP
    )
    return look_at_vk(eye, center, up)


def random_quat(key) -> jnp.ndarray:
    """``randomQuat`` (``geometryhelpers.cpp:159-169``): uniform random
    rotation quaternion (w, x, y, z), via two unit-disk samples."""
    import jax

    k1, k2 = jax.random.split(jnp.asarray(key))

    def disk(k):
        # rejection-free: polar sampling of the unit disk
        ka, kb = jax.random.split(k)
        r = jnp.sqrt(jax.random.uniform(ka))
        theta = jax.random.uniform(kb) * 2.0 * jnp.pi
        return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)])

    xy = disk(k1)
    uv = disk(k2)
    s = jnp.sqrt((1.0 - jnp.sum(xy * xy)) / jnp.maximum(jnp.sum(uv * uv), 1e-12))
    return jnp.stack([s * uv[1], xy[0], xy[1], s * uv[0]])


def perspective_vk(fov_y_degrees, aspect_ratio, near, far) -> jnp.ndarray:
    """``projectionVk`` (``geometryhelpers.cpp:83-95``).

    ``glm::perspectiveLH_ZO`` with near/far swapped -> reverse-Z: depth 1.0 at
    ``near``, 0.0 at ``far``.
    """
    fov = jnp.radians(_f32(fov_y_degrees))
    a = _f32(aspect_ratio)
    n, f = _f32(near), _f32(far)
    t = jnp.tan(fov / 2.0)
    # perspectiveLH_ZO(fov, a, zNear=f, zFar=n)
    z_near, z_far = f, n
    z = jnp.zeros_like(t)
    o = jnp.ones_like(t)
    rows = [
        1.0 / (a * t), z, z, z,
        z, 1.0 / t, z, z,
        z, z, z_far / (z_far - z_near), -(z_far * z_near) / (z_far - z_near),
        z, z, o, z,
    ]
    return _compose4(rows)


def projection_ortho_vk(min_v, max_v) -> jnp.ndarray:
    """``projectionOrthoVk`` (``geometryhelpers.cpp:97-100``).

    ``glm::orthoLH_ZO(min.x, max.x, min.y, max.y, zNear=max.z, zFar=min.z)`` —
    near/far swapped for reverse-Z.
    """
    mn, mx = _f32(min_v), _f32(max_v)
    left, right = mn[..., 0], mx[..., 0]
    bottom, top = mn[..., 1], mx[..., 1]
    z_near, z_far = mx[..., 2], mn[..., 2]
    z = jnp.zeros_like(left)
    o = jnp.ones_like(left)
    rows = [
        2.0 / (right - left), z, z, -(right + left) / (right - left),
        z, 2.0 / (top - bottom), z, -(top + bottom) / (top - bottom),
        z, z, 1.0 / (z_far - z_near), -z_near / (z_far - z_near),
        z, z, z, o,
    ]
    return _compose4(rows)


class AABB(NamedTuple):
    """Axis-aligned box as center + half extent (``geometrytypes.hpp:14-26``)."""

    center: jnp.ndarray  # (..., 3)
    half_extent: jnp.ndarray  # (..., 3)

    def collect_vertices(self) -> jnp.ndarray:
        """All 8 corners, shape (..., 8, 3) (``geometrytypes.cpp:20-32``)."""
        signs = jnp.array(
            [
                [sx, sy, sz]
                for sx in (-1.0, 1.0)
                for sy in (-1.0, 1.0)
                for sz in (-1.0, 1.0)
            ],
            dtype=jnp.float32,
        )
        return self.center[..., None, :] + self.half_extent[..., None, :] * signs

    @property
    def min(self) -> jnp.ndarray:
        return self.center - self.half_extent

    @property
    def max(self) -> jnp.ndarray:
        return self.center + self.half_extent


def aabb_from_min_max(min_v, max_v) -> AABB:
    mn, mx = _f32(min_v), _f32(max_v)
    return AABB(center=(mn + mx) * 0.5, half_extent=(mx - mn) * 0.5)


def project_point_on_plane(plane_point, plane_normal, point) -> jnp.ndarray:
    """``projectPointOnPlane`` (``geometryhelpers.cpp:55-61``).

    NOTE: reproduces the reference exactly — it *adds* the normal component
    (``dot(point - plane.point, n) * n + point``) instead of subtracting,
    doubling the forward offset. Shadow frusta depend on this behavior.
    """
    to_point = _f32(point) - _f32(plane_point)
    n = _f32(plane_normal)
    return jnp.sum(to_point * n, axis=-1, keepdims=True) * n + point


def ortho_aabb_vk(view, bounds: AABB) -> jnp.ndarray:
    """``projectionOrthoAABBVk`` (``geometryhelpers.cpp:171-204``).

    Fits an orthographic projection around an AABB as seen from ``view``.
    """
    view_m = _f32(view)
    verts = bounds.collect_vertices()  # (..., 8, 3)
    ones = jnp.ones((*verts.shape[:-1], 1), dtype=jnp.float32)
    verts_h = jnp.concatenate([verts, ones], axis=-1)  # (..., 8, 4)
    verts_view = jnp.einsum("...ij,...vj->...vi", view_m, verts_h)[..., :3]
    center_h = jnp.concatenate(
        [bounds.center, jnp.ones((*bounds.center.shape[:-1], 1), jnp.float32)],
        axis=-1,
    )
    center_view = jnp.einsum("...ij,...j->...i", view_m, center_h)[..., :3]
    projected = project_point_on_plane(
        center_view[..., None, :], WORLD_FORWARD, verts_view
    )
    view_min = jnp.min(projected, axis=-2)
    view_max = jnp.max(projected, axis=-2)
    return projection_ortho_vk(view_min, view_max)
