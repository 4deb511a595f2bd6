"""Port of the reference's startup geometry tests plus matrix-builder checks.

Euler cases mirror ``syzygy/source/syzygy/geometry/geometrytests.cpp:102-218``
verbatim; projection/view checks pin the GLM conventions the renderer relies on
(reverse-Z LH_ZO with swapped near/far, +y-down world)."""

import math

import numpy as np
import pytest

from syzygy_tpu.math import geometry as g

FORWARD = np.array([0.0, 0.0, 1.0], np.float32)
UP = np.array([0.0, -1.0, 0.0], np.float32)
RIGHT = np.array([1.0, 0.0, 0.0], np.float32)

EPS = 3.0 * 1.1920929e-07 * 10  # TEST_EPSILON scaled for f32 trig in jnp

HALF_PI = math.pi / 2
QUARTER_PI = math.pi / 4


def _roundtrip(forward):
    f = np.asarray(forward, np.float32)
    f = f / np.linalg.norm(f)
    eulers = np.asarray(g.eulers_from_forward(f))
    back = np.asarray(g.forward_from_eulers(eulers))
    np.testing.assert_allclose(back, f, atol=EPS)


@pytest.mark.parametrize(
    "forward",
    [
        [1, 0, 0],
        [0, 1, 0],
        [0, 0, 1],
        FORWARD,
        RIGHT,
        UP,
        FORWARD + RIGHT,
        RIGHT + UP,
        UP + FORWARD,
        FORWARD + RIGHT + UP,
        -FORWARD,
        -RIGHT,
        -UP,
        -FORWARD - RIGHT,
        -RIGHT - UP,
        -UP - FORWARD,
        -FORWARD - RIGHT - UP,
    ],
)
def test_euler_roundtrip(forward):
    # geometrytests.cpp:106-118
    _roundtrip(forward)


@pytest.mark.parametrize(
    "forward,expected",
    [
        (FORWARD, [0, 0, 0]),
        (-FORWARD, [0, 0, -math.pi]),
        (RIGHT, [0, 0, HALF_PI]),
        (-RIGHT, [0, 0, -HALF_PI]),
        (UP, [HALF_PI, 0, 0]),
        (-UP, [-HALF_PI, 0, 0]),
        (FORWARD + UP, [QUARTER_PI, 0, 0]),
        (FORWARD - UP, [-QUARTER_PI, 0, 0]),
        (-FORWARD - UP, [-QUARTER_PI, 0, math.pi]),
        (-FORWARD + UP, [QUARTER_PI, 0, math.pi]),
        (UP + RIGHT, [QUARTER_PI, 0, HALF_PI]),
        (UP - RIGHT, [QUARTER_PI, 0, -HALF_PI]),
        (-UP - RIGHT, [-QUARTER_PI, 0, -HALF_PI]),
        (-UP + RIGHT, [-QUARTER_PI, 0, HALF_PI]),
        (RIGHT + FORWARD, [0, 0, QUARTER_PI]),
        (RIGHT - FORWARD, [0, 0, 3 * QUARTER_PI]),
        (-RIGHT - FORWARD, [0, 0, -3 * QUARTER_PI]),
        (-RIGHT + FORWARD, [0, 0, -QUARTER_PI]),
    ],
)
def test_euler_expected_angles(forward, expected):
    # geometrytests.cpp:120-186
    f = np.asarray(forward, np.float32)
    f = f / np.linalg.norm(f)
    eulers = np.asarray(g.eulers_from_forward(f))
    # Compare as angles: ±pi yaw is the same rotation (XLA's summation loses
    # the signed zero GLM's atan2 sees, flipping the sign on exactly-backward).
    diff = np.mod(eulers - np.asarray(expected, np.float32) + math.pi, 2 * math.pi) - math.pi
    np.testing.assert_allclose(diff, np.zeros(3), atol=EPS)


def test_euler_precision_probe():
    # geometrytests.cpp:188-215 — magnitudes up to some power of two round-trip
    factor = 1.0
    while factor < 2**20:
        for s in (1.0, -1.0):
            _roundtrip(s * factor * (FORWARD + RIGHT + UP))
        factor *= 2


def test_zero_forward_gives_zero_eulers():
    np.testing.assert_array_equal(
        np.asarray(g.eulers_from_forward([0.0, 0.0, 0.0])), np.zeros(3, np.float32)
    )


def test_perspective_reverse_z():
    # depth 1.0 at near, 0.0 at far (geometryhelpers.cpp:83-95)
    proj = np.asarray(g.perspective_vk(70.0, 16 / 9, 0.1, 10000.0))
    for z, want in [(0.1, 1.0), (10000.0, 0.0)]:
        clip = proj @ np.array([0, 0, z, 1], np.float32)
        assert clip[3] == pytest.approx(z)
        assert clip[2] / clip[3] == pytest.approx(want, abs=1e-5)
    # midpoint depth is between, monotonically decreasing with distance
    clip_mid = proj @ np.array([0, 0, 100.0, 1], np.float32)
    assert 0.0 < clip_mid[2] / clip_mid[3] < 1.0


def test_perspective_fov_scaling():
    proj = np.asarray(g.perspective_vk(90.0, 1.0, 0.1, 100.0))
    # At fov 90, a point at x=z lands on the clip boundary x/w = 1
    clip = proj @ np.array([5.0, 0, 5.0, 1], np.float32)
    assert clip[0] / clip[3] == pytest.approx(1.0, abs=1e-5)


def test_ortho_reverse_z():
    proj = np.asarray(g.projection_ortho_vk([-1, -1, 2.0], [1, 1, 10.0]))
    near = proj @ np.array([0, 0, 2.0, 1], np.float32)
    far = proj @ np.array([0, 0, 10.0, 1], np.float32)
    assert near[2] == pytest.approx(1.0, abs=1e-5)
    assert far[2] == pytest.approx(0.0, abs=1e-5)


def test_view_inverse_of_transform():
    pos = np.array([3.0, -2.0, 5.0], np.float32)
    eulers = np.array([0.3, 0.1, -0.7], np.float32)
    t = np.asarray(g.transform_vk(pos, eulers))
    v = np.asarray(g.view_vk(pos, eulers))
    np.testing.assert_allclose(t @ v, np.eye(4), atol=1e-5)


def test_camera_view_maps_camera_forward_to_z():
    # A camera looking along its rotated forward sees that direction as +z
    eulers = np.array([0.4, 0.0, 1.1], np.float32)
    pos = np.array([1.0, 2.0, 3.0], np.float32)
    fwd = np.asarray(g.forward_from_eulers(eulers))
    v = np.asarray(g.view_vk(pos, eulers))
    view_dir = v @ np.append(fwd, 0.0).astype(np.float32)
    np.testing.assert_allclose(view_dir[:3], [0, 0, 1], atol=1e-6)


def test_transform_trs_order():
    # toMatrix = translate @ rotate @ scale (transform.cpp:11-15)
    m = np.asarray(
        g.transform_to_matrix([1.0, 2.0, 3.0], [0.0, 0.0, HALF_PI], [2.0, 2.0, 2.0])
    )
    # origin maps to translation
    np.testing.assert_allclose(m @ [0, 0, 0, 1], [1, 2, 3, 1], atol=1e-6)
    # +z scaled then yawed: forward 2*(0,0,1) -> yaw by pi/2 -> 2*(1,0,0)
    np.testing.assert_allclose((m @ [0, 0, 1, 1])[:3], [3, 2, 3], atol=1e-6)


def test_aabb_vertices():
    box = g.aabb_from_min_max([-1, -2, -3], [1, 2, 3])
    verts = np.asarray(box.collect_vertices())
    assert verts.shape == (8, 3)
    np.testing.assert_allclose(verts.min(axis=0), [-1, -2, -3])
    np.testing.assert_allclose(verts.max(axis=0), [1, 2, 3])


def test_ortho_aabb_contains_bounds():
    # All AABB corners must land inside the clip volume after proj @ view
    box = g.aabb_from_min_max([-4, -3, -2], [5, 1, 7])
    eulers = np.asarray(g.eulers_from_forward([0.3, 0.5, 0.8]))
    view = np.asarray(g.view_vk(np.zeros(3, np.float32), eulers))
    proj = np.asarray(g.ortho_aabb_vk(view, box))
    verts = np.asarray(box.collect_vertices())
    for v in verts:
        clip = proj @ view @ np.append(v, 1.0).astype(np.float32)
        assert -1.0001 <= clip[0] <= 1.0001
        assert -1.0001 <= clip[1] <= 1.0001
        assert -0.0001 <= clip[2] <= 1.0001


def test_look_at_vk_center_on_axis():
    # The look-at target projects to the view-space +z axis
    eye = np.array([1.0, -5.0, 2.0], np.float32)
    center = np.array([4.0, 0.0, -1.0], np.float32)
    m = np.asarray(g.look_at_vk(eye, center, np.asarray(g.WORLD_UP)))
    view_center = m @ np.append(center, 1.0).astype(np.float32)
    assert view_center[0] == pytest.approx(0.0, abs=1e-5)
    assert view_center[1] == pytest.approx(0.0, abs=1e-5)
    assert view_center[2] == pytest.approx(np.linalg.norm(center - eye), abs=1e-4)


def test_look_at_vk_safe_matches_look_at():
    eye = np.array([1.0, -5.0, 2.0], np.float32)
    center = np.array([4.0, 0.0, -1.0], np.float32)
    a = np.asarray(g.look_at_vk(eye, center, np.asarray(g.WORLD_UP)))
    b = np.asarray(g.look_at_vk_safe(eye, center))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_random_quat_unit_norm():
    import jax

    for seed in range(4):
        q = np.asarray(g.random_quat(jax.random.PRNGKey(seed)))
        np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-5)
