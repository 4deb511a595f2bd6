"""Native C++ host core vs the Python implementations."""

import math

import numpy as np
import pytest

from syzygy_tpu import native
from syzygy_tpu.scene import TransformHost

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_trs_matrices_match_python():
    rng = np.random.default_rng(3)
    n = 64
    t = rng.normal(size=(n, 3)).astype(np.float32)
    e = rng.uniform(-math.pi, math.pi, (n, 3)).astype(np.float32)
    s = rng.uniform(0.5, 3.0, (n, 3)).astype(np.float32)
    out = native.trs_to_matrices(t, e, s)
    for i in range(0, n, 7):
        ref = TransformHost.make(t[i], e[i], s[i]).to_matrix()
        np.testing.assert_allclose(out[i], ref, atol=1e-6)


def test_shadow_bounds_match_python():
    rng = np.random.default_rng(4)
    n = 10
    t = rng.normal(size=(n, 3)).astype(np.float32) * 5
    e = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    s = rng.uniform(0.5, 2.0, (n, 3)).astype(np.float32)
    mats = native.trs_to_matrices(t, e, s)
    corners = np.array(
        [[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)],
        np.float32,
    )
    corners_all = np.tile(corners[None], (n, 1, 1))
    casts = np.ones(n, np.uint8)
    casts[3] = 0  # one non-caster
    found, mn, mx = native.shadow_bounds(casts, corners_all, mats)
    assert found
    # python reference
    ref_mn = np.full(3, np.inf)
    ref_mx = np.full(3, -np.inf)
    ch = np.concatenate([corners, np.ones((8, 1), np.float32)], 1)
    for i in range(n):
        if not casts[i]:
            continue
        world = (mats[i] @ ch.T).T[:, :3]
        ref_mn = np.minimum(ref_mn, world.min(0))
        ref_mx = np.maximum(ref_mx, world.max(0))
    np.testing.assert_allclose(mn, ref_mn, atol=1e-5)
    np.testing.assert_allclose(mx, ref_mx, atol=1e-5)


def test_shadow_bounds_no_casters():
    found, mn, mx = native.shadow_bounds(
        np.zeros(2, np.uint8),
        np.zeros((2, 8, 3), np.float32),
        np.tile(np.eye(4, dtype=np.float32)[None], (2, 1, 1)),
    )
    assert not found
    np.testing.assert_array_equal(mn, 0)


def test_bin_triangles_exact():
    # 3 triangles: one in tile (0,0), one spanning two tiles, one invalid
    bboxes = np.array(
        [
            [5, 5, 20, 20],  # tile (0,0)
            [120, 5, 140, 20],  # tiles (0,0)... tile_w=128: x 120-140 -> tiles 0,1
            [0, 0, 500, 500],  # invalid
        ],
        np.float32,
    )
    valid = np.array([1, 1, 0], np.uint8)
    counts, indices, dropped = native.bin_triangles(
        bboxes, valid, tiles_x=2, tiles_y=1, tile_w=128, tile_h=64, capacity=4
    )
    assert dropped == 0
    assert counts[0, 0] == 2 and counts[0, 1] == 1
    assert set(indices[0, 0, :2].tolist()) == {0, 1}
    assert indices[0, 1, 0] == 1


def test_bin_triangles_overflow_reported():
    bboxes = np.tile(np.array([[1, 1, 5, 5]], np.float32), (10, 1))
    valid = np.ones(10, np.uint8)
    counts, _, dropped = native.bin_triangles(
        bboxes, valid, tiles_x=1, tiles_y=1, tile_w=64, tile_h=64, capacity=4
    )
    assert counts[0, 0] == 4
    assert dropped == 6


def test_tick_animations():
    kinds = np.array([1, 2, 0], np.int32)
    originals = np.array([[1, 0, 2], [0, 0, 0], [5, 5, 5]], np.float32)
    translations = originals.copy()
    eulers = np.zeros((3, 3), np.float32)
    native.tick_animations(kinds, originals, translations, eulers, 0.25, 0.1)
    expected_y = math.sin(0.25 + (1 + 10 + 2 + 10) / 3.1415)
    assert abs(translations[0, 1] - expected_y) < 1e-6
    assert abs(eulers[1, 2] - 0.1) < 1e-6
    np.testing.assert_array_equal(translations[2], [5, 5, 5])
