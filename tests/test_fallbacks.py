"""Degraded-mode behavior: native lib absent, packed vs unpacked parity."""

import numpy as np

from syzygy_tpu import native
from syzygy_tpu.scene import (
    default_scene,
    flatten_frame_params,
    frame_param_spec,
    pack_frame_params,
    unflatten_frame_params,
)


def test_shadow_bounds_python_fallback(monkeypatch):
    scene, _ = default_scene()
    with_native = scene.shadow_bounds()
    monkeypatch.setattr(native, "available", lambda: False)
    without = scene.shadow_bounds()
    np.testing.assert_allclose(with_native[0], without[0], atol=1e-4)
    np.testing.assert_allclose(with_native[1], without[1], atol=1e-4)


def test_frame_params_flatten_roundtrip():
    import jax

    scene, _ = default_scene()
    scene.tick(0.123)
    params = pack_frame_params(scene, 1.5, debug_lines=True)
    spec = frame_param_spec(params)
    buf = flatten_frame_params(params, spec)
    restored = jax.jit(
        lambda b: unflatten_frame_params(spec, b)
    )(buf)
    for orig, back in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_allclose(
            np.asarray(orig, np.float32), np.asarray(back, np.float32), atol=0
        )
        assert np.asarray(orig).shape == np.asarray(back).shape
