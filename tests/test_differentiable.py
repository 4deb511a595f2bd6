"""Differentiable shading: gradients flow through the lighting/sky math.

A JAX-native capability with no Vulkan counterpart: the deferred shading and
atmosphere passes are pure functions, so scene parameters (light color,
strength, sun angle) can be optimized against image losses. Visibility (the
Pallas raster) is treated as fixed — standard practice for shading-parameter
inverse rendering.
"""

import jax
import jax.numpy as jnp
import numpy as np

from syzygy_tpu.kernels.lighting import deferred_lighting
from syzygy_tpu.kernels.resolve import GBuffer
from syzygy_tpu.scene import Camera
from syzygy_tpu.scene.lights import (
    SpotlightParams,
    make_spot_batched,
    spot_raw,
)


def _setup(h=8, w=128):
    ones = np.ones((h, w, 1), np.float32)

    def plane(rgb, a=1.0):
        return jnp.asarray(
            np.concatenate(
                [np.tile(np.asarray(rgb, np.float32), (h, w, 1)), ones * a], -1
            )
        )

    gbuffer = GBuffer(
        diffuse=plane((0.6, 0.6, 0.6)),
        specular=plane((0.6, 0.6, 0.6)),
        normal=plane((0.0, -1.0, 0.0), 0.0),
        world_position=plane((0.0, -1.0, 0.0)),
        orm=plane((1.0, 0.5, 0.0)),
    )
    cam = Camera(position=(0.0, -5.0, 0.0)).packed(1.0)
    raw, n = spot_raw(
        [
            SpotlightParams(
                color=(0.9, 0.2, 0.1, 1.0),
                strength=10.0,
                position=(0.0, -3.0, 0.0),
                euler_angles=(-np.pi / 2, 0.0, 0.0),
                falloff_distance=10.0,
            )
        ],
        2,
    )
    smaps = jnp.zeros((4, 32, 32), jnp.float32)
    import jax.tree_util as jtu

    zero_dir = jax.tree.map(
        lambda x: jnp.zeros((2, *np.shape(x)), jnp.float32),
        make_spot_batched(raw),
    )
    # build a zeroed directional stack shaped like DirectionalLight
    from syzygy_tpu.scene.lights import DirectionalLight

    dirs = DirectionalLight(
        color=jnp.zeros((2, 4)),
        forward=jnp.tile(jnp.asarray([0.0, 0.0, 1.0, 0.0]), (2, 1)),
        projection=jnp.tile(jnp.eye(4), (2, 1, 1)),
        view=jnp.tile(jnp.eye(4), (2, 1, 1)),
        strength=jnp.zeros(2),
    )
    return gbuffer, cam, dirs, raw, smaps


def _render(gbuffer, cam, dirs, raw, smaps, color):
    raw2 = raw._replace(
        color=jnp.asarray(raw.color).at[0, :3].set(color)
    )
    spots = make_spot_batched(raw2)
    return deferred_lighting(
        gbuffer, cam, dirs, jnp.int32(0), jnp.int32(0), spots, jnp.int32(1),
        smaps, unroll=True,  # dynamic light loops have no VJP
    )


def test_gradients_flow_through_lighting():
    gbuffer, cam, dirs, raw, smaps = _setup()
    grad = jax.grad(
        lambda c: _render(gbuffer, cam, dirs, raw, smaps, c).mean()
    )(jnp.asarray([0.5, 0.5, 0.5]))
    g = np.asarray(grad)
    assert np.isfinite(g).all()
    assert (g > 0).all()  # brighter light -> brighter image, all channels


def test_inverse_rendering_recovers_light_color():
    gbuffer, cam, dirs, raw, smaps = _setup()
    target_color = jnp.asarray([0.8, 0.3, 0.05])
    target = _render(gbuffer, cam, dirs, raw, smaps, target_color)

    @jax.jit
    def loss_fn(c):
        img = _render(gbuffer, cam, dirs, raw, smaps, c)
        return jnp.mean((img - target) ** 2)

    # the image is linear in the light color, so the loss is quadratic:
    # Newton steps through the whole shading pass converge in one or two
    grad_fn = jax.jit(jax.grad(loss_fn))
    hess_fn = jax.jit(lambda c: jnp.diagonal(jax.hessian(loss_fn)(c)))
    c = jnp.asarray([0.5, 0.5, 0.5])
    for _ in range(3):
        c = c - grad_fn(c) / jnp.maximum(hess_fn(c), 1e-12)
    recovered = np.asarray(c)
    np.testing.assert_allclose(recovered, np.asarray(target_color), atol=1e-3)
    assert float(loss_fn(c)) < 1e-10
