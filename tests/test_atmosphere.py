"""Atmosphere: LUT mappings, ray-sphere math, physical sanity of the LUTs."""

import jax.numpy as jnp
import numpy as np
import pytest

from syzygy_tpu.kernels import atmosphere as atm
from syzygy_tpu.scene import Atmosphere


@pytest.fixture(scope="module")
def atmo():
    return Atmosphere().packed()


def test_transmittance_uv_roundtrip(atmo):
    # RMu -> UV -> RMu must round-trip inside the valid domain
    radius = jnp.asarray([6.37, 6.40, 6.4199], jnp.float32)
    mu = jnp.asarray([0.9, 0.2, 0.05], jnp.float32)
    u, v = atm.transmittance_rmu_to_uv(atmo, radius, mu)
    r2, mu2 = atm.transmittance_uv_to_rmu(atmo, u, v)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(radius), atol=2e-4)
    np.testing.assert_allclose(np.asarray(mu2), np.asarray(mu), atol=2e-3)


def test_ray_sphere_intersection():
    origin = jnp.asarray([[0.0, 2.0, 0.0]])
    down = jnp.asarray([[0.0, -1.0, 0.0]])
    hit, t0, t1 = atm.ray_sphere_intersect(origin, down, 1.0)
    assert bool(hit[0])
    np.testing.assert_allclose(np.asarray(t0)[0], 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t1)[0], 3.0, atol=1e-5)
    # miss
    side = jnp.asarray([[1.0, 0.0, 0.0]])
    hit2, _, _ = atm.ray_sphere_intersect(origin, side, 1.0)
    assert not bool(hit2[0])


def test_phase_functions_normalize():
    # integral over sphere of phase = 1: check with midpoint rule over cos
    cos = jnp.linspace(-0.9999, 0.9999, 20001)
    dcos = float(cos[1] - cos[0])
    for phase in [atm.phase_rayleigh, lambda c: atm.phase_mie(c, 0.8)]:
        total = float(jnp.sum(phase(cos)) * dcos * 2 * np.pi)
        assert abs(total - 1.0) < 5e-2


def test_transmittance_lut_physical(atmo):
    lut = np.asarray(atm.compute_transmittance_lut(atmo))
    assert lut.shape == (atm.TRANSMITTANCE_H, atm.TRANSMITTANCE_W, 3)
    assert np.isfinite(lut).all()
    assert (lut >= 0).all() and (lut <= 1.0 + 1e-5).all()
    # u=0 encodes d = d_min (shortest path): at the atmosphere's top edge
    # (v=1) that's a zero-length path -> transmittance ~ 1
    assert lut[-1, 0].min() > 0.95
    # ground-level zenith ray (u=0, v=0): mild extinction, blue < red < 1
    ground_up = lut[0, 0]
    assert ground_up[2] < ground_up[1] < ground_up[0] < 1.0
    assert ground_up[2] > 0.5
    # ground-level horizon-grazing ray (u=1 is the longest path): heavy
    # extinction, blue scatters out more than red
    ground_long = lut[0, -1]
    assert ground_long[2] < ground_long[0] < 0.5


def test_transmittance_monotonic_in_mu(atmo):
    # at fixed radius, transmittance decreases as the path length grows
    # (u=0 shortest -> u=1 horizon-grazing)
    lut = np.asarray(atm.compute_transmittance_lut(atmo))
    row = lut[64]  # mid radius
    luminance = row.mean(axis=-1)
    assert luminance[0] > luminance[-1]


def test_extinction_profile(atmo):
    # Rayleigh density decays with altitude; ozone peaks at 25 km
    low = atm.sample_extinction(atmo, jnp.asarray([0.0]))
    high = atm.sample_extinction(atmo, jnp.asarray([0.05]))  # 50 km
    assert float(low.scattering_rayleigh[0, 2]) > float(
        high.scattering_rayleigh[0, 2]
    )
    ozone_peak = atm.sample_extinction(atmo, jnp.asarray([0.025]))
    ozone_ground = atm.sample_extinction(atmo, jnp.asarray([0.0]))
    # ozone absorbs: extinction g-channel at 25km greater than the pure
    # molecular difference would suggest
    assert float(ozone_peak.extinction[0, 1]) > 0.0


def test_skyview_lut_daylight(atmo):
    t_lut = atm.compute_transmittance_lut(atmo)
    # noon sun (incident straight down in sky space)
    noon = atmo._replace(
        incident_direction_sun=jnp.asarray([0.0, -1.0, 0.0], jnp.float32)
    )
    origin = jnp.asarray([0.0, 6.36 + 1e-5, 0.0], jnp.float32)  # 10 m up
    sky = np.asarray(
        atm.compute_skyview_lut(noon, origin, t_lut, width=64, height=32)
    )
    assert np.isfinite(sky).all()
    above = sky[: 32 // 2]  # v < 0.5: above horizon
    # daytime sky is blue: channel 2 dominates in-scattering
    assert above[..., 2].mean() > above[..., 0].mean() > 0
    # and the upper sky carries non-trivial luminance at noon
    assert above[..., 2].mean() > 1e-3


def test_skyview_lut_night_dark(atmo):
    t_lut = atm.compute_transmittance_lut(atmo)
    midnight = atmo._replace(
        incident_direction_sun=jnp.asarray([0.0, 1.0, 0.0], jnp.float32)
    )
    origin = jnp.asarray([0.0, 6.36 + 1e-5, 0.0], jnp.float32)  # 10 m up
    sky = np.asarray(
        atm.compute_skyview_lut(midnight, origin, t_lut, width=64, height=32)
    )
    # sun below horizon: sky orders of magnitude darker than day
    assert sky.mean() < 1e-4


def test_luminance_integral_zero_distance(atmo):
    t_lut = atm.compute_transmittance_lut(atmo)
    origin = jnp.asarray([[0.0, 6.361, 0.0]], jnp.float32)
    direction = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    lum = atm.luminance_scattering_integral(
        atmo, t_lut, origin, direction, jnp.asarray([0.0], jnp.float32)
    )
    np.testing.assert_allclose(np.asarray(lum), 0.0, atol=1e-6)


def test_packed_lut_bitwise_identical(atmo):
    """Quad-packed bilinear sampling must equal the 4-gather path exactly."""
    lut = atm.compute_transmittance_lut(atmo)
    packed = atm.pack_lut(lut)
    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.random(4096, np.float32))
    v = jnp.asarray(rng.random(4096, np.float32))
    a = np.asarray(atm.sample_lut_bilinear(lut, u, v))
    b = np.asarray(atm.sample_lut_bilinear(packed, u, v))
    np.testing.assert_array_equal(a, b)


def test_fast_integral(atmo):
    """The opt-in fast integral (exp-step accumulation) tracks the exact
    LUT-ratio integral: same shape, bounded deviation. Documents why
    fast_sky is NOT parity-exact (steps span tens of km at 32 samples)."""
    lut = atm.compute_transmittance_lut(atmo)
    origin = jnp.asarray([0.0, 6.3601, 0.0], jnp.float32)
    exact = np.asarray(
        atm.compute_skyview_lut(atmo, origin, lut, width=128, height=64)
    )
    fast = np.asarray(
        atm.compute_skyview_lut(
            atmo, origin, lut, width=128, height=64, fast=True
        )
    )
    assert np.isfinite(fast).all()
    diff = np.abs(exact - fast)
    assert diff.max() < 0.03, diff.max()
    rmse = float(np.sqrt((diff**2).mean()))
    assert rmse < 3e-3, rmse


def test_skyview_rowwise(atmo):
    """The rowwise skyview builder (default) vs the per-texel build: exact
    on-axis up to float-summation order everywhere except the horizon row
    (where the in-scatter integral is discontinuity-sensitive); bounded
    deviation for realistic off-axis camera origins. Frame-level impact
    measured at max 1.4e-4 / RMSE 6.4e-6 (renderer/frame.py)."""
    lut = atm.pack_lut(atm.compute_transmittance_lut(atmo))
    for origin, max_tol, rmse_tol in [
        (jnp.asarray([0.0, 6.3601, 0.0], jnp.float32), 5e-3, 2e-4),
        (jnp.asarray([18e-6, 6.360016, -22e-6], jnp.float32), 8e-2, 3e-3),
    ]:
        exact = np.asarray(
            atm.compute_skyview_lut(
                atmo, origin, lut, width=256, height=128, rowwise=False
            )
        )
        row = np.asarray(
            atm.compute_skyview_lut(
                atmo, origin, lut, width=256, height=128, rowwise=True
            )
        )
        d = np.abs(exact - row)
        assert d.max() < max_tol, d.max()
        assert float(np.sqrt((d**2).mean())) < rmse_tol


def test_transmittance_lut_downsample_close(atmo):
    """Non-default LUT dims are self-consistent (half-texel insets follow the
    dims) and close to the reference 512x128 field: the transmittance field
    is smooth, so a 256x64 LUT sampled over the valid (radius, mu) domain
    stays within float-noise-scale deviation of the full-res LUT."""
    full = atm.pack_lut(atm.compute_transmittance_lut(atmo))
    half = atm.pack_lut(
        atm.compute_transmittance_lut(atmo, width=256, height=64)
    )
    rng = np.random.default_rng(7)
    pl = float(atmo.planet_radius_mm)
    at = float(atmo.atmosphere_radius_mm)
    radius = jnp.asarray(
        rng.uniform(pl + 1e-5, at - 1e-5, size=4096), jnp.float32
    )
    mu = jnp.asarray(rng.uniform(-0.05, 1.0, size=4096), jnp.float32)
    a = np.asarray(atm.sample_transmittance_rmu(full, atmo, radius, mu))
    b = np.asarray(atm.sample_transmittance_rmu(half, atmo, radius, mu))
    d = np.abs(a - b)
    assert d.max() < 2e-2, d.max()
    assert float(np.sqrt((d**2).mean())) < 2e-3


def test_transmittance_lut_dims_self_consistent(atmo):
    """Sampling a non-default-dims LUT at its own texel-center (radius, mu)
    coordinates reproduces the stored texels to UV-roundtrip float noise
    (~3e-5) — proves the UV mapping's half-texel insets are derived from the
    actual LUT dims end-to-end (builder -> sampler). With insets still pinned
    to 512x128 the error here is ~1e-2."""
    w, h = 128, 32
    lut = atm.compute_transmittance_lut(atmo, width=w, height=h)
    u = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    v = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    uu, vv = jnp.meshgrid(u, v)
    radius, mu = atm.transmittance_uv_to_rmu(atmo, uu, vv, w, h)
    got = np.asarray(atm.sample_transmittance_rmu(lut, atmo, radius, mu))
    np.testing.assert_allclose(got, np.asarray(lut), atol=1e-4)
