"""Pinned GLSL-derived numeric fixtures.

Every expected value below was hand-evaluated in float64 directly from the
reference GLSL expressions (file:line cited per case) — independently of the
syzygy_tpu implementation — so formula parity no longer rests only on
self-consistency properties (monotonicity, roundtrips) or on goldens produced
by this codebase. Implementation (f32) must match the f64 hand evaluation to
float precision.
"""

import jax.numpy as jnp
import numpy as np

from syzygy_tpu.kernels.atmosphere import (
    phase_mie,
    phase_rayleigh,
    tex_coord_from_unit_range,
    transmittance_rmu_to_uv,
)
from syzygy_tpu.kernels.lighting import (
    PBRTexel,
    _light_contribution,
    compute_fresnel,
    compute_shadow_frame,
    convert_pbr,
    diffuse_brdf,
    specular_brdf,
)
from syzygy_tpu.kernels.resolve import GBuffer
from syzygy_tpu.kernels.transfer import oetf_srgb
from syzygy_tpu.scene.atmosphere import AtmospherePacked, atmosphere_raw, pack_atmosphere
from syzygy_tpu.scene.scene import Atmosphere


def _earth_atmo() -> AtmospherePacked:
    return pack_atmosphere(atmosphere_raw(Atmosphere()))


def test_texture_coord_from_unit_range_pinned():
    # common.glinl:29-32: 0.5/dim + value * (1 - 1/dim)
    np.testing.assert_allclose(
        float(tex_coord_from_unit_range(jnp.float32(0.25), 512)),
        0.25048828125,
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        float(tex_coord_from_unit_range(jnp.float32(0.75), 128)),
        0.748046875,
        rtol=1e-6,
    )


def test_transmittance_rmu_to_uv_pinned():
    """transmittanceLUT_RMu_to_UV (common.glinl:40-66) at Earth radii
    (planet 6.36 Mm, atmosphere 6.42 Mm): corners + a mid-domain point."""
    atmo = _earth_atmo()
    cases = [
        # (radius, mu) -> (u, v) hand-evaluated in f64
        (6.36, 1.0, 0.0009765625, 0.00390625),  # ground, straight up
        (6.36, 0.0, 0.9990234375, 0.00390625),  # ground, horizon
        (6.40, -0.1, 0.9138412424992775, 0.8133898082772677),
        (6.42, 0.3, 0.0009765625, 0.99609375),  # top of atmosphere
        (6.38, 0.05, 0.31699025929350466, 0.5758488048681712),
    ]
    for radius, mu, u_exp, v_exp in cases:
        u, v = transmittance_rmu_to_uv(
            atmo, jnp.float32(radius), jnp.float32(mu)
        )
        np.testing.assert_allclose(float(u), u_exp, atol=3e-5, err_msg=f"{radius},{mu}")
        np.testing.assert_allclose(float(v), v_exp, atol=3e-5, err_msg=f"{radius},{mu}")


def test_phase_functions_pinned():
    """phaseRayleigh / phaseMie g=0.8 (common.glinl:262-279)."""
    cases = [
        (-1.0, 0.1193662073189215, 0.005582033638183756),
        (-0.3, 0.06505458298881223, 0.005747813597849508),
        (0.0, 0.05968310365946075, 0.007750222965370519),
        (0.5, 0.07460387957432593, 0.026428411045664683),
        (1.0, 0.1193662073189215, 4.069302522235954),
    ]
    for c, pr_exp, pm_exp in cases:
        np.testing.assert_allclose(
            float(phase_rayleigh(jnp.float32(c))), pr_exp, rtol=1e-6
        )
        np.testing.assert_allclose(
            float(phase_mie(jnp.float32(c), 0.8)), pm_exp, rtol=1e-5
        )


def _gbuffer_1px(diffuse, specular, normal, position, orm):
    def plane(v, extra):
        return jnp.asarray(np.array(list(v) + [extra], np.float32)).reshape(
            1, 1, 4
        )

    return GBuffer(
        diffuse=plane(diffuse, 1.0),
        specular=plane(specular, 1.0),
        normal=plane(normal, 0.0),
        world_position=plane(position, 1.0),
        orm=plane(orm, 1.0),
    )


def test_convert_pbr_properties_pinned():
    """convertPBRProperties (pbrFunctions.glinl:3-20): metallic lerp of
    reflectance and the 160^(1-roughness) specular power."""
    gb = _gbuffer_1px(
        diffuse=(0.8, 0.4, 0.2),
        specular=(0.5, 0.25, 0.125),
        normal=(0.0, 0.0, 1.0),
        position=(0.0, 0.0, 0.0),
        orm=(0.7, 0.3, 0.5),  # occlusion, roughness, metallic
    )
    m = convert_pbr(gb)
    # metallicReflectence = 0.5 * spec / max3(spec) = (0.5, 0.25, 0.125)
    # mix(0.04, that, metallic=0.5) = (0.27, 0.145, 0.0825)
    np.testing.assert_allclose(
        np.asarray(m.normal_reflectance)[0, 0], [0.27, 0.145, 0.0825], rtol=1e-6
    )
    np.testing.assert_allclose(
        float(m.specular_power[0, 0, 0]), 34.90470628408384, rtol=1e-5
    )
    np.testing.assert_allclose(float(m.occlusion[0, 0, 0]), 0.7)
    np.testing.assert_allclose(float(m.metallic[0, 0, 0]), 0.5)


def _dielectric_material():
    shape = (1, 1, 3)
    return PBRTexel(
        position=jnp.zeros(shape),
        normal=jnp.asarray([[[0.0, 0.0, 1.0]]]),
        subscattering_color=jnp.asarray([[[0.8, 0.4, 0.2]]]),
        normal_reflectance=jnp.full(shape, 0.04),
        occlusion=jnp.full((1, 1, 1), 0.7),
        specular_power=jnp.full((1, 1, 1), 160.0 ** (1.0 - 0.3)),
        metallic=jnp.zeros((1, 1, 1)),
    )


_LIGHT = jnp.asarray([[[0.0, 0.6, 0.8]]])
_VIEW = jnp.asarray([[[0.0, -0.6, 0.8]]])


def test_brdf_pinned():
    """computeFresnel / specularBRDF / diffuseBRDF (pbrFunctions.glinl:22-52)
    at l=(0,.6,.8), v=(0,-.6,.8): halfway = (0,0,1) exactly, h.l = 0.8."""
    m = _dielectric_material()
    fres = np.asarray(compute_fresnel(m, _LIGHT, _VIEW))[0, 0]
    # 0.04 + 0.96 * 0.2^5 = 0.0403072
    np.testing.assert_allclose(fres, 0.0403072, rtol=1e-6)
    spec = np.asarray(specular_brdf(m, _LIGHT, _VIEW))[0, 0]
    # h.n = 1 -> (specPower + 2) / 8 = 4.61308828551048
    np.testing.assert_allclose(spec, 4.61308828551048, rtol=1e-5)
    diff = np.asarray(diffuse_brdf(m))[0, 0]
    np.testing.assert_allclose(
        diff, np.array([0.8, 0.4, 0.2]) / 3.14159265359, rtol=1e-6
    )


def test_light_contribution_pinned():
    """computeLightContribution (lights.comp:93-108) end-to-end:
    occlusion * mix(diffuse, specular, fresnel) * spectral * <n.l>."""
    m = _dielectric_material()
    spectral = jnp.asarray([[[1.0, 0.9, 0.8]]]) * 2.5
    out = np.asarray(_light_contribution(m, _VIEW, _LIGHT, spectral))[0, 0]
    np.testing.assert_allclose(
        out, [0.60245421, 0.38824702, 0.27668101], rtol=1e-5
    )


def test_compute_shadow_frame_pinned():
    """computeShadowFrame (shadowmap.glinl:17-30) with identity projView:
    coord = (0.5x+0.5, 0.5y+0.5, z); spread from the projected normal."""
    position = jnp.asarray([[[0.2, -0.4, 0.6]]])
    normal = jnp.asarray([[[0.6, 0.8, 0.0]]])
    coord, dx, dy = compute_shadow_frame(jnp.eye(4), position, normal)
    np.testing.assert_allclose(
        np.asarray(coord)[0, 0, :3], [0.6, 0.3, 0.6], rtol=1e-6
    )
    np.testing.assert_allclose(float(dx[0, 0]), 0.9539392014169457, rtol=1e-6)
    np.testing.assert_allclose(float(dy[0, 0]), 0.916515138991168, rtol=1e-6)


def test_oetf_srgb_pinned():
    """oetf_srgb.comp:9-19: piecewise sRGB encode incl. the 0.0031308 knee."""
    x = jnp.asarray([0.0, 0.0031307, 0.0031309, 0.25, 0.5, 1.0])
    y = np.asarray(oetf_srgb(x))
    np.testing.assert_allclose(
        y,
        [
            0.0,
            0.040448644,
            0.04045117777859802,
            0.5370987304831942,
            0.7353569830524495,
            1.0,
        ],
        rtol=1e-5,
        atol=1e-7,
    )
