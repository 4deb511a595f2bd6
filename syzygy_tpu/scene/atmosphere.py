"""Atmosphere parameters, sun animation, and sun/moon light baking.

Mirrors ``renderer/scene.cpp:44-91`` (Earth defaults from Hillaire 2020),
``Atmosphere::toDeviceEquivalent`` (``scene.cpp:694-716``), ``Atmosphere::baked``
(``scene.cpp:718-737``) and the sun/moon constructors (``scene.cpp:584-623``).

Host-side parameters are a frozen dataclass; the device-facing packed form is a
NamedTuple pytree whose leaves are jnp arrays (the analog of
``AtmospherePacked``, ``gputypes.hpp:39-72``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple

import jax.numpy as jnp

from syzygy_tpu.math.geometry import (
    AABB,
    WORLD_UP,
    forward_from_eulers,
)
from syzygy_tpu.scene.lights import DirectionalLight, make_directional

KILOMETERS_PER_MEGAMETER = 1000.0
METERS_PER_MEGAMETER = 1_000_000.0


@dataclasses.dataclass
class Atmosphere:
    """Editable atmosphere state (``renderer/scene.hpp`` Atmosphere).

    All lengths are megameters; scattering/absorption are per-megameter.
    Defaults: ``Scene::DEFAULT_ATMOSPHERE_EARTH`` (``scene.cpp:52-75``).
    """

    sun_euler_angles: tuple = (1.0, 0.0, 0.0)

    planet_radius_mm: float = 6.360
    atmosphere_radius_mm: float = 6.420

    ground_color: tuple = (1.0, 1.0, 1.0)

    scattering_rayleigh_per_mm: tuple = (5.802, 13.558, 33.1)
    absorption_rayleigh_per_mm: tuple = (0.0, 0.0, 0.0)
    altitude_decay_rayleigh_mm: float = 8.0 / KILOMETERS_PER_MEGAMETER

    scattering_mie_per_mm: tuple = (3.996, 3.996, 3.996)
    absorption_mie_per_mm: tuple = (4.40, 4.40, 4.40)
    altitude_decay_mie_mm: float = 1.2 / KILOMETERS_PER_MEGAMETER

    scattering_ozone_per_mm: tuple = (0.0, 0.0, 0.0)
    absorption_ozone_per_mm: tuple = (0.650, 1.881, 0.085)

    sun_intensity_spectrum: tuple = (1.0, 1.0, 1.0)
    sun_angular_radius: float = math.radians(32.0 / 60.0)

    def direction_to_sun(self) -> jnp.ndarray:
        """``Atmosphere::directionToSun`` (``scene.cpp:689-692``)."""
        return -forward_from_eulers(jnp.asarray(self.sun_euler_angles, jnp.float32))

    def packed(self) -> "AtmospherePacked":
        """``Atmosphere::toDeviceEquivalent`` (``scene.cpp:694-716``).

        Sky shaders use +y up while the engine is +y down, hence the y flip on
        the sun direction.
        """
        sun_dir = self.direction_to_sun()
        sun_dir = sun_dir / jnp.linalg.norm(sun_dir)
        sun_dir = sun_dir * jnp.array([1.0, -1.0, 1.0], jnp.float32)
        f32 = lambda x: jnp.asarray(x, jnp.float32)
        return AtmospherePacked(
            scattering_rayleigh_per_mm=f32(self.scattering_rayleigh_per_mm),
            density_scale_rayleigh_mm=f32(self.altitude_decay_rayleigh_mm),
            absorption_rayleigh_per_mm=f32(self.absorption_rayleigh_per_mm),
            planet_radius_mm=f32(self.planet_radius_mm),
            scattering_mie_per_mm=f32(self.scattering_mie_per_mm),
            density_scale_mie_mm=f32(self.altitude_decay_mie_mm),
            absorption_mie_per_mm=f32(self.absorption_mie_per_mm),
            atmosphere_radius_mm=f32(self.atmosphere_radius_mm),
            incident_direction_sun=-sun_dir,
            scattering_ozone_per_mm=f32(self.scattering_ozone_per_mm),
            absorption_ozone_per_mm=f32(self.absorption_ozone_per_mm),
            sun_intensity_spectrum=f32(self.sun_intensity_spectrum),
            sun_angular_radius=f32(self.sun_angular_radius),
        )

    def baked(self, scene_bounds: AABB) -> "AtmosphereBaked":
        """``Atmosphere::baked`` (``scene.cpp:718-737``): packed + sun/moon lights."""
        sun_cosine = float(
            jnp.sum(WORLD_UP * self.direction_to_sun())
        )
        sunlight = _create_sunlight(scene_bounds, self.sun_euler_angles)
        moonlight = _create_moonlight(scene_bounds, sun_cosine, SUNSET_COSINE)
        return AtmosphereBaked(
            atmosphere=self.packed(), sunlight=sunlight, moonlight=moonlight
        )


class AtmospherePacked(NamedTuple):
    """Device-facing atmosphere (``gputypes.hpp:39-72``), +y-up megameter units."""

    scattering_rayleigh_per_mm: jnp.ndarray
    density_scale_rayleigh_mm: jnp.ndarray
    absorption_rayleigh_per_mm: jnp.ndarray
    planet_radius_mm: jnp.ndarray
    scattering_mie_per_mm: jnp.ndarray
    density_scale_mie_mm: jnp.ndarray
    absorption_mie_per_mm: jnp.ndarray
    atmosphere_radius_mm: jnp.ndarray
    incident_direction_sun: jnp.ndarray
    scattering_ozone_per_mm: jnp.ndarray
    absorption_ozone_per_mm: jnp.ndarray
    sun_intensity_spectrum: jnp.ndarray
    sun_angular_radius: jnp.ndarray


class AtmosphereBaked(NamedTuple):
    atmosphere: AtmospherePacked
    sunlight: DirectionalLight
    moonlight: DirectionalLight


class AtmosphereRaw(NamedTuple):
    """Raw host->device atmosphere parameters (engine basis, megameters).

    The cheap per-frame upload; ``pack_atmosphere`` / ``bake_directional``
    derive the device-facing forms *inside* the jitted frame, so the host
    packing path is numpy-only.
    """

    sun_euler_angles: jnp.ndarray  # (3,)
    planet_radius_mm: jnp.ndarray
    atmosphere_radius_mm: jnp.ndarray
    scattering_rayleigh_per_mm: jnp.ndarray
    absorption_rayleigh_per_mm: jnp.ndarray
    density_scale_rayleigh_mm: jnp.ndarray
    scattering_mie_per_mm: jnp.ndarray
    absorption_mie_per_mm: jnp.ndarray
    density_scale_mie_mm: jnp.ndarray
    scattering_ozone_per_mm: jnp.ndarray
    absorption_ozone_per_mm: jnp.ndarray
    sun_intensity_spectrum: jnp.ndarray
    sun_angular_radius: jnp.ndarray


def atmosphere_raw(atmo: "Atmosphere") -> AtmosphereRaw:
    """Host-side (numpy) snapshot of the editable atmosphere state."""
    import numpy as np

    f = lambda x: np.asarray(x, np.float32)
    return AtmosphereRaw(
        sun_euler_angles=f(atmo.sun_euler_angles),
        planet_radius_mm=f(atmo.planet_radius_mm),
        atmosphere_radius_mm=f(atmo.atmosphere_radius_mm),
        scattering_rayleigh_per_mm=f(atmo.scattering_rayleigh_per_mm),
        absorption_rayleigh_per_mm=f(atmo.absorption_rayleigh_per_mm),
        density_scale_rayleigh_mm=f(atmo.altitude_decay_rayleigh_mm),
        scattering_mie_per_mm=f(atmo.scattering_mie_per_mm),
        absorption_mie_per_mm=f(atmo.absorption_mie_per_mm),
        density_scale_mie_mm=f(atmo.altitude_decay_mie_mm),
        scattering_ozone_per_mm=f(atmo.scattering_ozone_per_mm),
        absorption_ozone_per_mm=f(atmo.absorption_ozone_per_mm),
        sun_intensity_spectrum=f(atmo.sun_intensity_spectrum),
        sun_angular_radius=f(atmo.sun_angular_radius),
    )


def pack_atmosphere(raw: AtmosphereRaw) -> AtmospherePacked:
    """Device-side ``Atmosphere::toDeviceEquivalent`` (``scene.cpp:694-716``)."""
    sun_dir = -forward_from_eulers(raw.sun_euler_angles)
    sun_dir = sun_dir / jnp.linalg.norm(sun_dir)
    sun_dir = sun_dir * jnp.array([1.0, -1.0, 1.0], jnp.float32)
    return AtmospherePacked(
        scattering_rayleigh_per_mm=raw.scattering_rayleigh_per_mm,
        density_scale_rayleigh_mm=raw.density_scale_rayleigh_mm,
        absorption_rayleigh_per_mm=raw.absorption_rayleigh_per_mm,
        planet_radius_mm=raw.planet_radius_mm,
        scattering_mie_per_mm=raw.scattering_mie_per_mm,
        density_scale_mie_mm=raw.density_scale_mie_mm,
        absorption_mie_per_mm=raw.absorption_mie_per_mm,
        atmosphere_radius_mm=raw.atmosphere_radius_mm,
        incident_direction_sun=-sun_dir,
        scattering_ozone_per_mm=raw.scattering_ozone_per_mm,
        absorption_ozone_per_mm=raw.absorption_ozone_per_mm,
        sun_intensity_spectrum=raw.sun_intensity_spectrum,
        sun_angular_radius=raw.sun_angular_radius,
    )


def bake_directional(
    raw: AtmosphereRaw, bounds_min, bounds_max
) -> DirectionalLight:
    """Device-side sun + moon baking (``scene.cpp:584-623,718-737``).

    Returns a stacked (2, ...) DirectionalLight: row 0 = sun, row 1 = moon.
    """
    import jax

    bounds = AABB(
        center=(jnp.asarray(bounds_min) + jnp.asarray(bounds_max)) * 0.5,
        half_extent=(jnp.asarray(bounds_max) - jnp.asarray(bounds_min)) * 0.5,
    )
    direction_to_sun = -forward_from_eulers(raw.sun_euler_angles)
    sun_cosine = jnp.sum(WORLD_UP * direction_to_sun)

    sunlight = make_directional(
        color=jnp.array([1.0, 1.0, 1.0, 1.0], jnp.float32),
        strength=jnp.asarray(SUNLIGHT_STRENGTH, jnp.float32),
        euler_angles=raw.sun_euler_angles,
        captured_bounds=bounds,
    )
    moon_strength = 0.02 * jnp.minimum(
        1.0, jnp.abs(sun_cosine - SUNSET_COSINE) / MOONRISE_LENGTH
    )
    moonlight = make_directional(
        color=jnp.asarray(MOONLIGHT_COLOR_RGBA, jnp.float32),
        strength=moon_strength,
        euler_angles=jnp.array([-math.pi / 2.0, 0.0, 0.0], jnp.float32),
        captured_bounds=bounds,
    )
    return jax.tree.map(lambda a, b: jnp.stack([a, b]), sunlight, moonlight)


SUNLIGHT_STRENGTH = 4.0  # scene.cpp:590
SUNSET_COSINE = 0.06  # scene.cpp:723
MOONRISE_LENGTH = 0.12  # scene.cpp:603
MOONLIGHT_COLOR_RGBA = (0.3, 0.4, 0.6, 1.0)  # scene.cpp:612


def _create_sunlight(scene_bounds: AABB, sun_euler_angles) -> DirectionalLight:
    """``createSunlight`` (``scene.cpp:584-598``)."""
    return make_directional(
        color=jnp.array([1.0, 1.0, 1.0, 1.0], jnp.float32),
        strength=SUNLIGHT_STRENGTH,
        euler_angles=jnp.asarray(sun_euler_angles, jnp.float32),
        captured_bounds=scene_bounds,
    )


def _create_moonlight(
    scene_bounds: AABB, sun_cosine: float, sunset_cosine: float
) -> DirectionalLight:
    """``createMoonlight`` (``scene.cpp:599-623``).

    The reference calls ``glm::clamp(0, 1, |sunCos - sunsetCos|/len)`` with the
    value/min/max arguments transposed; the effective result is
    ``min(1, |sunCos - sunsetCos| / MOONRISE_LENGTH)``, reproduced here.
    """
    strength = 0.02 * min(1.0, abs(sun_cosine - sunset_cosine) / MOONRISE_LENGTH)
    straight_down = jnp.array([-math.pi / 2.0, 0.0, 0.0], jnp.float32)
    return make_directional(
        color=jnp.asarray(MOONLIGHT_COLOR_RGBA, jnp.float32),
        strength=strength,
        euler_angles=straight_down,
        captured_bounds=scene_bounds,
    )


@dataclasses.dataclass
class SunAnimation:
    """``SunAnimation`` (``renderer/scene.hpp``, defaults ``scene.cpp:87-91``)."""

    frozen: bool = False
    time: float = 0.5
    speed: float = 100.0
    skip_night: bool = False

    DAY_LENGTH_SECONDS = 60.0 * 60.0 * 24.0  # scene.cpp:91

    def tick(self, delta_time_seconds: float) -> None:
        """Advance time-of-day (``Scene::tick``, ``scene.cpp:532-563``)."""
        if not self.frozen:
            self.time = (
                self.time + self.speed * delta_time_seconds / self.DAY_LENGTH_SECONDS
            ) % 1.0
        if self.skip_night and not self.frozen:
            sunset_length = 0.015
            horizon_a = 0.25 - sunset_length
            horizon_b = 0.75 + sunset_length
            if self.time < horizon_a or self.time > horizon_b:
                self.time = horizon_a if self.speed > 0.0 else horizon_b

    def sun_pitch_radians(self) -> float:
        """Sun orbit angle: straight down at t=0, one wrap per day
        (``scene.cpp:565-574``)."""
        start = math.pi / 2.0
        end = start + 2.0 * math.pi
        return start + (end - start) * self.time
