"""Planck blackbody spectral emission and emissivity/reflectivity baking.

The spectral model of the reference (PathTracing/src/pathtracer.cpp:360-386):

* ``BBP(T, v)`` — Planck blackbody spectral radiance at *wavenumber* ``v``
  (entered in 1/cm in the GUI) and absolute temperature ``T`` (Kelvin), with
  the exact constants and scaling used by the reference::

      c = 299792458
      k = 1.38064852e-23      (written 138064852e-31)
      h = 2*pi*1.05457180e-34 (written 2*pi*105457180e-42)
      BBP = 2e8 * h*c^2*v^3 / (exp(100*h*c*v / (k*T)) - 1)

* Baked per-material curves (pathtracer.cpp:371-386) — note the reference's
  (quirky but load-bearing) choice that *reflectivity* is pre-multiplied by
  the Planck curve as well::

      emissivity(mat, T)   = BBP(T + 273.15, v) * eps_lambda
      reflectivity(mat, T) = BBP(T + 273.15, v) * (1 - eps_lambda)

  Temperatures in the scene/API are degrees Celsius; the +273.15 conversion
  happens here (GUI clamps at -273.15, main.cpp:2174).

Everything here is pure jnp over a trailing wavelength axis — the reference's
per-wavelength ``Wave`` loops become one vectorised VPU op.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Constants exactly as written in the reference source (pathtracer.cpp:362-364).
_C = 299792458.0
_K = 1.0 * 138064852e-31
_H = 2.0 * 3.14159265358979323846 * 105457180e-42

CELSIUS_OFFSET = 273.15


def planck_bbp(temperature_k, wavenumbers):
    """Planck spectral radiance (reference ``PathTracer::BBP``).

    Args:
      temperature_k: absolute temperature(s) in Kelvin; any shape ``S``.
      wavenumbers: wavenumber grid in 1/cm, shape ``[nw]``.

    Returns:
      Radiance of shape ``S + [nw]`` (``temperature_k`` is broadcast against a
      trailing wavelength axis).
    """
    t = jnp.asarray(temperature_k, jnp.float32)[..., None]
    v = jnp.asarray(wavenumbers, jnp.float32)
    num = 2e8 * (_H * _C * _C) * v * v * v
    # exp(x) - 1 exactly as the reference (pathtracer.cpp:368); x > 0 always
    # for T > 0. Guard T <= 0 (reference would produce inf/nan; we return 0).
    x = 100.0 * _H * _C * v / _K / jnp.where(t > 0.0, t, 1.0)
    val = num / (jnp.exp(x) - 1.0)
    return jnp.where(t > 0.0, val, 0.0)


def planck_bbp_elem(temperature_k, wavenumber):
    """Elementwise ``BBP``: temperature and wavenumber share a shape (hero-
    wavelength dispersion path — one wavenumber per ray). Identical formula
    and constants to :func:`planck_bbp`, so a ray whose hero wavenumber is
    ``wavenumbers[h]`` gets the bit-identical radiance of channel ``h``."""
    t = jnp.asarray(temperature_k, jnp.float32)
    v = jnp.asarray(wavenumber, jnp.float32)
    num = 2e8 * (_H * _C * _C) * v * v * v
    x = 100.0 * _H * _C * v / _K / jnp.where(t > 0.0, t, 1.0)
    val = num / (jnp.exp(x) - 1.0)
    return jnp.where(t > 0.0, val, 0.0)


def planck_bbp_np(temperature_k, wavenumbers) -> np.ndarray:
    """Host (numpy) twin of ``planck_bbp`` for scene baking — keeps
    scene compilation free of device round-trips."""
    t = np.float32(temperature_k) if np.ndim(temperature_k) == 0 else \
        np.asarray(temperature_k, np.float32)
    t = np.asarray(t, np.float32)[..., None]
    v = np.asarray(wavenumbers, np.float32)
    num = np.float32(2e8 * (_H * _C * _C)) * v * v * v
    x = np.float32(100.0 * _H * _C) * v / np.float32(_K) / np.where(t > 0, t, 1)
    with np.errstate(over="ignore"):  # exp overflow -> inf -> val 0, fine
        val = num / (np.exp(x) - 1.0)
    return np.where(t > 0.0, val, 0.0).astype(np.float32)


def bake_emissivity_np(eps_curve, temperature_c, wavenumbers) -> np.ndarray:
    bbp = planck_bbp_np(np.float32(temperature_c) + np.float32(CELSIUS_OFFSET),
                        wavenumbers)
    return (bbp * np.asarray(eps_curve, np.float32)).astype(np.float32)


def bake_reflectivity_np(eps_curve, temperature_c, wavenumbers) -> np.ndarray:
    bbp = planck_bbp_np(np.float32(temperature_c) + np.float32(CELSIUS_OFFSET),
                        wavenumbers)
    return (bbp * (1.0 - np.asarray(eps_curve, np.float32))).astype(np.float32)


def bake_emissivity(eps_curve, temperature_c, wavenumbers):
    """``GetEmissivity`` (pathtracer.cpp:380-386): BBP(T+273.15) * eps."""
    bbp = planck_bbp(jnp.asarray(temperature_c, jnp.float32) + CELSIUS_OFFSET,
                     wavenumbers)
    return bbp * jnp.asarray(eps_curve, jnp.float32)


def bake_reflectivity(eps_curve, temperature_c, wavenumbers):
    """``GetReflectivity`` (pathtracer.cpp:371-378): BBP(T+273.15) * (1-eps).

    The Planck pre-multiplication is intentional parity with the reference.
    """
    bbp = planck_bbp(jnp.asarray(temperature_c, jnp.float32) + CELSIUS_OFFSET,
                     wavenumbers)
    return bbp * (1.0 - jnp.asarray(eps_curve, jnp.float32))


def sky_spectrum(eps_curve, temperature_c, wavenumbers):
    """``SetSky`` (pathtracer.cpp:297-309): BBP(T+273.15) * eps_sky.

    Pass ``eps_curve=None`` for "no sky material" -> zeros.
    """
    if eps_curve is None:
        return jnp.zeros(jnp.asarray(wavenumbers).shape, jnp.float32)
    return bake_emissivity(eps_curve, temperature_c, wavenumbers)
