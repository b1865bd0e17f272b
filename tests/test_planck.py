"""Spectral core: Planck BBP against closed-form values and baking rules."""

import math

import numpy as np
import pytest

from pathtracing_spectrum_tpu.ops import planck


def bbp_closed_form(t_kelvin, wavenumber_cm):
    """Independent evaluation of the reference formula (pathtracer.cpp:360-369)."""
    c = 299792458.0
    k = 1.38064852e-23
    h = 2.0 * math.pi * 1.05457180e-34
    v = wavenumber_cm
    return 2e8 * h * c * c * v ** 3 / (math.exp(100.0 * h * c * v / k / t_kelvin) - 1.0)


@pytest.mark.parametrize("t", [250.0, 300.0, 500.0, 1000.0, 5772.0])
@pytest.mark.parametrize("v", [100.0, 500.0, 1000.0, 2500.0])
def test_bbp_matches_closed_form(t, v):
    got = np.asarray(planck.planck_bbp(t, np.array([v], np.float32)))[0]
    want = bbp_closed_form(t, v)
    assert got == pytest.approx(want, rel=1e-4)


def test_bbp_broadcasts_temperature():
    waves = np.array([500.0, 1000.0, 1500.0], np.float32)
    temps = np.array([[300.0, 400.0], [500.0, 600.0]], np.float32)
    out = np.asarray(planck.planck_bbp(temps, waves))
    assert out.shape == (2, 2, 3)
    assert out[1, 0, 2] == pytest.approx(bbp_closed_form(500.0, 1500.0), rel=1e-4)


def test_bbp_nonpositive_temperature_is_zero():
    waves = np.array([1000.0], np.float32)
    assert np.asarray(planck.planck_bbp(0.0, waves))[0] == 0.0
    assert np.asarray(planck.planck_bbp(-10.0, waves))[0] == 0.0


def test_bake_emissivity_and_reflectivity():
    """GetEmissivity/GetReflectivity: BBP(T+273.15) * eps and * (1-eps),
    including the reference's quirky Planck-premultiplied reflectivity
    (pathtracer.cpp:371-386)."""
    waves = np.array([800.0, 1200.0], np.float32)
    eps = np.array([0.3, 0.9], np.float32)
    t_c = 26.85  # 300 K
    emis = np.asarray(planck.bake_emissivity(eps, t_c, waves))
    refl = np.asarray(planck.bake_reflectivity(eps, t_c, waves))
    for i, v in enumerate(waves):
        b = bbp_closed_form(t_c + 273.15, float(v))
        assert emis[i] == pytest.approx(b * eps[i], rel=1e-4)
        assert refl[i] == pytest.approx(b * (1.0 - eps[i]), rel=1e-4)


def test_sky_spectrum():
    waves = np.array([1000.0], np.float32)
    assert np.asarray(planck.sky_spectrum(None, 20.0, waves))[0] == 0.0
    got = np.asarray(planck.sky_spectrum(np.array([0.5]), 20.0, waves))[0]
    want = 0.5 * bbp_closed_form(293.15, 1000.0)
    assert got == pytest.approx(want, rel=1e-4)


def test_wien_peak_sanity():
    """Physics sanity: spectral radiance per wavenumber peaks near
    v_max ~= 1.9608 * T  [1/cm per K]."""
    t = 300.0
    waves = np.arange(50.0, 3000.0, 10.0, dtype=np.float32)
    out = np.asarray(planck.planck_bbp(t, waves))
    peak = waves[np.argmax(out)]
    assert peak == pytest.approx(1.9608 * t, rel=0.02)
