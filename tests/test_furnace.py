"""Analytic integration test: uniform enclosure ("furnace") expectation.

With a closed uniform box (emissivity curve eps, temperature T, diffuse,
base_color max = p <= 0.95), sky = 0, trace_depth = D, the reference
recurrence has a closed-form expectation over the RR randomness. Every ray
always hits (closed box), so with eb = BBP(T+273.15)*eps and
rb = BBP(T+273.15)*(1-eps):

  hits 1..D-1 contribute deterministically, hits D..2D survive with prob p;
  a kill contributes eb and stops; the 2D-th surviving ray sees sky = 0.

  E[L_h] = eb + rb * E[L_{h+1}]            for hit h < D
  E[L_h] = eb + p * rb * E[L_{h+1}]        for D <= h <= 2D  (E[L_{2D+1}] = 0)

This validates accumulation, RR probability/timing and the baked spectra
end-to-end, without depending on a random-sequence match.
"""

import numpy as np
import jax

from pathtracing_spectrum_tpu import camera_rays
from pathtracing_spectrum_tpu.engine import render_sample

import oracle
from scene_helpers import furnace_scene, WAVES


def analytic_expectation(eps, temp_c, depth, p):
    b = oracle.bbp(temp_c + 273.15, np.asarray(WAVES))
    eb = b * eps
    rb = b * (1.0 - eps)
    e_next = np.zeros_like(eb)
    # hits from 2D down to 1
    for h in range(2 * depth, 0, -1):
        if h >= depth:
            e_next = eb + p * rb * e_next
        else:
            e_next = eb + rb * e_next
    return e_next


def test_furnace_converges_to_expectation():
    eps, temp, depth, p = 0.5, 100.0, 2, 0.6
    sc = furnace_scene(eps=eps, temp=temp, depth=depth, res=(8, 8),
                       base=(p, p, p))
    scene = sc.compile()
    w, h = sc.resolution
    ro, rd = camera_rays(sc.camera(), w, h)
    n = w * h

    import jax.numpy as jnp
    total = jnp.zeros((n, len(WAVES)), jnp.float32)
    samples = jnp.zeros((), jnp.int32)
    spp = 1500
    key = jax.random.key(42)
    for s in range(spp):
        total, samples, out, _ = render_sample(
            scene, ro, rd, total, samples, jax.random.fold_in(key, s),
            max_depth=depth, backend="dense")
    got = np.asarray(out).mean(axis=0)

    want = analytic_expectation(eps, temp, depth, p)
    # Monte-Carlo tolerance: RR noise over 1500 spp * 64 pixels
    np.testing.assert_allclose(got, want, rtol=0.03)


def test_empty_scene_returns_sky():
    from pathtracing_spectrum_tpu import Scene, SpectrumMaterial
    from pathtracing_spectrum_tpu.engine import trace_radiance
    import jax.numpy as jnp

    sc = Scene()
    sc.wavelengths = list(WAVES)
    sc.spectrum_materials = [SpectrumMaterial("sky", [1.0] * len(WAVES))]
    sc.sky_material_id = 0
    sc.sky_temperature = 0.0
    scene = sc.compile()
    ro, rd = camera_rays(sc.camera(), 4, 4)
    res = trace_radiance(scene, ro, rd, jax.random.key(0), 3, backend="dense")
    want = oracle.bbp(273.15, np.asarray(WAVES))
    np.testing.assert_allclose(np.asarray(res.radiance),
                               np.broadcast_to(want, (16, len(WAVES))),
                               rtol=1e-4)
