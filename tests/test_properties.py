"""Property tests (SURVEY §4): sampling geometry, determinism, tile order."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracing_spectrum_tpu.models.camera import tile_order
from pathtracing_spectrum_tpu.ops.sampling import sample_bounce_soa

from scene_helpers import cornell_scene


def unit(v):
    return v / np.linalg.norm(v)


def _sample(mat, rd, n, rough=0.0, inside=False, u=0.3, th=0.7, fr=0.9,
            **kw):
    b = sample_bounce_soa(
        jnp.array([mat], jnp.int32),
        *(jnp.array([c], jnp.float32) for c in rd),
        *(jnp.array([c], jnp.float32) for c in n),
        jnp.array([rough], jnp.float32), jnp.array([inside]),
        jnp.array([u], jnp.float32), jnp.array([th], jnp.float32),
        jnp.array([fr], jnp.float32), **kw)
    return (np.array([float(b.dx[0]), float(b.dy[0]), float(b.dz[0])]),
            bool(b.refracted[0]), bool(b.new_inside[0]))


def test_specular_mirror():
    rd = unit(np.array([1.0, -1.0, 0.0]))
    n = np.array([0.0, 1.0, 0.0])
    d, _, _ = _sample(1, rd, n)
    np.testing.assert_allclose(d, unit(np.array([1.0, 1.0, 0.0])), atol=1e-6)


def test_diffuse_stays_in_hemisphere():
    rng = np.random.default_rng(0)
    for _ in range(50):
        n = unit(rng.normal(size=3))
        rd = unit(rng.normal(size=3))
        if np.dot(rd, n) > 0:
            n = -n
        d, _, _ = _sample(0, rd, n, u=rng.uniform(), th=rng.uniform())
        assert np.dot(d, n) >= -1e-6  # w in [0,1) keeps it above the surface
        assert abs(np.linalg.norm(d) - 1.0) < 1e-5


def test_glass_reciprocity():
    """Refract in then (from inside) refract out must restore the direction
    (nc/ng swap, pathtracer.cpp:493-513)."""
    rd = unit(np.array([0.6, 0.0, 0.8]))
    n_front = np.array([0.0, 0.0, -1.0])  # front-facing vs rd

    d1, refr1, inside1 = _sample(3, rd, n_front, fr=0.99)  # force refraction
    assert refr1 and inside1
    # exiting: the surface normal flips front-facing again (dot(n, d1) <= 0)
    d2, refr2, inside2 = _sample(3, d1, n_front, inside=True, fr=0.99)
    assert refr2 and not inside2
    np.testing.assert_allclose(d2, rd, atol=1e-5)


def test_glass_total_internal_reflection():
    # grazing exit from the dense medium: k < 0 -> mirror reflect
    rd = unit(np.array([0.95, 0.0, 0.312]))
    n = np.array([0.0, 0.0, -1.0])
    d, refr, inside = _sample(3, rd, n, inside=True, fr=0.99)
    assert not refr and inside
    np.testing.assert_allclose(d, unit(np.array([0.95, 0.0, -0.312])),
                               atol=1e-4)


def test_deterministic_image_hash():
    """Same seed -> bit-identical image across runs (counter-based RNG)."""
    import hashlib
    from pathtracing_spectrum_tpu.render import RenderSession

    def render():
        s = RenderSession(cornell_scene(depth=2, res=(16, 16)),
                          backend="dense", seed=123)
        return hashlib.sha256(np.ascontiguousarray(
            s.run(target_spp=4)).tobytes()).hexdigest()

    assert render() == render()


def test_tile_order_is_permutation_and_compact():
    perm, inv = tile_order(64, 48, tile=32)
    n = 64 * 48
    assert sorted(perm.tolist()) == list(range(n))
    np.testing.assert_array_equal(perm[inv], np.arange(n))
    np.testing.assert_array_equal(inv[perm], np.arange(n))
    # first 1024 entries = exactly the first 32x32 tile
    ys, xs = perm[:1024] // 64, perm[:1024] % 64
    assert ys.max() < 32 and xs.max() < 32


def test_energy_conservation_bound():
    """Reflectivity/emissivity baking: rho + eps = BBP (per wavelength), so a
    surface never adds more than blackbody radiance at its temperature."""
    from pathtracing_spectrum_tpu.ops import planck
    waves = np.array([500.0, 1500.0], np.float32)
    eps = np.array([0.3, 0.8], np.float32)
    e = planck.bake_emissivity_np(eps, 100.0, waves)
    r = planck.bake_reflectivity_np(eps, 100.0, waves)
    b = planck.planck_bbp_np(373.15, waves)
    np.testing.assert_allclose(e + r, b, rtol=1e-6)


# --- GLOSSY tangent-frame quirk (pathtracer.cpp:484) -----------------------
# The reference's branch condition tests n.x (the shading normal) while the
# frame is built around the mirror direction r:
#   u = |n.x| < 1-FLT_EPS ? cross((1,0,0), r) : cross((1,1,1), r)
# An axis-aligned wall (n = +-x) must therefore take the (1,1,1)-cross branch
# even though |r.x| stays well below 1.

FLT_EPS = 1.1920929e-07


def _cpp_glossy(rd, n, rough, u_rand, th, branch=None):
    """Scalar transliteration of pathtracer.cpp:481-490 (float64)."""
    r = rd - 2.0 * np.dot(rd, n) * n
    take_ones = abs(n[0]) >= 1.0 - FLT_EPS if branch is None else branch
    u = np.cross([1.0, 1.0, 1.0], r) if take_ones else np.cross([1.0, 0.0, 0.0], r)
    u = u / np.linalg.norm(u)
    v = np.cross(u, r)  # not re-normalised (reference parity)
    w = u_rand * rough
    return (w * np.cos(2 * np.pi * th) * u + w * np.sin(2 * np.pi * th) * v
            + np.sqrt(1.0 - w * w) * r)


def _sample_vec(mat, rd, n, rough=0.0, inside=False, u=0.3, th=0.7, fr=0.9):
    from pathtracing_spectrum_tpu.ops.sampling import sample_bounce
    b = sample_bounce(
        jnp.array([mat], jnp.int32), jnp.asarray([rd], jnp.float32),
        jnp.asarray([n], jnp.float32), jnp.array([rough], jnp.float32),
        jnp.array([inside]), jnp.array([u], jnp.float32),
        jnp.array([th], jnp.float32), jnp.array([fr], jnp.float32))
    return np.asarray(b.direction[0])


@pytest.mark.parametrize("nx", [1.0, -1.0])
def test_glossy_axis_aligned_wall_takes_ones_cross(nx):
    n = np.array([nx, 0.0, 0.0])
    rd = unit(np.array([-nx * 0.6, 0.5, 0.62]))
    assert np.dot(rd, n) < 0
    want = _cpp_glossy(rd, n, 0.4, 0.37, 0.21)
    wrong = _cpp_glossy(rd, n, 0.4, 0.37, 0.21, branch=False)
    assert not np.allclose(want, wrong, atol=1e-3)  # branches distinguishable
    d_soa, _, _ = _sample(2, rd, n, rough=0.4, u=0.37, th=0.21)
    np.testing.assert_allclose(d_soa, want, atol=1e-5)
    d_vec = _sample_vec(2, rd, n, rough=0.4, u=0.37, th=0.21)
    np.testing.assert_allclose(d_vec, want, atol=1e-5)


def test_glossy_generic_normal_takes_x_cross():
    n = unit(np.array([0.2, 0.9, -0.3]))
    rd = unit(np.array([0.1, -0.8, 0.2]))
    assert np.dot(rd, n) < 0
    want = _cpp_glossy(rd, n, 0.25, 0.6, 0.85)
    d_soa, _, _ = _sample(2, rd, n, rough=0.25, u=0.6, th=0.85)
    np.testing.assert_allclose(d_soa, want, atol=1e-5)
    d_vec = _sample_vec(2, rd, n, rough=0.25, u=0.6, th=0.85)
    np.testing.assert_allclose(d_vec, want, atol=1e-5)
