"""Hero-wavelength dispersion mode.

Checks: (1) the hero estimator is unbiased — dispersion mode converges to the
standard render on a glass-free scene; (2) per-wavelength IOR actually steers
refraction — a glass interface separates wavelengths spatially; (3) the
Cauchy curve baking.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracing_spectrum_tpu import Material, MaterialType, Scene, \
    SpectrumMaterial, camera_rays
from pathtracing_spectrum_tpu.engine import trace_radiance
from pathtracing_spectrum_tpu.ops.shade_pack import layout as shade_layout

from scene_helpers import cornell_scene, WAVES


def test_cauchy_curve_baked():
    sc = cornell_scene()
    mat = sc.objects[0].elements[0].material
    mat.ior = 1.4
    mat.dispersion_b = 0.02
    scene = sc.compile(build_bvh=False)  # keep triangle order = element order
    lay = shade_layout(len(WAVES))
    shade = np.asarray(scene.tri_shade)
    got = shade[0, lay["ior_curve"]]
    lam_um = 1e4 / np.asarray(WAVES)
    want = 1.4 + 0.02 / lam_um ** 2
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.slow
def test_dispersion_unbiased_on_glass_free_scene():
    sc = cornell_scene(depth=2, res=(8, 8))
    scene = sc.compile()
    ro, rd = camera_rays(sc.camera(), 8, 8)
    key = jax.random.key(1)

    from pathtracing_spectrum_tpu.engine import render_samples
    spp = 4000

    def run(dispersion):
        total = jnp.zeros((64, 4), jnp.float32)
        samples = jnp.zeros((), jnp.int32)
        _, _, out, _ = render_samples(scene, ro, rd, total, samples, key, 0,
                                      n_steps=spp, max_depth=2,
                                      backend="dense", dispersion=dispersion)
        return np.asarray(out)

    std = run(False)
    dis = run(True)
    # The hero mask adds variance ~3*E[X^2] per draw and thermal radiance is
    # heavy-tailed (500C light vs 20C walls), so tolerances reflect the SE at
    # 4000 spp x 64 pixels rather than a tight rtol.
    np.testing.assert_allclose(dis.mean(), std.mean(), rtol=0.02)
    np.testing.assert_allclose(dis.mean(axis=0), std.mean(axis=0), rtol=0.08)


def test_hero_mode_nw1_bit_identical_to_dense():
    """dispersion="hero" (the estimator without the physics change) at
    nw == 1 degenerates to the dense spectral path exactly: the hero
    channel is always 0 and throughput nw == 1, so every f32 op matches
    bit for bit."""
    sc = cornell_scene(depth=2, res=(8, 8))
    sc.wavelengths = [1000.0]
    for el in sc.objects[0].elements:
        el.material.spectrum_mat_id = min(
            el.material.spectrum_mat_id, len(sc.spectrum_materials) - 1)
    sc.spectrum_materials = [SpectrumMaterial(m.name, m.emissivity[:1])
                             for m in sc.spectrum_materials]
    scene = sc.compile()
    ro, rd = camera_rays(sc.camera(), 8, 8)
    key = jax.random.key(4)
    a = trace_radiance(scene, ro, rd, key, 2, backend="dense",
                       dispersion=False)
    b = trace_radiance(scene, ro, rd, key, 2, backend="dense",
                       dispersion="hero")
    np.testing.assert_array_equal(np.asarray(a.radiance),
                                  np.asarray(b.radiance))


def test_hero_flat_gather_bit_identical(monkeypatch):
    """The two hero spectral-read routes (flat [T*nw, 2] row gather vs
    fetched [nw, N] rows + one-hot select, crossover at
    HERO_FLAT_GATHER_MIN_NW) read the exact same table entries — the
    rendered radiance must be bit-identical."""
    import pathtracing_spectrum_tpu.engine as E

    nw = 12
    sc = cornell_scene(depth=2, res=(8, 8))
    waves = [500.0 + 100.0 * k for k in range(nw)]
    sc.wavelengths = waves
    sc.spectrum_materials = [
        SpectrumMaterial(m.name, list(np.linspace(0.6, 0.9, nw))
                         if m.name != "emitter" else [1.0] * nw)
        for m in sc.spectrum_materials]
    scene = sc.compile()
    ro, rd = camera_rays(sc.camera(), 8, 8)
    key = jax.random.key(6)

    monkeypatch.setattr(E, "HERO_FLAT_GATHER_MIN_NW", 1)  # force flat
    a = E.trace_radiance(scene, ro, rd, key, 2, backend="dense",
                         dispersion="hero")
    monkeypatch.setattr(E, "HERO_FLAT_GATHER_MIN_NW", 10**9)  # force select
    b = E.trace_radiance(scene, ro, rd, key, 2, backend="dense",
                         dispersion="hero")
    np.testing.assert_array_equal(np.asarray(a.radiance),
                                  np.asarray(b.radiance))


@pytest.mark.slow
def test_hero_mode_unbiased_with_glass():
    """Unlike dispersion=True (which swaps in Cauchy glass), the "hero"
    estimator must converge to the dense reference render even on a
    GLASS-carrying scene — same physics, different estimator."""
    sc = cornell_scene(depth=2, res=(8, 8))
    els = sc.objects[0].elements
    for el in els:
        if el.name == "tall_block":
            el.material.type = MaterialType.GLASS
    scene = sc.compile()
    ro, rd = camera_rays(sc.camera(), 8, 8)
    key = jax.random.key(2)

    from pathtracing_spectrum_tpu.engine import render_samples
    spp = 4000

    def run(dispersion):
        total = jnp.zeros((64, 4), jnp.float32)
        samples = jnp.zeros((), jnp.int32)
        _, _, out, _ = render_samples(scene, ro, rd, total, samples, key, 0,
                                      n_steps=spp, max_depth=2,
                                      backend="dense", dispersion=dispersion)
        return np.asarray(out)

    std = run(False)
    hero = run("hero")
    np.testing.assert_allclose(hero.mean(), std.mean(), rtol=0.02)
    np.testing.assert_allclose(hero.mean(axis=0), std.mean(axis=0),
                               rtol=0.08)


def glass_pane_scene(tmp_path, ior, dispersion_b):
    """Camera looks through a tilted glass pane at a striped hot/cold wall.

    Note the quirky spectral model (reference pathtracer.cpp:371-378):
    transmission through glass multiplies throughput by BBP(T)*(1-eps), so
    the pane needs a hot temperature for light to pass at all — intentional
    parity with the reference.
    """
    path = str(tmp_path / "pane.obj")
    n_stripes = 10
    with open(path, "w") as f:
        # a big tilted quad between camera and a striped back wall
        f.write("g pane\n")
        f.write("v -8 -8 3\nv 8 -8 3\nv 8 8 4\nv -8 8 4\n")
        f.write("f 1 2 3\nf 1 3 4\n")
        vb = 5
        for k in range(n_stripes):
            x0 = -5.0 + 10.0 * k / n_stripes
            x1 = -5.0 + 10.0 * (k + 1) / n_stripes
            f.write(f"g stripe{k}\n")
            f.write(f"v {x0} -5 8\nv {x1} -5 8\nv {x1} 5 8\nv {x0} 5 8\n")
            f.write(f"f {vb} {vb+1} {vb+2}\nf {vb} {vb+2} {vb+3}\n")
            vb += 4
    sc = Scene()
    sc.wavelengths = list(WAVES)
    sc.spectrum_materials = [SpectrumMaterial("glass", [0.0] * 4),
                             SpectrumMaterial("emit", [1.0] * 4)]
    sc.trace_depth = 4
    obj = sc.load_object(path)
    glass = Material(type=MaterialType.GLASS, spectrum_mat_id=0,
                     temperature=600.0, ior=ior, dispersion_b=dispersion_b,
                     base_color=(1.0, 1.0, 1.0))
    sc.set_material(0, 0, glass)
    for k in range(n_stripes):
        temp = 500.0 if k % 2 == 0 else -100.0
        sc.set_material(0, 1 + k, Material(type=MaterialType.DIFFUSE,
                                           spectrum_mat_id=1,
                                           temperature=temp))
    sc.set_camera([0, 0, 0], [0, 0, 0])
    sc.camera_fovy = 60.0
    return sc


def test_glass_eta_override_snell():
    """sample_bounce_soa with per-ray eta must obey Snell's law."""
    from pathtracing_spectrum_tpu.ops.sampling import sample_bounce_soa

    n = jnp.array([0.0]), jnp.array([0.0]), jnp.array([-1.0])  # facing -z
    # incoming 45 degrees in the x-z plane, going +z
    s = np.sin(np.radians(45.0))
    c = np.cos(np.radians(45.0))
    rd = jnp.array([s]), jnp.array([0.0]), jnp.array([c])
    for ior in (1.3, 1.5, 1.8):
        b = sample_bounce_soa(
            jnp.array([3], jnp.int32), *rd, *n,
            jnp.array([0.0]), jnp.zeros(1, bool),
            jnp.array([0.5]), jnp.array([0.5]), jnp.array([0.99]),  # refract
            eta_inside=jnp.array([ior], jnp.float32),
            eta_outside=jnp.array([1.0 / ior], jnp.float32))
        assert bool(b.refracted[0])
        sin_out = float(jnp.sqrt(b.dx[0] ** 2 + b.dy[0] ** 2))
        assert sin_out == pytest.approx(s / ior, rel=1e-5), ior


def test_dispersion_separates_wavelengths(tmp_path):
    """With a strongly dispersive tilted pane the stripe pattern shifts
    between wavelength channels: cross-channel correlation drops relative to
    the non-dispersive pane rendered with identical sampling noise."""
    key = jax.random.key(7)

    def render(b_coef, spp=512, dispersion=True):
        from pathtracing_spectrum_tpu.engine import render_samples
        sc = glass_pane_scene(tmp_path, ior=1.5, dispersion_b=b_coef)
        scene = sc.compile()
        ro, rd = camera_rays(sc.camera(), 16, 16)
        total = jnp.zeros((256, 4), jnp.float32)
        samples = jnp.zeros((), jnp.int32)
        _, _, out, _ = render_samples(scene, ro, rd, total, samples, key, 0,
                                      n_steps=spp, max_depth=4,
                                      backend="dense", dispersion=dispersion)
        return np.asarray(out)

    def corr03(img):
        a = img[:, 0] / max(img[:, 0].mean(), 1e-20)
        b = img[:, 3] / max(img[:, 3].mean(), 1e-20)
        return float(np.corrcoef(a, b)[0, 1])

    c_flat = corr03(render(0.0))
    c_disp = corr03(render(5.0))  # exaggerated Cauchy B for a clear split
    assert c_flat > 0.9            # same geometry -> stripes line up
    assert c_disp < c_flat - 0.15  # dispersion shifts the stripes
    # the "hero" estimator ignores ior/dispersion_b (reference 1.5 glass):
    # stripes stay aligned across channels despite the huge Cauchy B
    c_hero = corr03(render(5.0, dispersion="hero"))
    assert c_hero > 0.9


def test_dispersion_flag_through_session(tmp_path):
    from pathtracing_spectrum_tpu.render import RenderSession

    sc = glass_pane_scene(tmp_path, ior=1.5, dispersion_b=1.0)
    sc.resolution = (8, 8)
    sess = RenderSession(sc, backend="dense", dispersion=True, seed=0)
    img = sess.step(4)
    assert np.isfinite(img).all()
    assert img.mean() > 0
