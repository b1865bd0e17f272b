"""Persistent-wavefront mode (engine_wavefront.py).

The estimator must match the standard engine statistically (identical
physics, different RNG schedule), and the bookkeeping must be airtight:
counts advance for every slot, the depth-cap/sky fall-through matches the
reference semantics, and checkpoints round-trip completed samples.
"""

import numpy as np
import pytest

from pathtracing_spectrum_tpu.render import RenderSession

from scene_helpers import cornell_scene, furnace_scene


@pytest.mark.slow
def test_persistent_matches_standard_statistically():
    sc = cornell_scene(depth=2, res=(16, 16))
    std = RenderSession(sc, backend="dense", seed=0)
    std.run(target_spp=600, batch=100)
    a = std.result()

    per = RenderSession(cornell_scene(depth=2, res=(16, 16)),
                        backend="dense", seed=1, persistent=True)
    per.run(target_spp=600, batch=100)
    b = per.result()

    assert np.isfinite(b).all() and (b >= 0).all()
    # same estimator, independent RNG: compare means to Monte-Carlo noise
    np.testing.assert_allclose(b.mean(), a.mean(), rtol=0.02)
    np.testing.assert_allclose(b.mean(axis=(0, 1)), a.mean(axis=(0, 1)),
                               rtol=0.05)
    # and per-pixel agreement at coarse tolerance (600 spp)
    scale = max(float(a.mean()), 1e-20)
    assert np.quantile(np.abs(a - b) / scale, 0.95) < 0.35


def test_furnace_exact_in_persistent_mode():
    """In a closed furnace with uniform emissivity, every path's radiance
    is an analytic geometric series; the persistent estimator must land on
    the same value the standard engine does."""
    sc = furnace_scene(eps=0.5, temp=100.0, depth=3, res=(8, 8))
    std = RenderSession(sc, backend="dense", seed=0)
    std.run(target_spp=400, batch=100)
    per = RenderSession(furnace_scene(eps=0.5, temp=100.0, depth=3,
                                      res=(8, 8)),
                        backend="dense", seed=3, persistent=True)
    per.run(target_spp=400, batch=100)
    np.testing.assert_allclose(per.result().mean(axis=(0, 1)),
                               std.result().mean(axis=(0, 1)), rtol=0.03)


def test_counts_advance_and_are_near_uniform():
    sc = cornell_scene(depth=2, res=(16, 16))
    s = RenderSession(sc, backend="dense", persistent=True)
    s.run(target_spp=20, batch=10)
    counts = np.asarray(s._wf.count)
    assert counts.min() >= 20
    # slots advance at comparable rates (path lengths are bounded by 2*depth)
    assert counts.max() <= counts.min() * 3 + 10
    assert s.samples == counts.min()


@pytest.mark.slow
def test_persistent_checkpoint_roundtrip(tmp_path):
    p = str(tmp_path / "wf.npz")
    sc = cornell_scene(depth=2, res=(8, 8))
    a = RenderSession(sc, backend="dense", seed=0, persistent=True)
    a.run(target_spp=5)
    img_a = a.result()
    a.save_checkpoint(p)

    b = RenderSession(cornell_scene(depth=2, res=(8, 8)), backend="dense",
                      seed=0, persistent=True)
    b.start()
    b.load_checkpoint(p)
    np.testing.assert_allclose(b.result(), img_a, rtol=1e-6)
    b.resume()
    b.run(target_spp=10)
    assert b.samples >= 10

    # mode mismatch refuses
    c = RenderSession(cornell_scene(depth=2, res=(8, 8)), backend="dense")
    c.start()
    with pytest.raises(ValueError):
        c.load_checkpoint(p)


def test_persistent_rejects_unsupported_modes():
    sc = cornell_scene(depth=1, res=(8, 8))
    with pytest.raises(ValueError):
        RenderSession(sc, persistent=True, jitter=True)
    with pytest.raises(ValueError):
        RenderSession(sc, persistent=True, dispersion=True)


@pytest.mark.slow
def test_wavefront_textures_and_grids_match_standard(tmp_path):
    """Exercise the wavefront's has_rtex/has_grids branches: a glossy wall
    with a roughness texture + a hot/cold temperature grid must render the
    same (statistically) in both engines."""
    import os

    from pathtracing_spectrum_tpu import Material, MaterialType, Scene, \
        SpectrumMaterial

    ASSETS = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "assets")
    grid = tmp_path / "grid.txt"
    grid.write_text("2 1\n500.0 -100.0\n")

    def build():
        sc = Scene()
        sc.wavelengths = [500.0, 1000.0, 1500.0, 2000.0]
        sc.spectrum_materials = [SpectrumMaterial("w", [0.8, 0.7, 0.75, 0.8]),
                                 SpectrumMaterial("e", [1.0] * 4)]
        sc.trace_depth = 2
        obj = sc.load_object(os.path.join(ASSETS, "cornell_box.obj"))
        for i, el in enumerate(obj.elements):
            t = 500.0 if el.name == "light" else 20.0
            sid = 1 if el.name == "light" else 0
            sc.set_material(0, i, Material(type=MaterialType.DIFFUSE,
                                           temperature=t,
                                           spectrum_mat_id=sid))
        sc.set_material(0, 2, Material(
            type=MaterialType.GLOSSY, temperature=30.0, spectrum_mat_id=0,
            roughness=0.4,
            roughness_tex_file=os.path.join(ASSETS, "checker.png")))
        sc.set_temperature_data(0, 0, str(grid))
        sc.set_camera([0.0, 0.0, -2.0], [0.0, 0.0, 0.0])
        sc.camera_fovy = 50.0
        sc.resolution = (16, 16)
        return sc

    std = RenderSession(build(), backend="dense", seed=0)
    std.run(target_spp=400, batch=100)
    per = RenderSession(build(), backend="dense", seed=7, persistent=True)
    per.run(target_spp=400, batch=100)
    a, b = std.result(), per.result()
    assert np.isfinite(b).all()
    np.testing.assert_allclose(b.mean(), a.mean(), rtol=0.03)
    np.testing.assert_allclose(b.mean(axis=(0, 1)), a.mean(axis=(0, 1)),
                               rtol=0.08)
