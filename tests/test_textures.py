"""Texture binding semantics and textured rendering end-to-end."""

import os

import jax
import numpy as np
import pytest

from pathtracing_spectrum_tpu import Material, MaterialType, camera_rays
from pathtracing_spectrum_tpu.engine import trace_radiance

from scene_helpers import ASSETS, cornell_scene

CHECKER = os.path.join(ASSETS, "checker.png")


def test_set_material_preserves_normal_texture():
    """Reference quirk: SetMaterial copies normalTexId across
    (pathtracer.cpp:208); other texture bindings travel with the material."""
    sc = cornell_scene()
    sc.set_normal_texture(0, 0, CHECKER)
    new_mat = Material(type=MaterialType.GLOSSY, roughness=0.5,
                       roughness_tex_file="whatever.png")
    sc.set_material(0, 0, new_mat)
    m = sc.objects[0].elements[0].material
    assert m.normal_tex_file == CHECKER       # preserved
    assert m.roughness_tex_file == "whatever.png"
    assert m.type == MaterialType.GLOSSY


def test_texture_setters_mark_scene_dirty():
    sc = cornell_scene()
    v0 = sc.version
    sc.set_roughness_texture(0, 1, CHECKER)
    sc.set_temperature_texture(0, 2, CHECKER)
    assert sc.version > v0


def test_roughness_texture_affects_render():
    """A glossy block with a checker roughness map must differ from the
    same scene with constant roughness."""
    def render(with_tex):
        sc = cornell_scene(depth=2, res=(16, 16),
                           block_types=(MaterialType.GLOSSY,
                                        MaterialType.GLOSSY))
        if with_tex:
            sc.set_roughness_texture(0, 6, CHECKER)
            sc.set_roughness_texture(0, 7, CHECKER)
        scene = sc.compile()
        ro, rd = camera_rays(sc.camera(), 16, 16)
        return np.asarray(trace_radiance(scene, ro, rd, jax.random.key(3), 2,
                                         backend="dense").radiance)

    a = render(False)
    b = render(True)
    assert np.isfinite(b).all()
    assert not np.allclose(a, b)


def test_normal_map_affects_render():
    """Needs real UVs (the Cornell box has none, so tangents are degenerate
    and the map is a guarded no-op there): use the UV sphere."""
    from pathtracing_spectrum_tpu import Scene, SpectrumMaterial

    def render(with_tex):
        sc = Scene()
        sc.wavelengths = [500.0, 1000.0, 1500.0, 2000.0]
        sc.spectrum_materials = [SpectrumMaterial("s", [0.7] * 4)]
        sc.trace_depth = 2
        obj = sc.load_object(os.path.join(ASSETS, "sphere.obj"))
        obj.set_location([0.0, 0.0, 3.0])
        sc.set_material(0, 0, Material(temperature=150.0, spectrum_mat_id=0))
        if with_tex:
            sc.set_normal_texture(0, 0, CHECKER)
        sc.set_camera([0, 0, 0], [0, 0, 0])
        scene = sc.compile()
        ro, rd = camera_rays(sc.camera(), 16, 16)
        return np.asarray(trace_radiance(scene, ro, rd, jax.random.key(5), 2,
                                         backend="dense").radiance)

    a = render(False)
    b = render(True)
    assert np.isfinite(b).all()
    assert not np.allclose(a, b)


def test_temperature_grid_rebake(tmp_path):
    """A temperature grid overrides the baked spectra per hit
    (pathtracer.cpp:520-528): a lone wall, hot on one half of its UV range,
    must radiate asymmetrically."""
    from pathtracing_spectrum_tpu import Scene, SpectrumMaterial

    grid = tmp_path / "temps.txt"
    grid.write_text("\n".join(" ".join(["500"] * 4 + ["-100"] * 4)
                              for _ in range(4)) + "\n")
    wall = tmp_path / "wall.obj"
    wall.write_text("""
g wall
v -4 -4 4
v 4 -4 4
v 4 4 4
v -4 4 4
vt 0 0
vt 1 0
vt 1 1
vt 0 1
f 1/1 2/2 3/3
f 1/1 3/3 4/4
""")
    sc = Scene()
    sc.wavelengths = [500.0, 1000.0, 1500.0, 2000.0]
    sc.spectrum_materials = [SpectrumMaterial("w", [0.9] * 4)]
    sc.trace_depth = 1
    sc.load_object(str(wall))
    sc.set_material(0, 0, Material(temperature=20.0, spectrum_mat_id=0))
    sc.set_temperature_data(0, 0, str(grid))
    sc.set_camera([0, 0, 0], [0, 0, 0])
    scene = sc.compile()
    ro, rd = camera_rays(sc.camera(), 16, 16)
    img = np.asarray(trace_radiance(scene, ro, rd, jax.random.key(1), 1,
                                    backend="dense").radiance)
    img = img.reshape(16, 16, 4)
    left = img[:, :6].mean()
    right = img[:, 10:].mean()
    assert max(left, right) > 10.0 * min(left, right)
