"""Scene-file (.pts) writer/reader round-trip and helpers."""

import numpy as np
import pytest

from pathtracing_spectrum_tpu import MaterialType, Scene
from pathtracing_spectrum_tpu.utils import scene_io

from scene_helpers import cornell_scene


def test_round_trip(tmp_path):
    sc = cornell_scene()
    sc.objects[0].set_location([1.0, -2.5, 3.0])
    sc.objects[0].set_rotation([10.0, 380.0, -30.0])  # normalises to [0,360)
    sc.objects[0].is_scale_locked = False
    sc.objects[0].set_scale([2.0, 1.0, 0.5])
    sc.auto_res = True
    sc.sky_material_id = 1
    sc.sky_temperature = -15.5
    p = str(tmp_path / "scene.pts")
    scene_io.save_scene(sc, p)

    sc2 = scene_io.load_scene(p)
    assert sc2.wavelengths == sc.wavelengths
    assert len(sc2.spectrum_materials) == len(sc.spectrum_materials)
    for a, b in zip(sc2.spectrum_materials, sc.spectrum_materials):
        assert a.name == b.name
        np.testing.assert_allclose(a.emissivity, b.emissivity, rtol=1e-5)
    assert sc2.sky_material_id == 1
    assert sc2.sky_temperature == pytest.approx(-15.5)
    assert sc2.trace_depth == sc.trace_depth
    assert sc2.resolution == sc.resolution
    assert sc2.auto_res is True
    np.testing.assert_allclose(sc2.camera_position, sc.camera_position)
    np.testing.assert_allclose(sc2.camera_rotation, sc.camera_rotation,
                               atol=1e-4)
    assert len(sc2.objects) == 1
    o1, o2 = sc.objects[0], sc2.objects[0]
    assert o2.name == o1.name
    np.testing.assert_allclose(o2.location, o1.location, rtol=1e-5)
    np.testing.assert_allclose(o2.rotation, [10.0, 20.0, 330.0], atol=1e-4)
    np.testing.assert_allclose(o2.scale, o1.scale, rtol=1e-5)
    assert [e.name for e in o2.elements] == [e.name for e in o1.elements]
    for e1, e2 in zip(o1.elements, o2.elements):
        m1, m2 = e1.material, e2.material
        assert m2.type == m1.type
        assert m2.spectrum_mat_id == m1.spectrum_mat_id
        assert m2.temperature == pytest.approx(m1.temperature, rel=1e-5)
        assert m2.roughness == pytest.approx(m1.roughness, rel=1e-5)

    # a loaded scene renders identically to the original
    d1 = sc.compile()
    d2 = sc2.compile()
    np.testing.assert_allclose(np.asarray(d1.tri_v1), np.asarray(d2.tri_v1),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(d1.mat_emissivity),
                               np.asarray(d2.mat_emissivity), rtol=1e-5)


def test_resolution_peek(tmp_path):
    sc = cornell_scene(res=(777, 555))
    p = str(tmp_path / "scene.pts")
    scene_io.save_scene(sc, p)
    assert scene_io.get_resolution_from_scene_file(p) == (777, 555)
    assert scene_io.get_resolution_from_scene_file("/nonexistent.pts") is None


def test_header_and_version_gate(tmp_path):
    p = tmp_path / "bad.pts"
    p.write_text("Not a scene\n")
    with pytest.raises(scene_io.SceneFileError):
        scene_io.load_scene(str(p))
    p.write_text("Path Tracer Scene File\nVersion=Spectrum 0.9.0\n")
    with pytest.raises(scene_io.SceneFileError):
        scene_io.load_scene(str(p))


def test_scan_and_redirect(tmp_path):
    sc = cornell_scene()
    p = str(tmp_path / "scene.pts")
    # point the scene at a path that won't exist on load
    real = sc.objects[0].filename
    sc.objects[0].filename = "/missing/dir/cornell_box.obj"
    scene_io.save_scene(sc, p)

    refs = scene_io.scan_scene_objects(p)
    assert len(refs) == 1
    assert refs[0].exists is False
    assert refs[0].path == "/missing/dir/cornell_box.obj"

    with pytest.raises(OSError):
        scene_io.load_scene(p)
    sc2 = scene_io.load_scene(p, redirects={0: real})
    assert len(sc2.objects[0].elements) == 8


def test_material_names_with_spaces(tmp_path):
    sc = Scene()
    sc.wavelengths = [100.0, 200.0]
    from pathtracing_spectrum_tpu import SpectrumMaterial
    sc.spectrum_materials = [SpectrumMaterial("brushed steel 2", [0.1, 0.2])]
    p = str(tmp_path / "s.pts")
    scene_io.save_scene(sc, p)
    sc2 = scene_io.load_scene(p)
    assert sc2.spectrum_materials[0].name == "brushed steel 2"
