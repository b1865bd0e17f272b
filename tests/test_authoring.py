"""Spectrum-material library authoring + import semantics.

Covers the reference's left-bar actions and import flows:
* Add button defaults (main.cpp:2489-2497)
* DeleteSelectedMaterials reference fixup (main.cpp:183-215)
* LoadSpectrumWaves reset-to-zeros semantics (main.cpp:229-260)
* LoadSpectrumMaterials library replacement incl. the reference's quirky
  M-iteration reference-clearing loop (main.cpp:283-301): even old ids
  end at -1, odd old ids k end at (k-1)/2.
* CLI `import --apply` writing the result back into a .pts scene.
"""

import os
import subprocess
import sys

from pathtracing_spectrum_tpu import Scene, SpectrumMaterial


from scene_helpers import cornell_scene

ASSETS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets")


def _mini_scene(n_elements=6):
    sc = cornell_scene(res=(8, 8))
    assert len(sc.objects[0].elements) >= n_elements
    return sc


def test_add_defaults_and_rename():
    sc = Scene()
    sc.wavelengths = [500.0, 1000.0, 1500.0]
    i = sc.add_spectrum_material()
    assert sc.spectrum_materials[i].name == "Material 0"
    assert sc.spectrum_materials[i].emissivity == [0.0, 0.0, 0.0]
    j = sc.add_spectrum_material("hot", [0.5, 0.6, 0.7])
    assert sc.spectrum_materials[j].name == "hot"
    sc.rename_spectrum_material(j, "hotter")
    assert sc.spectrum_materials[j].name == "hotter"
    sc.set_spectrum_emissivity(j, [0.1])        # padded to wave count
    assert sc.spectrum_materials[j].emissivity == [0.1, 0.0, 0.0]
    assert sc.modified


def test_delete_fixes_references_like_reference():
    """Single-removal fixup (main.cpp:183-215): == i -> -1, > i -> shift."""
    sc = _mini_scene()
    sc.spectrum_materials = [SpectrumMaterial(f"m{k}", [0.0] * 4)
                             for k in range(4)]
    els = sc.objects[0].elements
    for k in range(4):
        els[k].material.spectrum_mat_id = k
    sc.sky_material_id = 3
    sc.delete_spectrum_materials([1])
    assert [els[k].material.spectrum_mat_id for k in range(4)] == \
        [0, -1, 1, 2]
    assert sc.sky_material_id == 2
    assert [m.name for m in sc.spectrum_materials] == ["m0", "m2", "m3"]


def test_waves_import_resets_material_curves():
    """LoadSpectrumWaves re-initialises every curve (main.cpp:229-260) —
    stale emissivity must NOT survive a wave re-import."""
    sc = Scene()
    sc.wavelengths = [500.0, 1000.0]
    sc.spectrum_materials = [SpectrumMaterial("a", [0.3, 0.4]),
                             SpectrumMaterial("b", [0.5, 0.6])]
    sc.import_waves([700.0, 900.0, 1100.0])
    assert sc.wavelengths == [700.0, 900.0, 1100.0]
    for m in sc.spectrum_materials:
        assert m.emissivity == [0.0, 0.0, 0.0]


def test_materials_import_reference_fixup_quirk():
    """The reference clears old references with M iterations of the
    single-removal fixup WITHOUT erasing as it goes (main.cpp:283-301), so
    even old ids -> -1 but odd old ids k -> (k-1)/2. Preserved faithfully."""
    sc = _mini_scene()
    sc.spectrum_materials = [SpectrumMaterial(f"m{k}", [0.0] * 4)
                             for k in range(5)]
    els = sc.objects[0].elements
    for k in range(5):
        els[k].material.spectrum_mat_id = k
    sc.sky_material_id = 2
    new = [SpectrumMaterial("n0", [0.1] * 4), SpectrumMaterial("n1", [0.2] * 4)]
    sc.import_spectrum_materials(new)
    assert [els[k].material.spectrum_mat_id for k in range(5)] == \
        [-1, 0, -1, 1, -1]
    assert sc.sky_material_id == -1
    assert [m.name for m in sc.spectrum_materials] == ["n0", "n1"]


def test_cli_import_apply_waves_and_materials(tmp_path):
    from pathtracing_spectrum_tpu.utils import scene_io

    sc = _mini_scene()
    sc.spectrum_materials = [SpectrumMaterial("old", [0.9, 0.9, 0.9, 0.9])]
    sc.objects[0].elements[0].material.spectrum_mat_id = 0
    scene_path = str(tmp_path / "scene.pts")
    scene_io.save_scene(sc, scene_path)

    waves_txt = tmp_path / "waves.txt"
    waves_txt.write_text("800 1200 1600\n")
    mats_txt = tmp_path / "mats.txt"
    mats_txt.write_text("steel\n0.2 0.3 0.4\npaint\n0.8 0.7 0.6\n")

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "pathtracing_spectrum_tpu", "import",
         "waves", str(waves_txt), "--apply", scene_path],
        capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr
    sc2 = scene_io.load_scene(scene_path)
    assert sc2.wavelengths == [800.0, 1200.0, 1600.0]
    assert sc2.spectrum_materials[0].emissivity == [0.0, 0.0, 0.0]

    r = subprocess.run(
        [sys.executable, "-m", "pathtracing_spectrum_tpu", "import",
         "materials", str(mats_txt), "--apply", scene_path],
        capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr
    sc3 = scene_io.load_scene(scene_path)
    assert [m.name for m in sc3.spectrum_materials] == ["steel", "paint"]
    assert sc3.spectrum_materials[0].emissivity == [0.2, 0.3, 0.4]
    # element 0 referenced old id 0 (even) -> cleared by the fixup loop
    assert sc3.objects[0].elements[0].material.spectrum_mat_id == -1
