"""A hand-written .pts fixture in the reference writer's exact shape.

Guards the reader against format drift independently of our own writer
(mixed `>>`/getline structure, %g floats, trailing spaces, names with
spaces, empty texture lines — main.cpp:826-890 output shape).
"""

import numpy as np

from pathtracing_spectrum_tpu.models.materials import MaterialType
from pathtracing_spectrum_tpu.utils import scene_io

from scene_helpers import ASSETS

FIXTURE = """Path Tracer Scene File
Version=Spectrum 1.2.0
3
500 1000.5 2000
2
matte white paint
0.9 0.85 0.8
polished aluminium
0.05 0.1 0.12
1 -40.5
5
800 600
1
1.5 -2 10.25
0 90 45
1
{obj}
my box
0.5 -1 2
370 -90 0
2 2 2
8
floor
1 0.5 0.25
2
0.35
normal_map.png
0 21.5
temp_tex.png
ceiling
1 1 1
3
0
{empty}
1 500
{empty}
back
1 1 1
0
0
{empty}
-1 0
{empty}
left
1 1 1
0
0
{empty}
0 20
{empty}
right
1 1 1
0
0
{empty}
1 20
{empty}
light
1 1 1
0
0
{empty}
1 600
{empty}
tall_block
1 1 1
1
0
{empty}
0 30
{empty}
short_block
1 1 1
0
0
{empty}
0 10
{empty}
"""


def test_hand_written_fixture(tmp_path):
    obj = ASSETS + "/cornell_box.obj"
    p = tmp_path / "fixture.pts"
    p.write_text(FIXTURE.format(obj=obj, empty=""))

    sc = scene_io.load_scene(str(p))
    assert sc.wavelengths == [500.0, 1000.5, 2000.0]
    assert sc.spectrum_materials[0].name == "matte white paint"
    assert sc.spectrum_materials[1].emissivity == [0.05, 0.1, 0.12]
    assert sc.sky_material_id == 1
    assert sc.sky_temperature == -40.5
    assert sc.trace_depth == 5
    assert sc.resolution == (800, 600)
    assert sc.auto_res is True
    np.testing.assert_allclose(sc.camera_position, [1.5, -2.0, 10.25])
    np.testing.assert_allclose(sc.camera_rotation, [0.0, 90.0, 45.0])

    obj0 = sc.objects[0]
    assert obj0.name == "my box"
    np.testing.assert_allclose(obj0.location, [0.5, -1.0, 2.0])
    # 370 deg normalises to 10, -90 to 270 (previewer.cpp:651-667)
    np.testing.assert_allclose(obj0.rotation, [10.0, 270.0, 0.0], atol=1e-4)
    np.testing.assert_allclose(obj0.scale, [2.0, 2.0, 2.0])

    els = obj0.elements
    assert [e.name for e in els] == ["floor", "ceiling", "back", "left",
                                     "right", "light", "tall_block",
                                     "short_block"]
    m0 = els[0].material
    assert m0.type == MaterialType.GLOSSY
    assert m0.base_color == (1.0, 0.5, 0.25)
    assert m0.roughness == 0.35
    assert m0.normal_tex_file == "normal_map.png"
    assert m0.spectrum_mat_id == 0
    assert m0.temperature == 21.5
    assert m0.temperature_tex_file == "temp_tex.png"
    m1 = els[1].material
    assert m1.type == MaterialType.GLASS
    assert m1.spectrum_mat_id == 1 and m1.temperature == 500.0
    assert els[2].material.spectrum_mat_id == -1  # no spectrum material

    # scene compiles and has the right geometry
    data = sc.compile()
    assert data.n_triangles == 36
