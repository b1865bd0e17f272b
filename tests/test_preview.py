"""Preview render + picking."""

import numpy as np

from pathtracing_spectrum_tpu.preview import pick, preview_render

from scene_helpers import cornell_scene


def test_preview_render_shades_geometry():
    sc = cornell_scene(res=(32, 32))
    img = preview_render(sc, 32, 32)
    assert img.shape == (32, 32)
    assert img.dtype == np.uint8
    # camera looks into a closed box: everything is geometry
    assert (img > 0).mean() > 0.99
    # back wall faces the camera head-on -> bright center
    assert img[16, 16] > 200


def test_pick_center_and_blocks():
    sc = cornell_scene(res=(64, 64))
    data = sc.compile()
    names = [el.name for el in sc.objects[0].elements]

    oid, eid = pick(sc, 64, 64, 32, 32, scene_data=data)
    assert oid == 0
    # center ray passes between the blocks to the back wall... or hits a
    # block; either way it must be a valid element of object 0
    assert 0 <= eid < len(names)

    # top-center: ceiling or light
    oid, eid = pick(sc, 64, 64, 32, 2, scene_data=data)
    assert names[eid] in ("ceiling", "light", "back")

    # bottom-center: floor-ish
    oid, eid = pick(sc, 64, 64, 32, 61, scene_data=data)
    assert names[eid] in ("floor", "back", "short_block", "tall_block")


def test_pick_miss_outside_geometry(tmp_path):
    from pathtracing_spectrum_tpu import Scene

    sc = Scene()
    sc.wavelengths = [1000.0]
    assert pick(sc, 8, 8, 4, 4) == (-1, -1)


def test_preview_rgb_highlight_and_selection_tint():
    """Reference override order (main.cpp:3333-3338): element highlight
    beats object selection beats material baseColor."""
    sc = cornell_scene(res=(32, 32))
    data = sc.compile()

    base = preview_render(sc, 32, 32, scene_data=data, rgb=True)
    assert base.shape == (32, 32, 3)
    # default baseColor is white -> R==G==B everywhere
    assert (base[..., 0] == base[..., 1]).all()

    # selecting the object tints every visible element cyan-ish (B > R)
    sc.select_object(0, True)
    sel = preview_render(sc, 32, 32, scene_data=data, rgb=True)
    hit = sel.sum(axis=-1) > 0
    assert (sel[..., 2][hit] >= sel[..., 0][hit]).all()
    assert (sel[..., 2][hit] > sel[..., 0][hit]).any()

    # highlighting one element overrides selection (yellow: R > B) there
    oid, eid = pick(sc, 32, 32, 16, 16, scene_data=data)
    sc.set_highlight(oid, eid, True)
    hi = preview_render(sc, 32, 32, scene_data=data, rgb=True)
    assert hi[16, 16, 0] > hi[16, 16, 2]
