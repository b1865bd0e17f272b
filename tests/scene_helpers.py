"""Shared scene builders for tests."""

import os

import numpy as np

from pathtracing_spectrum_tpu import Material, MaterialType, Scene, SpectrumMaterial

ASSETS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "assets")

WAVES = [500.0, 1000.0, 1500.0, 2000.0]


def cornell_scene(depth=3, res=(32, 32), sky=False,
                  block_types=(MaterialType.DIFFUSE, MaterialType.DIFFUSE)):
    """Cornell box viewed through its open face; camera fills the opening."""
    sc = Scene()
    sc.wavelengths = list(WAVES)
    sc.spectrum_materials = [
        SpectrumMaterial("white", [0.8, 0.7, 0.75, 0.8]),
        SpectrumMaterial("red", [0.9, 0.4, 0.3, 0.2]),
        SpectrumMaterial("green", [0.2, 0.6, 0.7, 0.9]),
        SpectrumMaterial("emitter", [1.0, 1.0, 1.0, 1.0]),
        SpectrumMaterial("metal", [0.1, 0.1, 0.15, 0.1]),
    ]
    sc.trace_depth = depth
    sc.resolution = res
    obj = sc.load_object(os.path.join(ASSETS, "cornell_box.obj"))

    def mat(spec_id, temp, mtype=MaterialType.DIFFUSE, rough=0.0,
            base=(1.0, 1.0, 1.0)):
        return Material(type=mtype, base_color=base, roughness=rough,
                        temperature=temp, spectrum_mat_id=spec_id)

    assign = {
        "floor": mat(0, 20.0),
        "ceiling": mat(0, 20.0),
        "back": mat(0, 20.0),
        "left": mat(1, 25.0),
        "right": mat(2, 15.0),
        "light": mat(3, 500.0),
        "tall_block": mat(4, 40.0, block_types[0], rough=0.3),
        "short_block": mat(0, 10.0, block_types[1], rough=0.1),
    }
    for i, el in enumerate(obj.elements):
        sc.set_material(0, i, assign[el.name])

    if sky:
        sc.sky_material_id = 0
        sc.sky_temperature = -20.0

    sc.set_camera([0.0, 0.0, -2.0], [0.0, 0.0, 0.0])
    sc.camera_fovy = 50.0
    sc.camera_focal = 0.1
    return sc


def furnace_scene(eps=0.5, temp=100.0, depth=2, res=(8, 8),
                  base=(0.6, 0.6, 0.6)):
    """Closed inward-facing box around the camera, uniform material."""
    import tempfile
    import assets_box  # generated below if missing

    sc = Scene()
    sc.wavelengths = list(WAVES)
    sc.spectrum_materials = [SpectrumMaterial("gray", [eps] * len(WAVES))]
    sc.trace_depth = depth
    sc.resolution = res
    path = assets_box.inward_box_obj()
    obj = sc.load_object(path)
    for i in range(len(obj.elements)):
        sc.set_material(0, i, Material(type=MaterialType.DIFFUSE,
                                       base_color=base, temperature=temp,
                                       spectrum_mat_id=0))
    sc.set_camera([0.0, 0.0, 0.0], [0.0, 0.0, 0.0])
    sc.camera_fovy = 90.0
    return sc
