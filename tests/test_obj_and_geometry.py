"""OBJ loader conventions and triangle SoA baking."""

import os

import numpy as np
import pytest

from pathtracing_spectrum_tpu.models.geometry import build_triangle_soa
from pathtracing_spectrum_tpu.models import transforms
from pathtracing_spectrum_tpu.utils import obj_loader


def write(tmp_path, text):
    p = tmp_path / "m.obj"
    p.write_text(text)
    return str(p)


def test_shapes_split_on_groups_and_fan_triangulation(tmp_path):
    path = write(tmp_path, """
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
g quad
f 1 2 3 4
g tri
f 1 2 3
""")
    mesh = obj_loader.load_obj(path)
    assert [s.name for s in mesh.shapes] == ["quad", "tri"]
    assert mesh.shapes[0].v_idx.shape == (2, 3)  # quad -> 2 fan triangles
    assert mesh.shapes[1].v_idx.shape == (1, 3)
    np.testing.assert_array_equal(mesh.shapes[0].v_idx[1], [0, 2, 3])


def test_negative_indices_and_vt_vn(tmp_path):
    path = write(tmp_path, """
v 0 0 0
v 1 0 0
v 0 1 0
vt 0 0
vt 1 0
vt 0 1
vn 0 0 1
f -3/-3/-1 -2/-2/-1 -1/-1/-1
""")
    mesh = obj_loader.load_obj(path)
    s = mesh.shapes[0]
    np.testing.assert_array_equal(s.v_idx[0], [0, 1, 2])
    np.testing.assert_array_equal(s.vt_idx[0], [0, 1, 2])
    np.testing.assert_array_equal(s.vn_idx[0], [0, 0, 0])


def test_smoothing_groups(tmp_path):
    path = write(tmp_path, """
v 0 0 0
v 1 0 0
v 0 1 0
s 1
f 1 2 3
s off
f 1 2 3
s 2
f 1 2 3
""")
    mesh = obj_loader.load_obj(path)
    np.testing.assert_array_equal(mesh.shapes[0].smoothing, [1, 0, 2])


def test_generate_smooth_normals(tmp_path):
    # two coplanar triangles sharing an edge in smoothing group 1
    path = write(tmp_path, """
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
s 1
f 1 2 3
f 1 3 4
""")
    mesh = obj_loader.load_obj(path)
    obj_loader.generate_smooth_normals(mesh)
    s = mesh.shapes[0]
    assert (s.vn_idx >= 0).all()
    n = mesh.normals[s.vn_idx]
    np.testing.assert_allclose(n[..., 2], 1.0, atol=1e-6)


def test_soa_x_negation_and_v_flip(tmp_path):
    path = write(tmp_path, """
v 1 0 0
v 2 0 0
v 1 1 0
vt 0.25 0.25
vt 0.5 0.25
vt 0.25 0.75
vn 0 0 1
f 1/1/1 2/2/1 3/3/1
""")
    mesh = obj_loader.load_obj(path)
    soa = build_triangle_soa(mesh, np.eye(4, dtype=np.float32), [0])
    # X negated (pathtracer.cpp:79)
    np.testing.assert_allclose(soa.v1[0], [-1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(soa.v1[0] + soa.e1[0], [-2, 0, 0], atol=1e-6)
    # V flipped (pathtracer.cpp:93)
    np.testing.assert_allclose(soa.uv1[0], [0.25, 0.75], atol=1e-6)
    np.testing.assert_allclose(soa.uv3[0], [0.25, 0.25], atol=1e-6)
    # normals negated in X too (pathtracer.cpp:85)
    np.testing.assert_allclose(soa.n1[0], [0, 0, 1], atol=1e-6)
    # face normal from transformed verts: cross(e1, e2) normalised
    np.testing.assert_allclose(soa.face_n[0], [0, 0, -1], atol=1e-6)


def test_model_matrix_bakes_into_positions_and_normals(tmp_path):
    path = write(tmp_path, """
v 1 0 0
v 2 0 0
v 1 1 0
vn 1 0 0
f 1//1 2//1 3//1
""")
    mesh = obj_loader.load_obj(path)
    m = transforms.model_matrix([5.0, 0.0, 0.0], [0.0, 0.0, 0.0], [2.0, 2.0, 2.0])
    soa = build_triangle_soa(mesh, m, [0])
    # position: negate X then M: (-1,0,0)*2 + (5,0,0) = (3,0,0)
    np.testing.assert_allclose(soa.v1[0], [3, 0, 0], atol=1e-5)
    # normal: direction transform, no translation, no inverse transpose
    np.testing.assert_allclose(soa.n1[0], [-2, 0, 0], atol=1e-5)


def test_model_matrix_rotation_order_degrees():
    # M = T * Rx * Ry * Rz * S (previewer.h:96-101), degrees (glm 0.9.3)
    m = transforms.model_matrix([0, 0, 0], [90.0, 0.0, 0.0], [1, 1, 1])
    p = m[:3, :3] @ np.array([0.0, 1.0, 0.0])
    np.testing.assert_allclose(p, [0, 0, 1], atol=1e-6)

    m = transforms.model_matrix([1, 2, 3], [0.0, 90.0, 0.0], [1, 1, 1])
    p = m[:3, :3] @ np.array([0.0, 0.0, 1.0]) + m[:3, 3]
    np.testing.assert_allclose(p, [2, 2, 3], atol=1e-6)


def test_camera_basis():
    d, u = transforms.camera_basis_from_rotation([0.0, 0.0, 0.0])
    np.testing.assert_allclose(d, [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(u, [0, 1, 0], atol=1e-6)
    # yaw +90 about Y maps +z to +x: Ry(a)*(0,0,1) = (sin a, 0, cos a)
    d, u = transforms.camera_basis_from_rotation([0.0, 90.0, 0.0])
    np.testing.assert_allclose(d, [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(u, [0, 1, 0], atol=1e-6)
    # negative angles normalise to [0,360)
    from pathtracing_spectrum_tpu.models.transforms import normalize_rotation
    assert normalize_rotation([-90.0, 720.0, 0.0]) == (270.0, 0.0, 0.0)


def test_cornell_asset_loads(assets_dir):
    mesh = obj_loader.load_obj(os.path.join(assets_dir, "cornell_box.obj"))
    names = [s.name for s in mesh.shapes]
    assert names == ["floor", "ceiling", "back", "left", "right", "light",
                     "tall_block", "short_block"]
    total = sum(s.v_idx.shape[0] for s in mesh.shapes)
    assert total == 2 * 6 + 12 * 2  # 6 quads + 2 boxes
