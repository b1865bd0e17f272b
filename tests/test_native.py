"""Native C++ components vs their Python semantic oracles."""

import os

import numpy as np
import pytest

from pathtracing_spectrum_tpu import native
from pathtracing_spectrum_tpu.utils.obj_loader import _load_obj_py

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def assert_mesh_equal(a, b):
    np.testing.assert_allclose(a.vertices, b.vertices, rtol=1e-6)
    np.testing.assert_allclose(a.texcoords, b.texcoords, rtol=1e-6)
    np.testing.assert_allclose(a.normals, b.normals, rtol=1e-6)
    assert len(a.shapes) == len(b.shapes)
    for sa, sb in zip(a.shapes, b.shapes):
        assert sa.name == sb.name
        np.testing.assert_array_equal(sa.v_idx, sb.v_idx)
        np.testing.assert_array_equal(sa.vt_idx, sb.vt_idx)
        np.testing.assert_array_equal(sa.vn_idx, sb.vn_idx)
        np.testing.assert_array_equal(sa.smoothing, sb.smoothing)


@pytest.mark.parametrize("asset", ["cornell_box.obj", "prism.obj",
                                   "sphere.obj"])
def test_obj_parser_matches_python(assets_dir, asset):
    path = os.path.join(assets_dir, asset)
    assert_mesh_equal(native.load_obj_native(path), _load_obj_py(path))


def test_obj_parser_edge_cases(tmp_path):
    p = tmp_path / "edge.obj"
    p.write_text("""
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vt 0 0
vt 1 1
vn 0 0 1
g with spaces in name
s 2
f -4/-2/-1 -3/-1/-1 -2//-1 -1
s off
f 1 2 3
""")
    assert_mesh_equal(native.load_obj_native(str(p)), _load_obj_py(str(p)))


def test_bvh_native_traversal_matches_dense():
    import dataclasses
    import jax.numpy as jnp
    from pathtracing_spectrum_tpu.models.geometry import empty_soa
    from pathtracing_spectrum_tpu.ops.bvh import intersect_bvh
    from pathtracing_spectrum_tpu.ops.intersect import (
        intersect_bruteforce, precompute_intersect_tables)

    rng = np.random.default_rng(3)
    t = 500
    v1 = rng.uniform(-3, 3, (t, 3)).astype(np.float32)
    e1 = rng.normal(0, 1, (t, 3)).astype(np.float32)
    e2 = rng.normal(0, 1, (t, 3)).astype(np.float32)
    n = np.cross(e1, e2)
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-20)
    v2 = v1 + e1
    v3 = v1 + e2
    tri_min = np.minimum(np.minimum(v1, v2), v3)
    tri_max = np.maximum(np.maximum(v1, v2), v3)

    flat = native.build_bvh_native(tri_min, tri_max, leaf_size=4)
    assert flat is not None
    # structural sanity: every triangle appears exactly once in leaf ranges
    seen = np.zeros(t, bool)
    for i in range(flat.node_min.shape[0]):
        c = flat.node_count[i]
        if c > 0:
            rng_ids = flat.tri_order[flat.node_first[i]:flat.node_first[i] + c]
            assert not seen[rng_ids].any()
            seen[rng_ids] = True
    assert seen.all()

    order = flat.tri_order
    bv1, be1, be2 = v1[order], e1[order], e2[order]
    bn = n[order].astype(np.float32)
    k1, k2, k3, consts = precompute_intersect_tables(bv1, be1, be2, bn)

    nrays = 128
    ro = rng.uniform(-4, 4, (nrays, 3)).astype(np.float32)
    rd = rng.normal(size=(nrays, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    ro, rd = jnp.asarray(ro), jnp.asarray(rd)

    h1, t1, _, _, _ = map(np.asarray, intersect_bruteforce(
        ro, rd, jnp.asarray(bn), jnp.asarray(k1), jnp.asarray(k2),
        jnp.asarray(k3), jnp.asarray(consts)))
    h2, t2, _, _, _ = map(np.asarray, intersect_bvh(
        ro, rd, jnp.asarray(bv1), jnp.asarray(be1), jnp.asarray(be2),
        jnp.asarray(bn),
        jnp.asarray(flat.node_min), jnp.asarray(flat.node_max),
        jnp.asarray(flat.node_skip), jnp.asarray(flat.node_first),
        jnp.asarray(flat.node_count), leaf_size=4))
    np.testing.assert_array_equal(h1, h2)
    np.testing.assert_allclose(t1[h1], t2[h1], rtol=1e-3, atol=1e-4)


def test_bvh_native_quality_on_sphere(assets_dir):
    """SAH tree should have sane structure on a real mesh."""
    from pathtracing_spectrum_tpu.models.geometry import build_triangle_soa
    from pathtracing_spectrum_tpu.utils.obj_loader import load_obj

    mesh = load_obj(os.path.join(assets_dir, "sphere.obj"))
    soa = build_triangle_soa(mesh, np.eye(4, dtype=np.float32),
                             [0] * len(mesh.shapes))
    v1 = soa.v1.astype(np.float64)
    v2 = v1 + soa.e1
    v3 = v1 + soa.e2
    tri_min = np.minimum(np.minimum(v1, v2), v3).astype(np.float32)
    tri_max = np.maximum(np.maximum(v1, v2), v3).astype(np.float32)
    flat = native.build_bvh_native(tri_min, tri_max, leaf_size=4)
    n_leaves = int((flat.node_count > 0).sum())
    assert n_leaves >= soa.count / 8
    # skip links are monotone and in range
    nn = flat.node_min.shape[0]
    assert ((flat.node_skip > np.arange(nn)) & (flat.node_skip <= nn)).all()
