"""Intersection backends vs the numpy oracle, and BVH vs dense."""

import numpy as np
import jax.numpy as jnp

from pathtracing_spectrum_tpu.ops.intersect import (
    intersect_bruteforce, precompute_intersect_tables)
from pathtracing_spectrum_tpu.ops.bvh import intersect_bvh

import oracle
from scene_helpers import cornell_scene


def random_rays(n, seed):
    rng = np.random.default_rng(seed)
    ro = rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
    ro[:, 2] = rng.uniform(2.5, 5.5, n)
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    return ro, rd


def dense_args(scene):
    return (scene.tri_face_n, scene.tri_k1, scene.tri_k2, scene.tri_k3,
            scene.tri_consts)


def test_dense_matches_oracle():
    scene = cornell_scene().compile(build_bvh=False)
    sc = oracle.OracleScene(scene)
    ro, rd = random_rays(64, 0)
    hit, t, idx, _, _ = map(np.asarray, intersect_bruteforce(
        jnp.asarray(ro), jnp.asarray(rd), *dense_args(scene)))
    for k in range(ro.shape[0]):
        oi, ot = oracle._closest_hit(sc, ro[k].astype(np.float64),
                                     rd[k].astype(np.float64))
        assert hit[k] == (oi >= 0), k
        if oi >= 0:
            assert abs(t[k] - ot) < 1e-3, k
            assert idx[k] == oi, k


def test_bvh_matches_dense():
    scene = cornell_scene().compile(build_bvh=True, leaf_size=4)
    ro, rd = random_rays(256, 1)
    ro, rd = jnp.asarray(ro), jnp.asarray(rd)
    h1, t1, i1, _, _ = map(np.asarray, intersect_bruteforce(
        ro, rd, *dense_args(scene)))
    h2, t2, i2, _, _ = map(np.asarray, intersect_bvh(
        ro, rd, scene.tri_v1, scene.tri_e1, scene.tri_e2, scene.tri_face_n,
        scene.bvh_node_min, scene.bvh_node_max,
        scene.bvh_node_skip, scene.bvh_node_first, scene.bvh_node_count,
        leaf_size=4))
    np.testing.assert_array_equal(h1, h2)
    np.testing.assert_allclose(t1[h1], t2[h1], rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(i1[h1], i2[h1])


def test_bvh_random_soup_matches_dense():
    """Random triangle soup: BVH must agree with the dense sweep."""
    rng = np.random.default_rng(7)
    t = 300
    v1 = rng.uniform(-3, 3, (t, 3)).astype(np.float32)
    e1 = rng.normal(0, 1, (t, 3)).astype(np.float32)
    e2 = rng.normal(0, 1, (t, 3)).astype(np.float32)
    n = np.cross(e1, e2)
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-20)

    from pathtracing_spectrum_tpu.models.geometry import empty_soa
    import dataclasses
    soa = empty_soa()
    soa = dataclasses.replace(
        soa, v1=v1, e1=e1, e2=e2, face_n=n.astype(np.float32))

    from pathtracing_spectrum_tpu.ops.bvh import build_bvh
    flat = build_bvh(soa, leaf_size=4)
    order = flat.tri_order
    bv1, be1, be2, bn = (v1[order], e1[order], e2[order],
                         n[order].astype(np.float32))
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
