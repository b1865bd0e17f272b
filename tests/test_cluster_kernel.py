"""Cluster-culled Pallas kernel vs the dense jnp sweep (interpret mode)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from pathtracing_spectrum_tpu.models.geometry import empty_soa
from pathtracing_spectrum_tpu.ops.bvh import build_bvh
from pathtracing_spectrum_tpu.ops.intersect import (
    intersect_bruteforce, precompute_intersect_tables)
from pathtracing_spectrum_tpu.ops.intersect_pallas import (
    build_cluster_aabbs, intersect_clustered_pallas_soa)

from scene_helpers import cornell_scene


def soup(t, seed):
    rng = np.random.default_rng(seed)
    v1 = rng.uniform(-3, 3, (t, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.7, (t, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.7, (t, 3)).astype(np.float32)
    n = np.cross(e1, e2)
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-20)
    return v1, e1, e2, n.astype(np.float32)


def rays(n, seed):
    rng = np.random.default_rng(seed)
    ro = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    return ro, rd


@pytest.mark.slow
@pytest.mark.parametrize("t", [50, 1500])
def test_cluster_kernel_matches_dense(t):
    v1, e1, e2, n = soup(t, seed=t)
    soa = dataclasses.replace(empty_soa(), v1=v1, e1=e1, e2=e2, face_n=n)
    flat = build_bvh(soa, leaf_size=4)
    order = flat.tri_order
    bv1, be1, be2, bn = v1[order], e1[order], e2[order], n[order]

    k1, k2, k3, consts = precompute_intersect_tables(bv1, be1, be2, bn)
    tri16 = np.concatenate([bn, k1, k2, k3, consts], axis=1).astype(np.float32)
    v2 = bv1 + be1
    v3 = bv1 + be2
    tri_min = np.minimum(np.minimum(bv1, v2), v3)
    tri_max = np.maximum(np.maximum(bv1, v2), v3)
    aabbs = build_cluster_aabbs(tri_min, tri_max)

    ro, rd = rays(256, seed=t + 1)
    h1, t1, i1, _, _ = map(np.asarray, intersect_bruteforce(
        jnp.asarray(ro), jnp.asarray(rd), jnp.asarray(bn), jnp.asarray(k1),
        jnp.asarray(k2), jnp.asarray(k3), jnp.asarray(consts)))
    h2, t2, i2, _, _ = map(np.asarray, intersect_clustered_pallas_soa(
        *(jnp.asarray(ro[:, k]) for k in range(3)),
        *(jnp.asarray(rd[:, k]) for k in range(3)),
        jnp.asarray(tri16), jnp.asarray(aabbs), interpret=True))

    assert (h1 == h2).mean() > 0.995  # fp-order seam ties only
    both = h1 & h2
    np.testing.assert_allclose(t1[both], t2[both], rtol=1e-4, atol=1e-4)
    # where indices differ, hits must be co-located (ties on shared edges)
    diff = both & (i1 != i2)
    assert diff.mean() < 0.02


@pytest.mark.slow
def test_cluster_engine_backend_matches_dense_cornell():
    """Full engine: cluster backend (interpret off CPU path is jnp-only, so
    drive the kernel directly through trace via monkeypatched interpret)."""
    import pathtracing_spectrum_tpu.ops.intersect_pallas as ip
    import jax

    sc = cornell_scene(depth=2, res=(8, 8))
    scene = sc.compile()
    from pathtracing_spectrum_tpu import camera_rays
    from pathtracing_spectrum_tpu.engine import trace_radiance

    ro, rd = camera_rays(sc.camera(), 8, 8)
    key = jax.random.key(0)
    want = np.asarray(trace_radiance(scene, ro, rd, key, 2,
                                     backend="dense").radiance)

    orig = ip.intersect_clustered_pallas_soa

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    ip.intersect_clustered_pallas_soa = interp
    import pathtracing_spectrum_tpu.engine as eng
    eng.intersect_clustered_pallas_soa = interp
    try:
        got = np.asarray(trace_radiance(scene, ro, rd, key, 2,
                                        backend="cluster").radiance)
    finally:
        ip.intersect_clustered_pallas_soa = orig
        eng.intersect_clustered_pallas_soa = orig
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)
