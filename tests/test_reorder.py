"""Contract tests for the shared reorder primitives (reorder.py)."""

import numpy as np
import jax.numpy as jnp

from pathtracing_spectrum_tpu.reorder import (REORDER_POS_BITS,
                                              REORDER_SEGMENT, segment_for,
                                              sort_key)


def test_segment_for_divides_in_whole_blocks():
    for n in (1024, 65536, 262144, 2073600, 1024 * 3, 4096 * 5):
        seg = segment_for(n)
        assert seg <= max(REORDER_SEGMENT, n)
        assert n % seg == 0
        if n % 1024 == 0:
            assert seg % 1024 == 0
    # no 1024-block divisor -> one global segment
    assert segment_for(1000) == 1000


def test_sort_key_dead_rays_sort_last_and_octant_dominates():
    rng = np.random.default_rng(3)
    n = 512
    o = [jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
         for _ in range(3)]
    d = [jnp.asarray(rng.normal(0, 1, n).astype(np.float32))
         for _ in range(3)]
    alive = jnp.asarray(rng.uniform(0, 1, n) < 0.6)
    smin = jnp.zeros(3, jnp.float32)
    inv_ext = jnp.ones(3, jnp.float32)
    key = np.asarray(sort_key(*o, *d, alive, smin, inv_ext, morton=True))
    al = np.asarray(alive)
    # every dead key strictly above every live key (dead bit is the MSB
    # of the used range)
    assert key[al].max() < key[~al].min()
    # octant bits sit above ALL morton bits: flipping one direction sign
    # moves the key more than any origin change can
    k_oct = np.asarray(sort_key(*o, -d[0], d[1], d[2], alive, smin,
                                inv_ext, morton=True))
    both = al & (np.asarray(d[0]) != 0)
    assert (np.abs(k_oct[both].astype(np.int64) - key[both])
            >= (1 << (3 * REORDER_POS_BITS - 1))).all()


def test_sort_key_morton_false_keeps_only_dead_bit():
    n = 64
    z = jnp.zeros(n, jnp.float32)
    alive = jnp.asarray(np.arange(n) % 2 == 0)
    key = np.asarray(sort_key(z, z, z, z, z, z, alive, jnp.zeros(3),
                              jnp.ones(3), morton=False))
    assert set(np.unique(key[np.asarray(alive)])) == {0}
    assert set(np.unique(key[~np.asarray(alive)])) == \
        {1 << (3 * REORDER_POS_BITS + 3)}


def test_reorder_segment_size_is_result_exact(monkeypatch):
    """REORDER_SEGMENT (PTS_REORDER_SEGMENT) only changes the sort's
    segment partition — any segment-local permutation is result-exact,
    so renders under different segment sizes must match bitwise. Uses
    2048 rays so the small setting actually produces TWO segments
    (segment boundaries are the thing under test) and the dense backend
    so the check runs fast on CPU."""
    import jax
    import pytest

    from scene_helpers import cornell_scene
    from pathtracing_spectrum_tpu import camera_rays, reorder
    from pathtracing_spectrum_tpu.engine import trace_radiance

    sc = cornell_scene(depth=3)
    scene = sc.compile()
    ro, rd = camera_rays(sc.camera(), 64, 32)          # 2048 rays
    rng = np.random.default_rng(11)
    rand = jnp.asarray(rng.uniform(0, 1, (6, 4, 2048)).astype(np.float32))
    key = jax.random.key(0)
    out = []
    for seg in (1024, 2048):                           # 2 segments vs global
        monkeypatch.setattr(reorder, "REORDER_SEGMENT", seg)
        assert reorder.segment_for(2048) == seg
        out.append(trace_radiance(scene, ro, rd, key, 3, backend="dense",
                                  rand_override=rand, reorder=True))
    np.testing.assert_array_equal(np.asarray(out[0].radiance),
                                  np.asarray(out[1].radiance))
    assert int(out[0].rays_traced) == int(out[1].rays_traced)


def test_engine_uses_the_shared_key_function():
    """The engine must literally reference reorder.sort_key — a
    re-implementation sneaking back in would defeat the consolidation."""
    import pathtracing_spectrum_tpu.engine as eng
    from pathtracing_spectrum_tpu import reorder
    assert eng.sort_key is reorder.sort_key
    assert eng.segment_for is reorder.segment_for


def test_sort_mat_key_is_result_exact(monkeypatch):
    """PTS_SORT_MAT (the material-sorted-queues A/B, engine.SORT_MAT)
    only changes the bounce-ray permutation — renders with and without
    the material bits in the key must match bitwise. Also pins the key
    layout: the dead bit stays strictly above every live key when the
    material bits are present."""
    import jax

    from scene_helpers import cornell_scene
    from pathtracing_spectrum_tpu import camera_rays
    import pathtracing_spectrum_tpu.engine as eng

    sc = cornell_scene(depth=3)
    scene = sc.compile()
    ro, rd = camera_rays(sc.camera(), 64, 32)          # 2048 rays
    rng = np.random.default_rng(13)
    rand = jnp.asarray(rng.uniform(0, 1, (6, 4, 2048)).astype(np.float32))
    key = jax.random.key(0)
    out = []
    for flag in (False, True):
        monkeypatch.setattr(eng, "SORT_MAT", flag)
        out.append(eng.trace_radiance(scene, ro, rd, key, 3,
                                      backend="dense", rand_override=rand,
                                      reorder=True))
    np.testing.assert_array_equal(np.asarray(out[0].radiance),
                                  np.asarray(out[1].radiance))
    assert int(out[0].rays_traced) == int(out[1].rays_traced)

    # key-layout pin: dead rays above every live key for all mat values
    n = 256
    rngk = np.random.default_rng(5)
    o = [jnp.asarray(rngk.uniform(0, 1, n).astype(np.float32))
         for _ in range(3)]
    d = [jnp.asarray(rngk.normal(0, 1, n).astype(np.float32))
         for _ in range(3)]
    alive = jnp.asarray(rngk.uniform(0, 1, n) < 0.6)
    mat = jnp.asarray(rngk.integers(0, 4, n).astype(np.int32))
    k = np.asarray(sort_key(*o, *d, alive, jnp.zeros(3), jnp.ones(3),
                            morton=True, mat=mat))
    al = np.asarray(alive)
    assert k[al].max() < k[~al].min()


def test_segment_policy_size_aware(monkeypatch):
    """Global segment iff the scene is large AND the wavefront moderate
    (measured table in reorder.py); PTS_REORDER_SEGMENT overrides."""
    import os
    from pathtracing_spectrum_tpu.reorder import (
        REORDER_GLOBAL_SEG_MIN_TRIS, REORDER_GLOBAL_SEG_MAX_N,
        segment_policy, segment_for)
    monkeypatch.delenv("PTS_REORDER_SEGMENT", raising=False)
    big_t = REORDER_GLOBAL_SEG_MIN_TRIS
    # large scene + 512^2 wavefront: one global segment
    assert segment_policy(262144, big_t) == 262144
    assert segment_policy(262144, 1_000_000) == 262144
    # small scene keeps the measured 65536 segmenting
    assert segment_policy(262144, big_t - 1) == segment_for(262144) == 65536
    # large wavefront (1080p) keeps segmenting even for large scenes
    n_1080p = 1920 * 1080
    assert segment_policy(n_1080p, 1_000_000) == segment_for(n_1080p)
    assert segment_policy(n_1080p, 1_000_000) <= REORDER_GLOBAL_SEG_MAX_N
    # env override pins the cap for everything
    monkeypatch.setenv("PTS_REORDER_SEGMENT", "1")
    assert segment_policy(262144, 1_000_000) == segment_for(262144)
