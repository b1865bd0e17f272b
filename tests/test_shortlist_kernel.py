"""Shortlist-driven cluster kernel (ops/intersect_shortlist.py) on the CPU
interpreter: hit/idx selection must match the brute-force sweep exactly
(incl. the lowest-index tie rule), and the stage-1 interval shortlists must
be conservative (never cull a group any ray actually hits)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pathtracing_spectrum_tpu.ops.intersect import (intersect_bruteforce,
                                                    precompute_intersect_tables)
from pathtracing_spectrum_tpu.ops.intersect_pallas import (build_cluster_aabbs,
                                                           pack_tri16)
import pathtracing_spectrum_tpu.ops.intersect_shortlist as isl


def _soup(T, seed=0, spread=5.0):
    rng = np.random.default_rng(seed)
    v1 = rng.uniform(-spread, spread, (T, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.3, (T, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.3, (T, 3)).astype(np.float32)
    fn = np.cross(e1, e2)
    fn /= np.maximum(np.linalg.norm(fn, axis=1, keepdims=True), 1e-20)
    k1, k2, k3, consts = precompute_intersect_tables(v1, e1, e2, fn)
    tri16 = pack_tri16(*(jnp.asarray(x) for x in (fn, k1, k2, k3, consts)))
    v2, v3 = v1 + e1, v1 + e2
    caabb = jnp.asarray(build_cluster_aabbs(
        np.minimum(np.minimum(v1, v2), v3).astype(np.float32),
        np.maximum(np.maximum(v1, v2), v3).astype(np.float32)))
    return (v1, e1, e2, fn, k1, k2, k3, consts), tri16, caabb


def _rays(N, seed=1, park_frac=0.3):
    rng = np.random.default_rng(seed)
    ro = rng.uniform(-8, 8, (N, 3)).astype(np.float32)
    rd = rng.normal(0, 1, (N, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    parked = rng.uniform(size=N) < park_frac
    rd[parked] = 0.0
    ro[parked] = 1e30
    return ro, rd


@pytest.mark.slow
@pytest.mark.parametrize("T,N", [(300, 1024), (3000, 4096), (1100, 2048)])
def test_shortlist_matches_bruteforce(T, N):
    geo, tri16, caabb = _soup(T)
    v1, e1, e2, fn, k1, k2, k3, consts = geo
    ro, rd = _rays(N)
    h0, t0, i0, _, _ = intersect_bruteforce(
        jnp.asarray(ro), jnp.asarray(rd), jnp.asarray(fn), jnp.asarray(k1),
        jnp.asarray(k2), jnp.asarray(k3), jnp.asarray(consts))
    h1, t1, i1, s2, s3 = isl.intersect_shortlist_pallas_soa(
        *(jnp.asarray(ro[:, k]) for k in range(3)),
        *(jnp.asarray(rd[:, k]) for k in range(3)),
        tri16, caabb, interpret=True)
    h0, h1 = np.asarray(h0), np.asarray(h1)
    np.testing.assert_array_equal(h0, h1)
    m = h0
    np.testing.assert_allclose(np.asarray(t0)[m], np.asarray(t1)[m],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i0)[m], np.asarray(i1)[m])


def test_shortlists_are_conservative():
    """Every group a real per-ray slab test hits must be in the shortlist."""
    geo, tri16, caabb = _soup(2100, seed=3)
    ro, rd = _rays(2048, seed=4)
    N = ro.shape[0]
    block = isl._RB * isl._LANES
    pad = (-N) % block
    comps = [np.concatenate([ro[:, k], np.zeros(pad, np.float32)])
             for k in range(3)]
    comps += [np.concatenate([rd[:, k], np.zeros(pad, np.float32)])
              for k in range(3)]
    rays = jnp.stack([jnp.asarray(c) for c in comps]).reshape(
        6, (N + pad) // isl._LANES, isl._LANES)

    t_pad = (-2100) % isl.GROUP_T
    n_groups = (2100 + t_pad) // isl.GROUP_T
    nc = n_groups * isl.KC
    ca = np.asarray(caabb)
    if ca.shape[0] < nc:
        ca = np.concatenate([ca, np.tile(
            [[1, 1, 1, -1, -1, -1, 0, 0]], (nc - ca.shape[0], 1))]).astype(
                np.float32)
    ga, gv = isl.group_aabbs_from_clusters(jnp.asarray(ca), n_groups)
    order, counts, tnear = isl.build_shortlists(rays, ga, gv)
    order, counts = np.asarray(order), np.asarray(counts)

    ga_np = np.asarray(ga)
    inv = np.where(rd == 0.0, np.inf, 1.0 / np.where(rd == 0.0, 1.0, rd))
    live = ~(rd == 0).all(axis=1)
    t0 = (ga_np[None, :, 0:3] - ro[:, None, :]) * inv[:, None, :]
    t1 = (ga_np[None, :, 3:6] - ro[:, None, :]) * inv[:, None, :]
    tn = np.minimum(t0, t1).max(2)
    tf = np.maximum(t0, t1).min(2)
    ray_hits = (tn < tf) & (tf >= 0) & live[:, None]        # [N, G]
    for b in range((N + pad) // block):
        rays_lo, rays_hi = b * block, min((b + 1) * block, N)
        if rays_lo >= N:
            continue
        needed = np.where(ray_hits[rays_lo:rays_hi].any(axis=0))[0]
        listed = set(order[b, :counts[b]].tolist())
        missing = [g for g in needed if g not in listed]
        assert not missing, f"block {b} shortlist missing groups {missing}"


@pytest.mark.slow
def test_engine_shortlist_backend_matches_dense():
    from scene_helpers import cornell_scene
    from pathtracing_spectrum_tpu import camera_rays
    from pathtracing_spectrum_tpu.engine import trace_radiance

    sc = cornell_scene()
    scene = sc.compile()
    ro, rd = camera_rays(sc.camera(), 16, 16)
    rng = np.random.default_rng(7)
    rand = jnp.asarray(rng.uniform(0, 1, (6, 4, 256)).astype(np.float32))
    key = jax.random.key(0)
    a = trace_radiance(scene, ro, rd, key, 3, backend="dense",
                       rand_override=rand)
    b = trace_radiance(scene, ro, rd, key, 3, backend="shortlist",
                       rand_override=rand)
    np.testing.assert_allclose(np.asarray(a.radiance),
                               np.asarray(b.radiance), rtol=2e-4, atol=1e-6)


@pytest.mark.slow
def test_reorder_is_bit_identical():
    """Bounce-ray reordering must not change a single bit of the result:
    block culling is conservative and hit selection is order-independent."""
    from scene_helpers import cornell_scene
    from pathtracing_spectrum_tpu import camera_rays
    from pathtracing_spectrum_tpu.engine import trace_radiance

    sc = cornell_scene(depth=3)
    scene = sc.compile()
    ro, rd = camera_rays(sc.camera(), 16, 16)
    rng = np.random.default_rng(11)
    rand = jnp.asarray(rng.uniform(0, 1, (6, 4, 256)).astype(np.float32))
    key = jax.random.key(0)
    a = trace_radiance(scene, ro, rd, key, 3, backend="shortlist",
                       rand_override=rand, reorder=False)
    b = trace_radiance(scene, ro, rd, key, 3, backend="shortlist",
                       rand_override=rand, reorder=True)
    np.testing.assert_array_equal(np.asarray(a.radiance),
                                  np.asarray(b.radiance))
    assert int(a.rays_traced) == int(b.rays_traced)


@pytest.mark.slow
def test_reorder_period_is_bit_identical():
    """reorder_period=2 reuses the previous bounce's permutation every
    other iteration. Any permutation is result-exact (the kernels are
    ray-order-independent), so the output must match period=1 bitwise."""
    from scene_helpers import cornell_scene
    from pathtracing_spectrum_tpu import camera_rays
    from pathtracing_spectrum_tpu.engine import trace_radiance

    sc = cornell_scene(depth=3)
    scene = sc.compile()
    ro, rd = camera_rays(sc.camera(), 16, 16)
    rng = np.random.default_rng(11)
    rand = jnp.asarray(rng.uniform(0, 1, (6, 4, 256)).astype(np.float32))
    key = jax.random.key(0)
    a = trace_radiance(scene, ro, rd, key, 3, backend="shortlist",
                       rand_override=rand, reorder=True)
    b = trace_radiance(scene, ro, rd, key, 3, backend="shortlist",
                       rand_override=rand, reorder=True, reorder_period=2)
    np.testing.assert_array_equal(np.asarray(a.radiance),
                                  np.asarray(b.radiance))
    assert int(a.rays_traced) == int(b.rays_traced)


@pytest.mark.slow
@pytest.mark.parametrize("rf", [2, 3, 6, 99])
def test_reorder_from_is_bit_identical(rf):
    """reorder_from=k runs looped iterations < k unsorted (they are
    nearly fully live, so the dead-to-front packing has nothing to
    pack). Unsorted iterations are the reorder=False code path, so the
    output must match reorder_from=1 bitwise for any k."""
    from scene_helpers import cornell_scene
    from pathtracing_spectrum_tpu import camera_rays
    from pathtracing_spectrum_tpu.engine import trace_radiance

    sc = cornell_scene(depth=3)
    scene = sc.compile()
    ro, rd = camera_rays(sc.camera(), 16, 16)
    rng = np.random.default_rng(11)
    rand = jnp.asarray(rng.uniform(0, 1, (6, 4, 256)).astype(np.float32))
    key = jax.random.key(0)
    a = trace_radiance(scene, ro, rd, key, 3, backend="shortlist",
                       rand_override=rand, reorder=True)
    b = trace_radiance(scene, ro, rd, key, 3, backend="shortlist",
                       rand_override=rand, reorder=True, reorder_from=rf)
    np.testing.assert_array_equal(np.asarray(a.radiance),
                                  np.asarray(b.radiance))
    assert int(a.rays_traced) == int(b.rays_traced)


@pytest.mark.slow
@pytest.mark.parametrize("rf", [2, 3, 5, 99])
def test_reorder_freeze_is_bit_identical(rf):
    """reorder_freeze=k reuses iteration k's permutation for every later
    iteration (dead lanes never revive, so the frozen dead-to-front
    packing stays valid; only live-lane grouping goes stale). Any
    permutation is result-exact, so the output must match an unfrozen
    run bitwise for any k."""
    from scene_helpers import cornell_scene
    from pathtracing_spectrum_tpu import camera_rays
    from pathtracing_spectrum_tpu.engine import trace_radiance

    sc = cornell_scene(depth=3)
    scene = sc.compile()
    ro, rd = camera_rays(sc.camera(), 16, 16)
    rng = np.random.default_rng(11)
    rand = jnp.asarray(rng.uniform(0, 1, (6, 4, 256)).astype(np.float32))
    key = jax.random.key(0)
    a = trace_radiance(scene, ro, rd, key, 3, backend="shortlist",
                       rand_override=rand, reorder=True)
    b = trace_radiance(scene, ro, rd, key, 3, backend="shortlist",
                       rand_override=rand, reorder=True, reorder_freeze=rf)
    np.testing.assert_array_equal(np.asarray(a.radiance),
                                  np.asarray(b.radiance))
    assert int(a.rays_traced) == int(b.rays_traced)


@pytest.mark.slow
@pytest.mark.parametrize("knob,val,rtol", [
    ("_EARLY_EXIT", True, 1e-4), ("row_cull", True, 1e-4),
    ("_RB", 8, 1e-4),
    ("mxu", "bf16x3", 1e-3), ("mxu", "f32x6", 1e-4),
    ("mxu+row_cull", "f32x6", 1e-4),
    ("fuse_rows", True, 1e-4), ("mxu+fuse_rows", "f32x6", 1e-4)])
def test_knob_variants_match_bruteforce(knob, val, rtol):
    """The off-by-default culling knobs must stay selection-identical —
    incl. the early-exit's min(best_t, root-box cap) bound, which lets
    sky/miss rays release the block's exit. (mxu schemes carry a
    documented <=2^-18 relative deviation from the VPU rounding order —
    these seeds are deterministic, no hit flips within tolerance.)"""
    geo, tri16, caabb = _soup(700, seed=8)
    v1, e1, e2, fn, k1, k2, k3, consts = geo
    ro, rd = _rays(1024, seed=9)
    h0, t0, i0, _, _ = intersect_bruteforce(
        jnp.asarray(ro), jnp.asarray(rd), jnp.asarray(fn), jnp.asarray(k1),
        jnp.asarray(k2), jnp.asarray(k3), jnp.asarray(consts))
    if knob in ("mxu", "row_cull", "mxu+row_cull", "fuse_rows",
                "mxu+fuse_rows"):
        # per-call static args, no module state involved; mxu+row_cull is
        # the TPU big-scene production configuration
        # (engine.sweep_policy); fuse_rows is off-default measurement
        # gear (measured loss — see the module knob comment)
        kw = ({"row_cull": True} if knob == "row_cull"
              else {"fuse_rows": True} if knob == "fuse_rows"
              else {"mxu": val} if knob == "mxu"
              else {"mxu": val, "row_cull": True} if knob == "mxu+row_cull"
              else {"mxu": val, "fuse_rows": True})
        h1, t1, i1, _, _ = isl.intersect_shortlist_pallas_soa(
            *(jnp.asarray(ro[:, k]) for k in range(3)),
            *(jnp.asarray(rd[:, k]) for k in range(3)),
            tri16, caabb, interpret=True, **kw)
    else:
        old = getattr(isl, knob)
        try:
            setattr(isl, knob, val)
            jax.clear_caches()
            h1, t1, i1, _, _ = isl.intersect_shortlist_pallas_soa(
                *(jnp.asarray(ro[:, k]) for k in range(3)),
                *(jnp.asarray(rd[:, k]) for k in range(3)),
                tri16, caabb, interpret=True)
        finally:
            setattr(isl, knob, old)
            jax.clear_caches()
    h0, h1 = np.asarray(h0), np.asarray(h1)
    np.testing.assert_array_equal(h0, h1)
    m = h0
    np.testing.assert_allclose(np.asarray(t0)[m], np.asarray(t1)[m],
                               rtol=rtol, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i0)[m], np.asarray(i1)[m])


@pytest.mark.slow
@pytest.mark.parametrize("mxu", [None, "f32x6"])
def test_row_fused_sweep_bitwise_identical(mxu):
    """fuse_rows reshapes the block to one [1, RB*128] row: every output
    element is the same dot product over the same K' column (lanes are
    independent), so the fused kernel must match the unfused one
    BITWISE per scheme — not just within tolerance."""
    geo, tri16, caabb = _soup(700, seed=8)
    ro, rd = _rays(2048, seed=9)
    args = ([jnp.asarray(ro[:, k]) for k in range(3)]
            + [jnp.asarray(rd[:, k]) for k in range(3)])
    a = isl.intersect_shortlist_pallas_soa(
        *args, tri16, caabb, interpret=True, mxu=mxu, row_cull=False,
        fuse_rows=False)
    b = isl.intersect_shortlist_pallas_soa(
        *args, tri16, caabb, interpret=True, mxu=mxu, row_cull=False,
        fuse_rows=True)
    for x, y, name in zip(a, b, ("hit", "t", "idx", "s2", "s3")):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=f"mxu={mxu} {name}")


@pytest.mark.slow
@pytest.mark.parametrize("span", [2, 4, 8])
def test_sweep_span_matches_span1(span):
    """span s sweeps s adjacent clusters per step gated on the span's
    slab UNION — conservative, so candidates only grow, and extras past
    a lane's bound never win the best-t compare: selection must match
    span=1 exactly (t within f32 reassociation of the same products)."""
    geo, tri16, caabb = _soup(700, seed=8)
    ro, rd = _rays(2048, seed=9)
    args = ([jnp.asarray(ro[:, k]) for k in range(3)]
            + [jnp.asarray(rd[:, k]) for k in range(3)])
    a = isl.intersect_shortlist_pallas_soa(
        *args, tri16, caabb, interpret=True, mxu=None, row_cull=False,
        span=1)
    b = isl.intersect_shortlist_pallas_soa(
        *args, tri16, caabb, interpret=True, mxu=None, row_cull=False,
        span=span)
    for x, y, name in zip(a, b, ("hit", "t", "idx", "s2", "s3")):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=f"span={span} {name}")


@pytest.mark.slow
@pytest.mark.parametrize("mxu,row_cull,span", [
    (None, False, 1), ("f32x6", True, 4), ("bf16x3", True, 4)])
def test_sel_gate_bitwise_identical(mxu, row_cull, span):
    """sel_gate skips the winner-selection epilogue under
    any((tmin <= cur_t) & (tmin < BIG)) — a superset of `better`, so a
    skipped step could never have updated any best ref: outputs must be
    BITWISE identical to the ungated kernel per knob combination."""
    geo, tri16, caabb = _soup(700, seed=8)
    ro, rd = _rays(2048, seed=9)
    args = ([jnp.asarray(ro[:, k]) for k in range(3)]
            + [jnp.asarray(rd[:, k]) for k in range(3)])
    a = isl.intersect_shortlist_pallas_soa(
        *args, tri16, caabb, interpret=True, mxu=mxu, row_cull=row_cull,
        span=span, sel_gate=False)
    b = isl.intersect_shortlist_pallas_soa(
        *args, tri16, caabb, interpret=True, mxu=mxu, row_cull=row_cull,
        span=span, sel_gate=True)
    for x, y, name in zip(a, b, ("hit", "t", "idx", "s2", "s3")):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=f"mxu={mxu} {name}")


def test_resolve_span_validates():
    assert isl.resolve_span(1) == 1
    assert isl.resolve_span(4) == 4
    with pytest.raises(ValueError, match="span=3"):
        isl.resolve_span(3)


def test_fuse_rows_excludes_row_cull():
    geo, tri16, caabb = _soup(100, seed=8)
    ro, rd = _rays(1024, seed=9)
    args = ([jnp.asarray(ro[:, k]) for k in range(3)]
            + [jnp.asarray(rd[:, k]) for k in range(3)])
    with pytest.raises(ValueError, match="mutually exclusive"):
        isl.intersect_shortlist_pallas_soa(
            *args, tri16, caabb, interpret=True, mxu="f32x6",
            row_cull=True, fuse_rows=True)


def test_resolve_row_fuse_env_sentinel(monkeypatch):
    assert isl.resolve_row_fuse(True) is True
    assert isl.resolve_row_fuse(False) is False
    monkeypatch.setattr(isl, "_ROW_FUSE", True)
    assert isl.resolve_row_fuse("env") is True
    monkeypatch.setattr(isl, "_ROW_FUSE", False)
    assert isl.resolve_row_fuse("env") is False


@pytest.mark.slow
@pytest.mark.parametrize("scheme", ["bf16x3", "f32x6"])
def test_mxu_unfused_fallback_matches_bruteforce(scheme):
    """PTS_MXU_FUSEK=0 (separate K=16 passes, summed smallest-first) is
    the fallback if Mosaic ever rejects the K-fused 48/96 contraction —
    it must stay selection-identical to brute force like the fused
    default the other mxu tests pin."""
    geo, tri16, caabb = _soup(700, seed=8)
    v1, e1, e2, fn, k1, k2, k3, consts = geo
    ro, rd = _rays(1024, seed=9)
    h0, t0, i0, _, _ = intersect_bruteforce(
        jnp.asarray(ro), jnp.asarray(rd), jnp.asarray(fn), jnp.asarray(k1),
        jnp.asarray(k2), jnp.asarray(k3), jnp.asarray(consts))
    old = isl._MXU_FUSE_K
    try:
        isl._MXU_FUSE_K = False
        jax.clear_caches()
        h1, t1, i1, _, _ = isl.intersect_shortlist_pallas_soa(
            *(jnp.asarray(ro[:, k]) for k in range(3)),
            *(jnp.asarray(rd[:, k]) for k in range(3)),
            tri16, caabb, interpret=True, mxu=scheme)
    finally:
        isl._MXU_FUSE_K = old
        jax.clear_caches()
    h0, h1 = np.asarray(h0), np.asarray(h1)
    np.testing.assert_array_equal(h0, h1)
    m = h0
    np.testing.assert_allclose(np.asarray(t0)[m], np.asarray(t1)[m],
                               rtol=(1e-3 if scheme == "bf16x3" else 1e-4),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i0)[m], np.asarray(i1)[m])


@pytest.mark.slow
@pytest.mark.parametrize("scheme,scale,max_flips", [
    ("bf16x3", 1e-2, 2), ("bf16x3", 1e3, 2),
    ("f32x6", 1e-2, 0), ("f32x6", 1e3, 0)])
def test_mxu_sweep_schemes_across_scene_scales(scheme, scale, max_flips):
    """The bf16-split error is RELATIVE, so scheme accuracy must hold at
    scene scales far from the unit-ish soup the other knob tests use
    (bench terrains span ~1e2, imported CAD can be mm or km). f32x6 is
    the exact 3-way-split decomposition — zero hit flips allowed at any
    scale; bf16x3's ~2^-18 relative t deviation may flip a near-tie
    between overlapping soup triangles, so a tiny deterministic flip
    budget is allowed (seeded; observed 0 flips at both scales)."""
    rng = np.random.default_rng(8)
    v1 = (rng.uniform(-5, 5, (700, 3)) * scale).astype(np.float32)
    e1 = (rng.normal(0, 0.3, (700, 3)) * scale).astype(np.float32)
    e2 = (rng.normal(0, 0.3, (700, 3)) * scale).astype(np.float32)
    fn = np.cross(e1, e2)
    fn /= np.maximum(np.linalg.norm(fn, axis=1, keepdims=True), 1e-30)
    k1, k2, k3, consts = precompute_intersect_tables(v1, e1, e2, fn)
    tri16 = pack_tri16(*(jnp.asarray(x) for x in (fn, k1, k2, k3, consts)))
    v2, v3 = v1 + e1, v1 + e2
    caabb = jnp.asarray(build_cluster_aabbs(
        np.minimum(np.minimum(v1, v2), v3).astype(np.float32),
        np.maximum(np.maximum(v1, v2), v3).astype(np.float32)))
    ro, rd = _rays(1024, seed=9)
    unparked = ro < 1e29                       # parked 1e30 stays parked
    ro = np.where(unparked, ro * scale, ro).astype(np.float32)
    h0, t0, i0, _, _ = intersect_bruteforce(
        jnp.asarray(ro), jnp.asarray(rd), jnp.asarray(fn), jnp.asarray(k1),
        jnp.asarray(k2), jnp.asarray(k3), jnp.asarray(consts))
    h1, t1, i1, _, _ = isl.intersect_shortlist_pallas_soa(
        *(jnp.asarray(ro[:, k]) for k in range(3)),
        *(jnp.asarray(rd[:, k]) for k in range(3)),
        tri16, caabb, interpret=True, mxu=scheme)
    h0, h1 = np.asarray(h0), np.asarray(h1)
    np.testing.assert_array_equal(h0, h1)
    m = h0
    flips = int((np.asarray(i0)[m] != np.asarray(i1)[m]).sum())
    assert flips <= max_flips, f"{flips} hit-index flips (budget {max_flips})"
    same = m & (np.asarray(i0) == np.asarray(i1))
    np.testing.assert_allclose(np.asarray(t0)[same], np.asarray(t1)[same],
                               rtol=(1e-3 if scheme == "bf16x3" else 1e-4),
                               atol=1e-5 * scale)


@pytest.mark.slow
@pytest.mark.parametrize("sb", [2, 4])
def test_superblock_shortlists_match_bruteforce(sb):
    """SMEM-budget super-blocking (shortlists per sb kernel blocks) must be
    selection-identical to per-block shortlists — bounds only get looser."""
    geo, tri16, caabb = _soup(2100, seed=5)
    v1, e1, e2, fn, k1, k2, k3, consts = geo
    ro, rd = _rays(4096, seed=6)
    h0, t0, i0, _, _ = intersect_bruteforce(
        jnp.asarray(ro), jnp.asarray(rd), jnp.asarray(fn), jnp.asarray(k1),
        jnp.asarray(k2), jnp.asarray(k3), jnp.asarray(consts))
    h1, t1, i1, _, _ = isl.intersect_shortlist_pallas_soa(
        *(jnp.asarray(ro[:, k]) for k in range(3)),
        *(jnp.asarray(rd[:, k]) for k in range(3)),
        tri16, caabb, interpret=True, sb=sb)
    h0, h1 = np.asarray(h0), np.asarray(h1)
    np.testing.assert_array_equal(h0, h1)
    m = h0
    np.testing.assert_allclose(np.asarray(t0)[m], np.asarray(t1)[m],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i0)[m], np.asarray(i1)[m])


def test_sweep_policy_defaults(monkeypatch):
    """The engine's production sweep policy (docs/tpu_cost_model.md
    "Hardware verdict"): bf16x3 + row-cull + span=4 on real TPU for the
    hierarchical kernels at large scenes (f32x6 below the 32k-tri
    regime), VPU (bit-identical, span 1) everywhere else, with
    PTS_MXU_SWEEP / PTS_ROW_CULL / PTS_SWEEP_SPAN always winning."""
    from pathtracing_spectrum_tpu.engine import sweep_policy
    monkeypatch.delenv("PTS_MXU_SWEEP", raising=False)
    monkeypatch.delenv("PTS_ROW_CULL", raising=False)
    monkeypatch.delenv("PTS_SWEEP_SPAN", raising=False)
    assert sweep_policy("hier", on_tpu=True) == ("bf16x3", True, 4)
    assert sweep_policy("shortlist", on_tpu=True) == ("bf16x3", True, 4)
    assert sweep_policy("worklist", on_tpu=True) == ("bf16x3", True, 4)
    # off-TPU (CPU tests / interpret): keep the bit-identical VPU sweep
    assert sweep_policy("hier", on_tpu=False) == (None, False, 1)
    # non-hierarchical backends never take the MXU sweep
    assert sweep_policy("dense_pallas", on_tpu=True) == (None, False, 1)
    assert sweep_policy("cluster", on_tpu=True) == (None, False, 1)
    # size-aware row culling + span: below the 32k-tri thresholds the
    # per-row slab tests are pure overhead (measured -35% at 2.2k tris)
    # and the span union gate is a wash, so small scenes keep the MXU
    # sweep but drop both
    from pathtracing_spectrum_tpu.engine import ROW_CULL_MIN_TRIS
    assert sweep_policy("hier", on_tpu=True,
                        n_tris=ROW_CULL_MIN_TRIS - 1) == ("f32x6", False, 1)
    assert sweep_policy("hier", on_tpu=True,
                        n_tris=ROW_CULL_MIN_TRIS) == ("bf16x3", True, 4)
    # set-but-empty PTS_MXU_SWEEP forces the VPU sweep even on TPU
    monkeypatch.setenv("PTS_MXU_SWEEP", "")
    monkeypatch.setattr(isl, "_MXU_SWEEP", None)
    assert sweep_policy("hier", on_tpu=True) == (None, False, 1)
    # explicit scheme override rides through
    monkeypatch.setenv("PTS_MXU_SWEEP", "f32x6")
    monkeypatch.setattr(isl, "_MXU_SWEEP", "f32x6")
    assert sweep_policy("hier", on_tpu=True) == ("f32x6", True, 4)


    # PTS_ROW_CULL=0 disables row culling under the MXU default
    monkeypatch.delenv("PTS_MXU_SWEEP", raising=False)
    monkeypatch.setenv("PTS_ROW_CULL", "0")
    monkeypatch.setattr(isl, "_ROW_CULL", False)
    assert sweep_policy("hier", on_tpu=True) == ("bf16x3", False, 4)
    # ...and PTS_ROW_CULL=1 turns it on even under the VPU sweep or
    # below the size threshold
    monkeypatch.setenv("PTS_ROW_CULL", "1")
    monkeypatch.setattr(isl, "_ROW_CULL", True)
    assert sweep_policy("hier", on_tpu=False) == (None, True, 1)
    assert sweep_policy("hier", on_tpu=True, n_tris=100) == ("f32x6", True, 1)
    # PTS_SWEEP_SPAN overrides the size gate in both directions
    monkeypatch.delenv("PTS_ROW_CULL", raising=False)
    monkeypatch.setenv("PTS_SWEEP_SPAN", "2")
    monkeypatch.setattr(isl, "_SWEEP_SPAN", 2)
    assert sweep_policy("hier", on_tpu=True, n_tris=100)[2] == 2
    monkeypatch.setenv("PTS_SWEEP_SPAN", "1")
    monkeypatch.setattr(isl, "_SWEEP_SPAN", 1)
    assert sweep_policy("hier", on_tpu=True)[2] == 1


def test_reorder_from_policy():
    """Size-aware reorder_from default (measured table at
    engine.REORDER_FROM_TINY_TRIS): tiny scenes sort only the LAST
    iteration, small ones skip the first sort, large ones skip none."""
    from pathtracing_spectrum_tpu.engine import (REORDER_FROM_SMALL_TRIS,
                                                 REORDER_FROM_TINY_TRIS,
                                                 reorder_from_policy)
    assert reorder_from_policy(2244, max_depth=3) == 5
    assert reorder_from_policy(REORDER_FROM_TINY_TRIS - 1, 3) == 5
    assert reorder_from_policy(REORDER_FROM_TINY_TRIS - 1, 5) == 9
    # depth-1 sorts its single looped iteration (unclamped 2*1-1; the
    # old max(2, ...) floor silently turned depth-1 into never-sort)
    assert reorder_from_policy(REORDER_FROM_TINY_TRIS - 1, 1) == 1
    assert reorder_from_policy(REORDER_FROM_TINY_TRIS) == 2
    assert reorder_from_policy(REORDER_FROM_SMALL_TRIS - 1) == 2
    assert reorder_from_policy(REORDER_FROM_SMALL_TRIS) == 1
    assert reorder_from_policy(246000) == 1


def test_resolve_row_cull_env_sentinel(monkeypatch):
    assert isl.resolve_row_cull(True) is True
    assert isl.resolve_row_cull(False) is False
    monkeypatch.setattr(isl, "_ROW_CULL", True)
    assert isl.resolve_row_cull("env") is True
    monkeypatch.setattr(isl, "_ROW_CULL", False)
    assert isl.resolve_row_cull("env") is False


@pytest.mark.slow
@pytest.mark.parametrize("kc", [16, 32])
def test_group_size_kc_matches_bruteforce(kc):
    """PTS_KC (clusters per group — the DMA/grid-step unit) is
    exact-match for any value: group partitioning only changes the
    front-to-back walk order, and the explicit lowest-index tie rule
    keeps hit/idx selection identical (same argument as the span knob).
    Pins the KC=16/32 variants the large-scene grid-overhead experiment
    uses against brute force."""
    geo, tri16, caabb = _soup(3000, seed=12)
    v1, e1, e2, fn, k1, k2, k3, consts = geo
    ro, rd = _rays(2048, seed=13)
    h0, t0, i0, _, _ = intersect_bruteforce(
        jnp.asarray(ro), jnp.asarray(rd), jnp.asarray(fn), jnp.asarray(k1),
        jnp.asarray(k2), jnp.asarray(k3), jnp.asarray(consts))
    old_kc, old_gt = isl.KC, isl.GROUP_T
    try:
        isl.KC, isl.GROUP_T = kc, kc * isl.CLUSTER
        jax.clear_caches()
        h1, t1, i1, _, _ = isl.intersect_shortlist_pallas_soa(
            *(jnp.asarray(ro[:, k]) for k in range(3)),
            *(jnp.asarray(rd[:, k]) for k in range(3)),
            tri16, caabb, interpret=True)
    finally:
        isl.KC, isl.GROUP_T = old_kc, old_gt
        jax.clear_caches()
    h0, h1 = np.asarray(h0), np.asarray(h1)
    np.testing.assert_array_equal(h0, h1)
    m = h0
    np.testing.assert_allclose(np.asarray(t0)[m], np.asarray(t1)[m],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i0)[m], np.asarray(i1)[m])
