"""Pooled-worklist kernel (ops/intersect_worklist.py) on the CPU
interpreter: selection must match the brute-force sweep exactly, on both
the worklist path and the budget-overflow fallback path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pathtracing_spectrum_tpu.ops.intersect import intersect_bruteforce
import pathtracing_spectrum_tpu.ops.intersect_worklist as iwl

from test_shortlist_kernel import _rays, _soup


def _check_equal(geo, tri16, caabb, ro, rd, bpb, rtol=1e-4, mxu="env",
                 row_cull="env", span="env", sel_gate="env"):
    v1, e1, e2, fn, k1, k2, k3, consts = geo
    h0, t0, i0, _, _ = intersect_bruteforce(
        jnp.asarray(ro), jnp.asarray(rd), jnp.asarray(fn), jnp.asarray(k1),
        jnp.asarray(k2), jnp.asarray(k3), jnp.asarray(consts))
    h1, t1, i1, s2, s3 = iwl.intersect_worklist_pallas_soa(
        *(jnp.asarray(ro[:, k]) for k in range(3)),
        *(jnp.asarray(rd[:, k]) for k in range(3)),
        tri16, caabb, interpret=True, bpb=bpb, mxu=mxu,
        row_cull=row_cull, span=span, sel_gate=sel_gate)
    h0, h1 = np.asarray(h0), np.asarray(h1)
    np.testing.assert_array_equal(h0, h1)
    m = h0
    np.testing.assert_allclose(np.asarray(t0)[m], np.asarray(t1)[m],
                               rtol=rtol, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i0)[m], np.asarray(i1)[m])


@pytest.mark.slow
@pytest.mark.parametrize("T,N", [(300, 1024), (3000, 4096), (1100, 2048)])
def test_worklist_matches_bruteforce(T, N):
    geo, tri16, caabb = _soup(T)
    _check_equal(geo, tri16, caabb, *_rays(N), bpb=iwl.BUDGET_PER_BLOCK)


@pytest.mark.slow
@pytest.mark.parametrize("scheme", ["bf16x3", "f32x6"])
def test_worklist_mxu_sweep_matches_bruteforce(scheme):
    """The MXU sweep knob must hold selection-identical through the
    worklist kernel too (same tolerance story as the shortlist knob
    test: deterministic seeds, no hit flips within the scheme's
    documented deviation)."""
    geo, tri16, caabb = _soup(700, seed=8)
    ro, rd = _rays(1024, seed=9)
    _check_equal(geo, tri16, caabb, ro, rd,
                 bpb=iwl.BUDGET_PER_BLOCK,
                 rtol=1e-3 if scheme == "bf16x3" else 1e-4,
                 mxu=scheme)


@pytest.mark.slow
@pytest.mark.parametrize("row_cull,span", [
    (True, 1), (False, 2), (False, 4), (True, 4), (False, 8)])
def test_worklist_knobs_match_bruteforce(row_cull, span):
    """row_cull and span are exact-match in the worklist kernel too
    (same argument as the shortlist knobs: row culling only skips rows
    whose slab gate is all-false, span unions adjacent slab gates and
    extra candidates past a lane's bound can never win the compare)."""
    geo, tri16, caabb = _soup(1100, seed=5)
    ro, rd = _rays(2048, seed=6)
    _check_equal(geo, tri16, caabb, ro, rd, bpb=iwl.BUDGET_PER_BLOCK,
                 mxu=None, row_cull=row_cull, span=span)


@pytest.mark.slow
def test_worklist_mxu_knob_stack_matches_bruteforce():
    """The production large-scene stack (f32x6 + row_cull + span=4)
    composed through the worklist kernel."""
    geo, tri16, caabb = _soup(2300, seed=15)
    ro, rd = _rays(1024, seed=16)
    _check_equal(geo, tri16, caabb, ro, rd, bpb=iwl.BUDGET_PER_BLOCK,
                 mxu="f32x6", row_cull=True, span=4)


def test_resolve_bpb_policy():
    """Size-aware pooled-budget default (~G/4, clamped to [16, 256] and
    the SMEM budget across NB blocks — measured table at
    BUDGET_PER_BLOCK: undersizing falls back to the (NB, G) grid's dead
    steps, oversizing pays ~1 µs per inactive pool entry)."""
    assert iwl.resolve_bpb(7, 1000, 128) == 7          # explicit wins
    assert iwl.resolve_bpb(0, 1020, 128) == 255        # 1M terrain
    assert iwl.resolve_bpb(0, 241, 128) == 60          # 246k terrain
    assert iwl.resolve_bpb(0, 51, 128) == 16           # floor
    assert iwl.resolve_bpb(0, 8160, 128) == 256        # cap
    assert iwl.resolve_bpb(0, 1020, 4096) == 16        # SMEM clamp


@pytest.mark.slow
def test_worklist_sel_gate_matches_bruteforce():
    """sel_gate composed with the full production stack through the
    worklist kernel (bitwise identity to the ungated kernel is pinned
    in test_shortlist_kernel; here the stacked result must still equal
    brute force)."""
    geo, tri16, caabb = _soup(2300, seed=15)
    ro, rd = _rays(1024, seed=16)
    _check_equal(geo, tri16, caabb, ro, rd, bpb=iwl.BUDGET_PER_BLOCK,
                 mxu="f32x6", row_cull=True, span=4, sel_gate=True)


@pytest.mark.slow
def test_worklist_overflow_falls_back_identically():
    """bpb=1 forces the pooled budget under the real shortlist total, so
    the lax.cond fallback (round-2 kernel) must produce the result."""
    geo, tri16, caabb = _soup(5200, seed=9)
    ro, rd = _rays(2048, seed=10, park_frac=0.0)  # all live -> long lists
    _check_equal(geo, tri16, caabb, ro, rd, bpb=1)


@pytest.mark.slow
def test_worklist_partial_budget_stays_exact():
    """A mid-size pool where SOME blocks exceed bpb individually but the
    pooled total fits — per-block overflow must not lose groups."""
    geo, tri16, caabb = _soup(4100, seed=12)
    ro, rd = _rays(3072, seed=13, park_frac=0.5)
    _check_equal(geo, tri16, caabb, ro, rd, bpb=3)


@pytest.mark.slow
def test_engine_worklist_backend_matches_dense():
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
    b = trace_radiance(scene, ro, rd, key, 3, backend="worklist",
                       rand_override=rand)
    np.testing.assert_allclose(np.asarray(a.radiance),
                               np.asarray(b.radiance), rtol=2e-4, atol=1e-6)


@pytest.mark.slow
def test_engine_hier_backend_matches_dense():
    """'hier' (the TPU auto choice) resolves shortlist-vs-worklist by the
    SMEM-budget regime at trace time; either way it must match dense."""
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
    b = trace_radiance(scene, ro, rd, key, 3, backend="hier",
                       rand_override=rand)
    np.testing.assert_allclose(np.asarray(a.radiance),
                               np.asarray(b.radiance), rtol=2e-4, atol=1e-6)
