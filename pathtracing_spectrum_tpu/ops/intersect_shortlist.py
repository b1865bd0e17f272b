"""Work-proportional two-level intersection kernel (large-scene TPU path).

Round-1's cluster kernel streamed EVERY triangle group through VMEM for
every ray block (O(T) DMA per block) and culled only compute. This version
makes both DMA and compute proportional to the work that survives a
hierarchy, the TPU-native analog of the reference's log-time ``BVHNode::Hit``
(mesh.cpp:239-280):

1. **Shortlist stage (plain XLA)**: rays are viewed as blocks of
   ``RB*128 = 1024``; per block, conservative *interval-arithmetic* slab
   tests of the block's (origin, direction) bounds against each
   1024-triangle group AABB yield a per-block shortlist of groups, sorted
   front-to-back by the group's entry-``t`` lower bound. Groups the whole
   block provably misses never reach the kernel. All [n_blocks, G] shapes —
   a few hundred KB of elementwise work, no big intermediates.
2. **Pallas stage (grid = ray blocks)**: the triangle table stays in
   **HBM**; a dynamic ``while_loop`` walks the shortlist with
   double-buffered ``make_async_copy`` (group ``g+1`` streams in while
   group ``g`` is tested), per-cluster (128-tri) AABB culling bounded by the
   *current* best-``t`` inside each group, and early exit once the next
   group's entry bound exceeds the worst live best-``t`` in the block.

The triangle predicate itself is identical to the dense sweep
(reference mesh.cpp:283-295 in the matmul-free K-vector form), so hit
selection is bit-identical to ops/intersect_pallas.py given the same
front-to-back triangle order (ties: lower BVH-order index wins, which
front-to-back group order preserves because group index == index range).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect_pallas import BIG, CLUSTER, _LANES, _slab_block

# Ray rows per kernel block (block = _RB x 128 rays). 8 is the f32 tile
# height (the floor Mosaic can address); PTS_RB (fresh process) trades
# looser per-block shortlist bounds against fewer grid steps and, under
# the MXU sweep, amortizing each cluster's lhs operand split over more
# row matmuls. Exact-match for any value (hit selection is per-ray;
# pinned by the knob equivalence test). 16 is the measured production
# default under the f32x6 MXU sweep (v5e 2026-08-19, in-context A/B,
# spp/s RB=8 -> 16): textured 1080p 2.98 -> 3.24, terrain 52k
# 7.71 -> 7.73, 246k 2.96 -> 3.08, 1M 0.82 -> 0.88; RB=32 regresses
# (1080p 2.78 — per-block shortlist bounds get too loose).
_RB = int(os.environ.get("PTS_RB", "16"))
if _RB < 8 or (_RB & (_RB - 1)) or _RB > 256:
    raise ValueError(f"PTS_RB={_RB}: expected a power of two in [8, 256]")
# Clusters per group — the DMA/grid-step unit. The kernel grid's second
# dim is n_groups = ceil(T / (KC*CLUSTER)); steps past a block's
# shortlist still pay ~1 µs of grid bookkeeping each (measured on the 1M
# pooled-budget sweep), so at 246k the (128 x 241) grid carries ~20+ ms
# of skipped-step overhead per call. PTS_KC=16 (fresh process) halves
# the grid at the price of coarser group AABBs in stage 1 (looser
# shortlists; per-cluster culling inside the kernel is unchanged) and
# 2x DMA per active step. Exact-match for any value — group partitioning
# only changes the walk order, and the front-to-back tie rule keeps
# selection identical (same argument as the span knob).
KC = int(os.environ.get("PTS_KC", "8"))
if KC < 8 or (KC & (KC - 1)) or KC > 64:
    raise ValueError(f"PTS_KC={KC}: expected a power of two in [8, 64]")
GROUP_T = KC * CLUSTER      # triangles per group (DMA unit, 64 KiB @ KC=8)

# SMEM budget for EACH prefetch array (order/tnear are [n_blocks x G] i32).
# When a (resolution, triangle-count) pair exceeds it, shortlists are built
# per SUPER-block of 2^k kernel blocks instead (looser bounds, same kernel-
# side per-cluster/per-row culling), keeping SMEM bounded at any scale.
_SMEM_SHORTLIST_BYTES = 256 * 1024

# Tuning knobs (trace-time; benchmark sweeps patch these per process, or
# set PTS_EARLY_EXIT=1 / PTS_ROW_CULL=1 to flip a fresh process without
# repo edits — both schemes are exact-match, pinned by the knob tests).
# Front-to-back group early exit on best-t: exact-match correct but measured
# a small NET LOSS on v5e (52k terrain 3.93 vs 4.15 spp/s; 1080p 1.586 vs
# 1.605) — the per-step scalar reduce + SMEM compare costs more than the
# skipped groups save once the shortlist is already short. Off by default.
_EARLY_EXIT = os.environ.get("PTS_EARLY_EXIT") == "1"
# Per-row (128-ray) cluster culling: exact-match correct; its value
# depends on the sweep backend. Under the VPU sweep it is a NET LOSS on
# v5e (1080p textured: 0.94 vs 1.61 spp/s; 52k terrain: 3.88 vs 4.15 —
# the 8 extra pl.when branches per cluster stall the unrolled vector
# pipeline for longer than the skipped sweeps take), but under the
# K-fused MXU sweep a culled row skips an ENTIRE [CLUSTER,96]x[96,128]
# matmul and it flips to a WIN (80.2 vs 89.4 ms/call at 246k tris,
# v5e 2026-08-18 — docs/tpu_cost_model.md). Selected per call via the
# kernel's static ``row_cull=`` argument; the engine's policy
# (engine.sweep_policy) turns it on exactly when the MXU sweep is on.
# PTS_ROW_CULL overrides per process (the "env" sentinel reads it).
_ROW_CULL = os.environ.get("PTS_ROW_CULL") == "1"


def resolve_row_cull(row_cull):
    """Resolve a kernel ``row_cull=`` argument: the "env" sentinel defers
    to PTS_ROW_CULL (module flag, so tests can patch it)."""
    if row_cull == "env":
        return _ROW_CULL
    return bool(row_cull)


# Row-fused sweep: treat the whole kernel block as ONE [1, RB*128] ray
# row, so each cluster costs a single [CLUSTER, K'] x [K', 8*RB*128]
# matmul (and one wide VPU epilogue) instead of RB separate 1024-column
# matmuls with [1, 128]-granular reductions between them. Per-ray
# arithmetic is identical (each output element is the same dot product
# over the same K' column, lanes are independent), so hit/t/idx are
# exact-match with the unfused kernel per scheme — pinned by the knob
# equivalence tests. Mutually exclusive with row_cull (there are no
# rows left to cull; the block-level pl.when still stands).
# MEASURED LOSS on v5e (textured 1080p / 2.2k tris intersect chain:
# 43.4 vs 36.3 ms/call unfused): every [1, RB*128] epilogue value
# occupies 8x the vregs of packed [RB, 128] rows (one sublane of
# eight), so the ~12 best-update ops pay 8x the VPU slots — more than
# the saved matmul issues. Kept off-default as measurement gear; the
# same probe showed the kernel is VPU/branch-bound at small T (bf16
# 35.4 vs f32x6 36.3: 6x less MXU work bought 2.5%).
_ROW_FUSE = os.environ.get("PTS_ROW_FUSE") == "1"


def resolve_row_fuse(fuse_rows):
    """Resolve a kernel ``fuse_rows=`` argument: the "env" sentinel
    defers to PTS_ROW_FUSE (module flag, so tests can patch it)."""
    if fuse_rows == "env":
        return _ROW_FUSE
    return bool(fuse_rows)


# Clusters swept per kernel step (see intersect_shortlist_pallas_soa's
# ``span`` arg): span s replaces s per-cluster matmul+epilogue rounds
# with ONE [s*64, K'] matmul and ONE epilogue, gated on the span's slab
# UNION — exact-match (extra candidates beyond a lane's bound can never
# win the best-t compare). SIZE-DEPENDENT (v5e 2026-08-19, in-context
# A/B, spp/s at span 1/2/4/8): a wash at small scenes whose blocks
# sweep ~2-3 shortlisted clusters (textured 1080p 3.36/3.38, terrain
# 10k 14.40/14.23 — the union gate mostly ADDS triangles per-cluster
# slabs would have skipped) but a big WIN where shortlists are long:
# terrain 52k 7.78/8.61/8.86, 246k 3.08/3.61/3.74/3.60 — the saved
# epilogues dominate. Production default: engine.sweep_policy selects
# span=4 at >= 32k tris on real TPU; PTS_SWEEP_SPAN overrides.
_SWEEP_SPAN = int(os.environ.get("PTS_SWEEP_SPAN", "1"))


def resolve_span(span):
    """Resolve a kernel ``span=`` argument: the "env" sentinel defers
    to PTS_SWEEP_SPAN (module flag, so tests can patch it)."""
    if span == "env":
        span = _SWEEP_SPAN
    span = int(span)
    if span not in (1, 2, 4, 8):
        raise ValueError(f"span={span}: expected 1, 2, 4 or 8")
    return span


# Selection-gate knob (PTS_SEL_GATE=1): per (row, span-step), run the
# winner SELECTION half of the epilogue (arg-min lane iota reduce, the
# two one-hot s2/s3 select reduces, the four best-ref updates) under
# ``pl.when(any((tmin <= cur_t) & (tmin < BIG)))``. The gate is a
# superset of ``better`` (better requires tmin <= cur_t and tmin < BIG
# in both its < and tie branches), so skipped steps could never have
# updated any ref — exact-match by construction, pinned by the knob
# equivalence tests. On a front-to-back walk most swept steps improve
# no lane (the first hit ends improvement for the whole row), so this
# trades one cheap [1, LANES] compare + scalar branch for 3 of the 4
# [span_t, LANES] reduces.
_SEL_GATE = os.environ.get("PTS_SEL_GATE") == "1"


def resolve_sel_gate(sel_gate):
    """Resolve a kernel ``sel_gate=`` argument: the "env" sentinel
    defers to PTS_SEL_GATE (module flag, so tests can patch it)."""
    if sel_gate == "env":
        return _SEL_GATE
    return bool(sel_gate)
# MXU sweep: compute ALL 8 ray.K dot-product families of the triangle
# predicate as ONE [CLUSTER, 16] x [16, 8*LANES] matmul per (row,
# cluster) — the VPU sweep (~40 broadcast ops) is the measured wall on
# bounce rays: 113 ms/call at 246k tris (docs/tpu_cost_model.md). The
# lhs is the UNMODIFIED tri16 block (triangle K-vectors + constants in
# its 16 columns); the rhs packs 8 column groups of 128 rays each —
# (n.ro-c0 | n.rd | k1.ro-c1 | k1.rd | k2.ro-c2 | k2.rd | k3.ro-c3 |
# k3.rd) — built ONCE per ray block into VMEM scratch at grid step
# j == 0, with the c-columns folded in via -1 coefficient rows. Output
# slices are lane-aligned at 128, so the per-row reduction code is
# shared with the VPU path unchanged. Schemes (manual bf16 operand
# splits, summed smallest-first in f32; round-3's 8-tiny-matmul
# variants measured DEFAULT 73.5 ms / broken geometry, HIGHEST 629 ms):
#   "bf16"   — 1 pass: speed ceiling; ~2^-9 relative error (unusable
#              for geometry, kept for measurement).
#   "bf16x3" — 3 passes from 2-way splits: ~2^-18 relative error.
#   "f32x6"  — 6 passes from 3-way splits: <=f32-ulp-level deviation
#              (same decomposition XLA uses for Precision.HIGHEST).
# NO scheme is bit-identical to the VPU path (sequential-rounding
# order differs; the earlier "checksum-identical" HIGHEST claim was a
# 3-significant-digit checksum), so the knob stays OFF by default and
# the default path keeps dense-sweep bit-equivalence. Select per call
# via the kernels' static ``mxu=`` argument, or per process with
# PTS_MXU_SWEEP=bf16x3|f32x6 (the ``mxu="env"`` default reads it).
_MXU_SCHEMES = (None, "bf16", "bf16x3", "f32x6")
_MXU_SWEEP = os.environ.get("PTS_MXU_SWEEP") or None
if _MXU_SWEEP not in _MXU_SCHEMES:
    raise ValueError(f"PTS_MXU_SWEEP={_MXU_SWEEP!r}: "
                     "expected bf16, bf16x3 or f32x6")
# K-fused multi-pass schemes (default ON): the MXU is a 128x128 systolic
# array, so a K=16 contraction leaves 7/8 of it idle — the bf16x3/f32x6
# passes concatenate their operand splits along K instead (K=48/96, both
# <=128) and issue ONE dot_general per (row, cluster). Same products,
# same f32 accumulation, ~pass-count-fold fewer MXU invocations; the
# only numerical difference is summation order (the schemes are already
# not bit-identical to the VPU path, and the per-scheme error bounds are
# order-independent — pinned by the scale tests). PTS_MXU_FUSEK=0 falls
# back to the separate-pass form in case Mosaic rejects the wider K.
_MXU_FUSE_K = os.environ.get("PTS_MXU_FUSEK", "1") != "0"
# contraction width per scheme in the fused form
_MXU_K = {"bf16": 16, "bf16x3": 48, "f32x6": 96}


def resolve_mxu(mxu):
    """Resolve a kernel ``mxu=`` argument: the "env" sentinel defers to
    PTS_MXU_SWEEP (module default), anything else must be a scheme."""
    if mxu == "env":
        return _MXU_SWEEP
    if mxu not in _MXU_SCHEMES:
        raise ValueError(f"mxu={mxu!r}: expected None, 'env', "
                         "'bf16', 'bf16x3' or 'f32x6'")
    return mxu


# ---------------------------------------------------------------------------
# MXU sweep helpers — shared by the shortlist and worklist kernels.
# ---------------------------------------------------------------------------

def mxu_num_scratch(mxu) -> int:
    """Number of VMEM rhs scratch buffers the scheme needs (kernels use
    it to split their trailing scratch refs off the positional args)."""
    if not mxu:
        return 0
    return 1 if _MXU_FUSE_K else 3


def mxu_scratch_shapes(rows: int, mxu, lanes: int = _LANES):
    """VMEM rhs buffers: K-fused — ONE [rows*K', 8*lanes] buffer holding
    each row's pre-concatenated split stack (K' = 16/48/96); separate-
    pass fallback — bf16 hi/mid/lo chunk buffers. ``lanes`` is the ray
    row width: 128 normally, RB*128 under the row-fused sweep."""
    if _MXU_FUSE_K:
        return [pltpu.VMEM((rows * _MXU_K[mxu], 8 * lanes), jnp.bfloat16)]
    return [pltpu.VMEM((rows * 16, 8 * lanes), jnp.bfloat16)] * 3


def _mxu_build_rhs(row_plane, rows, rhs_refs, mxu):
    """Build the per-row matmul rhs once per ray block (reused across
    every streamed group): rhs row k carries the coefficient that
    multiplies tri16 column k, so out = tri16_cluster @ rhs yields the
    8 lane-aligned column groups (n.ro-c0 | n.rd | k1.ro-c1 | k1.rd |
    ...). Split into bf16 chunks (hi = the 1-pass operand, hi+mid =
    2-way split, all three = the exact 3-way split of f32); the K-fused
    layout stacks each row's scheme-ordered chunks contiguously so the
    sweep issues one [CLUSTER, K'] @ [K', 8*lanes] matmul per row.
    ``row_plane(k, r)`` yields ray plane k of row r as [1, lanes]
    (lanes = the ray row width: 128, or RB*128 when rows are fused)."""
    lanes = row_plane(0, 0).shape[-1]
    z = jnp.zeros((1, lanes), jnp.float32)
    m1 = -jnp.ones((1, lanes), jnp.float32)
    for r in range(rows):
        ro3 = [row_plane(k, r) for k in range(3)]
        rd3 = [row_plane(k + 3, r) for k in range(3)]
        rows16 = []
        for sec in range(4):            # n, k1, k2, k3
            for comp in range(3):
                pieces = [z] * 8
                pieces[2 * sec] = ro3[comp]
                pieces[2 * sec + 1] = rd3[comp]
                rows16.append(jnp.concatenate(pieces, axis=1))
        for sec in range(4):            # c0..c3 coefficients
            pieces = [z] * 8
            pieces[2 * sec] = m1
            rows16.append(jnp.concatenate(pieces, axis=1))
        rhs = jnp.concatenate(rows16, axis=0)
        hi = rhs.astype(jnp.bfloat16)
        r1 = rhs - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        if not _MXU_FUSE_K:
            lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
            rhs_hi_ref, rhs_mid_ref, rhs_lo_ref = rhs_refs
            rhs_hi_ref[r * 16:(r + 1) * 16, :] = hi
            rhs_mid_ref[r * 16:(r + 1) * 16, :] = mid
            rhs_lo_ref[r * 16:(r + 1) * 16, :] = lo
            continue
        (rhs_ref,) = rhs_refs
        kp = _MXU_K[mxu]
        # stack order pairs with _mxu_lhs_chunks' lhs concatenation
        if mxu == "bf16":
            stack = [hi]
        elif mxu == "bf16x3":
            stack = [mid, hi, hi]               # vs [l_hi | l_mid | l_hi]
        else:   # "f32x6"
            lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
            stack = [lo, mid, hi, mid, hi, hi]  # vs [hi|mid|lo|hi|mid|hi]
        rhs_ref[r * kp:(r + 1) * kp, :] = jnp.concatenate(stack, axis=0)


def _mxu_lhs_chunks(tri_ref, base, mxu, span_t=CLUSTER):
    """bf16 split of the [span_t, 16] tri16 block slice, hoisted out of
    the row loop (one split per cluster span): K-fused — the scheme's
    chunk sequence concatenated along K; fallback — the (hi, mid, lo)
    triple."""
    trif = tri_ref[base:base + span_t, :]
    l_hi = trif.astype(jnp.bfloat16)
    t1 = trif - l_hi.astype(jnp.float32)
    l_mid = t1.astype(jnp.bfloat16)
    if not _MXU_FUSE_K:
        l_lo = (t1 - l_mid.astype(jnp.float32)).astype(jnp.bfloat16)
        return l_hi, l_mid, l_lo
    if mxu == "bf16":
        return l_hi
    if mxu == "bf16x3":
        return jnp.concatenate([l_hi, l_mid, l_hi], axis=1)
    l_lo = (t1 - l_mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([l_hi, l_mid, l_lo, l_hi, l_mid, l_hi], axis=1)


def _mxu_sweep_row(lhs, rhs_refs, r, mxu):
    """The triangle predicate terms (denom, t, s1, s2, s3) for ray row
    r, each [CLUSTER, lanes], from native bf16xbf16->f32 MXU matmuls
    (DEFAULT precision). K-fused: ONE [CLUSTER, K'] @ [K', 8*lanes]
    dot_general — all split products accumulate in the MXU's f32
    accumulator. Fallback: one [CLUSTER, 16] @ [16, 8*lanes] pass per
    split pair, summed smallest-magnitude first. The row width is read
    off the rhs buffer (128 normally, RB*128 when rows are fused)."""
    L = rhs_refs[0].shape[-1] // 8

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    if _MXU_FUSE_K:
        (rhs_ref,) = rhs_refs
        kp = _MXU_K[mxu]
        out = mm(lhs, rhs_ref[r * kp:(r + 1) * kp, :])
    else:
        l_hi, l_mid, l_lo = lhs
        rhs_hi_ref, rhs_mid_ref, rhs_lo_ref = rhs_refs
        sl16 = slice(r * 16, (r + 1) * 16)
        rhi = rhs_hi_ref[sl16, :]
        if mxu == "bf16":
            out = mm(l_hi, rhi)
        elif mxu == "bf16x3":
            rmid = rhs_mid_ref[sl16, :]
            out = mm(l_hi, rmid) + mm(l_mid, rhi) + mm(l_hi, rhi)
        else:   # "f32x6"
            rmid = rhs_mid_ref[sl16, :]
            rlo = rhs_lo_ref[sl16, :]
            out = ((mm(l_hi, rlo) + mm(l_mid, rmid) + mm(l_lo, rhi))
                   + (mm(l_hi, rmid) + mm(l_mid, rhi)) + mm(l_hi, rhi))
    denom = out[:, 1 * L:2 * L]
    safe = jnp.where(denom == 0.0, 1.0, denom)
    # group 0 is n.ro - c0, so t = -(group0)/denom
    t = -out[:, 0:L] / safe
    s1 = out[:, 2 * L:3 * L] + t * out[:, 3 * L:4 * L]
    s2 = out[:, 4 * L:5 * L] + t * out[:, 5 * L:6 * L]
    s3 = out[:, 6 * L:7 * L] + t * out[:, 7 * L:8 * L]
    return denom, t, s1, s2, s3


# ---------------------------------------------------------------------------
# Stage 1: per-block group shortlists via interval arithmetic (plain XLA).
# ---------------------------------------------------------------------------

def root_bounds(cluster_aabbs):
    """Scene root AABB (lo3, hi3) over the VALID cluster boxes (padded
    clusters carry inverted never-hit boxes, excluded here)."""
    cvalid = (cluster_aabbs[:, 0] <= cluster_aabbs[:, 3])[:, None]
    lo = jnp.min(jnp.where(cvalid, cluster_aabbs[:, 0:3], jnp.inf), axis=0)
    hi = jnp.max(jnp.where(cvalid, cluster_aabbs[:, 3:6], -jnp.inf), axis=0)
    return lo, hi


def rays_with_exit_caps(rox, roy, roz, rdx, rdy, rdz, cluster_aabbs):
    """The 7 ray component planes both hierarchical kernels consume:
    (ro xyz, rd xyz, root-box slab-exit cap) — the cap construction is
    a shared correctness-sensitive invariant (margin semantics, parked
    rays), so it lives in exactly one place."""
    lo, hi = root_bounds(cluster_aabbs)
    cap = ray_exit_caps(rox, roy, roz, rdx, rdy, rdz, lo, hi)
    return (rox, roy, roz, rdx, rdy, rdz, cap)


def ray_exit_caps(rox, roy, roz, rdx, rdy, rdz, lo, hi,
                  margin: float = 1e-4):
    """Per-ray sweep cap: the slab EXIT t of the scene's root AABB.

    Every triangle lies inside the root box, so any true hit satisfies
    ``t_hit <= t_exit(root)`` — a ray that leaves the box quickly (sky
    rays: the majority of live lanes at later bounces) can bound its
    cluster culling by that exit instead of the running best-t, which
    for miss rays never tightens at all. Measured on the v5e this is
    the difference between sweeping ~half the scene for every sky ray
    and sweeping almost nothing. ``margin`` absorbs the few-ulp
    difference between slab and triangle-plane arithmetic so hit
    selection stays exact (equivalence pinned by the dense-vs-shortlist
    tests). Rays that miss the box (or are parked) get cap ~0."""
    def axis(o, d, l, h_):
        inv = 1.0 / jnp.where(d == 0.0, 1.0, d)
        t0 = (l - o) * inv
        t1 = (h_ - o) * inv
        near = jnp.minimum(t0, t1)
        far = jnp.maximum(t0, t1)
        inside = (o >= l) & (o <= h_)
        zero = d == 0.0
        near = jnp.where(zero, jnp.where(inside, -BIG, BIG), near)
        far = jnp.where(zero, jnp.where(inside, BIG, -BIG), far)
        return near, far
    nx, fx = axis(rox, rdx, lo[0], hi[0])
    ny, fy = axis(roy, rdy, lo[1], hi[1])
    nz, fz = axis(roz, rdz, lo[2], hi[2])
    t_near = jnp.maximum(jnp.maximum(nx, ny), nz)
    t_far = jnp.minimum(jnp.minimum(fx, fy), fz)
    hit_box = (t_near <= t_far) & (t_far >= 0.0)
    cap = jnp.where(hit_box, t_far, 0.0)
    return cap * (1.0 + margin) + margin


def tighten_caps(cap, t_ub, margin: float = 1e-4):
    """Fold a per-ray hit-t upper bound into the sweep-cap plane.

    ``t_ub`` must satisfy ``t_ub >= t_true`` for every ray (e.g. the
    closest-hit t against any SUBSET of the scene's triangles — a
    subset hit is a real hit, so its t bounds the true closest t from
    above; misses contribute BIG). The margin absorbs the few-ulp
    difference between the kernels' slab culling arithmetic and the
    triangle-plane t the bound came from — the same invariant as
    :func:`ray_exit_caps`, so hit selection stays exact."""
    return jnp.minimum(cap, t_ub * (1.0 + margin) + margin)


def _interval_quotient(nlo, nhi, dlo, dhi):
    """Interval [nlo,nhi] / [dlo,dhi] for sign-constant denominators."""
    a, b = nlo / dlo, nlo / dhi
    c, d = nhi / dlo, nhi / dhi
    return (jnp.minimum(jnp.minimum(a, b), jnp.minimum(c, d)),
            jnp.maximum(jnp.maximum(a, b), jnp.maximum(c, d)))


def _axis_interval(glo, ghi, olo, ohi, dlo, dhi):
    """Per-axis slab-crossing t interval: lower bound of the entry t and
    upper bound of the exit t over ALL (origin, direction) in the block's
    bounds. A direction interval touching 0 yields no constraint."""
    spans0 = (dlo <= 0.0) & (dhi >= 0.0)
    sd_lo = jnp.where(spans0, 1.0, dlo)
    sd_hi = jnp.where(spans0, 1.0, dhi)
    q0lo, q0hi = _interval_quotient(glo - ohi, glo - olo, sd_lo, sd_hi)
    q1lo, q1hi = _interval_quotient(ghi - ohi, ghi - olo, sd_lo, sd_hi)
    enter_lb = jnp.minimum(q0lo, q1lo)
    exit_ub = jnp.maximum(q0hi, q1hi)
    return (jnp.where(spans0, -BIG, enter_lb),
            jnp.where(spans0, BIG, exit_ub))


def group_aabbs_from_clusters(cluster_aabbs, n_groups: int, kc: int = KC):
    """[G, 6] group AABBs = union of each group's kc cluster boxes
    (padding clusters carry inverted boxes and are skipped)."""
    grouped = cluster_aabbs.reshape(n_groups, kc, 8)
    valid = grouped[:, :, 0:3] <= grouped[:, :, 3:6]
    gmin = jnp.min(jnp.where(valid, grouped[:, :, 0:3], jnp.inf), axis=1)
    gmax = jnp.max(jnp.where(valid, grouped[:, :, 3:6], -jnp.inf), axis=1)
    return jnp.concatenate([gmin, gmax], axis=1), jnp.isfinite(gmin[:, 0])


def build_shortlists(rays, group_aabb, group_valid, block_rows: int = _RB):
    """Front-to-back group shortlists per ray block.

    Args:
      rays: [6 or 7, rows_total, 128] ray component planes (ro xyz,
        rd xyz[, sweep cap]); parked rays have rd == 0 and are excluded
        from the bounds. With a 7th plane (:func:`ray_exit_caps`),
        groups whose entry lower bound exceeds the block's largest cap
        are dropped — sky-dominated blocks shortlist to (almost)
        nothing.
      group_aabb: [G, 6] (min3, max3).
      group_valid: [G] bool.
      block_rows: rows of 128 rays per shortlist block (a multiple of the
        kernel block ``_RB`` when super-blocking for the SMEM budget).

    Returns (order [NB, G] int32 front-to-back group ids, counts [NB] int32,
    tnear [NB, G] f32 entry-t lower bound in shortlist order, BIG past count).

    All three axes run as single batched [3, NB, G] ops instead of a
    per-axis Python loop (3x fewer fusion instances; measured NEUTRAL at
    246k tris / 512² — ~33 ms either way, so the cost is not op-count
    there — kept for the larger-G regime where instance count grows).
    Per-element arithmetic is unchanged, so results are bit-identical.
    """
    nplanes = rays.shape[0]
    rows_total = rays.shape[1]
    nb = rows_total // block_rows
    r = rays.reshape(nplanes, nb, block_rows * _LANES)
    parked = (r[3] == 0.0) & (r[4] == 0.0) & (r[5] == 0.0)   # [NB, B]

    pk = parked[None]
    lo = jnp.min(jnp.where(pk, jnp.inf, r[:6]), axis=2)       # [6, NB]
    hi = jnp.max(jnp.where(pk, -jnp.inf, r[:6]), axis=2)
    block_valid = ~jnp.all(parked, axis=1)                    # [NB]
    cap_max = (jnp.max(jnp.where(parked, 0.0, r[6]), axis=1)
               if nplanes > 6 else None)                      # [NB]

    olo, ohi = lo[0:3][:, :, None], hi[0:3][:, :, None]       # [3, NB, 1]
    dlo, dhi = lo[3:6][:, :, None], hi[3:6][:, :, None]
    gt = group_aabb.T                                          # [6, G]
    glo = gt[0:3][:, None, :]                                  # [3, 1, G]
    ghi = gt[3:6][:, None, :]

    # _axis_interval broadcasts [3, NB, 1] x [3, 1, G] -> [3, NB, G]
    enter, exit_ = _axis_interval(glo, ghi, olo, ohi, dlo, dhi)
    enter_lb = jnp.max(enter, axis=0)                         # [NB, G]
    exit_ub = jnp.min(exit_, axis=0)

    hit = ((enter_lb < exit_ub) & (exit_ub >= 0.0)
           & block_valid[:, None] & group_valid[None, :])
    if cap_max is not None:
        hit = hit & (enter_lb <= cap_max[:, None])
    tnear = jnp.where(hit, jnp.maximum(enter_lb, 0.0), BIG)
    order = jnp.argsort(tnear, axis=1).astype(jnp.int32)
    counts = jnp.sum(hit, axis=1).astype(jnp.int32)
    tnear_sorted = jnp.take_along_axis(tnear, order, axis=1)
    return order, counts, tnear_sorted


# ---------------------------------------------------------------------------
# Stage 2: shortlist-driven grid kernel (scalar-prefetch index maps).
#
# The grid is (ray_blocks, n_groups) exactly like the round-1 cluster scan,
# so Mosaic's automatic block pipelining (DMA of step j+1 overlapped with
# compute of step j) is preserved — but the triangle-block index map reads
# the PREFETCHED shortlist: step (i, j) streams group shortlist[i, j], and
# steps past the block's count clamp to the previous index, which the
# pipeline recognises as "same block" and skips both the DMA and (via
# pl.when) the compute. Work becomes proportional to the shortlist lengths
# while keeping the proven compute layout (triangles in sublanes, rays in
# lanes, one block-level branch per cluster).
# ---------------------------------------------------------------------------


def _sl_kernel(counts_ref, sl_ref, *refs, rows, kc, sb, mxu, row_cull,
               fused=False, span=1, sel_gate=False):
    # tnear rides as a third prefetch array ONLY when the early-exit knob
    # is on — prefetch args are copied to SMEM whether read or not (they
    # are pallas_call operands, invisible to XLA DCE), so the unused array
    # would tax every call.
    if _EARLY_EXIT:
        tnear_ref, *refs = refs
    if fused:
        # fused best-hit accumulators live in [1, RB*128] VMEM scratch
        # (the compute layout); the [RB, 128] out blocks are written once
        # per block at the last grid step
        sc_refs = tuple(refs[len(refs) - 4:])
        refs = refs[:len(refs) - 4]
    if mxu:
        ns = mxu_num_scratch(mxu)
        rhs_refs = tuple(refs[len(refs) - ns:])
        refs = refs[:len(refs) - ns]
    (ray_ref, tri_ref, aabb_ref,
     out_t_ref, out_i_ref, out_s2_ref, out_s3_ref) = refs
    if fused:
        # ray block is [1, 7, RB*128]: plane k = one [1, RB*128] row;
        # there is exactly one row, so the per-row view is the plane
        best_t_ref, best_i_ref, best_s2_ref, best_s3_ref = sc_refs

        def plane(k):
            return ray_ref[0, k:k + 1, :]

        def row_plane(k, r):
            return ray_ref[0, k:k + 1, :]
    else:
        best_t_ref, best_i_ref = out_t_ref, out_i_ref
        best_s2_ref, best_s3_ref = out_s2_ref, out_s3_ref

        def plane(k):
            return ray_ref[k]

        def row_plane(k, r):
            return ray_ref[k, r:r + 1, :]
    i = pl.program_id(0) // sb      # shortlist (super-)block index
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        best_t_ref[:] = jnp.full_like(best_t_ref, BIG)
        best_i_ref[:] = jnp.zeros_like(best_i_ref)
        best_s2_ref[:] = jnp.zeros_like(best_s2_ref)
        best_s3_ref[:] = jnp.zeros_like(best_s3_ref)
        if mxu:
            _mxu_build_rhs(row_plane, rows, rhs_refs, mxu)

    # Front-to-back early exit: the shortlist is sorted by the group's
    # entry-t lower bound, so once that bound strictly exceeds the worst
    # live best-t in the block, no remaining group can produce a closer hit
    # (ties stay processed -> the lowest-index tie rule is preserved and
    # results remain bit-identical). Parked rays (zero direction) never hit
    # and keep best_t == BIG, so they are masked out of the worst.
    active = j < counts_ref[i]
    if _EARLY_EXIT:
        parked = ((plane(3) == 0.0) & (plane(4) == 0.0)
                  & (plane(5) == 0.0))
        # compare in int32 bit-pattern space: tnear/best_t are non-negative
        # floats (bit order == float order); parked rays mask to -1 so an
        # all-parked block compares below every tnear and shortlists to
        # zero. Each lane's bound is min(best_t, root-box exit cap): miss
        # rays never tighten best_t and would otherwise hold the whole
        # block's exit hostage at BIG — their cap releases it.
        bound = jnp.minimum(best_t_ref[:], plane(6))
        best_bits = jax.lax.bitcast_convert_type(bound, jnp.int32)
        worst = jnp.max(jnp.where(parked, jnp.int32(-1), best_bits))
        tnear_j = tnear_ref[i * pl.num_programs(1) + j]
        active = active & (tnear_j <= worst)

    @pl.when(active)
    def _():
        gidx = sl_ref[i * pl.num_programs(1) + j]
        rox_b = plane(0)
        roy_b = plane(1)
        roz_b = plane(2)
        rdx_b = plane(3)
        rdy_b = plane(4)
        rdz_b = plane(5)
        inv_xb = 1.0 / rdx_b
        inv_yb = 1.0 / rdy_b
        inv_zb = 1.0 / rdz_b
        span_t = span * CLUSTER
        lane_iota = jax.lax.broadcasted_iota(
            jnp.int32, (span_t, rox_b.shape[-1]), 0)

        for c in range(0, kc, span):
            # sweep bound: running best-t AND the ray's root-box exit
            # cap (plane 6) — miss rays never tighten best_t, the cap
            # does; re-read per cluster so this step's hits keep culling
            bound = jnp.minimum(best_t_ref[:], plane(6))
            # span > 1 sweeps `span` adjacent clusters as one [span*64]
            # triangle block (one matmul at MXU-native M, one epilogue):
            # a lane joins if it slab-hits ANY of the span's boxes —
            # conservative, and extra candidates past a lane's bound
            # can never win the best-t compare, so selection stays
            # bit-identical to span=1 (pinned by the knob tests).
            slab = _slab_block(
                rox_b, roy_b, roz_b, inv_xb, inv_yb, inv_zb,
                aabb_ref[c, 0], aabb_ref[c, 1], aabb_ref[c, 2],
                aabb_ref[c, 3], aabb_ref[c, 4], aabb_ref[c, 5],
                bound)
            for d in range(1, span):
                slab = slab | _slab_block(
                    rox_b, roy_b, roz_b, inv_xb, inv_yb, inv_zb,
                    aabb_ref[c + d, 0], aabb_ref[c + d, 1],
                    aabb_ref[c + d, 2], aabb_ref[c + d, 3],
                    aabb_ref[c + d, 4], aabb_ref[c + d, 5],
                    bound)
            # per-ROW cluster culling (8x finer than whole-block): after
            # reordering, rows are coherent 128-ray subgroups, so rows that
            # provably miss this cluster skip its 128-triangle sweep.
            # int32, not bool: Mosaic can only extract 32-bit scalars.
            row_any = (jnp.any(slab, axis=1).astype(jnp.int32) if row_cull
                       else None)

            @pl.when(jnp.any(slab))
            def _(c=c, row_any=row_any):
                base = c * CLUSTER
                if mxu:
                    # matmul lhs IS the tri16 block: [span_t, 16] with
                    # K-vectors in cols 0:12 and c0..c3 in cols 12:16
                    lhs = _mxu_lhs_chunks(tri_ref, base, mxu, span_t)
                else:
                    nx = tri_ref[base:base + span_t, 0:1]
                    ny = tri_ref[base:base + span_t, 1:2]
                    nz = tri_ref[base:base + span_t, 2:3]
                    k1x = tri_ref[base:base + span_t, 3:4]
                    k1y = tri_ref[base:base + span_t, 4:5]
                    k1z = tri_ref[base:base + span_t, 5:6]
                    k2x = tri_ref[base:base + span_t, 6:7]
                    k2y = tri_ref[base:base + span_t, 7:8]
                    k2z = tri_ref[base:base + span_t, 8:9]
                    k3x = tri_ref[base:base + span_t, 9:10]
                    k3y = tri_ref[base:base + span_t, 10:11]
                    k3z = tri_ref[base:base + span_t, 11:12]
                    c0 = tri_ref[base:base + span_t, 12:13]
                    c1 = tri_ref[base:base + span_t, 13:14]
                    c2 = tri_ref[base:base + span_t, 14:15]
                    c3 = tri_ref[base:base + span_t, 15:16]
                tri_base = gidx * GROUP_T + base

                for r in range(rows):
                    def _row_body(r=r):
                        if mxu:
                            denom, t, s1, s2, s3 = _mxu_sweep_row(
                                lhs, rhs_refs, r, mxu)
                        else:
                            rox = row_plane(0, r)
                            roy = row_plane(1, r)
                            roz = row_plane(2, r)
                            rdx = row_plane(3, r)
                            rdy = row_plane(4, r)
                            rdz = row_plane(5, r)
                            denom = rdx * nx + rdy * ny + rdz * nz
                            ro_n = rox * nx + roy * ny + roz * nz
                            safe = jnp.where(denom == 0.0, 1.0, denom)
                            t = (c0 - ro_n) / safe
                            px = rox + t * rdx
                            py = roy + t * rdy
                            pz = roz + t * rdz
                            s1 = px * k1x + py * k1y + pz * k1z - c1
                            s2 = px * k2x + py * k2y + pz * k2z - c2
                            s3 = px * k3x + py * k3y + pz * k3z - c3
                        valid = ((denom != 0.0) & (t >= 0.0)
                                 & (s1 >= 0.0) & (s2 >= 0.0) & (s3 >= 0.0))
                        tt = jnp.where(valid, t, BIG)

                        tmin = jnp.min(tt, axis=0, keepdims=True)
                        cur_t = best_t_ref[r:r + 1, :]

                        def _select(tmin=tmin, cur_t=cur_t, tt=tt,
                                    s2=s2, s3=s3, r=r):
                            cand = jnp.where(tt == tmin, lane_iota, span_t)
                            amin = jnp.min(cand, axis=0,
                                           keepdims=True).astype(jnp.int32)
                            win = lane_iota == amin
                            s2_sel = jnp.sum(jnp.where(win, s2, 0.0),
                                             axis=0, keepdims=True)
                            s3_sel = jnp.sum(jnp.where(win, s3, 0.0),
                                             axis=0, keepdims=True)
                            # groups arrive front-to-back (not in index
                            # order), so exact ties need the explicit
                            # lowest-index rule to stay bit-identical to
                            # the dense sweep
                            tie = ((tmin == cur_t) & (tmin < BIG)
                                   & (tri_base + amin
                                      < best_i_ref[r:r + 1, :]))
                            better = ((tmin < cur_t) & (tmin < BIG)) | tie
                            best_t_ref[r:r + 1, :] = jnp.where(
                                better, tmin, cur_t)
                            best_i_ref[r:r + 1, :] = jnp.where(
                                better, tri_base + amin,
                                best_i_ref[r:r + 1, :])
                            best_s2_ref[r:r + 1, :] = jnp.where(
                                better, s2_sel, best_s2_ref[r:r + 1, :])
                            best_s3_ref[r:r + 1, :] = jnp.where(
                                better, s3_sel, best_s3_ref[r:r + 1, :])

                        if sel_gate:
                            # superset of `better` (see _SEL_GATE): a
                            # skipped step could not have updated any ref
                            pl.when(jnp.any((tmin <= cur_t)
                                            & (tmin < BIG)))(_select)
                        else:
                            _select()

                    if row_cull:
                        pl.when(row_any[r] != 0)(_row_body)
                    else:
                        _row_body()

    if fused:
        # write the [RB, 128] out blocks once, after the block's last
        # shortlist step — one (1, RB*128) -> (RB, 128) relayout per ref
        # per block instead of one per cluster
        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            out_t_ref[:] = best_t_ref[:].reshape(out_t_ref.shape)
            out_i_ref[:] = best_i_ref[:].reshape(out_i_ref.shape)
            out_s2_ref[:] = best_s2_ref[:].reshape(out_s2_ref.shape)
            out_s3_ref[:] = best_s3_ref[:].reshape(out_s3_ref.shape)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "sb", "mxu", "row_cull",
                                    "fuse_rows", "span", "sel_gate"))
def intersect_shortlist_pallas_soa(rox, roy, roz, rdx, rdy, rdz, tri_pack,
                                   cluster_aabbs, interpret: bool = False,
                                   sb: int = 0, mxu: str | None = "env",
                                   row_cull: bool | str = "env",
                                   fuse_rows: bool | str = "env",
                                   span: int | str = "env",
                                   sel_gate: bool | str = "env",
                                   t_ub=None):
    """Closest hit via the shortlist-driven cluster kernel.

    Args:
      rox..rdz: [N] ray component planes (parked rays: rd == 0).
      tri_pack: [T, 16] packed table (pack_tri16), BVH-ordered.
      cluster_aabbs: [ceil(T/CLUSTER), 8] from build_cluster_aabbs.
      t_ub: optional [N] per-ray upper bound on the closest-hit t
        (see :func:`tighten_caps`): tightens the sweep-cap plane, so
        both the stage-1 shortlists and the cluster sweep cull against
        ~the true hit distance instead of the root-box exit. Exactness
        is the cap-margin invariant, unchanged.
      sb: super-block factor override (0 = auto from the SMEM budget).
      mxu: MXU sweep scheme (None, "bf16", "bf16x3", "f32x6") or "env"
        to defer to PTS_MXU_SWEEP — see the module knob comment.
      row_cull: per-row cluster culling (exact-match; a win under the MXU
        sweep, a loss under the VPU sweep) or "env" for PTS_ROW_CULL.
      fuse_rows: sweep the whole block as one [1, RB*128] row — one wide
        matmul/epilogue per cluster instead of RB narrow ones
        (exact-match) — or "env" for PTS_ROW_FUSE. Excludes row_cull.
      span: adjacent clusters swept per step (1, 2, 4 or 8): span s
        costs one [s*64, K'] matmul + ONE epilogue where span=1 pays s
        of each; culling coarsens to the span's slab union
        (exact-match — see the kernel comment) — or "env" for
        PTS_SWEEP_SPAN.

    Returns (hit [N] bool, t [N], idx [N] int32, s2 [N], s3 [N]),
    idx in BVH order — identical selection to the dense sweep.
    """
    mxu = resolve_mxu(mxu)
    row_cull = resolve_row_cull(row_cull)
    fuse_rows = resolve_row_fuse(fuse_rows)
    span = resolve_span(span)
    sel_gate = resolve_sel_gate(sel_gate)
    if fuse_rows and row_cull:
        raise ValueError("fuse_rows and row_cull are mutually exclusive "
                         "(a fused block has no rows to cull)")
    n = rox.shape[0]
    t_count = tri_pack.shape[0]
    n_groups_est = -(-max(t_count, 1) // GROUP_T)

    if sb <= 0:
        # super-block factor: grow shortlist blocks (in whole kernel blocks)
        # until BOTH [NB, G] prefetch arrays fit the SMEM budget
        sb = 1
        while ((-(-n // (sb * _RB * _LANES))) * n_groups_est * 4
               > _SMEM_SHORTLIST_BYTES):
            sb *= 2

    block = sb * _RB * _LANES
    pad_n = (-n) % block
    # root-box slab-exit sweep cap as a 7th ray plane
    comps = rays_with_exit_caps(rox, roy, roz, rdx, rdy, rdz, cluster_aabbs)
    if t_ub is not None:
        comps = comps[:6] + (tighten_caps(comps[6], t_ub),)
    if pad_n:
        zeros = jnp.zeros((pad_n,), rox.dtype)
        comps = tuple(jnp.concatenate([c, zeros]) for c in comps)
    n_pad = n + pad_n
    rows_total = n_pad // _LANES
    nb = rows_total // _RB          # KERNEL blocks (grid dim 0)
    rays = jnp.stack(comps).reshape(7, rows_total, _LANES)

    pad_t = (-t_count) % GROUP_T
    if pad_t:
        tri_pack = jnp.concatenate(
            [tri_pack, jnp.zeros((pad_t, 16), tri_pack.dtype)])
    n_groups = (t_count + pad_t) // GROUP_T
    n_clusters = n_groups * KC
    if cluster_aabbs.shape[0] < n_clusters:
        extra = n_clusters - cluster_aabbs.shape[0]
        never = jnp.tile(jnp.asarray(
            [[1.0, 1.0, 1.0, -1.0, -1.0, -1.0, 0.0, 0.0]], jnp.float32),
            (extra, 1))
        cluster_aabbs = jnp.concatenate([cluster_aabbs, never])

    # pass kc explicitly (module global read at call time, so PTS_KC
    # monkeypatching in tests reaches it — a def-time default would not)
    group_aabb, group_valid = group_aabbs_from_clusters(cluster_aabbs,
                                                        n_groups, KC)
    order, counts, tnear = build_shortlists(rays, group_aabb, group_valid,
                                            block_rows=sb * _RB)
    # masked steps (j >= count) clamp to the last real entry, so the block
    # pipeline sees a repeated index and skips the DMA entirely
    clamp = jnp.maximum(counts - 1, 0)[:, None]
    order = jnp.where(jnp.arange(n_groups, dtype=jnp.int32)[None, :]
                      <= clamp, order, jnp.take_along_axis(order, clamp, 1))
    # 1-D prefetch arrays: a 2-D [nb, G] SMEM array would be lane-padded to
    # [nb, 128] and blow the 1 MiB SMEM budget at high resolutions. tnear
    # (int32 bit patterns: non-negative floats compare as ints) is only
    # shipped when the early-exit knob reads it — see _sl_kernel.
    order = order.reshape(-1)
    prefetch = [counts, order]
    if _EARLY_EXIT:
        prefetch.append(
            jax.lax.bitcast_convert_type(tnear, jnp.int32).reshape(-1))
    np_pre = len(prefetch)

    grid = (nb, n_groups)
    # row-fused: the same ray bytes viewed as [nb, 7, RB*128] — the
    # kernel block becomes [1, 7, RB*128] (Mosaic requires the trailing
    # two block dims to be (8,128)-divisible or exactly the array dims,
    # which rules out a [7, 1, RB*128] view). Outputs keep the unfused
    # [rows_total, 128] layout; the kernel accumulates into [1, RB*128]
    # scratch and relayouts once per block.
    krows = 1 if fuse_rows else _RB
    lanes_k = _RB * _LANES if fuse_rows else _LANES
    rays_k = (rays.reshape(7, nb, lanes_k).transpose(1, 0, 2)
              if fuse_rows else rays)
    ray_spec = (pl.BlockSpec((1, 7, lanes_k),
                             lambda i, j, *pre: (i, 0, 0),
                             memory_space=pltpu.VMEM)
                if fuse_rows else
                pl.BlockSpec((7, _RB, _LANES),
                             lambda i, j, *pre: (0, i, 0),
                             memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((_RB, _LANES),
                            lambda i, j, *pre: (i, 0),
                            memory_space=pltpu.VMEM)
    # bf16 hi/mid/lo chunks of the per-row matmul rhs, built once per
    # ray block at j == 0 (persist across the shortlist walk), plus the
    # fused best-hit accumulators
    scratch = list(mxu_scratch_shapes(krows, mxu, lanes_k)) if mxu else []
    if fuse_rows:
        scratch += [pltpu.VMEM((1, lanes_k), jnp.float32),
                    pltpu.VMEM((1, lanes_k), jnp.int32),
                    pltpu.VMEM((1, lanes_k), jnp.float32),
                    pltpu.VMEM((1, lanes_k), jnp.float32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=np_pre,
        grid=grid,
        in_specs=[
            ray_spec,
            pl.BlockSpec((GROUP_T, 16),
                         lambda i, j, counts, sl, *pre:
                         (sl[(i // sb) * n_groups + j], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KC, 8),
                         lambda i, j, counts, sl, *pre:
                         (sl[(i // sb) * n_groups + j], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * 4,
        scratch_shapes=scratch,
    )
    best_t, best_i, best_s2, best_s3 = pl.pallas_call(
        functools.partial(_sl_kernel, rows=krows, kc=KC, sb=sb, mxu=mxu,
                          row_cull=row_cull, fused=fuse_rows, span=span,
                          sel_gate=sel_gate),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((rows_total, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows_total, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows_total, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows_total, _LANES), jnp.float32),
        ],
        interpret=interpret,
    )(*prefetch, rays_k, tri_pack, cluster_aabbs)

    best_t = best_t.reshape(n_pad)[:n]
    best_i = best_i.reshape(n_pad)[:n]
    best_s2 = best_s2.reshape(n_pad)[:n]
    best_s3 = best_s3.reshape(n_pad)[:n]
    return best_t < BIG, best_t, best_i, best_s2, best_s3
