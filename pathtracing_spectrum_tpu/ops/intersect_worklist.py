"""Pooled-worklist intersection kernel (work-proportional grid).

Third-generation large-scene TPU path (after the round-1 cluster scan and
the round-2 shortlist kernel). The round-2 kernel's grid is
``(ray_blocks, n_groups)``: every ray block steps through ALL ``G`` group
slots and skips the ones past its shortlist count. Measured on a 246k-tri
scene at 512² (256 blocks x 241 groups = 61k grid steps), the *skipped*
steps alone cost ~63 ms per call — ~1 µs of scalar index-map/pipeline
bookkeeping per step — while the mean shortlist is only ~14 groups.

This kernel makes the grid itself work-proportional, the TPU-native analog
of the reference's log-time per-ray descent (mesh.cpp:239-280): grid =
one step per *(ray block, shortlisted group)* pair, laid out as a flat
worklist shared by all blocks:

* **Stage 1 (XLA)**: per-block interval shortlists exactly as before
  (ops/intersect_shortlist.build_shortlists — conservative, order sorted
  front-to-back), then a worklist of (block, group) pairs is assembled
  with a cumsum + searchsorted — no big sorts, no scatters.
* **Pooled budget**: the worklist length ``W = ray_blocks * min(G, bpb)``
  is a STATIC pool shared across blocks — one block may consume hundreds
  of entries while most use a handful, so per-block overflow (common for
  sky-grazing blocks) does not force a fallback; only the *total*
  exceeding the pool does. On overflow ``lax.cond`` routes the whole call
  to the round-2 kernel (grid (NB, G)) — bit-identical results, just the
  old cost. Scalar-prefetch SMEM is O(W), so the round-2 SMEM
  super-blocking pressure disappears on this path.
* **Stage 2 (Pallas)**: each step streams its group's 1024-triangle block
  and 8 cluster AABBs (same double-buffered pipelining — consecutive
  steps with the same indices skip the DMA), runs the identical
  cluster-culled sweep, and accumulates into the block's best-hit planes.
  The worklist is block-major so output blocks are visited contiguously
  (no revisits); a block's first step initialises its outputs. Blocks
  with empty shortlists get one inactive entry so initialisation still
  runs.

Hit selection is bit-identical to the dense sweep and the round-2 kernel:
same predicate (reference mesh.cpp:283-295 in K-vector form), same
lowest-index tie rule (front-to-back group order within each block).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect_pallas import BIG, CLUSTER, _LANES, _slab_block
from . import intersect_shortlist as isl
from .intersect_shortlist import (_RB, build_shortlists,
                                  group_aabbs_from_clusters,
                                  intersect_shortlist_pallas_soa)

# Pooled budget: worklist entries per ray block (the pool is shared;
# this is an AVERAGE, not a per-block cap). Both failure directions are
# real and were measured at 1M tris / 512² (G=1020, NB=128, in-context
# spp/s, v5e 2026-08-19):
#   bpb   16     64     128    256    512
#   spp/s 1.565  1.699  1.741  1.778  1.639
# UNDERsizing: a bounce-ray wavefront whose shortlist TOTAL exceeds the
# pool falls back to the round-2 (NB, G) grid, whose skipped steps cost
# ~1 µs each (130k steps ≈ 130 ms/call — the round-3 1M intersect wall
# at the old fixed bpb=16). OVERsizing: entries past the total clamp to
# the last (block, group) pair — the pipeline skips their DMA and
# compute but still pays the same ~1 µs/step bookkeeping (bpb=512's
# regression). The auto default (bpb=0) sizes the pool to ~G/4,
# clamped to [16, 256] and to the SMEM budget across NB blocks.
# PTS_WL_BPB forces a fixed value per process.
BUDGET_PER_BLOCK = int(os.environ.get("PTS_WL_BPB", "0"))
_SMEM_WL_ENTRIES = 64 * 1024      # 256 KiB per i32 prefetch array


def resolve_bpb(bpb: int, n_groups: int, nb: int) -> int:
    """Resolve the pooled budget: explicit > env > size-aware auto."""
    if bpb > 0:
        return bpb
    if BUDGET_PER_BLOCK > 0:
        return BUDGET_PER_BLOCK
    smem_cap = _SMEM_WL_ENTRIES // max(nb, 1)
    if smem_cap < 16:
        # > 4096 blocks: even a 16-entry pool would blow the 64k-entry
        # SMEM budget across the prefetch arrays. Return the honest cap
        # (>= 1) — the tiny pool keeps SMEM bounded, and shortlist totals
        # above it route to the round-2 kernel, whose super-blocking
        # handles SMEM at any scale.
        return max(smem_cap, 1)
    return min(max(16, n_groups // 4), 256, smem_cap)

# Default clusters (of 128 BVH-ordered triangles) per worklist group.
# Smaller groups = finer stage-1 culling granularity (fewer dead
# triangles swept per shortlist entry) at the cost of more worklist
# entries — the work-proportional grid makes that trade cheap, which the
# round-2 kernel's (NB, G) grid could not.
KC_DEFAULT = 8


def _wl_kernel(wl_block_ref, wl_group_ref, wl_active_ref, ray_ref, tri_ref,
               aabb_ref, best_t_ref, best_i_ref, best_s2_ref, best_s3_ref,
               *scratch, rows, kc, group_t, mxu, row_cull=False, span=1,
               sel_gate=False):
    w = pl.program_id(0)
    blk = wl_block_ref[w]
    prev = wl_block_ref[jnp.maximum(w - 1, 0)]
    first_visit = (w == 0) | (prev != blk)

    @pl.when(first_visit)
    def _():
        best_t_ref[:] = jnp.full_like(best_t_ref, BIG)
        best_i_ref[:] = jnp.zeros_like(best_i_ref)
        best_s2_ref[:] = jnp.zeros_like(best_s2_ref)
        best_s3_ref[:] = jnp.zeros_like(best_s3_ref)
        if mxu:
            # the worklist is block-major, so the per-block matmul rhs
            # built at each first visit stays valid until the next one
            isl._mxu_build_rhs(lambda k, r: ray_ref[k, r:r + 1, :],
                               rows, scratch, mxu)

    @pl.when(wl_active_ref[w] != 0)
    def _():
        gidx = wl_group_ref[w]
        rox_b = ray_ref[0]
        roy_b = ray_ref[1]
        roz_b = ray_ref[2]
        rdx_b = ray_ref[3]
        rdy_b = ray_ref[4]
        rdz_b = ray_ref[5]
        inv_xb = 1.0 / rdx_b
        inv_yb = 1.0 / rdy_b
        inv_zb = 1.0 / rdz_b
        span_t = span * CLUSTER
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (span_t, _LANES), 0)

        for c in range(0, kc, span):
            # bound by running best-t AND the ray's root-box exit cap
            # (plane 6): miss rays never tighten best_t, the cap does.
            # span > 1 sweeps `span` adjacent clusters as one [span*64]
            # triangle block gated on the UNION of their slab hits —
            # exact-match, same argument as the shortlist kernel.
            bound = jnp.minimum(best_t_ref[:], ray_ref[6])
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
            # per-ROW culling (8x finer than whole-block; int32 — Mosaic
            # can only extract 32-bit scalars)
            row_any = (jnp.any(slab, axis=1).astype(jnp.int32) if row_cull
                       else None)

            @pl.when(jnp.any(slab))
            def _(c=c, row_any=row_any):
                base = c * CLUSTER
                if mxu:
                    lhs = isl._mxu_lhs_chunks(tri_ref, base, mxu, span_t)
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
                tri_base = gidx * group_t + base

                for r in range(rows):
                    def _row_body(r=r):
                        if mxu:
                            denom, t, s1, s2, s3 = isl._mxu_sweep_row(
                                lhs, scratch, r, mxu)
                        else:
                            rox = ray_ref[0, r:r + 1, :]
                            roy = ray_ref[1, r:r + 1, :]
                            roz = ray_ref[2, r:r + 1, :]
                            rdx = ray_ref[3, r:r + 1, :]
                            rdy = ray_ref[4, r:r + 1, :]
                            rdz = ray_ref[5, r:r + 1, :]

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
                            # groups arrive front-to-back (not index
                            # order): exact ties take the explicit
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
                            # superset of `better` (see isl._SEL_GATE): a
                            # skipped step could not have updated any ref
                            pl.when(jnp.any((tmin <= cur_t)
                                            & (tmin < BIG)))(_select)
                        else:
                            _select()

                    if row_cull:
                        pl.when(row_any[r] != 0)(_row_body)
                    else:
                        _row_body()


@functools.partial(jax.jit,
                   static_argnames=("interpret", "bpb", "kc", "mxu",
                                    "row_cull", "span", "sel_gate"))
def intersect_worklist_pallas_soa(rox, roy, roz, rdx, rdy, rdz, tri_pack,
                                  cluster_aabbs, interpret: bool = False,
                                  bpb: int = 0,
                                  kc: int = KC_DEFAULT,
                                  mxu: str | None = "env",
                                  row_cull: bool | str = "env",
                                  span: int | str = "env",
                                  sel_gate: bool | str = "env"):
    """Closest hit via the pooled-worklist kernel.

    Args:
      rox..rdz: [N] ray component planes (parked rays: rd == 0).
      tri_pack: [T, 16] packed table (pack_tri16), BVH-ordered.
      cluster_aabbs: [ceil(T/CLUSTER), 8] from build_cluster_aabbs.
      bpb: pooled worklist budget per ray block (shared pool; see the
        measured table at BUDGET_PER_BLOCK). Totals above the pool fall
        back to the round-2 kernel. 0 (default) = size-aware auto
        (~n_groups/4 clamped to [16, 256] and the SMEM budget);
        PTS_WL_BPB forces a fixed value per process.
      kc: clusters (of 128 triangles) per group — the stage-1 culling and
        DMA granularity.
      mxu: MXU sweep scheme (None, "bf16", "bf16x3", "f32x6") or "env"
        to defer to PTS_MXU_SWEEP — see intersect_shortlist's knob.
      row_cull: per-row cluster culling (exact-match) or "env" for
        PTS_ROW_CULL — same trade as the shortlist kernel's knob.
      span: adjacent clusters swept per step (1, 2, 4 or 8; must divide
        kc), or "env" for PTS_SWEEP_SPAN — exact-match, see the
        shortlist kernel's knob comment.

    Returns (hit [N] bool, t [N], idx [N] int32, s2 [N], s3 [N]),
    idx in BVH order — identical selection to the dense sweep.
    """
    mxu = isl.resolve_mxu(mxu)
    row_cull = isl.resolve_row_cull(row_cull)
    span = isl.resolve_span(span)
    sel_gate = isl.resolve_sel_gate(sel_gate)
    if kc % span:
        raise ValueError(f"span={span} must divide kc={kc}")
    n = rox.shape[0]
    t_count = tri_pack.shape[0]

    block = _RB * _LANES
    pad_n = (-n) % block
    # root-box slab-exit sweep cap as a 7th ray plane (shared helper —
    # both kernels must build the cap identically)
    comps = isl.rays_with_exit_caps(rox, roy, roz, rdx, rdy, rdz,
                                    cluster_aabbs)
    if pad_n:
        zeros = jnp.zeros((pad_n,), rox.dtype)
        comps = tuple(jnp.concatenate([c, zeros]) for c in comps)
    n_pad = n + pad_n
    rows_total = n_pad // _LANES
    nb = rows_total // _RB
    rays = jnp.stack(comps).reshape(7, rows_total, _LANES)

    group_t = kc * CLUSTER
    pad_t = (-t_count) % group_t
    if pad_t:
        tri_pack = jnp.concatenate(
            [tri_pack, jnp.zeros((pad_t, 16), tri_pack.dtype)])
    n_groups = (t_count + pad_t) // group_t
    n_clusters = n_groups * kc
    if cluster_aabbs.shape[0] < n_clusters:
        extra = n_clusters - cluster_aabbs.shape[0]
        never = jnp.tile(jnp.asarray(
            [[1.0, 1.0, 1.0, -1.0, -1.0, -1.0, 0.0, 0.0]], jnp.float32),
            (extra, 1))
        cluster_aabbs = jnp.concatenate([cluster_aabbs, never])

    group_aabb, group_valid = group_aabbs_from_clusters(cluster_aabbs,
                                                        n_groups, kc=kc)
    order, counts, _tnear = build_shortlists(rays, group_aabb, group_valid,
                                             block_rows=_RB)

    # ---- worklist assembly (XLA; no big sorts/scatters) ----
    bpb = resolve_bpb(bpb, n_groups, nb)
    w_budget = nb * min(n_groups, bpb)
    counts_eff = jnp.maximum(counts, 1)     # >=1 entry: first-visit init
    ends = jnp.cumsum(counts_eff)
    total = ends[-1]
    w_idx = jnp.arange(w_budget, dtype=jnp.int32)
    blk = jnp.searchsorted(ends, w_idx, side="right").astype(jnp.int32)
    blk = jnp.minimum(blk, nb - 1)
    j = w_idx - (ends[blk] - counts_eff[blk])
    in_pool = w_idx < total
    wl_block = jnp.where(in_pool, blk, nb - 1)
    gsel = order[wl_block, jnp.clip(j, 0, n_groups - 1)]
    wl_group = jnp.where(in_pool, gsel, gsel[-1])
    wl_active = (in_pool & (j < counts[wl_block])).astype(jnp.int32)

    def run_worklist(rays, tri_pack, cluster_aabbs):
        grid = (w_budget,)
        out_spec = pl.BlockSpec((_RB, _LANES),
                                lambda w, wb, wg, wa: (wb[w], 0),
                                memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                pl.BlockSpec((7, _RB, _LANES),
                             lambda w, wb, wg, wa: (0, wb[w], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((group_t, 16),
                             lambda w, wb, wg, wa: (wg[w], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((kc, 8),
                             lambda w, wb, wg, wa: (wg[w], 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[out_spec] * 4,
            # bf16 rhs chunks for the MXU sweep, rebuilt at each block's
            # first visit (worklist entries are block-major)
            scratch_shapes=(isl.mxu_scratch_shapes(_RB, mxu)
                            if mxu else []),
        )
        return pl.pallas_call(
            functools.partial(_wl_kernel, rows=_RB, kc=kc,
                              group_t=group_t, mxu=mxu,
                              row_cull=row_cull, span=span,
                              sel_gate=sel_gate),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((rows_total, _LANES), jnp.float32),
                jax.ShapeDtypeStruct((rows_total, _LANES), jnp.int32),
                jax.ShapeDtypeStruct((rows_total, _LANES), jnp.float32),
                jax.ShapeDtypeStruct((rows_total, _LANES), jnp.float32),
            ],
            interpret=interpret,
        )(wl_block, wl_group, wl_active, rays, tri_pack, cluster_aabbs)

    if w_budget >= nb * n_groups:
        # pool covers the worst case — no fallback branch needed
        best_t, best_i, best_s2, best_s3 = run_worklist(
            rays, tri_pack, cluster_aabbs)
        best_t = best_t.reshape(n_pad)[:n]
        best_i = best_i.reshape(n_pad)[:n]
        best_s2 = best_s2.reshape(n_pad)[:n]
        best_s3 = best_s3.reshape(n_pad)[:n]
        return best_t < BIG, best_t, best_i, best_s2, best_s3

    def short_path(_):
        t, i, s2, s3 = run_worklist(rays, tri_pack, cluster_aabbs)
        return t, i, s2, s3

    def full_path(_):
        # round-2 kernel: grid (NB, G), handles any shortlist total
        hit, t, i, s2, s3 = intersect_shortlist_pallas_soa(
            rox, roy, roz, rdx, rdy, rdz, tri_pack[:t_count],
            cluster_aabbs, interpret=interpret, mxu=mxu,
            row_cull=row_cull, span=span, sel_gate=sel_gate)
        pad = jnp.zeros((pad_n,), jnp.float32)
        padi = jnp.zeros((pad_n,), jnp.int32)
        return (jnp.concatenate([t, jnp.full((pad_n,), BIG, jnp.float32)])
                .reshape(rows_total, _LANES),
                jnp.concatenate([i, padi]).reshape(rows_total, _LANES),
                jnp.concatenate([s2, pad]).reshape(rows_total, _LANES),
                jnp.concatenate([s3, pad]).reshape(rows_total, _LANES))

    best_t, best_i, best_s2, best_s3 = jax.lax.cond(
        total <= w_budget, short_path, full_path, operand=None)
    best_t = best_t.reshape(n_pad)[:n]
    best_i = best_i.reshape(n_pad)[:n]
    best_s2 = best_s2.reshape(n_pad)[:n]
    best_s3 = best_s3.reshape(n_pad)[:n]
    return best_t < BIG, best_t, best_i, best_s2, best_s3
