"""Pallas TPU kernel for the dense ray-triangle closest-hit sweep.

Same predicate as ops/intersect.py (reference mesh.cpp:283-295 + blackpawn
same-side test in the matmul-free K-vector form), hand-scheduled for the VPU:

* **Layout**: rays live in *lanes* (128 per row), triangles in *sublanes* —
  the [C, 128] hit matrix per (ray-row, chunk) pair is a native VPU tile.
  Ray components arrive as six [N/128, 128] planes; the per-triangle tables
  as one packed [T, 16] block (nx ny nz | k1 | k2 | k3 | c0 c1 c2 c3).
* **Grid**: (ray_blocks, tri_chunks); each step processes RB=8 rows of 128
  rays against a C-triangle chunk held in VMEM, unrolled over rows. The
  chunk axis is the inner (sequential) dimension so the best-hit output
  block stays resident in VMEM and is folded across chunks.
* **Reduction**: per-row min + first-index argmin over the sublane axis,
  folded into running (best_t, best_idx) with earlier-chunk-wins ties —
  bit-identical hit selection to the jnp path.

Everything is fused in one kernel: no [N, C] intermediate ever touches HBM
(the XLA fallback spills ~0.5 GB per bounce at 512x512).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 3.0e38  # python float: jnp scalars would be captured consts in the kernel

_LANES = 128
# Ray rows (of 128 lanes) per grid step. The dense kernel wants large
# blocks (fewer grid steps, tri chunk reused across more rays: 8->64 rows
# measured +8% on the Cornell headline, plateau at 128); the cluster kernel
# wants small ones (a 1024-ray block is a compact screen tile, and culling
# granularity degrades with block size).
_RB_DENSE = 64
_RB = 8


def _kernel(ray_ref, tri_ref, best_t_ref, best_i_ref, *, chunk, rows):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        best_t_ref[:] = jnp.full_like(best_t_ref, BIG)
        best_i_ref[:] = jnp.zeros_like(best_i_ref)

    # per-triangle columns, [C, 1]
    nx, ny, nz = (tri_ref[:, 0:1], tri_ref[:, 1:2], tri_ref[:, 2:3])
    k1x, k1y, k1z = (tri_ref[:, 3:4], tri_ref[:, 4:5], tri_ref[:, 5:6])
    k2x, k2y, k2z = (tri_ref[:, 6:7], tri_ref[:, 7:8], tri_ref[:, 8:9])
    k3x, k3y, k3z = (tri_ref[:, 9:10], tri_ref[:, 10:11], tri_ref[:, 11:12])
    c0, c1 = tri_ref[:, 12:13], tri_ref[:, 13:14]
    c2, c3 = tri_ref[:, 14:15], tri_ref[:, 15:16]

    tri_base = (j * chunk).astype(jnp.int32)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, _LANES), 0)

    for r in range(rows):
        rox = ray_ref[0, r:r + 1, :]
        roy = ray_ref[1, r:r + 1, :]
        roz = ray_ref[2, r:r + 1, :]
        rdx = ray_ref[3, r:r + 1, :]
        rdy = ray_ref[4, r:r + 1, :]
        rdz = ray_ref[5, r:r + 1, :]

        denom = rdx * nx + rdy * ny + rdz * nz          # [C, 128]
        ro_n = rox * nx + roy * ny + roz * nz
        safe = jnp.where(denom == 0.0, 1.0, denom)
        t = (c0 - ro_n) / safe

        # hit point first, then the same-side tests against it — the
        # reference's own order (GetUV takes p, pathtracer.cpp:394-405),
        # and 15 fewer [C, 128] ops than expanding each s_i dot product
        px = rox + t * rdx
        py = roy + t * rdy
        pz = roz + t * rdz
        s1 = px * k1x + py * k1y + pz * k1z - c1
        s2 = px * k2x + py * k2y + pz * k2z - c2
        s3 = px * k3x + py * k3y + pz * k3z - c3

        valid = ((denom != 0.0) & (t >= 0.0)
                 & (s1 >= 0.0) & (s2 >= 0.0) & (s3 >= 0.0))
        tt = jnp.where(valid, t, BIG)

        tmin = jnp.min(tt, axis=0, keepdims=True)        # [1, 128]
        # first-index argmin over the sublane (triangle) axis
        cand = jnp.where(tt == tmin, lane_iota, chunk)
        amin = jnp.min(cand, axis=0, keepdims=True).astype(jnp.int32)

        cur_t = best_t_ref[r:r + 1, :]
        better = (tmin < cur_t) & (tmin < BIG)
        best_t_ref[r:r + 1, :] = jnp.where(better, tmin, cur_t)
        best_i_ref[r:r + 1, :] = jnp.where(
            better, tri_base + amin, best_i_ref[r:r + 1, :])


def intersect_dense_pallas(ro, rd, tri_pack, chunk: int = 512):
    """Closest hit over all triangles (Pallas TPU path), [N, 3] interface."""
    return intersect_dense_pallas_soa(ro[:, 0], ro[:, 1], ro[:, 2],
                                      rd[:, 0], rd[:, 1], rd[:, 2],
                                      tri_pack, chunk=chunk)


@functools.partial(jax.jit, static_argnames=("chunk",))
def intersect_dense_pallas_soa(rox, roy, roz, rdx, rdy, rdz, tri_pack,
                               chunk: int = 512):
    """Closest hit over all triangles (Pallas TPU path).

    Args:
      rox..rdz: [N] ray component planes.
      tri_pack: [T, 16] packed table (see module docstring; zero rows miss).
      chunk: triangles per VMEM chunk (rounded to sublane multiple of 8).

    Returns (hit [N] bool, t [N], idx [N] int32).
    """
    n = rox.shape[0]
    t_count = tri_pack.shape[0]

    block = _RB_DENSE * _LANES
    pad_n = (-n) % block
    comps = (rox, roy, roz, rdx, rdy, rdz)
    if pad_n:
        zeros = jnp.zeros((pad_n,), rox.dtype)
        comps = tuple(jnp.concatenate([c, zeros]) for c in comps)
    n_pad = n + pad_n
    rows_total = n_pad // _LANES

    # [6, rows, 128] ray-component planes
    rays = jnp.stack(comps).reshape(6, rows_total, _LANES)

    c = min(chunk, max(8, ((t_count + 7) // 8) * 8))
    pad_t = (-t_count) % c
    if pad_t:
        tri_pack = jnp.concatenate(
            [tri_pack, jnp.zeros((pad_t, 16), tri_pack.dtype)])
    n_chunks = (t_count + pad_t) // c

    grid = (rows_total // _RB_DENSE, n_chunks)
    out_spec = pl.BlockSpec((_RB_DENSE, _LANES), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    # NOTE: no s2/s3 outputs here — the per-chunk winner selection costs
    # ~12% on small scenes (measured on the Cornell headline); the engine
    # computes barycentrics from fetched attrs for this backend instead.
    best_t, best_i = pl.pallas_call(
        functools.partial(_kernel, chunk=c, rows=_RB_DENSE),
        grid=grid,
        in_specs=[
            pl.BlockSpec((6, _RB_DENSE, _LANES), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 16), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * 2,
        out_shape=[
            jax.ShapeDtypeStruct((rows_total, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows_total, _LANES), jnp.int32),
        ],
    )(rays, tri_pack)

    best_t = best_t.reshape(n_pad)[:n]
    best_i = best_i.reshape(n_pad)[:n]
    zero = jnp.zeros_like(best_t)
    return best_t < BIG, best_t, best_i, zero, zero


def pack_tri16(tri_n, tri_k1, tri_k2, tri_k3, tri_consts):
    """[T, 16] packed table from the SceneData intersect arrays."""
    return jnp.concatenate(
        [tri_n, tri_k1, tri_k2, tri_k3, tri_consts], axis=1)


# ---------------------------------------------------------------------------
# Clustered kernel: SAH-ordered 64-triangle clusters with AABB culling.
#
# The lockstep skip-link BVH is gather-bound under XLA on TPU (scattered row
# gathers run ~100x below bandwidth), so the large-scene path re-designs the
# acceleration structure around the hardware instead: triangles stay in
# SAH-BVH order (spatially coherent), grouped into clusters of 64 with
# precomputed AABBs. Per (ray-block x cluster-group) grid step the kernel
# slab-tests each cluster AABB against the whole 1024-ray block and runs the
# dense 64-triangle test only when any ray hits (pl.when) — a block-coherent
# BVH cut. Worst case degrades to the dense sweep; typical primary/secondary
# blocks cull the vast majority of clusters.
# ---------------------------------------------------------------------------

CLUSTER = 128          # triangles per cluster (one AABB each)
_KC = 8              # clusters per grid step (tri block = KC*CLUSTER rows)


def build_cluster_aabbs(tri_min, tri_max, cluster: int = CLUSTER):
    """[ceil(T/cluster), 8] cluster AABB table (min3, max3, pad2) over
    consecutive runs of BVH-ordered triangles. Padding clusters get
    inverted AABBs that never hit."""
    import numpy as np

    t = tri_min.shape[0]
    n_clusters = max(1, -(-t // cluster))
    out = np.zeros((n_clusters, 8), np.float32)
    for i in range(n_clusters):
        lo, hi = i * cluster, min((i + 1) * cluster, t)
        if lo >= t:
            out[i, 0:3] = 1.0
            out[i, 3:6] = -1.0  # inverted -> slab test always misses
            continue
        out[i, 0:3] = tri_min[lo:hi].min(axis=0)
        out[i, 3:6] = tri_max[lo:hi].max(axis=0)
        same = out[i, 3:6] == out[i, 0:3]
        out[i, 3:6] = np.where(same, out[i, 3:6] + 1e-3, out[i, 3:6])
    return out


def _slab_block(rox_b, roy_b, roz_b, inv_x, inv_y, inv_z,
                ax0, ay0, az0, ax1, ay1, az1, cur_best):
    """Boolean slab test of one AABB against a whole ray block."""
    tx0 = (ax0 - rox_b) * inv_x
    tx1 = (ax1 - rox_b) * inv_x
    ty0 = (ay0 - roy_b) * inv_y
    ty1 = (ay1 - roy_b) * inv_y
    tz0 = (az0 - roz_b) * inv_z
    tz1 = (az1 - roz_b) * inv_z
    t_near = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                     jnp.minimum(ty0, ty1)),
                         jnp.minimum(tz0, tz1))
    t_far = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                    jnp.maximum(ty0, ty1)),
                        jnp.maximum(tz0, tz1))
    return (t_near < t_far) & (t_far >= 0.0) & (t_near < cur_best)


def _cluster_kernel(ray_ref, tri_ref, aabb_ref, gaabb_ref,
                    best_t_ref, best_i_ref, best_s2_ref, best_s3_ref, *,
                    rows, kc):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        best_t_ref[:] = jnp.full_like(best_t_ref, BIG)
        best_i_ref[:] = jnp.zeros_like(best_i_ref)
        best_s2_ref[:] = jnp.zeros_like(best_s2_ref)
        best_s3_ref[:] = jnp.zeros_like(best_s3_ref)

    rox_b = ray_ref[0]
    roy_b = ray_ref[1]
    roz_b = ray_ref[2]
    rdx_b = ray_ref[3]
    rdy_b = ray_ref[4]
    rdz_b = ray_ref[5]
    inv_xb = 1.0 / rdx_b
    inv_yb = 1.0 / rdy_b
    inv_zb = 1.0 / rdz_b

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (CLUSTER, _LANES), 0)

    # group-level cull: one AABB over this whole 1024-triangle grid step
    group_hit = jnp.any(_slab_block(
        rox_b, roy_b, roz_b, inv_xb, inv_yb, inv_zb,
        gaabb_ref[j, 0], gaabb_ref[j, 1], gaabb_ref[j, 2],
        gaabb_ref[j, 3], gaabb_ref[j, 4], gaabb_ref[j, 5],
        best_t_ref[:]))

    @pl.when(group_hit)
    def _group():
        _cluster_group(ray_ref, tri_ref, aabb_ref, best_t_ref, best_i_ref,
                       best_s2_ref, best_s3_ref,
                       rows, kc, j, rox_b, roy_b, roz_b,
                       inv_xb, inv_yb, inv_zb, lane_iota)


def _cluster_group(ray_ref, tri_ref, aabb_ref, best_t_ref, best_i_ref,
                   best_s2_ref, best_s3_ref,
                   rows, kc, j, rox_b, roy_b, roz_b,
                   inv_xb, inv_yb, inv_zb, lane_iota):
    for c in range(kc):
        # ---- cluster AABB vs the whole ray block (slab test, boolean-only
        # like the reference mesh.cpp:48-59) ----
        # prune clusters entirely behind the rays or beyond the current best
        any_hit = jnp.any(_slab_block(
            rox_b, roy_b, roz_b, inv_xb, inv_yb, inv_zb,
            aabb_ref[c, 0], aabb_ref[c, 1], aabb_ref[c, 2],
            aabb_ref[c, 3], aabb_ref[c, 4], aabb_ref[c, 5],
            best_t_ref[:]))

        @pl.when(any_hit)
        def _(c=c):
            base = c * CLUSTER
            nx = tri_ref[base:base + CLUSTER, 0:1]
            ny = tri_ref[base:base + CLUSTER, 1:2]
            nz = tri_ref[base:base + CLUSTER, 2:3]
            k1x = tri_ref[base:base + CLUSTER, 3:4]
            k1y = tri_ref[base:base + CLUSTER, 4:5]
            k1z = tri_ref[base:base + CLUSTER, 5:6]
            k2x = tri_ref[base:base + CLUSTER, 6:7]
            k2y = tri_ref[base:base + CLUSTER, 7:8]
            k2z = tri_ref[base:base + CLUSTER, 8:9]
            k3x = tri_ref[base:base + CLUSTER, 9:10]
            k3y = tri_ref[base:base + CLUSTER, 10:11]
            k3z = tri_ref[base:base + CLUSTER, 11:12]
            c0 = tri_ref[base:base + CLUSTER, 12:13]
            c1 = tri_ref[base:base + CLUSTER, 13:14]
            c2 = tri_ref[base:base + CLUSTER, 14:15]
            c3 = tri_ref[base:base + CLUSTER, 15:16]
            tri_base = (j * (kc * CLUSTER) + base).astype(jnp.int32)

            # NOTE: per-row pl.when predication was tried here and measured
            # 2.4x SLOWER (scalar-unit branching serialises the row loop);
            # one block-level branch per cluster is the sweet spot.
            for r in range(rows):
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
                cand = jnp.where(tt == tmin, lane_iota, CLUSTER)
                amin = jnp.min(cand, axis=0, keepdims=True).astype(jnp.int32)
                win = lane_iota == amin
                s2_sel = jnp.sum(jnp.where(win, s2, 0.0), axis=0,
                                 keepdims=True)
                s3_sel = jnp.sum(jnp.where(win, s3, 0.0), axis=0,
                                 keepdims=True)

                cur_t = best_t_ref[r:r + 1, :]
                better = (tmin < cur_t) & (tmin < BIG)
                best_t_ref[r:r + 1, :] = jnp.where(better, tmin, cur_t)
                best_i_ref[r:r + 1, :] = jnp.where(
                    better, tri_base + amin, best_i_ref[r:r + 1, :])
                best_s2_ref[r:r + 1, :] = jnp.where(
                    better, s2_sel, best_s2_ref[r:r + 1, :])
                best_s3_ref[r:r + 1, :] = jnp.where(
                    better, s3_sel, best_s3_ref[r:r + 1, :])


@functools.partial(jax.jit, static_argnames=("interpret",))
def intersect_clustered_pallas_soa(rox, roy, roz, rdx, rdy, rdz, tri_pack,
                                   cluster_aabbs, interpret: bool = False):
    """Closest hit via cluster-culled dense sweep (large-scene TPU path).

    Args:
      rox..rdz: [N] ray component planes.
      tri_pack: [T, 16] packed table, BVH-ordered, padded to _KC*CLUSTER.
      cluster_aabbs: [T/CLUSTER, 8] from build_cluster_aabbs.

    Returns (hit [N] bool, t [N], idx [N] int32, in BVH order).
    """
    n = rox.shape[0]
    t_count = tri_pack.shape[0]

    block = _RB * _LANES
    pad_n = (-n) % block
    comps = (rox, roy, roz, rdx, rdy, rdz)
    if pad_n:
        zeros = jnp.zeros((pad_n,), rox.dtype)
        comps = tuple(jnp.concatenate([c, zeros]) for c in comps)
    n_pad = n + pad_n
    rows_total = n_pad // _LANES
    rays = jnp.stack(comps).reshape(6, rows_total, _LANES)

    group = _KC * CLUSTER
    pad_t = (-t_count) % group
    if pad_t:
        tri_pack = jnp.concatenate(
            [tri_pack, jnp.zeros((pad_t, 16), tri_pack.dtype)])
    n_groups = (t_count + pad_t) // group
    n_clusters = n_groups * _KC
    if cluster_aabbs.shape[0] < n_clusters:
        extra = n_clusters - cluster_aabbs.shape[0]
        never = jnp.tile(jnp.asarray(
            [[1.0, 1.0, 1.0, -1.0, -1.0, -1.0, 0.0, 0.0]], jnp.float32),
            (extra, 1))
        cluster_aabbs = jnp.concatenate([cluster_aabbs, never])

    # group AABBs: union of each grid step's _KC cluster boxes (padding
    # clusters are inverted, so guard with min/max identity elements)
    grouped = cluster_aabbs.reshape(n_groups, _KC, 8)
    gmin = jnp.min(jnp.where(grouped[:, :, 0:3] <= grouped[:, :, 3:6],
                             grouped[:, :, 0:3], jnp.inf), axis=1)
    gmax = jnp.max(jnp.where(grouped[:, :, 0:3] <= grouped[:, :, 3:6],
                             grouped[:, :, 3:6], -jnp.inf), axis=1)
    degenerate = ~jnp.isfinite(gmin[:, 0:1])
    gmin = jnp.where(degenerate, 1.0, gmin)
    gmax = jnp.where(degenerate, -1.0, gmax)
    group_aabbs = jnp.concatenate(
        [gmin, gmax, jnp.zeros((n_groups, 2), jnp.float32)], axis=1)

    grid = (rows_total // _RB, n_groups)
    out_spec = pl.BlockSpec((_RB, _LANES), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    best_t, best_i, best_s2, best_s3 = pl.pallas_call(
        functools.partial(_cluster_kernel, rows=_RB, kc=_KC),
        grid=grid,
        in_specs=[
            pl.BlockSpec((6, _RB, _LANES), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, 16), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_KC, 8), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            # whole (tiny) group-AABB table resident in VMEM; indexed by j
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((rows_total, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows_total, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows_total, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows_total, _LANES), jnp.float32),
        ],
        interpret=interpret,
    )(rays, tri_pack, cluster_aabbs, group_aabbs)

    best_t = best_t.reshape(n_pad)[:n]
    best_i = best_i.reshape(n_pad)[:n]
    best_s2 = best_s2.reshape(n_pad)[:n]
    best_s3 = best_s3.reshape(n_pad)[:n]
    return best_t < BIG, best_t, best_i, best_s2, best_s3
