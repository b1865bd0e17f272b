"""Wavefront spectral path-tracing engine (device side).

The reference's recursive per-pixel ``Trace`` (pathtracer.cpp:424-541) is
re-designed as a *wavefront* over a ray-state SoA: the recurrence
``L = emissivity + Trace(next) * reflectivity`` unrolls exactly to::

    radiance   += throughput * emissivity
    throughput *= reflectivity

so one ``lax.fori_loop`` over bounces replaces recursion, with every live ray
advancing in lockstep. Reference behaviours preserved bit-for-formula:

* depth cap ``2 * max_depth`` hits, after which a surviving ray contributes
  the **sky** spectrum (the fall-through at pathtracer.cpp:536-540 — a quirk,
  but load-bearing for parity);
* Russian roulette from the ``max_depth``-th hit on, kill probability
  ``1 - min(0.95, max(baseColor))``; a killed ray contributes the **baked**
  material emissivity (pathtracer.cpp:458-464), *not* the temperature-map
  adjusted one (the RR check precedes the override in the reference);
* smooth normals by barycentric interpolation when the triangle's smoothing
  group is set; backface flip; tangent-space normal mapping with the
  ``nt.z < 0 -> z = 0`` clamp (pathtracer.cpp:436-448);
* hit-point offset ``p += n * EPS``; glass refraction steps back ``2*EPS``
  (pathtracer.cpp:449, 510);
* roughness-texture override of scalar roughness (pathtracer.cpp:451-453);
* per-hit temperature-grid re-bake of emissivity/reflectivity through the
  Planck curve (pathtracer.cpp:520-528).

TPU-first data flow (each measured on a v5e at 512x512):

* rays, normals and all per-hit scalars live as **[N] component planes**
  (SoA) — an [N, 3] vector op uses 3 of 128 lanes, a component op all 128;
* intersection runs in the Pallas kernel (ops/intersect_pallas.py) on TPU,
  the portable jnp sweep elsewhere;
* per-hit attributes come from ONE packed [T, F] table fetched *transposed*
  via a one-hot [F,T]x[T,N] MXU matmul (exact selection), so every attribute
  arrives as a ready [N] plane — no gathers, no transposes in the loop;
* spectra are [nw, N] planes (wavelengths broadcast over the lane axis);
* texture sampling and the temperature re-bake are statically skipped when
  the scene has no textures/grids (zero-length tables).

RNG: counter-based (threefry) keys per (sample, bounce), replacing the
reference's single shared mt19937 (pathtracer.cpp:12 — racy across OpenMP
threads). For tests, ``rand_override`` injects fixed variates so a host
oracle can replay the identical random sequence.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .constants import EPS
from .scene import SceneData
from .ops import planck, sampling
from .ops.shade_pack import layout as shade_layout
from .ops.intersect import intersect_bruteforce
from .ops.intersect_pallas import (BIG, intersect_clustered_pallas_soa,
                                   intersect_dense_pallas_soa, pack_tri16)
from .ops.bvh import intersect_bvh
from .ops.texturing import sample_nearest_wh
# Reorder constants + key/segment/bounds primitives live in reorder.py
# (one home for the key schedule); re-exported here for compatibility.
from .reorder import (REORDER_AUTO_MIN_TRIS, REORDER_POS_BITS,   # noqa: F401
                      REORDER_SEGMENT, scene_bounds, segment_for,
                      segment_policy, sort_key)

# One-hot MXU fetch while the [T, N] one-hot stays under this many bytes;
# single packed gather above (the one-hot would blow HBM for big scenes).
ONEHOT_FETCH_MAX_BYTES = 256 * 1024 * 1024

# fetch_rows_pallas' grid is (ray_blocks, table_groups): every ray block
# streams the WHOLE table through VMEM, so its cost grows with the
# triangle count while a plain row gather's grows only with the ray
# count. Measured crossover on v5e (246k tris, 262k rays, round 3):
# pallas fetch 69.5 ms/call vs row gather 4.6 ms — use the MXU kernel
# only while the table fits this many 1024-row groups (~16k triangles).
FETCH_PALLAS_MAX_GROUPS = 16

# "auto" backend: dense sweep below this triangle count.
DENSE_AUTO_MAX_TRIS = 512

# Hero mode: read the baked per-(triangle, hero-channel) spectra via ONE
# [N, 2] row gather from a flat [T*nw, 2] table (instead of fetching all
# 2*nw emissivity/reflectivity rows and one-hot selecting) only above
# this wavelength count. Measured on v5e (cornell 512², depth 3, 32 spp
# one dispatch, spp/s fetch-select vs flat-gather): nw=64 131.6 vs
# 100.4 (the tiny-table MXU fetch is cheap; the gather's fixed ~0.4
# ms/iteration is not), nw=256 69.1 vs 94.1 (2*256 fetched rows lose).
# Both paths produce the exact same table entries — bit-identical.
HERO_FLAT_GATHER_MIN_NW = 128

# Per-row cluster culling only pays once shortlists are long enough that
# a culled row skips whole MXU matmuls often; below this the per-row
# slab tests are pure overhead. Measured intersect chains on v5e
# (2026-08-18, f32x6 sweep, cull vs no-cull ms/call): 2.2k tris
# 49.1/36.3 (-35%), 9.9k 11.6/10.5 (-10%), 52k 28.8/29.3 (+2%),
# 246k 80.2/89.4 (+11%) — crossover sits between 10k and 52k.
ROW_CULL_MIN_TRIS = 32768

# Clusters swept per kernel step (shortlist kernel ``span=``, exact-
# match — see the kernel knob comment). Span s replaces s per-cluster
# [64, K'] matmul+epilogue rounds with ONE [s*64, K'] matmul and ONE
# epilogue, gated on the span's slab UNION. Big scenes sweep many
# shortlisted clusters per block, so the saved epilogues dominate the
# union's extra triangles; small scenes sweep ~2-3 clusters and the
# union coarsening wins instead. In-context A/B (v5e 2026-08-19,
# tools/ab_engine.py, spp/s at span = 1 / 2 / 4 / 8, production
# defaults otherwise):
#   textured 1080p  2.2k tris: 3.36 / 3.38 /  —   /  —   (wash)
#   terrain 512²    10k tris: 14.40 /14.23 /  —   /  —   (wash)
#   terrain 512²    52k tris:  7.78 / 8.61 / 8.86 /  —
#   terrain 512²   246k tris:  3.08 / 3.61 / 3.74 / 3.60
# span=4 + row_cull compose (row culling coarsens to the span's slab
# union); at 246k span4 without row-cull collapses to 1.97. The
# crossover tracks ROW_CULL_MIN_TRIS — both fire where shortlists are
# long. PTS_SWEEP_SPAN overrides per process.
SWEEP_SPAN_MIN_TRIS = 32768
SWEEP_SPAN_LARGE = 4

# MXU sweep scheme by size: bf16x3 (K=48) in the large-scene regime
# where span=4 makes the fused matmul big enough for the halved K to
# show (+2-3% in-context at 52k/246k/1M, docs/tpu_cost_model.md),
# f32x6 (K=96, f32-ulp-faithful) below where the difference is noise.
MXU_BF16X3_MIN_TRIS = 32768

# Size-aware default for ``reorder_from`` (first looped bounce iteration
# that sorts). Early iterations are nearly fully live, so the sort's
# dead-to-front packing — its dominant value on small scenes — has
# nothing to pack there, while the sort itself costs ~26 ms/iteration at
# 1080p (5.5 ms at 512²). On large scenes the sort's BLOCK-COHERENCE
# value dominates from bounce 1 on and skipping any sort loses big.
# Measured in-context on v5e (2026-08-19, tools/ab_engine.py, spp/s,
# reorder_from = 1 / 2 / 3 / 4 / 5 / off, depth 3 = 6 iterations):
#   textured 1080p 2.2k tris: 2.79/2.87/2.95/2.98/ - /2.91 -> 4 wins
#   terrain 512²   10k tris: 13.58/14.40/14.23/ - / - /13.85 -> 2 wins
#   terrain 512²   52k tris:  7.62/ 6.08/ 5.38/ - / - / 4.64 -> 1 wins
# Tiny scenes want only the LAST iteration sorted (the sort's
# dead-to-front packing needs a mostly-dead wavefront to pack, which RR
# only produces near the end); by ~10k tris the kernel-coherence value
# already carries every sort after the first. Re-measured under the
# RB=16 kernel default (v5e 2026-08-19): textured 1080p from4 3.236 vs
# from5 3.363 spp/s — the h=4 sort never recoups its ~27 ms either.
REORDER_FROM_TINY_TRIS = 4096      # below: sort the last iteration only
REORDER_FROM_SMALL_TRIS = 32768    # below: skip the h=1 sort

# A/B gear (PTS_SORT_MAT=1): key the bounce-ray sort by the PREVIOUS
# hit's material type above the octant — the "material-sorted shading
# queues" north-star hypothesis. Shading here is branchless full-lane
# vector math, so the only thing grouping by material can change is
# block coherence for the culling kernels (it dilutes the spatial key
# bits). Result-exact either way; measured verdict in
# docs/tpu_cost_model.md.
SORT_MAT = os.environ.get("PTS_SORT_MAT", "") not in ("", "0")


def reorder_from_policy(n_tris: int, max_depth: int = 3) -> int:
    """Resolve ``reorder_from="auto"`` from the scene's triangle count
    (see the measured table above). The loop runs ``2*max_depth - 1``
    sortable iterations (h = 1 .. 2*max_depth-1)."""
    if n_tris < REORDER_FROM_TINY_TRIS:
        # 2*max_depth - 1 is the last sortable iteration; unclamped so
        # depth 1 still sorts its single looped iteration (the old
        # max(2, ...) floor silently turned depth-1 into never-sort)
        return 2 * max_depth - 1
    if n_tris < REORDER_FROM_SMALL_TRIS:
        return 2
    return 1


def resolve_backend(backend: str, n_tris: int) -> str:
    """Map 'auto'/'dense' to a concrete implementation for this platform.

    On TPU: Pallas kernels — plain dense sweep for small scenes, the
    cluster-culled sweep ("cluster") above DENSE_AUTO_MAX_TRIS. On CPU:
    the portable jnp sweep, or the lockstep skip-link BVH for big scenes
    (XLA's scattered gathers make that path TPU-hostile).
    """
    platform = jax.devices()[0].platform.lower()
    on_tpu = platform in ("tpu", "axon")
    if backend == "auto":
        if on_tpu:
            backend = ("dense" if n_tris <= DENSE_AUTO_MAX_TRIS
                       else "hier")
        else:
            backend = "dense" if n_tris <= 8192 else "bvh"
    if backend == "dense" and on_tpu:
        return "dense_pallas"
    return backend


class TraceResult(NamedTuple):
    radiance: jnp.ndarray     # [N, nw]
    rays_traced: jnp.ndarray  # [] int32 — total rays cast (for Mrays/s)


def _column_subset(lay, backend: str, has_ntex: bool, has_rtex: bool,
                   has_grids: bool, want_ior: bool, hero: bool = False):
    """Static column subset of the packed shading table for one config.

    Only the attribute rows this configuration actually reads are fetched
    (barycentric alpha/beta come from the intersection's s2/s3 on kernels
    that return them, so the geometry rows v1/e1/e2/d00/d01/d11 are only
    needed on the dense-pallas path). Returns (sub: name -> row slice in
    the subset, cols_idx int32 array of source columns)."""
    needed: list = []
    sub: dict = {}

    def want(name):
        cols = lay[name]
        sub[name] = slice(len(needed), len(needed) + cols.stop - cols.start)
        needed.extend(range(cols.start, cols.stop))

    for nm in ("uv1", "uv2", "uv3", "face_n", "n1", "n2", "n3", "smoothing",
               "inv_denom", "mat_type", "rr_prob", "roughness"):
        want(nm)
    if not hero:
        # hero mode reads the spectral curves via flat per-(triangle,
        # hero-channel) row gathers instead (O(N) per iteration — the
        # 2*nw-row fetch here was the hero path's hidden nw-scaling,
        # measured: nw=256 hero 69 spp/s before, see tpu_cost_model.md)
        for nm in ("emissivity", "reflectivity"):
            want(nm)
    if backend == "dense_pallas":
        for nm in ("v1", "e1", "e2", "d00", "d01", "d11"):
            want(nm)
    if has_ntex:
        for nm in ("tangent", "bitangent", "normal_tex", "normal_tex_wh"):
            want(nm)
    if has_rtex:
        for nm in ("roughness_tex", "roughness_tex_wh"):
            want(nm)
    if has_grids:
        if not hero:
            want("eps_curve")
        for nm in ("temp_grid", "temp_grid_wh"):
            want(nm)
    if want_ior and not hero:
        want("ior_curve")
    return sub, jnp.asarray(needed, jnp.int32)


def _fetch_attrs_t(idx, shade_sub, shade_sub_t, on_pallas: bool):
    """[F', N] attribute planes for each ray's hit triangle."""
    n = idx.shape[0]
    n_tris = shade_sub.shape[0]
    if on_pallas and n_tris <= FETCH_PALLAS_MAX_GROUPS * 1024:
        from .ops.fetch_pallas import fetch_rows_pallas
        return fetch_rows_pallas(idx, shade_sub)
    if on_pallas:
        # large table: the XLA row gather scales with rays, not triangles
        # (v5e: 4.6 vs 69.5 ms at 246k tris / 262k rays); barrier as below
        return jax.lax.optimization_barrier(shade_sub[idx].T)
    if n_tris * n * 4 <= ONEHOT_FETCH_MAX_BYTES:
        onehot_t = (jnp.arange(n_tris, dtype=jnp.int32)[:, None]
                    == idx[None, :]).astype(jnp.float32)   # [T, N]
        return jnp.dot(shade_sub_t, onehot_t,
                       preferred_element_type=jnp.float32)
    # barrier: otherwise XLA re-fuses this gather into each downstream
    # fusion and runs it several times (profiled: 4x94 ms per sample at
    # 1080p without it)
    return jax.lax.optimization_barrier(shade_sub[idx].T)


def _texture_flags(scene: SceneData):
    has_tex = scene.textures.shape[0] > 0
    return (has_tex and scene.normal_tex_any.shape[0] > 0,
            has_tex and scene.roughness_tex_any.shape[0] > 0,
            scene.temp_grids.shape[0] > 0)


def sweep_policy(backend: str, on_tpu: bool | None = None,
                 n_tris: int | None = None):
    """Resolve the (mxu scheme, row_cull, span) triple for the
    hierarchical kernels. Measured production default (v5e 2026-08-18,
    loop-carried chains at 246k tris — docs/tpu_cost_model.md "Hardware
    verdict"): the K-fused f32x6 MXU sweep + per-row culling, worth
    +37% in-context (2.72 vs 1.98 spp/s at 246k; 80.2 vs 112.4 ms/call
    on the kernel chain). f32x6 is f32-ulp-faithful — hit/idx selection
    is identical to the VPU sweep (pinned by tests), only last-ulp t
    differs — so it is safe as a default. Row culling only pays when a
    culled row skips a whole matmul, which needs both the MXU sweep and
    shortlists long enough to skip from — size-aware via
    ROW_CULL_MIN_TRIS (at 2.2k tris culling COSTS 35% of the intersect
    chain; n_tris=None means unknown, assume large). span=4 fires on
    the same large-scene regime (measured table at
    SWEEP_SPAN_MIN_TRIS: +14%/+21% at 52k/246k, a wash below). In that
    regime the scheme drops f32x6 -> bf16x3: with span=4 the fused
    matmul is big enough that halving K from 96 to 48 finally shows
    (in-context spp/s, v5e 2026-08-19: 246k 3.86 vs 3.75, 52k 9.03 vs
    8.84, 1M 1.57 vs 1.53; a wash at 2.2k). bf16x3 is value-faithful
    (~2^-18 relative t; hit/idx match pinned 100% across scene scales
    in INTERPRET mode by test_mxu_sweep_schemes_across_scene_scales —
    on hardware grazing-edge flips make it 99.88-99.93%, gated >=99.8%
    in bench_suite and bounded by the RMSE gates; docs/physics.md
    "Numerical fidelity"); small scenes keep
    the ulp-faithful f32x6 where the speed difference is noise. Env
    overrides always win: PTS_MXU_SWEEP (set-but-empty = force the VPU
    sweep), PTS_ROW_CULL and PTS_SWEEP_SPAN. Off-TPU (CPU tests,
    interpret mode) keeps the VPU sweep and its bit-identity with the
    dense kernel."""
    if backend not in ("shortlist", "worklist", "hier"):
        return None, False, 1
    if on_tpu is None:
        on_tpu = jax.devices()[0].platform.lower() in ("tpu", "axon")
    from .ops import intersect_shortlist as isl
    if "PTS_MXU_SWEEP" in os.environ:
        mxu = isl._MXU_SWEEP
    elif not on_tpu:
        mxu = None
    else:
        mxu = ("bf16x3" if (n_tris is None or n_tris >= MXU_BF16X3_MIN_TRIS)
               else "f32x6")
    if "PTS_ROW_CULL" in os.environ:
        row_cull = isl._ROW_CULL
    else:
        row_cull = (mxu is not None and on_tpu
                    and (n_tris is None or n_tris >= ROW_CULL_MIN_TRIS))
    if "PTS_SWEEP_SPAN" in os.environ:
        span = isl._SWEEP_SPAN
    else:
        span = (SWEEP_SPAN_LARGE
                if (mxu is not None and on_tpu
                    and (n_tris is None or n_tris >= SWEEP_SPAN_MIN_TRIS))
                else 1)
    return mxu, row_cull, span


def make_intersector(scene: SceneData, backend: str, leaf_size: int = 4):
    """Resolve the backend and return ``intersect(ox..dz) -> (hit, t, idx,
    s2, s3)`` over [N] component planes. Shared by the per-bounce loop and
    the primary-hit hoist in :func:`render_samples`."""
    n_tris = scene.tri_shade.shape[0]
    backend = resolve_backend(backend, n_tris=n_tris)
    mxu, row_cull, span = sweep_policy(backend, n_tris=n_tris)
    tri16 = (pack_tri16(scene.tri_face_n, scene.tri_k1, scene.tri_k2,
                        scene.tri_k3, scene.tri_consts)
             if backend in ("dense_pallas", "cluster", "shortlist",
                            "worklist", "hier")
             else None)

    def intersect(ox, oy, oz, dx, dy, dz):
        if backend == "dense_pallas":
            return intersect_dense_pallas_soa(ox, oy, oz, dx, dy, dz, tri16)
        if backend == "hier":
            # size-resolved at trace time: the round-2 shortlist kernel is
            # ~2-3% faster while its [NB, G] prefetch arrays fit SMEM
            # (measured 52k/246k/1080p); the pooled-worklist kernel takes
            # over in the super-blocking regime where per-block shortlists
            # would otherwise coarsen (its prefetch is O(W), not O(NB*G)).
            # PTS_HIER_BACKEND forces one side per process (A/B gear).
            from .ops.intersect_shortlist import (_LANES as _L, _RB as _R,
                                                  GROUP_T,
                                                  _SMEM_SHORTLIST_BYTES)
            nb = -(-ox.shape[0] // (_R * _L))
            n_groups = -(-n_tris // GROUP_T)
            forced = os.environ.get("PTS_HIER_BACKEND")
            if forced in ("shortlist", "worklist"):
                backend_here = forced
            elif nb * n_groups * 4 > _SMEM_SHORTLIST_BYTES:
                backend_here = "worklist"
            else:
                backend_here = "shortlist"
        else:
            backend_here = backend
        if backend_here == "worklist":
            from .ops.intersect_worklist import intersect_worklist_pallas_soa
            interp = jax.devices()[0].platform.lower() not in ("tpu", "axon")
            return intersect_worklist_pallas_soa(
                ox, oy, oz, dx, dy, dz, tri16, scene.cluster_aabbs,
                interpret=interp, mxu=mxu, row_cull=row_cull, span=span)
        if backend_here == "shortlist":
            from .ops.intersect_shortlist import intersect_shortlist_pallas_soa
            interp = jax.devices()[0].platform.lower() not in ("tpu", "axon")
            return intersect_shortlist_pallas_soa(
                ox, oy, oz, dx, dy, dz, tri16, scene.cluster_aabbs,
                interpret=interp, mxu=mxu, row_cull=row_cull, span=span)
        if backend == "cluster":
            return intersect_clustered_pallas_soa(
                ox, oy, oz, dx, dy, dz, tri16, scene.cluster_aabbs)
        o = jnp.stack([ox, oy, oz], axis=1)
        d = jnp.stack([dx, dy, dz], axis=1)
        if backend == "dense":
            return intersect_bruteforce(o, d, scene.tri_face_n, scene.tri_k1,
                                        scene.tri_k2, scene.tri_k3,
                                        scene.tri_consts)
        return intersect_bvh(o, d, scene.tri_v1, scene.tri_e1, scene.tri_e2,
                             scene.tri_face_n, scene.bvh_node_min,
                             scene.bvh_node_max, scene.bvh_node_skip,
                             scene.bvh_node_first, scene.bvh_node_count,
                             leaf_size=leaf_size)

    return intersect, backend


def _norm3(x, y, z):
    # rsqrt is a fast native VPU op; sqrt+divide chains profiled ~2 GB/s
    s = x * x + y * y + z * z
    inv = jnp.where(s > 0, jax.lax.rsqrt(jnp.where(s > 0, s, 1.0)), 0.0)
    return x * inv, y * inv, z * inv


def trace_radiance(scene: SceneData, ro, rd, key, max_depth: int,
                   backend: str = "auto", leaf_size: int = 4,
                   rand_override: Optional[jnp.ndarray] = None,
                   dispersion: bool = False,
                   reorder: object = "auto",
                   primary0=None,
                   reorder_period: int = 1,
                   reorder_from: object = "auto",
                   reorder_freeze: int = 0) -> TraceResult:
    """Trace radiance spectra for a batch of rays.

    Args:
      scene: compiled scene.
      ro, rd: [N, 3] primary rays.
      key: PRNG key for this sample.
      max_depth: the reference's trace depth (GUI range 1..10); the loop runs
        2*max_depth hit iterations (pathtracer.cpp:455).
      backend: "auto", "dense", "dense_pallas" or "bvh".
      rand_override: optional [2*max_depth, 4, N] fixed U[0,1) variates
        (testing: lets a host oracle replay the identical sequence).
      dispersion: spectral estimator mode.
        False (default): dense [nw, N] spectral state — reference parity.
        True: hero-wavelength dispersion — each ray samples ONE wavelength
        channel (throughput = nw * onehot(hero), an unbiased estimator of
        the per-channel image) and GLASS refracts with that channel's
        Cauchy index from the material's ior/dispersion_b instead of the
        reference's fixed 1.5.
        "hero": the same hero-packed estimator with UNCHANGED reference
        glass physics (hardcoded 1.5, pathtracer.cpp:493) — the scaling
        valve for large wavelength counts (SURVEY §7): per-bounce
        spectral work drops from O(nw·N) to O(N) + 2-3 [nw, N] selects,
        while staying unbiased for the exact reference render (pinned by
        test_dispersion.test_hero_mode_unbiased_with_glass; at nw == 1
        it is bit-identical to the dense path).
      reorder: sort bounce rays by (direction octant, origin morton cell)
        before each intersection from bounce 1 on, so the block-granular
        culling in the cluster/shortlist kernels sees coherent blocks and
        fully-terminated blocks compact to the tail. "auto" = on exactly for
        those kernels on TPU; True/False force it. Per-ray hit selection is
        order-independent (conservative block culls + the lowest-index tie
        rule), so results are bit-identical either way.
      primary0: optional (hit, t, idx, s2, s3) for THIS (ro, rd) batch. In
        progressive (non-jitter) rendering the primary rays never change, so
        the bounce-0 intersection is sample-invariant; render_samples
        computes it once per dispatch and reuses it for every sample
        (~50 ms/sample at 1080p). Results are bit-identical by
        construction — it is the same intersect call, hoisted.
      reorder_period: 2 = refresh the bounce sort every other iteration
        and reuse the previous permutation in between (skips the key +
        two segmented argsorts; both row gathers remain). Bit-identical
        output for any period — a stale permutation only loosens block
        coherence. 1 = fresh sort every iteration. MEASURED LOSS on v5e
        (interleaved A/B 2026-08-18: terrain 52k 6.74 vs 7.96 spp/s):
        one-iteration-stale direction octants cost more sweep time than
        the saved argsorts (~5.6 ms). Off-default measurement gear.
      reorder_from: first looped bounce iteration that sorts (1 = every
        one; "auto" = size-aware :func:`reorder_from_policy`, measured
        table at REORDER_FROM_TINY_TRIS). Early bounce iterations are
        nearly fully live, so the sort's dead-to-front packing — its
        main value on small scenes — buys nothing there while costing
        ~26 ms at 1080p (per-phase chain, v5e 2026-08-18); skipping it
        where it cannot pay keeps the late-iteration benefit.
        Result-exact for any value (the kernels are
        ray-order-independent, pinned by test_reorder_is_bit_identical
        / test_reorder_from_is_bit_identical). Ignored on the
        ``reorder_period >= 2`` path.
      reorder_freeze: if > 0, the LAST fresh sort happens at iteration
        ``reorder_freeze``; later iterations reuse that permutation
        (skip the key + two segmented argsorts, keep both row gathers).
        Late bounce iterations are mostly dead, and dead lanes never
        revive — a frozen permutation keeps them packed at the front
        forever; only the few still-live lanes' octant/morton grouping
        goes stale. Result-exact for any value (same argument as
        ``perm_in``). 0 = never freeze. Ignored on the
        ``reorder_period >= 2`` path and when it lands before
        ``reorder_from``'s first sort.

    Returns:
      TraceResult(radiance [N, nw], rays_traced scalar).
    """
    n = ro.shape[0]
    nw = scene.wavenumbers.shape[0]
    n_tris = scene.tri_shade.shape[0]
    lay = shade_layout(nw)
    intersect, backend = make_intersector(scene, backend, leaf_size)
    has_tex = scene.textures.shape[0] > 0
    # per-kind static gates: a 2M-ray texel gather for a texture kind no
    # element binds is pure waste (~10 ms/bounce at 1080p, measured)
    has_ntex = has_tex and scene.normal_tex_any.shape[0] > 0
    has_rtex = has_tex and scene.roughness_tex_any.shape[0] > 0
    has_grids = scene.temp_grids.shape[0] > 0

    # the dense Pallas kernel omits the s2/s3 winner selection (it costs
    # ~12% there); that backend computes barycentrics from fetched geometry
    kernel_bary = backend != "dense_pallas"
    # hero packing fires for both dispersion modes; the Cauchy ior_curve
    # column (and the glass physics change) only for dispersion=True
    use_hero = bool(dispersion) and nw > 0
    use_cauchy = (dispersion is True) and nw > 0
    hero_flat = use_hero and nw >= HERO_FLAT_GATHER_MIN_NW
    sub, cols_idx = _column_subset(lay, backend, has_ntex, has_rtex,
                                   has_grids, use_cauchy, hero=hero_flat)
    shade_sub = scene.tri_shade[:, cols_idx]   # [T, F'] — hoisted
    shade_sub_t = shade_sub.T                  # [F', T]

    on_tpu = jax.devices()[0].platform.lower() in ("tpu", "axon")
    on_pallas = on_tpu and backend in ("dense_pallas", "cluster",
                                       "shortlist", "worklist", "hier")

    # ---- bounce-ray reordering (block coherence for culling kernels) ----
    do_reorder = (reorder is True
                  or (reorder == "auto" and on_pallas
                      and backend in ("cluster", "shortlist", "worklist", "hier")
                      and n_tris >= REORDER_AUTO_MIN_TRIS))
    sort_mat = do_reorder and SORT_MAT
    if do_reorder:
        _SEG = segment_policy(n, n_tris)
        smin, inv_ext = scene_bounds(scene)

        def sort_perm(ox, oy, oz, dx, dy, dz, alive, mat=None):
            """Forward + inverse segment-local permutations from the
            shared reorder key (reorder.sort_key — octant, then origin
            morton cell; dead rays to the top bucket so fully-parked
            tail blocks shortlist to zero groups). The inverse is just
            another segmented argsort of the forward one — no scatter
            anywhere (an [N, 4] row scatter measured 85 ms). The
            permutation is APPLIED as packed row gathers (see the
            do_sort branch): XLA's per-element gather runs ~500 MB/s on
            TPU regardless of locality, while 16-24B row gathers run
            ~10x faster — per-plane indexing was the dominant cost of
            the whole bounce (61 ms of a 258 ms 6-bounce sample at 262k
            rays)."""
            key = sort_key(ox, oy, oz, dx, dy, dz, alive, smin, inv_ext,
                           morton=True, mat=mat)
            ns = n // _SEG
            perm_l = jnp.argsort(key.reshape(ns, _SEG), axis=1,
                                 stable=True).astype(jnp.int32)
            inv_l = jnp.argsort(perm_l, axis=1).astype(jnp.int32)
            offs = (jnp.arange(ns, dtype=jnp.int32) * _SEG)[:, None]
            return ((perm_l + offs).reshape(-1),
                    (inv_l + offs).reshape(-1))

    def fetch_attrs_t(idx):
        """[F', N] attribute planes for each ray's hit triangle."""
        return _fetch_attrs_t(idx, shade_sub, shade_sub_t, on_pallas)

    def row(attrs_t, name):
        return attrs_t[sub[name].start]

    def row3(attrs_t, name):
        s = sub[name].start
        return attrs_t[s], attrs_t[s + 1], attrs_t[s + 2]

    def rows(attrs_t, name):
        return attrs_t[sub[name]]

    if use_hero:
        hero_u = jax.random.uniform(jax.random.fold_in(key, 0x0D15), (n,))
        hero = jnp.minimum((hero_u * nw).astype(jnp.int32), nw - 1)
        hero_onehot_t = (jnp.arange(nw, dtype=jnp.int32)[:, None]
                         == hero[None, :]).astype(jnp.float32)  # [nw, N]

        def hero_sel(rows_t):
            """Exact hero-channel select from [nw, N] rows (one nonzero
            term per column, so the reduce adds only zeros — bit-identical
            to indexing channel ``hero``)."""
            return jnp.sum(rows_t * hero_onehot_t, axis=0)

        sky_hero = hero_sel(scene.sky[:, None])
        wn_hero = (hero_sel(scene.wavenumbers[:, None])
                   if has_grids else None)
    if hero_flat:
        # flat per-(triangle, hero-channel) spectral tables: the baked
        # emissivity/reflectivity for each ray's hit arrive as ONE
        # [N, 2] 8-byte row gather per iteration instead of a 2*nw-row
        # fetch — the fetch was the hero path's hidden nw-scaling
        # (HERO_FLAT_GATHER_MIN_NW measured crossover). Values are the
        # exact table entries the one-hot select produced —
        # bit-identical.
        emis_tbl = scene.tri_shade[:, lay["emissivity"]]   # [T, nw]
        refl_tbl = scene.tri_shade[:, lay["reflectivity"]]
        er_flat = jnp.stack([emis_tbl.reshape(-1),
                             refl_tbl.reshape(-1)], axis=1)  # [T*nw, 2]
        eps_flat = (scene.tri_shade[:, lay["eps_curve"]].reshape(-1)
                    if has_grids else None)
        ior_flat = (scene.tri_shade[:, lay["ior_curve"]].reshape(-1)
                    if use_cauchy else None)

    def body(h, state, do_sort=False, hit0=None, perm_in=None,
             want_perm=False):
        (rox, roy, roz, rdx, rdy, rdz,
         throughput_t, radiance_t, inside, alive, rays_traced,
         *mat_tail) = state
        prev_mat = mat_tail[0] if sort_mat else None
        rays_traced = rays_traced + jnp.sum(alive.astype(jnp.int32))

        attrs0 = None
        if hit0 is not None:
            # sample-invariant primary intersection (and optionally the
            # attribute fetch), hoisted by the caller
            hit, t, idx, s2, s3 = hit0[:5]
            if len(hit0) > 5:
                attrs0 = hit0[5]
        elif do_sort:
            # Sort only around the intersection; the [nw, N] spectral state
            # never moves. The permutation is applied as ONE [N, 6] row
            # gather in and ONE [N, 4] row gather (by the inverse) out —
            # element gathers are ~10x slower than 16-24B row ops on TPU,
            # and scatters are ~7x slower again, hence the segmented-
            # argsort inverse. idx rides the f32 pack as an exact float
            # VALUE (f32 represents integers < 2^24 exactly; a bitcast
            # would produce denormal bit patterns that TPU float ops flush
            # to zero); `hit` is recomputed from t < BIG, exactly how the
            # kernel derives it.
            # ``perm_in`` reuses the previous iteration's permutation
            # (reorder_period=2): any permutation is result-exact (the
            # kernels are ray-order-independent, pinned by
            # test_reorder_is_bit_identical), a stale one only loosens
            # block coherence — bounce h+1 origins are bounce h hit
            # points, so origin grouping survives; only the direction
            # octants go stale. Saves the key + two segmented argsorts.
            if perm_in is not None:
                perm, inv = perm_in
            else:
                perm, inv = sort_perm(rox, roy, roz, rdx, rdy, rdz, alive,
                                      prev_mat)
            packed = jnp.stack([rox, roy, roz, rdx, rdy, rdz],
                               axis=1)[perm]                       # [N, 6]
            hit_s, t_s, idx_s, s2_s, s3_s = intersect(
                packed[:, 0], packed[:, 1], packed[:, 2],
                packed[:, 3], packed[:, 4], packed[:, 5])
            assert n_tris < (1 << 24), "float-exact idx pack needs T < 2^24"
            res = jnp.stack(
                [t_s, s2_s, s3_s, idx_s.astype(jnp.float32)], axis=1)
            out = res[inv]                                         # unsort
            t, s2, s3 = out[:, 0], out[:, 1], out[:, 2]
            idx = out[:, 3].astype(jnp.int32)
            hit = t < BIG   # exactly how every intersect backend derives it
        else:
            hit, t, idx, s2, s3 = intersect(rox, roy, roz, rdx, rdy, rdz)
        hit = hit & alive

        attrs_t = attrs0 if attrs0 is not None else fetch_attrs_t(idx)

        # ---- hit geometry ----
        px, py, pz = rox + t * rdx, roy + t * rdy, roz + t * rdz
        inv_denom = row(attrs_t, "inv_denom")
        if kernel_bary:
            # alpha/beta directly from the intersection's same-side terms:
            # s2 = (p-v1).K2 = alpha/invDenom, s3 = beta/invDenom (identical
            # products to the reference's GetUV, pathtracer.cpp:394-405)
            alpha = s2 * inv_denom
            beta = s3 * inv_denom
        else:
            v1x, v1y, v1z = row3(attrs_t, "v1")
            e1x, e1y, e1z = row3(attrs_t, "e1")
            e2x, e2y, e2z = row3(attrs_t, "e2")
            wx, wy, wz = px - v1x, py - v1y, pz - v1z
            d20 = wx * e1x + wy * e1y + wz * e1z
            d21 = wx * e2x + wy * e2y + wz * e2z
            d00 = row(attrs_t, "d00")
            d01 = row(attrs_t, "d01")
            d11 = row(attrs_t, "d11")
            alpha = (d11 * d20 - d01 * d21) * inv_denom
            beta = (d00 * d21 - d01 * d20) * inv_denom
        w0 = 1.0 - alpha - beta

        s = sub["uv1"].start
        uvu = w0 * attrs_t[s] + alpha * attrs_t[s + 2] + beta * attrs_t[s + 4]
        uvv = (w0 * attrs_t[s + 1] + alpha * attrs_t[s + 3]
               + beta * attrs_t[s + 5])

        # ---- shading normal: smooth -> backface flip -> normal map ----
        fnx, fny, fnz = row3(attrs_t, "face_n")
        n1x, n1y, n1z = row3(attrs_t, "n1")
        n2x, n2y, n2z = row3(attrs_t, "n2")
        n3x, n3y, n3z = row3(attrs_t, "n3")
        smx = w0 * n1x + alpha * n2x + beta * n3x
        smy = w0 * n1y + alpha * n2y + beta * n3y
        smz = w0 * n1z + alpha * n2z + beta * n3z
        smx, smy, smz = _norm3(smx, smy, smz)
        smooth = row(attrs_t, "smoothing") > 0.5
        nx = jnp.where(smooth, smx, fnx)
        ny = jnp.where(smooth, smy, fny)
        nz = jnp.where(smooth, smz, fnz)
        backface = (nx * rdx + ny * rdy + nz * rdz) > 0.0
        nx = jnp.where(backface, -nx, nx)
        ny = jnp.where(backface, -ny, ny)
        nz = jnp.where(backface, -nz, nz)

        roughness = row(attrs_t, "roughness")
        if has_ntex:
            ntex = row(attrs_t, "normal_tex").astype(jnp.int32)
            nwh = sub["normal_tex_wh"].start
            tex = sample_nearest_wh(scene.textures, ntex,
                                    attrs_t[nwh], attrs_t[nwh + 1], uvu, uvv)
            ntx, nty, ntz = (tex[:, 0] * 2.0 - 1.0, tex[:, 1] * 2.0 - 1.0,
                             tex[:, 2] * 2.0 - 1.0)
            ntz = jnp.where(ntz < 0.0, 0.0, ntz)
            ntx, nty, ntz = _norm3(ntx, nty, ntz)
            tax, tay, taz = row3(attrs_t, "tangent")
            bx, by, bz = row3(attrs_t, "bitangent")
            mnx = tax * ntx + bx * nty + nx * ntz
            mny = tay * ntx + by * nty + ny * ntz
            mnz = taz * ntx + bz * nty + nz * ntz
            mnx, mny, mnz = _norm3(mnx, mny, mnz)
            use_map = ntex >= 0
            nx = jnp.where(use_map, mnx, nx)
            ny = jnp.where(use_map, mny, ny)
            nz = jnp.where(use_map, mnz, nz)

        if has_rtex:
            rtex = row(attrs_t, "roughness_tex").astype(jnp.int32)
            rwh = sub["roughness_tex_wh"].start
            rough_tex = sample_nearest_wh(scene.textures, rtex,
                                          attrs_t[rwh], attrs_t[rwh + 1],
                                          uvu, uvv)
            roughness = jnp.where(rtex >= 0, rough_tex[:, 0], roughness)

        pox, poy, poz = px + nx * EPS, py + ny * EPS, pz + nz * EPS

        # ---- randoms ----
        if rand_override is not None:
            rr_rand, u_rand, th_rand, fr_rand = (rand_override[h, 0],
                                                 rand_override[h, 1],
                                                 rand_override[h, 2],
                                                 rand_override[h, 3])
        else:
            k = jax.random.fold_in(key, h)
            rr_rand, u_rand, th_rand, fr_rand = jax.random.uniform(
                k, (4, n), jnp.float32)

        # ---- Russian roulette (from the max_depth-th hit on) ----
        rr_active = jnp.asarray(h >= max_depth - 1)
        killed = hit & rr_active & (rr_rand > row(attrs_t, "rr_prob"))

        # ---- emissivity / reflectivity (+ temperature-grid re-bake) ----
        # miss: sky, die. kill: BAKED emissivity, die. survive: effective
        # emissivity, throughput *= effective reflectivity.
        miss = alive & ~hit
        survive = hit & ~killed
        if use_hero:
            # hero-packed state: per-ray SCALAR throughput/radiance for
            # the hero channel (throughput_t/radiance_t are [N] here).
            # Two exact routes to the same baked table entries (see
            # HERO_FLAT_GATHER_MIN_NW): at large nw, ONE [N, 2] row
            # gather from the flat [T*nw, 2] table (barrier for the same
            # reason as _fetch_attrs_t — XLA re-fuses an unbarriered
            # gather into each consumer); below, the fetched [nw, N]
            # rows + one-hot select.
            if hero_flat:
                flat_idx = idx * nw + hero
                er = jax.lax.optimization_barrier(
                    er_flat[flat_idx])                       # [N, 2]
                emis_b = er[:, 0]
                refl_b = er[:, 1]
            else:
                emis_b = hero_sel(rows(attrs_t, "emissivity"))
                refl_b = hero_sel(rows(attrs_t, "reflectivity"))
            if has_grids:
                grid = row(attrs_t, "temp_grid").astype(jnp.int32)
                gwh = sub["temp_grid_wh"].start
                temp = sample_nearest_wh(scene.temp_grids, grid,
                                         attrs_t[gwh], attrs_t[gwh + 1],
                                         uvu, uvv)
                bbp_h = planck.planck_bbp_elem(
                    temp + planck.CELSIUS_OFFSET, wn_hero)
                eps_h = (eps_flat[flat_idx] if hero_flat
                         else hero_sel(rows(attrs_t, "eps_curve")))
                hg = grid >= 0
                emis_eff = jnp.where(hg, bbp_h * eps_h, emis_b)
                refl_eff = jnp.where(hg, bbp_h * (1.0 - eps_h), refl_b)
            else:
                emis_eff = emis_b
                refl_eff = refl_b
            contrib = (miss * sky_hero + killed * emis_b
                       + survive * emis_eff)
            radiance_t = radiance_t + throughput_t * contrib
            throughput_t = jnp.where(survive, throughput_t * refl_eff,
                                     throughput_t)
        else:
            emis_t = rows(attrs_t, "emissivity")        # [nw, N]
            refl_t = rows(attrs_t, "reflectivity")
            if has_grids:
                grid = row(attrs_t, "temp_grid").astype(jnp.int32)
                gwh = sub["temp_grid_wh"].start
                temp = sample_nearest_wh(scene.temp_grids, grid,
                                         attrs_t[gwh], attrs_t[gwh + 1],
                                         uvu, uvv)
                bbp_t = planck.planck_bbp(temp + planck.CELSIUS_OFFSET,
                                          scene.wavenumbers).T   # [nw, N]
                eps_t = rows(attrs_t, "eps_curve")
                has_grid = (grid >= 0)[None, :]
                emis_eff = jnp.where(has_grid, bbp_t * eps_t, emis_t)
                refl_eff = jnp.where(has_grid, bbp_t * (1.0 - eps_t), refl_t)
            else:
                emis_eff = emis_t
                refl_eff = refl_t
            contrib = (miss[None, :] * scene.sky[:, None]
                       + killed[None, :] * emis_t
                       + survive[None, :] * emis_eff)
            radiance_t = radiance_t + throughput_t * contrib
            throughput_t = jnp.where(survive[None, :],
                                     throughput_t * refl_eff, throughput_t)

        # ---- bounce ----
        if use_cauchy:
            ior_hero = (ior_flat[flat_idx] if hero_flat
                        else jnp.sum(rows(attrs_t, "ior_curve")
                                     * hero_onehot_t, axis=0))
            ior_hero = jnp.maximum(ior_hero, 1.0 + 1e-6)
            eta_kw = dict(eta_inside=ior_hero, eta_outside=1.0 / ior_hero)
        else:
            # dispersion="hero" keeps the reference glass (hardcoded 1.5,
            # pathtracer.cpp:493) — the estimator changes, the physics not
            eta_kw = {}
        mat_i = row(attrs_t, "mat_type").astype(jnp.int32)
        b = sampling.sample_bounce_soa(
            mat_i,
            rdx, rdy, rdz, nx, ny, nz, roughness, inside,
            u_rand, th_rand, fr_rand, **eta_kw)
        # Dead rays are parked far away with a zero direction: the triangle
        # predicate rejects them (denom == 0) and the cluster/group slab
        # tests cull them (t_near = t_far = -inf), so terminated lanes stop
        # paying for traversal — soft compaction without any reordering.
        back = jnp.where(b.refracted, EPS * 2.0, 0.0)
        park = jnp.float32(1e30)
        rox = jnp.where(survive, pox - nx * back, park)
        roy = jnp.where(survive, poy - ny * back, park)
        roz = jnp.where(survive, poz - nz * back, park)
        rdx = jnp.where(survive, b.dx, 0.0)
        rdy = jnp.where(survive, b.dy, 0.0)
        rdz = jnp.where(survive, b.dz, 0.0)
        inside = jnp.where(survive, b.new_inside, inside)
        alive = survive
        new_state = (rox, roy, roz, rdx, rdy, rdz,
                     throughput_t, radiance_t, inside, alive, rays_traced)
        if sort_mat:
            new_state += (jnp.where(survive, mat_i, 0),)
        if want_perm:
            return new_state, (perm, inv)
        return new_state

    if use_hero:
        # hero estimator: E[nw * onehot(hero)] = 1 per channel; packed as a
        # scalar per ray, scattered to [nw, N] once at the end
        throughput0 = jnp.full((n,), jnp.float32(nw))
        radiance0 = jnp.zeros((n,), jnp.float32)
    else:
        throughput0 = jnp.ones((nw, n), jnp.float32)
        radiance0 = jnp.zeros((nw, n), jnp.float32)
    state = (ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2],
             throughput0, radiance0,
             jnp.zeros(n, bool),
             jnp.ones(n, bool),
             jnp.zeros((), jnp.int32))
    if sort_mat:
        state += (jnp.zeros(n, jnp.int32),)
    # bounce 0 is always peeled: primary rays are tile-ordered already (no
    # sort needed) and the caller may supply the hoisted intersection
    state = body(0, state, hit0=primary0)
    if do_reorder and reorder_period >= 2 and 2 * max_depth > 2:
        # permutation reuse: iterations pair as (fresh sort, reuse) — the
        # reuse iteration skips key + 2 argsorts but keeps both gathers.
        # Result-exact for ANY permutation; see the body() comment.
        n_pairs = (2 * max_depth - 1) // 2

        def pair(j, st):
            h0 = 1 + 2 * j
            st, pi = body(h0, st, do_sort=True, want_perm=True)
            return body(h0 + 1, st, do_sort=True, perm_in=pi)

        state = jax.lax.fori_loop(0, n_pairs, pair, state)
        if (2 * max_depth - 1) % 2:
            state = body(2 * max_depth - 1, state, do_sort=True)
    else:
        if reorder_from == "auto":
            reorder_from = reorder_from_policy(n_tris, max_depth)
        first_sorted = min(max(int(reorder_from), 1), 2 * max_depth)
        if do_reorder and first_sorted > 1:
            # early iterations are ~fully live: run them unsorted (the
            # parked-lane packing the sort provides has nothing to pack),
            # then sort from `first_sorted` on
            state = jax.lax.fori_loop(1, first_sorted,
                                      functools.partial(body,
                                                        do_sort=False),
                                      state)
        freeze = (min(int(reorder_freeze), 2 * max_depth - 1)
                  if reorder_freeze and do_reorder else 0)
        last_fresh = freeze if freeze >= first_sorted else 2 * max_depth
        state = jax.lax.fori_loop(first_sorted if do_reorder else 1,
                                  min(last_fresh, 2 * max_depth),
                                  functools.partial(body,
                                                    do_sort=do_reorder),
                                  state)
        if do_reorder and first_sorted <= last_fresh < 2 * max_depth:
            # freeze: one more fresh sort that also returns its
            # permutation, then reuse it for the remaining iterations
            # (see the reorder_freeze arg note — result-exact)
            state, pi = body(last_fresh, state, do_sort=True,
                             want_perm=True)
            state = jax.lax.fori_loop(last_fresh + 1, 2 * max_depth,
                                      functools.partial(body, do_sort=True,
                                                        perm_in=pi),
                                      state)
    throughput_t, radiance_t, alive, rays_traced = (state[6], state[7],
                                                    state[9], state[10])

    # depth-cap fall-through: surviving rays see the sky (pathtracer.cpp:536-540)
    if use_hero:
        radiance_s = radiance_t + alive * throughput_t * sky_hero
        radiance_t = hero_onehot_t * radiance_s      # scatter to [nw, N]
    else:
        radiance_t = (radiance_t
                      + alive[None, :] * throughput_t * scene.sky[:, None])
    return TraceResult(radiance_t.T, rays_traced)


@functools.partial(jax.jit,
                   static_argnames=("max_depth", "backend", "leaf_size",
                                    "dispersion", "reorder"))
def render_sample(scene: SceneData, ro, rd, total, samples, key,
                  max_depth: int, backend: str = "auto", leaf_size: int = 4,
                  dispersion: bool = False, reorder: object = "auto"):
    """One progressive sample: trace all pixels once and accumulate.

    Reproduces ``RenderFrame``'s accumulation (pathtracer.cpp:595-598):
    ``total += wave; out = total / samples``.

    Returns (total', samples', out, rays_traced).
    """
    res = trace_radiance(scene, ro, rd, key, max_depth, backend, leaf_size,
                         dispersion=dispersion, reorder=reorder)
    total = total + res.radiance
    samples = samples + 1
    out = total / samples.astype(jnp.float32)
    return total, samples, out, res.rays_traced


@functools.partial(jax.jit,
                   static_argnames=("n_steps", "max_depth", "backend",
                                    "leaf_size", "dispersion", "reorder",
                                    "reorder_period", "reorder_from",
                                    "reorder_freeze", "chunks"),
                   donate_argnums=(3,))
def render_samples(scene: SceneData, ro, rd, total, samples, base_key,
                   counter0, n_steps: int, max_depth: int,
                   backend: str = "auto", leaf_size: int = 4,
                   dispersion: bool = False, reorder: object = "auto",
                   jitter_cam=None, reorder_period: int = 1,
                   reorder_from: object = "auto",
                   reorder_freeze: int = 0, chunks: int = 1):
    """``n_steps`` progressive samples in ONE dispatch.

    Per-call launch latency on a tunneled/remote TPU can reach hundreds of
    ms, so the per-sample loop lives inside the compiled program. Sample
    ``i`` uses ``fold_in(base_key, counter0 + i)`` — the same key schedule
    as repeated ``render_sample`` calls, so checkpoint-resume stays exact.

    Returns (total', samples', out, rays_traced_total).

    The primary-ray intersection AND its attribute fetch are sample-
    invariant (fixed rays, no RNG before the first hit), so both are
    computed ONCE here and reused by every sample in the batch — at 1080p
    that hoists ~60 ms/sample of pallas-kernel time XLA's loop-invariant
    code motion cannot touch (custom calls). The downstream pure geometry
    ops become loop-invariant too and XLA hoists them itself. Bit-
    identical: the same calls, made earlier.

    ``jitter_cam`` (models.camera.JitterCam) switches on batched sub-pixel
    jitter: sample ``i`` regenerates its ray directions in-dispatch from
    ``fold_in(fold_in(key_i, 0xC0FFEE))`` draws, so jitter renders batch
    exactly like non-jitter ones instead of paying one dispatch per sample.
    Primary rays then differ per sample, so the primary-hit hoist is
    disabled (it would be wrong).
    """
    if jitter_cam is None:
        pre_intersect, resolved = make_intersector(scene, backend, leaf_size)
        hit0 = pre_intersect(ro[:, 0], ro[:, 1], ro[:, 2],
                             rd[:, 0], rd[:, 1], rd[:, 2])
        nw = scene.wavenumbers.shape[0]
        has_ntex, has_rtex, has_grids = _texture_flags(scene)
        sub0, cols_idx0 = _column_subset(
            shade_layout(nw), resolved, has_ntex, has_rtex, has_grids,
            (dispersion is True) and nw > 0,
            hero=bool(dispersion) and nw >= HERO_FLAT_GATHER_MIN_NW)
        shade_sub0 = scene.tri_shade[:, cols_idx0]
        on_pallas = (jax.devices()[0].platform.lower() in ("tpu", "axon")
                     and resolved in ("dense_pallas", "cluster",
                                      "shortlist", "worklist", "hier"))
        attrs0 = _fetch_attrs_t(hit0[2], shade_sub0, shade_sub0.T, on_pallas)
        primary0 = hit0 + (attrs0,)
    else:
        primary0 = None

    if chunks > 1:
        # Bounded-width wavefront: trace the frame as `chunks` sequential
        # sub-wavefronts via lax.map (one traced body, scanned). The
        # per-lane iteration cost GROWS with wavefront width on v5e
        # (measured ~2.1 ns/lane-iteration at 259k-lane chunks vs 3.5 ns
        # at the full 8.3M-lane 4K wavefront; chunks=32 at 4K: 219.8 vs
        # 134.0 Mrays/s unchunked — docs/tpu_cost_model.md "4K
        # bounded-width" entry), so a 4K frame runs faster as 512²-sized
        # chunks; it also bounds the HBM working set (attrs planes scale
        # with chunk width, not frame).
        # Chunk c of sample i draws from fold_in(fold_in(base_key,
        # counter0+i), 0xC40000+c) — per-(chunks, seed) deterministic;
        # per-pixel math is width-independent, so results differ from
        # chunks=1 only by the variate stream (unbiased either way; the
        # trace-level equivalence under shared variates is pinned by
        # test_chunked_trace_bit_identical).
        if jitter_cam is not None:
            raise ValueError("chunks > 1 does not support jitter_cam yet")
        n = ro.shape[0]
        if n % chunks:
            raise ValueError(f"ray count {n} must divide chunks={chunks}")
        nc = n // chunks
        ro_c = ro.reshape(chunks, nc, 3)
        rd_c = rd.reshape(chunks, nc, 3)
        if primary0 is not None:
            prim_c = tuple(p.reshape(chunks, nc) for p in primary0[:5])
            attrs_c = (primary0[5].reshape(-1, chunks, nc)
                       .transpose(1, 0, 2))          # [C, F', nc]
        cidx = jnp.arange(chunks, dtype=jnp.int32)

        def body(i, carry):
            total, samples, rays = carry
            k = jax.random.fold_in(base_key, counter0 + i)

            def chunk_fn(args):
                c = args[0]
                roc, rdc = args[1], args[2]
                prim = (tuple(args[3:8]) + (args[8],)
                        if primary0 is not None else None)
                kc = jax.random.fold_in(k, 0xC40000 + c)
                res = trace_radiance(scene, roc, rdc, kc, max_depth,
                                     backend, leaf_size,
                                     dispersion=dispersion,
                                     reorder=reorder, primary0=prim,
                                     reorder_period=reorder_period,
                                     reorder_from=reorder_from,
                                     reorder_freeze=reorder_freeze)
                return res.radiance, res.rays_traced

            operands = (cidx, ro_c, rd_c)
            if primary0 is not None:
                operands = operands + prim_c + (attrs_c,)
            rad_c, rays_c = jax.lax.map(chunk_fn, operands)
            return (total + rad_c.reshape(total.shape), samples + 1,
                    rays + jnp.sum(rays_c))
    else:
        def body(i, carry):
            total, samples, rays = carry
            k = jax.random.fold_in(base_key, counter0 + i)
            if jitter_cam is not None:
                from .models.camera import jittered_dirs
                ck = jax.random.fold_in(k, 0xC0FFEE)
                kx, ky = jax.random.split(ck)
                n = jitter_cam.px.shape[0]
                rd_i = jittered_dirs(jitter_cam,
                                     jax.random.uniform(kx, (n,)),
                                     jax.random.uniform(ky, (n,)))
            else:
                rd_i = rd
            res = trace_radiance(scene, ro, rd_i, k, max_depth, backend,
                                 leaf_size, dispersion=dispersion,
                                 reorder=reorder, primary0=primary0,
                                 reorder_period=reorder_period,
                                 reorder_from=reorder_from,
                                 reorder_freeze=reorder_freeze)
            return total + res.radiance, samples + 1, rays + res.rays_traced

    total, samples, rays = jax.lax.fori_loop(
        0, n_steps, body, (total, samples, jnp.zeros((), jnp.int32)))
    out = total / samples.astype(jnp.float32)
    return total, samples, out, rays
