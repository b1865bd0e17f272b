"""Persistent-wavefront progressive renderer (opt-in fast path).

The standard engine (engine.py) advances one SAMPLE of every pixel in
lockstep: 2*depth bounce iterations over [N] rays whose alive fraction
decays (measured average ~1.9 live iterations of 6 on the textured-1080p
benchmark) — late iterations pay full-lane cost for mostly-dead lanes,
and XLA's static shapes make those lanes unskippable within a sample.

This module keeps lanes busy instead: a persistent pool of path slots, ONE
SLOT PER PIXEL. Each iteration:

* **Restart (phase A)**: a slot that is between samples and below the
  sample target starts its pixel's next sample — NOT at the primary ray
  but directly at the FIRST BOUNCE, using a precomputed primary-hit bundle
  (the primary ray is static per slot, so its hit, attributes, shading
  frame and emissivity/reflectivity are sample-invariant — computed once
  per call, never re-intersected). Pixels whose primary ray misses fold a
  whole sky sample per iteration with zero ray work.
* **Intersect + shade + bounce (phases B/C)**: the pooled rays run the
  same intersect/fetch/shade/bounce math as engine.body (identical
  formulas, per-path depth for Russian roulette and the 2*depth cap,
  contribution rules of pathtracer.cpp:424-541). Terminated paths fold
  their radiance into the slot accumulator ELEMENTWISE — pinning slots to
  pixels is what removes the scatter a classic wavefront pool needs (a
  [2M, 4] TPU row scatter measured 85 ms) — and go inactive until phase A
  revives them.
* **Parking**: slots at the sample target stay inactive (parked rays cull
  through the reorder + shortlist path), so a "render N spp" run does not
  overshoot fast pixels while slow ones catch up.

RNG: two independent draw sets per iteration — one for phase-A restart
bounces, one for phase-C path bounces — so no variate is consumed twice.
Every per-pixel sample is the same unbiased estimator the standard engine
computes; only the RNG *schedule* differs, so images match statistically,
not bit-for-bit — validated against the standard path in
tests/test_wavefront.py (statistical + furnace closed-form).

Not supported (RenderSession raises): jitter (primary rays must be static
per slot), dispersion (hero selection is per-sample; assignable at restart
time — round-3 candidate), sharding.

**Measured verdict (v5e)**: correct but SLOWER than the lockstep engine —
1.95 vs 2.31 spp/s on textured 1080p, 4.9 vs 6.0 on the 52k terrain. Two
structural reasons: (a) attribute fetch / texture / shading are lane-fixed
costs under XLA's static shapes, so an iteration with mostly-parked slots
still pays them in full, while the lockstep engine's primary-hit hoist +
reorder compaction already harvest most of the occupancy win; (b) the
equal-spp contract gates each step on the *slowest* pixels (deep paths run
to the 2*depth cap with rr=0.95), so endgame iterations run nearly empty.
Kept as an experimental mode (`RenderSession(persistent=True)` /
`render --persistent`): it is the scaffold for a future
compaction-across-dispatches design, and the only mode whose per-sample
cost is insensitive to path-length variance.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .constants import EPS
from .scene import SceneData
from .ops import sampling
from .engine import BIG
from .reorder import (REORDER_AUTO_MIN_TRIS, scene_bounds, segment_for,
                      sort_key)
from . import engine_common as ec


class WavefrontState(NamedTuple):
    """Loop-carried pool state (all [M] planes / [nw, M] spectra)."""

    rox: jnp.ndarray
    roy: jnp.ndarray
    roz: jnp.ndarray
    rdx: jnp.ndarray
    rdy: jnp.ndarray
    rdz: jnp.ndarray
    throughput: jnp.ndarray    # [nw, M]
    path_rad: jnp.ndarray      # [nw, M] — radiance of the path in flight
    inside: jnp.ndarray        # [M] bool
    depth: jnp.ndarray         # [M] int32 — hits processed so far
    active: jnp.ndarray        # [M] bool — carrying a live path
    total: jnp.ndarray         # [nw, M] — completed-sample accumulator
    count: jnp.ndarray         # [M] int32 — completed samples per slot
    rays_traced: jnp.ndarray   # [] int32
    iteration: jnp.ndarray     # [] int32 — global RNG counter


def init_state(n: int, nw: int) -> WavefrontState:
    """Fresh pool: every slot inactive between samples; the first
    iteration's restart phase primes it."""
    park = jnp.full((n,), 1e30, jnp.float32)
    zero = jnp.zeros((n,), jnp.float32)
    return WavefrontState(
        rox=park, roy=park, roz=park, rdx=zero, rdy=zero, rdz=zero,
        throughput=jnp.zeros((nw, n), jnp.float32),
        path_rad=jnp.zeros((nw, n), jnp.float32),
        inside=jnp.zeros((n,), bool),
        depth=jnp.zeros((n,), jnp.int32),
        active=jnp.zeros((n,), bool),
        total=jnp.zeros((nw, n), jnp.float32),
        count=jnp.zeros((n,), jnp.int32),
        rays_traced=jnp.zeros((), jnp.int32),
        iteration=jnp.zeros((), jnp.int32))


@functools.partial(jax.jit,
                   static_argnames=("n_iters", "max_depth", "backend",
                                    "leaf_size"))
def run_iterations(scene: SceneData, ro, rd, state: WavefrontState,
                   base_key, target, n_iters: int, max_depth: int,
                   backend: str = "auto",
                   leaf_size: int = 4) -> WavefrontState:
    """Advance the pool by ``n_iters`` iterations toward ``target``
    samples per slot (traced scalar; slots at the target stay parked).

    ro, rd: [N, 3] static primary rays (slot i's samples all start there).
    """
    n = ro.shape[0]
    nw = scene.wavenumbers.shape[0]
    n_tris = scene.tri_shade.shape[0]
    # sorted_intersect rides the hit index through an f32 plane
    assert n_tris < (1 << 24), "float-exact idx pack needs T < 2^24"
    ctx = ec.make_ctx(scene, backend, leaf_size)
    intersect = ctx.intersect
    do_reorder = (ctx.on_pallas and ctx.backend in ("cluster", "shortlist",
                                                    "worklist", "hier")
                  and n_tris >= REORDER_AUTO_MIN_TRIS)
    # restart-at-first-bounce needs RR-free primary hits: RR activates at
    # hit index max_depth-1, so max_depth == 1 restarts at the primary ray
    inline_primary = max_depth >= 2

    pdx, pdy, pdz = rd[:, 0], rd[:, 1], rd[:, 2]

    # ---- sample-invariant primary-hit bundle (computed once per call) ----
    if inline_primary:
        ph_hit, ph_t, ph_idx, ph_s2, ph_s3 = intersect(
            ro[:, 0], ro[:, 1], ro[:, 2], pdx, pdy, pdz)
        ph_attrs = ec.fetch_attrs(ctx, ph_idx)
        (ph_pox, ph_poy, ph_poz, ph_nx, ph_ny, ph_nz, ph_rough,
         ph_uvu, ph_uvv) = ec.shade_geometry(
            ctx, ph_attrs, ro[:, 0], ro[:, 1], ro[:, 2], pdx, pdy, pdz,
            ph_t, ph_s2, ph_s3)
        _, ph_emis_eff, ph_refl_eff = ec.material_spectra(ctx, ph_attrs,
                                                          ph_uvu, ph_uvv)
        ph_mat = ec.row(ctx, ph_attrs, "mat_type").astype(jnp.int32)

    if do_reorder:
        smin, inv_ext = scene_bounds(scene)
        seg = segment_for(n)

        def sorted_intersect(ox, oy, oz, dx, dy, dz):
            """Same segmented (octant, morton) reorder as engine.body —
            the key comes from the shared reorder.sort_key (the pool has
            no parked rays here, so every ray is keyed live)."""
            key = sort_key(ox, oy, oz, dx, dy, dz, jnp.bool_(True),
                           smin, inv_ext, morton=True)
            ns = n // seg
            perm_l = jnp.argsort(key.reshape(ns, seg), axis=1,
                                 stable=True).astype(jnp.int32)
            inv_l = jnp.argsort(perm_l, axis=1).astype(jnp.int32)
            offs = (jnp.arange(ns, dtype=jnp.int32) * seg)[:, None]
            perm = (perm_l + offs).reshape(-1)
            inv = (inv_l + offs).reshape(-1)
            packed = jnp.stack([ox, oy, oz, dx, dy, dz], axis=1)[perm]
            hit_s, t_s, idx_s, s2_s, s3_s = intersect(
                packed[:, 0], packed[:, 1], packed[:, 2],
                packed[:, 3], packed[:, 4], packed[:, 5])
            res = jnp.stack([t_s, s2_s, s3_s,
                             idx_s.astype(jnp.float32)], axis=1)
            out = res[inv]
            return (out[:, 0] < BIG, out[:, 0],
                    out[:, 3].astype(jnp.int32), out[:, 1], out[:, 2])

    def body(i, state: WavefrontState) -> WavefrontState:
        (rox, roy, roz, rdx, rdy, rdz, throughput, path_rad, inside,
         depth, active, total, count, rays_traced, iteration) = state

        # two independent draw sets: restarts must not share variates with
        # the in-flight paths' bounces (a slot can need both per iteration)
        k = jax.random.fold_in(base_key, iteration + i)
        (rr_rand, u_rand, th_rand, fr_rand,
         ru_rand, rth_rand, rfr_rand) = jax.random.uniform(
            k, (7, n), jnp.float32)

        # ---- phase A: restart idle below-target slots at bounce 1 ----
        restart = ~active & (count < target)
        if inline_primary:
            rb = sampling.sample_bounce_soa(
                ph_mat, pdx, pdy, pdz, ph_nx, ph_ny, ph_nz, ph_rough,
                jnp.zeros((n,), bool), ru_rand, rth_rand, rfr_rand)
            back = jnp.where(rb.refracted, EPS * 2.0, 0.0)
            # primary miss: the whole sample is the sky — fold instantly,
            # the slot never activates (one sample/iteration, no ray work)
            instant = restart & ~ph_hit
            total = total + instant[None, :] * scene.sky[:, None]
            count = count + instant.astype(jnp.int32)
            go = restart & ph_hit
            rox = jnp.where(go, ph_pox - ph_nx * back, rox)
            roy = jnp.where(go, ph_poy - ph_ny * back, roy)
            roz = jnp.where(go, ph_poz - ph_nz * back, roz)
            rdx = jnp.where(go, rb.dx, rdx)
            rdy = jnp.where(go, rb.dy, rdy)
            rdz = jnp.where(go, rb.dz, rdz)
            throughput = jnp.where(go[None, :], ph_refl_eff, throughput)
            path_rad = jnp.where(go[None, :], ph_emis_eff, path_rad)
            inside = jnp.where(go, rb.new_inside, inside)
            depth = jnp.where(go, 1, depth)
            active = active | go
        else:
            # max_depth == 1: restart at the primary ray (RR applies from
            # the very first hit, so it cannot be pre-folded)
            rox = jnp.where(restart, ro[:, 0], rox)
            roy = jnp.where(restart, ro[:, 1], roy)
            roz = jnp.where(restart, ro[:, 2], roz)
            rdx = jnp.where(restart, pdx, rdx)
            rdy = jnp.where(restart, pdy, rdy)
            rdz = jnp.where(restart, pdz, rdz)
            throughput = jnp.where(restart[None, :], 1.0, throughput)
            path_rad = jnp.where(restart[None, :], 0.0, path_rad)
            inside = jnp.where(restart, False, inside)
            depth = jnp.where(restart, 0, depth)
            active = active | restart
        rays_traced = rays_traced + jnp.sum(active.astype(jnp.int32))

        # ---- phase B: intersect the pool (inactive slots are parked) ----
        isect = sorted_intersect if do_reorder else intersect
        hit, t, idx, s2, s3 = isect(rox, roy, roz, rdx, rdy, rdz)
        hit = hit & active

        attrs_t = ec.fetch_attrs(ctx, idx)
        (pox, poy, poz, nx, ny, nz, roughness,
         uvu, uvv) = ec.shade_geometry(ctx, attrs_t, rox, roy, roz,
                                       rdx, rdy, rdz, t, s2, s3)
        emis_t, emis_eff, refl_eff = ec.material_spectra(ctx, attrs_t,
                                                         uvu, uvv)

        # ---- phase C: per-path RR, contribution, bounce, termination ----
        rr_active = depth >= (max_depth - 1)
        killed = hit & rr_active & (rr_rand
                                    > ec.row(ctx, attrs_t, "rr_prob"))
        miss = active & ~hit
        survive = hit & ~killed

        contrib = (miss[None, :] * scene.sky[:, None]
                   + killed[None, :] * emis_t
                   + survive[None, :] * emis_eff)
        path_rad = path_rad + throughput * contrib
        throughput = jnp.where(survive[None, :], throughput * refl_eff,
                               throughput)

        b = sampling.sample_bounce_soa(
            ec.row(ctx, attrs_t, "mat_type").astype(jnp.int32),
            rdx, rdy, rdz, nx, ny, nz, roughness, inside,
            u_rand, th_rand, fr_rand)
        back = jnp.where(b.refracted, EPS * 2.0, 0.0)
        depth = depth + hit.astype(jnp.int32)
        # depth cap: survivors at 2*max_depth fall through to the sky
        # (pathtracer.cpp:536-540) and terminate now
        capped = survive & (depth >= 2 * max_depth)
        path_rad = path_rad + jnp.where(capped[None, :],
                                        throughput * scene.sky[:, None],
                                        0.0)
        terminated = miss | killed | capped
        live = survive & ~capped

        total = total + jnp.where(terminated[None, :], path_rad, 0.0)
        count = count + terminated.astype(jnp.int32)
        active = active & ~terminated
        park = jnp.float32(1e30)
        rox = jnp.where(live, pox - nx * back, jnp.where(terminated, park,
                                                         rox))
        roy = jnp.where(live, poy - ny * back, jnp.where(terminated, park,
                                                         roy))
        roz = jnp.where(live, poz - nz * back, jnp.where(terminated, park,
                                                         roz))
        rdx = jnp.where(live, b.dx, jnp.where(terminated, 0.0, rdx))
        rdy = jnp.where(live, b.dy, jnp.where(terminated, 0.0, rdy))
        rdz = jnp.where(live, b.dz, jnp.where(terminated, 0.0, rdz))
        inside = jnp.where(live, b.new_inside, inside)

        return WavefrontState(rox, roy, roz, rdx, rdy, rdz, throughput,
                              path_rad, inside, depth, active, total,
                              count, rays_traced, iteration)

    state = jax.lax.fori_loop(0, n_iters, body, state)
    return state._replace(iteration=state.iteration + n_iters)
