"""Compaction-across-dispatches progressive engine (shrinking live prefix).

The lockstep engine advances one sample of every pixel through ``2*depth``
bounce iterations at FULL lane width; its alive fraction decays fast
(textured 1080p: average ~1.9 live iterations of 6), so late iterations
pay full-width intersect/fetch/shade for mostly-dead lanes — XLA's static
shapes make those lanes unskippable *within* one trace. This engine makes
the width itself shrink, the design specced in docs/tpu_cost_model.md
("round-3 lead"): the capability anchor is the reference, which never
pays for dead pixels — a terminated path simply returns up the recursion
(pathtracer.cpp:581-598).

How it works, all inside ONE dispatch per batch (static shapes):

* the 2*depth bounce iterations are cut into **spans** by a per-scene
  ``schedule``: a tuple of ``(h, P)`` pairs — "from iteration h on, only
  the first P ray slots exist". Span 0 is always (0, N).
* at each split the live rays are sorted to the front (the same segmented
  octant/morton sort the engine already runs per bounce, with dead rays
  keyed to the top) and the whole per-ray state — rays, throughput,
  radiance, inside flag, original slot id — moves as ONE packed
  [P, 8+2nw] row table. Subsequent iterations run every component
  (intersect, attribute fetch, texturing, shading, RNG) at width P.
* the schedule is **learned, not guessed**: the first sample runs with an
  empty schedule (full width — bit-identical to engine.render_samples by
  construction) and returns the per-iteration alive counts; the host
  quantizes them (x1.15 margin, power-of-two-ish rungs) into a schedule
  and compiles the batched variant once. Counts are deterministic given
  the seed, so the schedule — and therefore every rendered image — is
  reproducible run-to-run and across checkpoint resume (the schedule is
  saved in checkpoints).
* correctness never depends on the margin: each split also counts the
  live rays; if they exceed the new prefix the sample is **poisoned** —
  its contribution is zeroed, its slot in the returned validity mask
  cleared, and the host re-renders exactly those samples at full width
  (deterministically). No ray is ever silently dropped.
* a sample's radiance ends in split-scrambled order; each row carries its
  original slot id, so one ``argsort(src)`` + one [N, nw] row gather per
  sample restores slot order before accumulation.

RNG schedule: sample i uses ``fold_in(base_key, counter0 + i)``, bounce h
draws ``uniform(fold_in(key_i, h), (4, P_h))`` — with an empty schedule
(P_h == N everywhere) this is byte-for-byte the lockstep engine's
schedule, which the bit-identity test pins. With splits the draws are
assigned by compacted position instead of slot — a different (equally
i.i.d.) variate assignment, statistically validated like the persistent
engine.

Not supported (RenderSession raises): jitter (the primary hoist and
learning assume static primaries), dispersion (hero packing is already
width-1), sharding.

**Measured verdict (v5e, round 3): correct but SLOWER — opt-in only.**
Textured 1080p: 0.19 vs 2.25 spp/s. The whole-state split moves (packed
[P, 16] row gathers, the [nw, P] transposes around them, and the
per-sample argsort(src) unscramble) cost seconds at 2M rays on this
memory system — the round-2 cost-model numbers that made them look
affordable (segmented argsort 3.1 ms, row gathers 10-12 ms @2M) turned
out to be dispatch-latency artifacts of a warm-up that relied on
``block_until_ready``, which does not block through the axon relay
(docs/tpu_cost_model.md, round-3 correction). The engine is kept as a
correct, schedule-learned, poison-safe implementation of the design —
``RenderSession(compact=True)`` — and as the measurement record; on
hardware where permutation moves run near memcpy speed the same code is
the right architecture.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .constants import EPS
from .ops import sampling
from .engine import (BIG, REORDER_AUTO_MIN_TRIS, REORDER_POS_BITS,
                     REORDER_SEGMENT)
from . import engine_common as ec

# Schedule quantization: prefixes are multiples of this (and of 1024).
PREFIX_MARGIN = 1.15
MAX_SPLITS = 3


def _segment_for(n: int) -> int:
    """Largest segment <= REORDER_SEGMENT dividing n in whole 1024-ray
    blocks (engine.py's rule)."""
    for d in range(REORDER_SEGMENT // 1024, 0, -1):
        if n % (1024 * d) == 0:
            return 1024 * d
    return n


def _scene_bounds(scene):
    ca = scene.cluster_aabbs
    cvalid = (ca[:, 0] <= ca[:, 3])[:, None]
    smin = jnp.min(jnp.where(cvalid, ca[:, 0:3], jnp.inf), axis=0)
    smax = jnp.max(jnp.where(cvalid, ca[:, 3:6], -jnp.inf), axis=0)
    return smin, 1.0 / jnp.maximum(smax - smin, 1e-6)


def _sort_key(ox, oy, oz, dx, dy, dz, alive, smin, inv_ext):
    """Engine.body's reorder key: (dead, direction octant, origin morton);
    dead rays key to the top bucket so live rays compact to the front."""
    cells = 1 << REORDER_POS_BITS

    def q(v, lo, ie):
        return jnp.clip(((v - lo) * ie * cells).astype(jnp.int32),
                        0, cells - 1)

    qx = q(ox, smin[0], inv_ext[0])
    qy = q(oy, smin[1], inv_ext[1])
    qz = q(oz, smin[2], inv_ext[2])
    m = jnp.zeros_like(qx)
    for b in range(REORDER_POS_BITS):
        m = (m | (((qx >> b) & 1) << (3 * b + 2))
             | (((qy >> b) & 1) << (3 * b + 1))
             | (((qz >> b) & 1) << (3 * b)))
    octant = ((dx < 0).astype(jnp.int32) * 4
              + (dy < 0).astype(jnp.int32) * 2
              + (dz < 0).astype(jnp.int32))
    key = (octant << (3 * REORDER_POS_BITS)) | m
    return jnp.where(alive, key, jnp.int32(1) << (3 * REORDER_POS_BITS + 3))


def _segmented_perm(key, n):
    seg = _segment_for(n)
    ns = n // seg
    perm_l = jnp.argsort(key.reshape(ns, seg), axis=1,
                         stable=True).astype(jnp.int32)
    inv_l = jnp.argsort(perm_l, axis=1).astype(jnp.int32)
    offs = (jnp.arange(ns, dtype=jnp.int32) * seg)[:, None]
    return (perm_l + offs).reshape(-1), (inv_l + offs).reshape(-1)


@functools.partial(
    jax.jit,
    static_argnames=("n_steps", "max_depth", "backend", "leaf_size",
                     "schedule"),
    donate_argnums=(3,))
def compact_render_samples(scene, ro, rd, total, samples, base_key,
                           counter0, n_steps: int, max_depth: int,
                           backend: str = "auto", leaf_size: int = 4,
                           schedule: Tuple[Tuple[int, int], ...] = ()):
    """``n_steps`` progressive samples in ONE dispatch with a shrinking
    live prefix per ``schedule``.

    Returns ``(total', samples', out, rays_traced, alive_profile [2d],
    valid [n_steps] bool)``. With ``schedule=()`` results are
    bit-identical to :func:`engine.render_samples` (pinned by test) and
    ``alive_profile`` holds the LAST sample's per-iteration live counts —
    the input the host uses to learn a schedule.
    """
    n = ro.shape[0]
    nw = scene.wavenumbers.shape[0]
    n_tris = scene.tri_shade.shape[0]
    assert n < (1 << 24), "float-exact src pack needs N < 2^24"
    ctx = ec.make_ctx(scene, backend, leaf_size)
    do_reorder = (ctx.on_pallas
                  and ctx.backend in ("cluster", "shortlist", "worklist", "hier")
                  and n_tris >= REORDER_AUTO_MIN_TRIS)
    smin, inv_ext = _scene_bounds(scene)

    for h_s, p_s in schedule:
        assert 0 < h_s < 2 * max_depth and 0 < p_s <= n and p_s % 1024 == 0

    # sample-invariant primary intersection + attribute fetch (same hoist
    # as engine.render_samples — bit-identical, made earlier)
    hit0 = ctx.intersect(ro[:, 0], ro[:, 1], ro[:, 2],
                         rd[:, 0], rd[:, 1], rd[:, 2])
    attrs0 = ec.fetch_attrs(ctx, hit0[2])

    def bounce(h, st, key, width, hoisted=False, sorted_isect=False):
        """One bounce iteration over [width] planes — engine.body's
        formula sequence (see engine.py for the quirk provenance)."""
        (rox, roy, roz, rdx, rdy, rdz, thr, rad, inside, alive, src,
         rays_traced, profile) = st
        profile = profile.at[h].set(jnp.sum(alive.astype(jnp.int32)))
        rays_traced = rays_traced + jnp.sum(alive.astype(jnp.int32))

        if hoisted:
            hit, t, idx, s2, s3 = hit0
            attrs_t = attrs0
        elif sorted_isect:
            key_s = _sort_key(rox, roy, roz, rdx, rdy, rdz, alive,
                              smin, inv_ext)
            perm, inv = _segmented_perm(key_s, width)
            packed = jnp.stack([rox, roy, roz, rdx, rdy, rdz],
                               axis=1)[perm]
            hit_s, t_s, idx_s, s2_s, s3_s = ctx.intersect(
                packed[:, 0], packed[:, 1], packed[:, 2],
                packed[:, 3], packed[:, 4], packed[:, 5])
            res = jnp.stack([t_s, s2_s, s3_s,
                             idx_s.astype(jnp.float32)], axis=1)[inv]
            t, s2, s3 = res[:, 0], res[:, 1], res[:, 2]
            idx = res[:, 3].astype(jnp.int32)
            hit = t < BIG
            attrs_t = ec.fetch_attrs(ctx, idx)
        else:
            hit, t, idx, s2, s3 = ctx.intersect(rox, roy, roz,
                                                rdx, rdy, rdz)
            attrs_t = ec.fetch_attrs(ctx, idx)
        hit = hit & alive

        (pox, poy, poz, nx, ny, nz, roughness, uvu, uvv) = \
            ec.shade_geometry(ctx, attrs_t, rox, roy, roz, rdx, rdy, rdz,
                              t, s2, s3)

        k = jax.random.fold_in(key, h)
        rr_rand, u_rand, th_rand, fr_rand = jax.random.uniform(
            k, (4, width), jnp.float32)

        rr_active = jnp.asarray(h >= max_depth - 1)
        killed = hit & rr_active & (rr_rand
                                    > ec.row(ctx, attrs_t, "rr_prob"))
        miss = alive & ~hit
        survive = hit & ~killed

        emis_t, emis_eff, refl_eff = ec.material_spectra(ctx, attrs_t,
                                                         uvu, uvv)
        contrib = (miss[None, :] * scene.sky[:, None]
                   + killed[None, :] * emis_t
                   + survive[None, :] * emis_eff)
        rad = rad + thr * contrib
        thr = jnp.where(survive[None, :], thr * refl_eff, thr)

        b = sampling.sample_bounce_soa(
            ec.row(ctx, attrs_t, "mat_type").astype(jnp.int32),
            rdx, rdy, rdz, nx, ny, nz, roughness, inside,
            u_rand, th_rand, fr_rand)
        back = jnp.where(b.refracted, EPS * 2.0, 0.0)
        park = jnp.float32(1e30)
        rox = jnp.where(survive, pox - nx * back, park)
        roy = jnp.where(survive, poy - ny * back, park)
        roz = jnp.where(survive, poz - nz * back, park)
        rdx = jnp.where(survive, b.dx, 0.0)
        rdy = jnp.where(survive, b.dy, 0.0)
        rdz = jnp.where(survive, b.dz, 0.0)
        inside = jnp.where(survive, b.new_inside, inside)
        return (rox, roy, roz, rdx, rdy, rdz, thr, rad, inside, survive,
                src, rays_traced, profile)

    def pack_state(st, width):
        """[width, 8+2nw] row table: rays | inside | src | thr | rad."""
        (rox, roy, roz, rdx, rdy, rdz, thr, rad, inside, alive, src,
         _, _) = st
        return jnp.concatenate(
            [jnp.stack([rox, roy, roz, rdx, rdy, rdz,
                        inside.astype(jnp.float32),
                        src.astype(jnp.float32)], axis=1),
             thr.T, rad.T], axis=1)

    def unpack_state(packed, rays_traced, profile):
        rox, roy, roz, rdx, rdy, rdz = (packed[:, i] for i in range(6))
        inside = packed[:, 6] > 0.5
        src = packed[:, 7].astype(jnp.int32)
        thr = packed[:, 8:8 + nw].T
        rad = packed[:, 8 + nw:8 + 2 * nw].T
        alive = ~((rdx == 0.0) & (rdy == 0.0) & (rdz == 0.0))
        return (rox, roy, roz, rdx, rdy, rdz, thr, rad, inside, alive,
                src, rays_traced, profile)

    def sample_body(i, carry):
        total, samples, rays_all, profile_out, valid_mask = carry
        key = jax.random.fold_in(base_key, counter0 + i)

        thr0 = jnp.ones((nw, n), jnp.float32)
        rad0 = jnp.zeros((nw, n), jnp.float32)
        st = (ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2],
              thr0, rad0, jnp.zeros(n, bool), jnp.ones(n, bool),
              jnp.arange(n, dtype=jnp.int32),
              jnp.zeros((), jnp.int32),
              jnp.zeros((2 * max_depth,), jnp.int32))
        st = bounce(0, st, key, n, hoisted=True)

        poison = jnp.zeros((), bool)
        buf = None            # [N, C] packed rows once the first split ran
        h_cur, p_cur = 1, n
        spans = list(schedule) + [(2 * max_depth, None)]
        for h_split, p_next in spans:
            # iterations h_cur..h_split-1 at width p_cur (one compiled
            # bounce body per span, reused across its iterations)
            if h_split > h_cur:
                st = jax.lax.fori_loop(
                    h_cur, h_split,
                    lambda h, s: bounce(h, s, key, p_cur,
                                        sorted_isect=do_reorder),
                    st)
            if p_next is None:
                break
            # ---- split: live-to-front sort of the WHOLE state ----
            (rox, roy, roz, rdx, rdy, rdz, thr, rad, inside, alive, src,
             rays_traced, profile) = st
            key_s = _sort_key(rox, roy, roz, rdx, rdy, rdz, alive,
                              smin, inv_ext)
            perm, _ = _segmented_perm(key_s, p_cur)
            live = jnp.sum(alive.astype(jnp.int32))
            poison = poison | (live > p_next)
            packed = pack_state(st, p_cur)[perm]          # [p_cur, C]
            if buf is None:
                buf = packed                              # p_cur == n
            else:
                buf = jax.lax.dynamic_update_slice(buf, packed, (0, 0))
            st = unpack_state(packed[:p_next], rays_traced, profile)
            h_cur, p_cur = h_split, p_next

        # depth-cap fall-through: survivors see the sky
        (rox, roy, roz, rdx, rdy, rdz, thr, rad, inside, alive, src,
         rays_traced, profile) = st
        rad = rad + alive[None, :] * thr * scene.sky[:, None]

        if buf is None:
            contribution = rad.T                          # slot order
        else:
            tail = pack_state((rox, roy, roz, rdx, rdy, rdz, thr, rad,
                               inside, alive, src, rays_traced, profile),
                              p_cur)
            buf = jax.lax.dynamic_update_slice(buf, tail, (0, 0))
            inv = jnp.argsort(buf[:, 7].astype(jnp.int32))
            contribution = buf[:, 8 + nw:8 + 2 * nw][inv]  # [N, nw]

        ok = ~poison
        total = total + jnp.where(ok, contribution, 0.0)
        samples = samples + ok.astype(jnp.int32)
        valid_mask = valid_mask.at[i].set(ok)
        return (total, samples, rays_all + rays_traced, profile,
                valid_mask)

    total, samples, rays, profile, valid = jax.lax.fori_loop(
        0, n_steps, sample_body,
        (total, samples, jnp.zeros((), jnp.int32),
         jnp.zeros((2 * max_depth,), jnp.int32),
         jnp.ones((n_steps,), bool)))
    out = total / jnp.maximum(samples.astype(jnp.float32), 1.0)
    return total, samples, out, rays, profile, valid


def learn_schedule(profile, n: int, max_depth: int,
                   margin: float = PREFIX_MARGIN,
                   max_splits: int = MAX_SPLITS):
    """Quantize a per-iteration alive profile into a static schedule.

    ``profile``: [2*max_depth] live counts (iteration h's count at entry).
    Prefixes are multiples of 1024, chosen with a safety margin; a split
    is only worth compiling if it shrinks the width by >= 25%.
    """
    import numpy as np
    prof = np.asarray(profile)
    schedule = []
    p_cur = n
    for h in range(1, 2 * max_depth):
        want = int(min(n, np.ceil(prof[h] * margin / 1024.0) * 1024))
        want = max(want, 1024)
        if want <= p_cur * 0.75 and len(schedule) < max_splits:
            schedule.append((h, want))
            p_cur = want
    return tuple(schedule)
