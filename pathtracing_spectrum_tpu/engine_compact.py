"""Compaction-across-dispatches progressive engine (shrinking live prefix).

The lockstep engine advances one sample of every pixel through ``2*depth``
bounce iterations at FULL lane width. The alive fraction decays fast
(measured entry-live fractions, v5e round 3: terrain-246k
[1.0, .38, .18, .09, .05, .03]; textured 1080p [1.0, .72, .52, .41, .33,
.27]), so late iterations pay full-width intersect/fetch/shade for
mostly-dead lanes — XLA's static shapes make those lanes unskippable
within one trace. The capability anchor is the reference, which never
pays for dead pixels: a terminated path simply returns up the recursion
(pathtracer.cpp:581-598).

Round-3 v1 of this engine implemented the shrink as whole-state row moves
at split points and measured 0.19 vs 2.25 spp/s at 1080p — the packed
[P, C] gathers, [nw, P] transposes, per-split ``dynamic_update_slice``
into an [N, C] buffer and a *global* per-sample ``argsort`` cost more
than the saved width. This v2 restructures the data movement so that
compaction costs (almost) nothing extra over what the lockstep engine
already pays:

* **Steady iterations are lockstep at prefix width.** A non-shrinking
  iteration runs the lockstep engine's exact movement pattern — the
  segmented (direction-octant, origin-morton) sort applied around the
  intersection as ONE [w, 6] row gather in and ONE [w, 4] inverse row
  gather out, spectral state never moving — just at the current prefix
  width ``w`` instead of N. (v2.0 made every bounce a persistent
  8+2nw-plane move; measured on v5e that widening cancelled the width
  saving at 1080p — 2.17 vs 2.25 spp/s.)
* **Shrinks are ONE persistent packed move.** At a shrink iteration the
  sort is live-to-front (dead rays key to each segment's tail) and the
  whole per-ray state (8+2nw planes) moves once through
  ``perm[:, :Q]`` — a *smaller* gather than the width it leaves —
  and downstream iterations simply run in the new order.
* **Segments never exchange rays**, so every permutation is
  segment-local. Dropped (dead) rows' ``(src, radiance)`` are banked
  into a full-width per-segment buffer with *static* slice updates, and
  the end-of-sample unscramble is one segmented argsort + one [N, nw]
  segmented row gather — the same shapes the lockstep engine's
  per-bounce unsort already runs.
* **RNG is bit-identical to the lockstep engine.** Lockstep bounce ``h``
  draws ``uniform(fold_in(key, h), (4, N))`` and ray ``s`` consumes
  column ``s``. With jax's partitionable threefry (the default), the
  variate at flat position ``c*N + s`` is ``hash(counter=c*N+s)`` — so
  the compacted engine evaluates the hash directly at the gathered
  counters ``c*N + src`` (pure compute, no gather, no transpose) and
  every surviving ray consumes the *same* variate it would in lockstep
  (pinned by test against ``jax.random.uniform``). A sample whose live
  rays all fit the schedule therefore renders BIT-IDENTICAL to
  engine.render_samples; one that does not is poisoned and re-rendered
  full-width by the host. Nothing is ever approximated or dropped.
* The schedule is **learned, not guessed**: the first sample runs at
  full width and returns per-iteration max-per-segment live counts; the
  host quantizes them (x1.15 margin, 1024-ray rungs) into a static
  ``(iteration, width)`` schedule. Counts are deterministic given the
  seed, so images are reproducible run-to-run and across resume (the
  schedule is saved in checkpoints).

Segment occupancy note: the shrink width is ``ns * max_s(live_s)``, so
spatially clustered liveness (one hot segment) wastes width. The render
session therefore interleaves ray *blocks* round-robin across segments
(:func:`interleave_blocks`) — a host-side permutation composed into its
existing tile order, making per-segment liveness uniform. Correctness
never depends on the ray order.

Not supported (RenderSession raises): jitter (the primary hoist and
learning assume static primaries), dispersion (hero packing is already
width-1), sharding.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .constants import EPS
from .ops import sampling
from .ops.intersect_pallas import BIG
from .reorder import (REORDER_AUTO_MIN_TRIS, scene_bounds as _scene_bounds,
                      segment_for as _segment_for, sort_key as _sort_key)
from . import engine_common as ec

# Schedule quantization: per-segment prefixes are multiples of this.
PREFIX_RUNG = 1024
PREFIX_MARGIN = 1.15
MAX_SPLITS = 3
# a split must shrink the width by at least this factor to be compiled
SPLIT_RATIO = 0.75


def interleave_blocks(n: int):
    """Host-side permutation spreading 1024-ray blocks round-robin over
    the engine's sort segments, so per-segment liveness tracks the global
    fraction instead of the worst spatial cluster (the shrink width is
    ``ns * max_s(live_s)``). Blocks stay contiguous — the intersection
    kernels' block-granular culling sees the same 32x32 screen tiles.

    Returns an [n] int32 numpy permutation (``rays_engine = rays[perm]``)
    or None when there is a single segment (nothing to spread).
    """
    import numpy as np
    seg = _segment_for(n)
    ns = n // seg
    if ns <= 1 or seg % 1024 or n % 1024:
        return None
    spb = seg // 1024                       # blocks per segment
    blk = np.arange(n // 1024, dtype=np.int64).reshape(spb, ns).T
    perm = blk.reshape(-1)[:, None] * 1024 + np.arange(1024)[None, :]
    return perm.reshape(-1).astype(np.int32)


def _uniform4_at(key_h, src_f, n: int):
    """The exact variates ``jax.random.uniform(key_h, (4, n))[:, src]``
    without materializing the full draw or gathering: with partitionable
    threefry (jax's default), the variate at flat position ``c*n + s`` is
    a pure counter hash — evaluate it at the gathered counters.
    Equality with ``jax.random.uniform`` is pinned by
    tests/test_compact.py (uniform internals: jax._src.random._uniform;
    counters: jax._src.prng._threefry_random_bits_partitionable)."""
    from jax._src.prng import threefry2x32_p
    kd = jax.random.key_data(key_h)
    src_u = src_f.astype(jnp.int32).astype(jnp.uint32)
    flat = (jnp.arange(4, dtype=jnp.uint32)[:, None] * jnp.uint32(n)
            + src_u[None, :])
    b1, b2 = threefry2x32_p.bind(kd[0], kd[1], jnp.zeros_like(flat), flat)
    bits = b1 ^ b2
    fb = (bits >> jnp.uint32(9)) | jnp.uint32(0x3F800000)
    u = jax.lax.bitcast_convert_type(fb, jnp.float32) - 1.0
    u = jnp.maximum(0.0, u)
    return u[0], u[1], u[2], u[3]


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
    live prefix per ``schedule`` ((iteration, width) pairs, width a
    multiple of the segment count).

    Returns ``(total', samples', out, rays_traced, profile [2*depth],
    valid [n_steps] bool)``. ``profile`` holds the LAST sample's
    per-iteration max-per-segment live counts — the input
    :func:`learn_schedule` quantizes. Samples are bit-identical to
    :func:`engine.render_samples` whenever their live rays fit the
    schedule (see module docstring); a sample that does not fit is
    poisoned (zero contribution, ``valid`` cleared) for the host to
    re-render full-width.
    """
    n = ro.shape[0]
    nw = scene.wavenumbers.shape[0]
    n_tris = scene.tri_shade.shape[0]
    assert n < (1 << 24), "float-exact src pack needs N < 2^24"
    # the steady-sorted bounce also rides idx through an f32 plane
    # (same trick as engine.py's reorder pack) — guard T as well
    assert n_tris < (1 << 24), "float-exact idx pack needs T < 2^24"
    ctx = ec.make_ctx(scene, backend, leaf_size)
    seg = _segment_for(n)
    ns = n // seg
    n_iters = 2 * max_depth
    morton = (ctx.on_pallas
              and ctx.backend in ("cluster", "shortlist", "worklist",
                                  "hier")
              and n_tris >= REORDER_AUTO_MIN_TRIS)
    smin, inv_ext = _scene_bounds(scene)

    # static per-iteration widths from the schedule
    widths = [n] * n_iters
    prev_h, prev_p = 0, n + 1
    for h_s, p_s in schedule:
        assert 0 < h_s < n_iters and 0 < p_s <= n and p_s % ns == 0
        assert h_s > prev_h and p_s < min(prev_p, n), \
            "schedule must strictly shrink"
        for h in range(h_s, n_iters):
            widths[h] = p_s
        prev_h, prev_p = h_s, p_s

    # sample-invariant primary intersection + attribute fetch (same hoist
    # as engine.render_samples — bit-identical, made earlier)
    hit0 = ctx.intersect(ro[:, 0], ro[:, 1], ro[:, 2],
                         rd[:, 0], rd[:, 1], rd[:, 2])
    attrs0 = ec.fetch_attrs(ctx, hit0[2])

    def shade(h, key, rays6, inside_f, src_f, thr, rad,
              isect, alive, rays_traced, profile, hoisted=False):
        """Post-intersection half of one bounce: engine.body's formula
        sequence (see engine.py for the quirk provenance)."""
        rox, roy, roz, rdx, rdy, rdz = rays6
        hit, t, idx, s2, s3 = isect
        hit = hit & alive
        attrs_t = attrs0 if hoisted else ec.fetch_attrs(ctx, idx)
        (pox, poy, poz, nx, ny, nz, roughness, uvu, uvv) = \
            ec.shade_geometry(ctx, attrs_t, rox, roy, roz, rdx, rdy, rdz,
                              t, s2, s3)

        rr_rand, u_rand, th_rand, fr_rand = _uniform4_at(
            jax.random.fold_in(key, h), src_f, n)

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
            rdx, rdy, rdz, nx, ny, nz, roughness, inside_f > 0.5,
            u_rand, th_rand, fr_rand)
        back = jnp.where(b.refracted, EPS * 2.0, 0.0)
        park = jnp.float32(1e30)
        rox = jnp.where(survive, pox - nx * back, park)
        roy = jnp.where(survive, poy - ny * back, park)
        roz = jnp.where(survive, poz - nz * back, park)
        rdx = jnp.where(survive, b.dx, 0.0)
        rdy = jnp.where(survive, b.dy, 0.0)
        rdz = jnp.where(survive, b.dz, 0.0)
        inside_f = jnp.where(survive,
                             b.new_inside.astype(jnp.float32), inside_f)
        return ((rox, roy, roz, rdx, rdy, rdz), inside_f, src_f, thr, rad,
                rays_traced, profile)

    def run_bounce(h, st, key, w_in, w_out, bank):
        """One bounce at iteration ``h``.

        Steady (w_out == w_in): lockstep's exact movement pattern at the
        current prefix width — sort only around the intersection, ONE
        [w, 6] row gather in, ONE [w, 4] inverse row gather out; the
        [nw, w] spectral state never moves (no sort at all for backends
        without block culling). Shrink (w_out < w_in): persistent
        live-to-front sort; the whole [w_in, 8+2nw] state moves ONCE to
        the new (smaller) prefix, dropped rows' (src, radiance) banked
        with static slice updates, and downstream iterations simply run
        in the new order.

        Returns (state', bank', poisoned_now)."""
        (rays6, inside_f, src_f, thr, rad, rays_traced, profile) = st
        rox, roy, roz, rdx, rdy, rdz = rays6
        alive_in = ~((rdx == 0.0) & (rdy == 0.0) & (rdz == 0.0))
        profile = profile.at[h].set(jnp.max(jnp.sum(
            alive_in.reshape(ns, w_in // ns).astype(jnp.int32), axis=1)))
        rays_traced = rays_traced + jnp.sum(alive_in.astype(jnp.int32))
        q_in, q_out = w_in // ns, w_out // ns
        poisoned = jnp.zeros((), bool)

        if w_out == w_in and not morton:
            # steady, no culling backend: intersect in place, no sort
            isect = ctx.intersect(rox, roy, roz, rdx, rdy, rdz)
            st = shade(h, key, rays6, inside_f, src_f, thr, rad, isect,
                       alive_in, rays_traced, profile)
            return st, bank, poisoned

        keys = _sort_key(rox, roy, roz, rdx, rdy, rdz, alive_in,
                         smin, inv_ext, morton)
        perm_l = jnp.argsort(keys.reshape(ns, q_in), axis=1,
                             stable=True).astype(jnp.int32)
        offs = (jnp.arange(ns, dtype=jnp.int32) * q_in)[:, None]

        if w_out == w_in:
            # steady: sort around the intersection only (engine.py's
            # do_sort branch at prefix width); idx rides the f32 pack as
            # an exact float VALUE, hit is recomputed from t < BIG
            perm = (perm_l + offs).reshape(-1)
            inv = (jnp.argsort(perm_l, axis=1).astype(jnp.int32)
                   + offs).reshape(-1)
            packed = jnp.stack([rox, roy, roz, rdx, rdy, rdz],
                               axis=1)[perm]                   # [w, 6]
            _, t_s, idx_s, s2_s, s3_s = ctx.intersect(
                packed[:, 0], packed[:, 1], packed[:, 2],
                packed[:, 3], packed[:, 4], packed[:, 5])
            res = jnp.stack([t_s, s2_s, s3_s,
                             idx_s.astype(jnp.float32)], axis=1)
            out = res[inv]                                     # [w, 4]
            t, s2, s3 = out[:, 0], out[:, 1], out[:, 2]
            idx = out[:, 3].astype(jnp.int32)
            isect = (t < BIG, t, idx, s2, s3)
            st = shade(h, key, rays6, inside_f, src_f, thr, rad, isect,
                       alive_in, rays_traced, profile)
            return st, bank, poisoned

        # shrink: ONE persistent packed move of the whole state to the
        # new prefix; a live ray past the prefix would be dropped ->
        # poison (the host re-renders the sample full-width)
        live_s = jnp.sum(alive_in.reshape(ns, q_in).astype(jnp.int32),
                         axis=1)
        poisoned = jnp.any(live_s > q_out)

        planes = [rox, roy, roz, rdx, rdy, rdz, inside_f, src_f]
        planes += [thr[c] for c in range(nw)]
        planes += [rad[c] for c in range(nw)]
        packed = jnp.stack(planes, axis=1)            # [w_in, 8+2nw]
        keep = (perm_l[:, :q_out] + offs).reshape(-1)
        ps = packed[keep]                             # ONE row gather
        rays6 = tuple(ps[:, i] for i in range(6))
        inside_f, src_f = ps[:, 6], ps[:, 7]
        thr = ps[:, 8:8 + nw].T
        rad = ps[:, 8 + nw:8 + 2 * nw].T
        alive = ~((rays6[3] == 0.0) & (rays6[4] == 0.0)
                  & (rays6[5] == 0.0))

        # bank dropped rows' (src, radiance): they are dead, their
        # radiance is final. Static slice update per segment.
        drop = (perm_l[:, q_out:] + offs).reshape(-1)
        srcrad = jnp.stack(
            [packed[:, 7]] + [packed[:, 8 + nw + c]
                              for c in range(nw)], axis=1)[drop]
        bank_src, bank_rad = bank
        dsrc = srcrad[:, 0].reshape(ns, q_in - q_out)
        drad = (srcrad[:, 1:].reshape(ns, q_in - q_out, nw)
                .transpose(2, 0, 1))
        bank_src = jax.lax.dynamic_update_slice(bank_src, dsrc,
                                                (0, q_out))
        bank_rad = jax.lax.dynamic_update_slice(bank_rad, drad,
                                                (0, 0, q_out))
        bank = (bank_src, bank_rad)

        isect = ctx.intersect(*rays6)
        st = shade(h, key, rays6, inside_f, src_f, thr, rad, isect,
                   alive, rays_traced, profile)
        return st, bank, poisoned

    def sample_body(i, carry):
        total, samples, rays_all, profile_out, valid_mask = carry
        key = jax.random.fold_in(base_key, counter0 + i)

        # bounce 0: hoisted primary intersection, input (slot) order
        src0 = jnp.arange(n, dtype=jnp.int32).astype(jnp.float32)
        profile = jnp.zeros((n_iters,), jnp.int32).at[0].set(jnp.int32(seg))
        st = shade(0, key,
                   (ro[:, 0], ro[:, 1], ro[:, 2],
                    rd[:, 0], rd[:, 1], rd[:, 2]),
                   jnp.zeros((n,), jnp.float32), src0,
                   jnp.ones((nw, n), jnp.float32),
                   jnp.zeros((nw, n), jnp.float32),
                   hit0, jnp.ones((n,), bool),
                   jnp.asarray(n, jnp.int32), profile, hoisted=True)

        bank = (jnp.zeros((ns, seg), jnp.float32),
                jnp.zeros((nw, ns, seg), jnp.float32))
        poison = jnp.zeros((), bool)

        # iterations 1..n_iters-1: fori spans of constant width; width
        # transitions (shrinks) run as single unrolled bounces
        h = 1
        while h < n_iters:
            w_in, w_out = widths[h - 1], widths[h]
            if w_out < w_in:
                st, bank, p = run_bounce(h, st, key, w_in, w_out, bank)
                poison = poison | p
                h += 1
                continue
            h_end = h + 1
            while h_end < n_iters and widths[h_end] == w_out:
                h_end += 1
            if h_end == h + 1:
                st, bank, _ = run_bounce(h, st, key, w_out, w_out, bank)
            else:
                def span_body(hh, sb, w=w_out):
                    s1, b1, _ = run_bounce(hh, sb[0], key, w, w, sb[1])
                    return (s1, b1)
                st, bank = jax.lax.fori_loop(h, h_end, span_body,
                                             (st, bank))
            h = h_end

        # depth-cap fall-through: survivors see the sky
        (rays6, inside_f, src_f, thr, rad, rays_traced, profile) = st
        alive = ~((rays6[3] == 0.0) & (rays6[4] == 0.0)
                  & (rays6[5] == 0.0))
        rad = rad + alive[None, :] * thr * scene.sky[:, None]

        # final assembly: write the active prefix into the bank, restore
        # slot order with ONE segmented argsort + [n, nw] segmented gather
        q_f = widths[n_iters - 1] // ns
        bank_src, bank_rad = bank
        bank_src = jax.lax.dynamic_update_slice(
            bank_src, src_f.reshape(ns, q_f), (0, 0))
        bank_rad = jax.lax.dynamic_update_slice(
            bank_rad, rad.reshape(nw, ns, q_f), (0, 0, 0))
        inv = jnp.argsort(bank_src, axis=1).astype(jnp.int32)  # [ns, seg]
        contrib = jnp.take_along_axis(
            bank_rad.transpose(1, 2, 0),                # [ns, seg, nw]
            inv[:, :, None], axis=1).reshape(n, nw)

        ok = ~poison
        total = total + jnp.where(ok, contrib, 0.0)
        samples = samples + ok.astype(jnp.int32)
        valid_mask = valid_mask.at[i].set(ok)
        return (total, samples, rays_all + rays_traced, profile,
                valid_mask)

    total, samples, rays, profile, valid = jax.lax.fori_loop(
        0, n_steps, sample_body,
        (total, samples, jnp.zeros((), jnp.int32),
         jnp.zeros((n_iters,), jnp.int32),
         jnp.ones((n_steps,), bool)))
    out = total / jnp.maximum(samples.astype(jnp.float32), 1.0)
    return total, samples, out, rays, profile, valid


def learn_schedule(profile, n: int, max_depth: int,
                   margin: float = PREFIX_MARGIN,
                   max_splits: int = MAX_SPLITS,
                   split_ratio: float = SPLIT_RATIO):
    """Quantize a per-iteration max-per-segment live profile into a
    static ``((iteration, width), ...)`` schedule.

    ``profile``: [2*max_depth] max-per-segment live counts at iteration
    entry (compact_render_samples' last-sample profile). Prefixes are
    multiples of 1024 rays per segment with a safety margin; a split is
    only worth compiling (an unrolled bounce + one persistent packed
    move) if it shrinks the width by at least ``1 - split_ratio``.
    """
    import numpy as np
    seg = _segment_for(n)
    ns = n // seg
    if seg % PREFIX_RUNG or n % PREFIX_RUNG:
        return ()                    # odd sizes: run full width
    prof = np.asarray(profile)
    schedule = []
    q_cur = seg
    for h in range(1, 2 * max_depth):
        want = int(np.ceil(prof[h] * margin / PREFIX_RUNG) * PREFIX_RUNG)
        want = min(max(want, PREFIX_RUNG), seg)
        if want <= q_cur * split_ratio and len(schedule) < max_splits:
            schedule.append((h, want * ns))
            q_cur = want
    return tuple(schedule)
