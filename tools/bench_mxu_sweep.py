"""Measure the fused MXU cluster sweep (PTS_MXU_SWEEP) on real TPU.

Two protocols (docs/tpu_cost_model.md "measurement protocol, final
form" — only loop-carried chains inside one jit with data-dependent
per-iteration inputs and a scalar drain are trustworthy here):

1. kernel chain — intersect_shortlist_pallas_soa on real bounce-1 rays
   (the 113 ms/call "wall" row of the bounce-sweep attack log), K
   chained calls whose origins depend on the previous call's t.
2. in-context — terrain 512^2 render_samples spp/s per scheme.

Schemes are selected by re-importing with PTS_MXU_SWEEP set, so run
this once per scheme:

    python tools/bench_mxu_sweep.py               # VPU baseline
    PTS_MXU_SWEEP=bf16x3 python tools/bench_mxu_sweep.py
    PTS_MXU_SWEEP=f32x6  python tools/bench_mxu_sweep.py

(In-process scheme selection via the kernels' static ``mxu=`` argument
also works and is what the knob equivalence tests do; a fresh process
per scheme removes any doubt about stale compile caches when numbers
go in the cost model.)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench_suite as bs
import pathtracing_spectrum_tpu.ops.intersect_shortlist as isl
from pathtracing_spectrum_tpu import engine_common as ec
from pathtracing_spectrum_tpu.reorder import (scene_bounds, segment_for,
                                              sort_key)
from pathtracing_spectrum_tpu.models.camera import camera_rays, tile_order
from pathtracing_spectrum_tpu.ops import sampling
from pathtracing_spectrum_tpu.ops.intersect_pallas import pack_tri16
from pathtracing_spectrum_tpu.render import RenderSession

K = 16          # chain length (per-call cost = dt / K)
SPP = 4         # in-context sample count
OBJ = os.environ.get("PTS_BENCH_OBJ", "terrain_200k.obj")
RES = int(os.environ.get("PTS_BENCH_RES", "512"))


def bounce1_rays(sc, sd, w, h):
    """Real bounce-1 rays in the engine's sorted block order — the
    workload whose sweep divergence is the measured wall."""
    n = w * h
    ro, rd = camera_rays(sc.camera(), w, h)
    perm, _ = tile_order(w, h)
    ro = jnp.asarray(np.asarray(ro)[perm])
    rd = jnp.asarray(np.asarray(rd)[perm])
    ctx = ec.make_ctx(sd, "shortlist")

    @jax.jit
    def bounce1():
        rox, roy, roz = ro[:, 0], ro[:, 1], ro[:, 2]
        rdx, rdy, rdz = rd[:, 0], rd[:, 1], rd[:, 2]
        hit, t, idx, s2, s3 = ctx.intersect(rox, roy, roz, rdx, rdy, rdz)
        attrs_t = ec.fetch_attrs(ctx, idx)
        pox, poy, poz, nx, ny, nz, rough, _, _ = ec.shade_geometry(
            ctx, attrs_t, rox, roy, roz, rdx, rdy, rdz, t, s2, s3)
        u = jax.random.uniform(jax.random.key(7), (4, n))
        b = sampling.sample_bounce_soa(
            ec.row(ctx, attrs_t, "mat_type").astype(jnp.int32),
            rdx, rdy, rdz, nx, ny, nz, rough, jnp.zeros((n,), bool),
            u[1], u[2], u[3])
        park = jnp.float32(1e30)
        smin, inv_ext = scene_bounds(sd)
        nro = (jnp.where(hit, pox, park), jnp.where(hit, poy, park),
               jnp.where(hit, poz, park))
        nrd = (jnp.where(hit, b.dx, 0.0), jnp.where(hit, b.dy, 0.0),
               jnp.where(hit, b.dz, 0.0))
        keys = sort_key(*nro, *nrd, hit, smin, inv_ext, True)
        seg = segment_for(n)
        ns = n // seg
        p = (jnp.argsort(keys.reshape(ns, seg), axis=1).astype(jnp.int32)
             + (jnp.arange(ns, dtype=jnp.int32) * seg)[:, None]).reshape(-1)
        return jnp.stack(nro + nrd, axis=1)[p]

    pk = np.asarray(bounce1())
    return [jnp.asarray(pk[:, i]) for i in range(6)]


def kernel_chain(sd, rays):
    tri16 = pack_tri16(sd.tri_face_n, sd.tri_k1, sd.tri_k2, sd.tri_k3,
                       sd.tri_consts)
    ca = sd.cluster_aabbs
    # interpret mode off TPU so the tool itself is smoke-testable on CPU
    interp = jax.devices()[0].platform.lower() not in ("tpu", "axon")

    @jax.jit
    def run(rox, roy, roz, rdx, rdy, rdz):
        def it(i, carry):
            rox, roy, roz, acc = carry
            hit, t, _, _, _ = isl.intersect_shortlist_pallas_soa(
                rox, roy, roz, rdx, rdy, rdz, tri16, ca, interpret=interp)
            tt = jnp.where(hit, t, 0.0)
            s = jnp.float32(1e-5) * (1.0 + 1e-3 * i)
            return (rox + s * tt * rdx, roy + s * tt * rdy,
                    roz + s * tt * rdz, acc + jnp.sum(tt))
        r = jax.lax.fori_loop(0, K, it, (rox, roy, roz, jnp.float32(0)))
        return r[3]

    float(run(*rays))                                 # compile + warm
    t0 = time.perf_counter()
    drain = float(run(*rays))
    dt = time.perf_counter() - t0
    print(f"kernel chain [{isl._MXU_SWEEP or 'vpu'}]: "
          f"{dt / K * 1000:.2f} ms/call  (drain {drain:.3e})", flush=True)


def in_context(sc):
    s = RenderSession(sc, seed=3)
    s.run(SPP, batch=SPP)                             # compile + warm
    assert s.samples == SPP
    t0 = time.perf_counter()
    s.run(2 * SPP, batch=SPP)    # timed: samples SPP -> 2*SPP (counters
    img = np.asarray(s.result())                      # differ); drain
    dt = time.perf_counter() - t0
    assert s.samples == 2 * SPP
    print(f"in-context [{isl._MXU_SWEEP or 'vpu'}]: {SPP / dt:.2f} spp/s "
          f"({dt:.3f}s for {SPP} spp)  mean={img.mean():.5f}", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    print(f"scheme={isl._MXU_SWEEP or 'vpu'} fused_k={isl._MXU_FUSE_K} "
          f"rb={isl._RB} row_cull={isl._ROW_CULL} "
          f"early_exit={isl._EARLY_EXIT}", flush=True)
    sc = bs.terrain_scene((RES, RES), OBJ)
    sd = sc.compile()
    rays = bounce1_rays(sc, sd, RES, RES)
    print("bounce-1 rays ready", flush=True)
    kernel_chain(sd, rays)
    in_context(sc)
    if os.environ.get("PTS_BENCH_1080P"):
        # the other unmet target: textured 1080p (small-T dense-ish
        # sweep — a different regime from the terrain's divergence tax)
        sc2 = bs.textured_sphere_scene((1920, 1080))
        print("textured 1080p:", flush=True)
        in_context(sc2)


if __name__ == "__main__":
    main()
