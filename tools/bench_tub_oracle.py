"""Oracle experiment for the t_ub sweep-cap tightening lead.

Question: if every bounce ray arrived with a PERFECT per-ray upper
bound on its closest-hit t (t_ub = the true t, +margin), how much of
the bounce-ray cluster sweep would the tightened cap actually cull?
The bound flows into both stage 1 (groups whose entry lower bound
exceeds the block's max cap drop from the shortlist entirely) and the
kernel's per-cluster/per-row slab tests (per-lane bound = min(best_t,
cap)). If even the oracle bound buys little, any two-phase scheme that
must PAY to construct an approximate bound is dead; if it buys a lot,
the cheap-probe phase-1 design is worth building.

Protocol per docs/tpu_cost_model.md: K-call loop-carried chain inside
one jit on real bounce-1 rays (the measured wall), origins nudged per
iteration to defeat the relay's memoization, scalar drain. Run one
variant per process:

    python tools/bench_tub_oracle.py base     # no t_ub (production)
    python tools/bench_tub_oracle.py oracle   # t_ub = true t + margin

PTS_BENCH_OBJ / PTS_BENCH_RES select the scene (default terrain_200k
@512^2, same as bench_mxu_sweep).
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
from pathtracing_spectrum_tpu.engine import sweep_policy
from pathtracing_spectrum_tpu.ops.intersect_pallas import BIG, pack_tri16
from bench_mxu_sweep import bounce1_rays, K, OBJ, RES


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "base"
    assert variant in ("base", "oracle"), variant
    sc = bs.terrain_scene((RES, RES), OBJ)
    sd = sc.compile()
    rays = bounce1_rays(sc, sd, RES, RES)
    tri16 = pack_tri16(sd.tri_face_n, sd.tri_k1, sd.tri_k2, sd.tri_k3,
                       sd.tri_consts)
    ca = sd.cluster_aabbs
    interp = jax.devices()[0].platform.lower() not in ("tpu", "axon")
    # the engine's production policy (f32x6 + row_cull + span=4 at this
    # size on real TPU), so the A/B runs on the real baseline
    mxu, row_cull, span = sweep_policy("shortlist",
                                       n_tris=int(sd.tri_face_n.shape[0]))
    kn = dict(mxu=mxu, row_cull=row_cull, span=span)
    print(f"policy: mxu={mxu} row_cull={row_cull} span={span}", flush=True)

    # the oracle bound: one untimed call for the true closest-hit t.
    # The chain nudges origins FORWARD along the ray (s ~ 1e-5 t), which
    # only shortens the true t, so a fixed relative margin keeps the
    # bound valid across the whole chain.
    hit0, t0, _, _, _ = isl.intersect_shortlist_pallas_soa(
        *rays, tri16, ca, interpret=interp, **kn)
    t_ub = jnp.where(hit0, t0 * 1.001 + 1e-3, jnp.float32(BIG))
    use_ub = variant == "oracle"

    @jax.jit
    def run(rox, roy, roz, rdx, rdy, rdz, t_ub):
        def it(i, carry):
            rox, roy, roz, acc = carry
            hit, t, _, _, _ = isl.intersect_shortlist_pallas_soa(
                rox, roy, roz, rdx, rdy, rdz, tri16, ca, interpret=interp,
                t_ub=t_ub if use_ub else None, **kn)
            tt = jnp.where(hit, t, 0.0)
            s = jnp.float32(1e-5) * (1.0 + 1e-3 * i)
            return (rox + s * tt * rdx, roy + s * tt * rdy,
                    roz + s * tt * rdz, acc + jnp.sum(tt))
        r = jax.lax.fori_loop(0, K, it, (*rays[:3], jnp.float32(0)))
        return r[3]

    float(run(*rays, t_ub))                            # compile + warm
    t_start = time.perf_counter()
    drain = float(run(*rays, t_ub))
    dt = time.perf_counter() - t_start
    print(f"tub chain [{variant}] {OBJ}@{RES}: {dt / K * 1000:.2f} ms/call"
          f"  (drain {drain:.6e})", flush=True)


if __name__ == "__main__":
    main()
