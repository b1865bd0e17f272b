"""Chunked-4K A/B: the bounded-width wavefront at BASELINE config 5.

Measures `RenderSession(chunks=C)` on the 4K Cornell config for a sweep
of chunk widths (PTS_CHUNKS_SWEEP, comma-separated; default 1,8,16,32,64),
plus the 512-squared reference point for the per-lane-cost story
(docs/tpu_cost_model.md "4K bounded-width" entry). One process measures
all variants back-to-back; each variant is a fresh session whose timed
batch follows the bench_suite steady-state protocol (`_timed_spp` — the
warmup accumulates, so no dispatch is a bit-identical repeat the relay
could memoize).

    python tools/bench_4k_chunks.py            # on the TPU
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import bench_suite as bs


def main():
    sweep = [int(v) for v in os.environ.get(
        "PTS_CHUNKS_SWEEP", "1,8,16,32,64").split(",")]
    spp = int(os.environ.get("PTS_CHUNKS_SPP", "16"))
    results = []

    # reference point: the same scene/depth at 512^2, chunks=1 (the
    # wavefront width the chunk sizes aim to reproduce)
    sc = bs.cornell_scene((512, 512), 3)
    s = bs._session(sc)
    dt, st = bs._timed_spp(s, spp, batch=spp)
    entry = dict(config="cornell_512", chunks=1, spp=spp,
                 seconds=round(dt, 3), spp_per_sec=round(spp / dt, 2),
                 mrays_per_sec=round(st["mrays_per_s"], 1))
    print(json.dumps(entry), flush=True)
    results.append(entry)

    for c in sweep:
        sc = bs.cornell_scene((3840, 2160), 3)
        s = bs._session(sc, chunks=c)
        t0 = time.time()
        dt, st = bs._timed_spp(s, spp, batch=spp)
        entry = dict(config="cornell_4k", chunks=c, spp=spp,
                     seconds=round(dt, 3),
                     spp_per_sec_4k=round(spp / dt, 3),
                     mrays_per_sec=round(st["mrays_per_s"], 1),
                     wall_incl_compile=round(time.time() - t0, 1))
        print(json.dumps(entry), flush=True)
        results.append(entry)
        with open("/tmp/bench_4k_chunks.json", "w") as f:
            json.dump({"device": str(jax.devices()[0]),
                       "results": results}, f, indent=2)

    print("wrote /tmp/bench_4k_chunks.json")


if __name__ == "__main__":
    main()
