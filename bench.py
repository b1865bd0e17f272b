"""Headline benchmark: Mrays/sec/chip on the Cornell-box spectral scene.

Runs the flagship wavefront engine on the default JAX device (the real TPU
chip under the driver): Cornell box, 512x512, 4 wavelengths, trace depth 3,
progressive sampling. Rays are counted exactly as traced (sum of live rays
per bounce iteration, including primaries), matching the Mrays/s definition
in BASELINE.json. Baseline target: 200 Mrays/sec/chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp


def main():
    from __graft_entry__ import _tiny_scene
    from pathtracing_spectrum_tpu import camera_rays
    from pathtracing_spectrum_tpu.engine import render_samples

    w = h = 512
    depth = 3
    sc = _tiny_scene(res=(w, h), depth=depth)
    scene = sc.compile()
    ro, rd = camera_rays(sc.camera(), w, h)
    nw = len(sc.wavelengths)
    key = jax.random.key(0)

    backend = os.environ.get("PTS_BENCH_BACKEND", "auto")
    n_steps = int(os.environ.get("PTS_BENCH_STEPS", "64"))

    total = jnp.zeros((w * h, nw), jnp.float32)
    samples = jnp.zeros((), jnp.int32)

    # warmup / compile (the whole multi-sample batch is ONE dispatch — launch
    # latency on a tunneled TPU would otherwise dominate)
    total, samples, out, nrays = render_samples(
        scene, ro, rd, total, samples, key, 0, n_steps=n_steps,
        max_depth=depth, backend=backend)
    jax.block_until_ready(out)
    rays = int(nrays)

    # timed steady-state: best of 3 batches (tunnel latency is noisy).
    # IMPORTANT: every batch continues the accumulation with a fresh sample
    # counter — identical dispatches would be memoized by the axon relay and
    # report fantasy numbers.
    best = float("inf")
    for rep in range(1, 4):
        t0 = time.perf_counter()
        total, samples, out, nrays = render_samples(
            scene, ro, rd, total, samples, key, rep * n_steps,
            n_steps=n_steps, max_depth=depth, backend=backend)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)

    mrays = rays / best / 1e6
    print(json.dumps({
        "metric": "Mrays/sec/chip (Cornell box 512x512, 4-wave spectral, depth 3)",
        "value": round(mrays, 2),
        "unit": "Mray/s",
        "vs_baseline": round(mrays / 200.0, 3),
    }))


if __name__ == "__main__":
    main()
