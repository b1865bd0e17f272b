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
    from pathtracing_spectrum_tpu.engine import render_sample

    w = h = 512
    depth = 3
    sc = _tiny_scene(res=(w, h), depth=depth)
    scene = sc.compile()
    ro, rd = camera_rays(sc.camera(), w, h)
    nw = len(sc.wavelengths)
    total = jnp.zeros((w * h, nw), jnp.float32)
    samples = jnp.zeros((), jnp.int32)
    key = jax.random.key(0)

    backend = os.environ.get("PTS_BENCH_BACKEND", "dense")

    # warmup / compile
    total, samples, out, nrays = render_sample(
        scene, ro, rd, total, samples, jax.random.fold_in(key, 0),
        max_depth=depth, backend=backend)
    jax.block_until_ready(out)

    # timed steady-state
    n_steps = int(os.environ.get("PTS_BENCH_STEPS", "16"))
    rays = 0
    t0 = time.perf_counter()
    for s in range(1, n_steps + 1):
        total, samples, out, nrays = render_sample(
            scene, ro, rd, total, samples, jax.random.fold_in(key, s),
            max_depth=depth, backend=backend)
        rays += int(nrays)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    mrays = rays / dt / 1e6
    print(json.dumps({
        "metric": "Mrays/sec/chip (Cornell box 512x512, 4-wave spectral, depth 3)",
        "value": round(mrays, 2),
        "unit": "Mray/s",
        "vs_baseline": round(mrays / 200.0, 3),
    }))


if __name__ == "__main__":
    main()
