"""In-context A/B of engine knobs at the production bench configs.

    python tools/ab_engine.py <config> <variant>

config: textured | terrain_52k | terrain_200k | terrain_1m
variant:
  base        production defaults
  noreorder   disable the bounce-ray reorder (patches
              engine.REORDER_AUTO_MIN_TRIS above the scene size)
  period2     reorder_period=2 — reuse the bounce permutation every
              other iteration (result-exact; see engine.trace_radiance)
  from2/from3 reorder_from=2/3 — first looped iterations run unsorted
              (nearly fully live: nothing to pack), sort kicks in later
              (result-exact; see engine.trace_radiance)
  chunksN     bounded-width wavefront: trace each sample as N
              sequential sub-wavefronts (render_samples(chunks=N))

Kernel env knobs (PTS_SWEEP_SPAN, PTS_MXU_SWEEP, PTS_ROW_CULL, PTS_RB,
...) compose on top: set them on the command line. Run ONE variant per
process — module-level knob reads, jit caches and the relay's
memoization all make in-process switching lie (docs/tpu_cost_model.md).

Timing is bench_suite._timed_spp verbatim (warm batch kept in the
accumulator so every timed dispatch is distinct work).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = {
    "textured": (16, 16),
    "terrain_10k": (16, 16),
    "terrain_52k": (8, 8),
    "terrain_200k": (4, 4),
    "terrain_1m": (2, 2),
}


def main():
    config = sys.argv[1] if len(sys.argv) > 1 else "textured"
    variant = sys.argv[2] if len(sys.argv) > 2 else "base"
    spp, batch = CONFIGS[config]
    spp = int(os.environ.get("PTS_AB_SPP", spp))

    import bench_suite as bs
    import pathtracing_spectrum_tpu.engine as engine
    import pathtracing_spectrum_tpu.render as render_mod

    if variant == "noreorder":
        engine.REORDER_AUTO_MIN_TRIS = 1 << 30
    elif variant == "period2":
        orig = render_mod.render_samples
        render_mod.render_samples = (
            lambda *a, **k: orig(*a, reorder_period=2, **k))
    elif variant in ("from2", "from3", "from4", "from5"):
        rf = int(variant[-1])
        orig = render_mod.render_samples
        render_mod.render_samples = (
            lambda *a, **k: orig(*a, reorder_from=rf, **k))
    elif variant.startswith("freeze"):
        fz = int(variant[len("freeze"):])
        orig = render_mod.render_samples
        render_mod.render_samples = (
            lambda *a, **k: orig(*a, reorder_freeze=fz, **k))
    elif variant.startswith("chunks"):
        pass                      # handled at session construction below
    elif variant != "base":
        raise SystemExit(f"unknown variant {variant!r}")

    if config == "textured":
        sc = bs.textured_sphere_scene((1920, 1080))
    else:
        sc = bs.terrain_scene((512, 512), f"{config}.obj")
    session_kw = {}
    if variant.startswith("chunks"):
        session_kw["chunks"] = int(variant[len("chunks"):])
    s = bs._session(sc, **session_kw)
    t0 = time.time()
    dt, st = bs._timed_spp(s, spp, batch=batch)
    print(json.dumps({
        "config": config, "variant": variant, "spp": spp,
        "env": {k: v for k, v in os.environ.items()
                if k.startswith("PTS_")},
        "spp_per_sec": round(spp / dt, 3),
        "ms_per_sample": round(dt / spp * 1000, 1),
        "mrays_per_sec": round(st["mrays_per_s"], 1),
        "total_s": round(time.time() - t0, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
