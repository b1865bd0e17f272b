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

RNG: counter-based (threefry) keys per (sample, bounce), replacing the
reference's single shared mt19937 (pathtracer.cpp:12 — racy across OpenMP
threads). For tests, ``rand_override`` injects fixed variates so a host
oracle can replay the identical random sequence.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .constants import EPS
from .scene import SceneData
from .ops import barycentric, planck, sampling
from .ops.intersect import intersect_bruteforce
from .ops.bvh import intersect_bvh
from .ops.texturing import sample_nearest


class TraceResult(NamedTuple):
    radiance: jnp.ndarray  # [N, nw]
    rays_traced: jnp.ndarray  # [] int32 — total rays cast (for Mrays/s)


def _shading_normal(scene: SceneData, idx, p, rd, uv, alpha, beta):
    """Smooth + backface-flip + normal-map chain (pathtracer.cpp:435-448)."""
    n = scene.tri_face_n[idx]
    smooth = barycentric.interp_normal(alpha, beta, scene.tri_n1[idx],
                                       scene.tri_n2[idx], scene.tri_n3[idx])
    n = jnp.where(scene.tri_smoothing[idx][:, None], smooth, n)
    # backface flip
    n = jnp.where((jnp.sum(n * rd, axis=-1) > 0.0)[:, None], -n, n)

    mat = scene.tri_material[idx]
    ntex = scene.mat_normal_tex[mat]
    tex = sample_nearest(scene.textures, scene.texture_sizes, ntex, uv)
    nt = tex[:, :3] * 2.0 - 1.0
    nt = jnp.where((nt[:, 2] < 0.0)[:, None],
                   nt * jnp.array([1.0, 1.0, 0.0]), nt)
    norm = jnp.linalg.norm(nt, axis=-1, keepdims=True)
    nt = nt / jnp.where(norm > 0, norm, 1.0)
    tbn_n = (scene.tri_tangent[idx] * nt[:, 0:1]
             + scene.tri_bitangent[idx] * nt[:, 1:2]
             + n * nt[:, 2:3])
    norm = jnp.linalg.norm(tbn_n, axis=-1, keepdims=True)
    tbn_n = tbn_n / jnp.where(norm > 0, norm, 1.0)
    return jnp.where((ntex >= 0)[:, None], tbn_n, n)


def trace_radiance(scene: SceneData, ro, rd, key, max_depth: int,
                   backend: str = "bvh", leaf_size: int = 4,
                   rand_override: Optional[jnp.ndarray] = None) -> TraceResult:
    """Trace radiance spectra for a batch of rays.

    Args:
      scene: compiled scene.
      ro, rd: [N, 3] primary rays.
      key: PRNG key for this sample.
      max_depth: the reference's trace depth (GUI range 1..10); the loop runs
        2*max_depth hit iterations (pathtracer.cpp:455).
      backend: "bvh" (skip-link traversal) or "dense" (all-triangles sweep).
      rand_override: optional [2*max_depth, 4, N] fixed U[0,1) variates
        (testing: lets a host oracle replay the same sequence).

    Returns:
      TraceResult(radiance [N, nw], rays_traced scalar).
    """
    n = ro.shape[0]
    nw = scene.wavenumbers.shape[0]

    def intersect(o, d):
        if backend == "dense":
            return intersect_bruteforce(o, d, scene.tri_v1, scene.tri_e1,
                                        scene.tri_e2, scene.tri_face_n)
        return intersect_bvh(o, d, scene.tri_v1, scene.tri_e1, scene.tri_e2,
                             scene.tri_face_n, scene.bvh_node_min,
                             scene.bvh_node_max, scene.bvh_node_skip,
                             scene.bvh_node_first, scene.bvh_node_count,
                             leaf_size=leaf_size)

    def body(h, state):
        ro, rd, throughput, radiance, inside, alive, rays_traced = state
        rays_traced = rays_traced + jnp.sum(alive.astype(jnp.int32))

        hit, t, idx = intersect(ro, rd)
        hit = hit & alive

        # ---- hit data ----
        p = ro + t[:, None] * rd
        alpha, beta = barycentric.barycentric_coords(
            p, scene.tri_v1[idx], scene.tri_e1[idx], scene.tri_e2[idx],
            scene.tri_d00[idx], scene.tri_d01[idx], scene.tri_d11[idx],
            scene.tri_inv_denom[idx])
        uv = barycentric.interp_uv(alpha, beta, scene.tri_uv1[idx],
                                   scene.tri_uv2[idx], scene.tri_uv3[idx])
        nrm = _shading_normal(scene, idx, p, rd, uv, alpha, beta)
        p_off = p + nrm * EPS

        mat = scene.tri_material[idx]
        roughness = scene.mat_roughness[mat]
        rtex = scene.mat_roughness_tex[mat]
        rough_tex = sample_nearest(scene.textures, scene.texture_sizes, rtex, uv)
        roughness = jnp.where(rtex >= 0, rough_tex[:, 0], roughness)

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
        killed = hit & rr_active & (rr_rand > scene.mat_rr_prob[mat])

        # ---- emissivity / reflectivity (+ temperature-grid re-bake) ----
        emis = scene.mat_emissivity[mat]
        refl = scene.mat_reflectivity[mat]
        grid = scene.mat_temp_grid[mat]
        temp = sample_nearest(scene.temp_grids, scene.temp_grid_sizes, grid, uv)
        bbp = planck.planck_bbp(temp + planck.CELSIUS_OFFSET, scene.wavenumbers)
        eps_curve = scene.mat_eps_curve[mat]
        has_grid = (grid >= 0)[:, None]
        emis_eff = jnp.where(has_grid, bbp * eps_curve, emis)
        refl_eff = jnp.where(has_grid, bbp * (1.0 - eps_curve), refl)

        # ---- radiance/throughput updates ----
        # miss: sky, die. kill: BAKED emissivity, die. survive: effective
        # emissivity, throughput *= effective reflectivity.
        miss = alive & ~hit
        survive = hit & ~killed
        contrib = (miss[:, None] * scene.sky[None, :]
                   + (killed[:, None] * emis)
                   + (survive[:, None] * emis_eff))
        radiance = radiance + throughput * contrib
        throughput = jnp.where(survive[:, None], throughput * refl_eff,
                               throughput)

        # ---- bounce ----
        bounce = sampling.sample_bounce(scene.mat_type[mat], rd, nrm,
                                        roughness, inside,
                                        u_rand, th_rand, fr_rand)
        new_ro = jnp.where(bounce.refracted[:, None],
                           p_off - nrm * (EPS * 2.0), p_off)
        ro = jnp.where(survive[:, None], new_ro, ro)
        rd = jnp.where(survive[:, None], bounce.direction, rd)
        inside = jnp.where(survive, bounce.new_inside, inside)
        alive = survive
        return ro, rd, throughput, radiance, inside, alive, rays_traced

    state = (ro, rd,
             jnp.ones((n, nw), jnp.float32),
             jnp.zeros((n, nw), jnp.float32),
             jnp.zeros(n, bool),
             jnp.ones(n, bool),
             jnp.zeros((), jnp.int32))
    ro_f, rd_f, throughput, radiance, inside, alive, rays_traced = (
        jax.lax.fori_loop(0, 2 * max_depth, body, state))

    # depth-cap fall-through: surviving rays see the sky (pathtracer.cpp:536-540)
    radiance = radiance + alive[:, None] * throughput * scene.sky[None, :]
    return TraceResult(radiance, rays_traced)


@functools.partial(jax.jit,
                   static_argnames=("max_depth", "backend", "leaf_size"))
def render_sample(scene: SceneData, ro, rd, total, samples, key,
                  max_depth: int, backend: str = "bvh", leaf_size: int = 4):
    """One progressive sample: trace all pixels once and accumulate.

    Reproduces ``RenderFrame``'s accumulation (pathtracer.cpp:595-598):
    ``total += wave; out = total / samples``.

    Returns (total', samples', out, rays_traced).
    """
    res = trace_radiance(scene, ro, rd, key, max_depth, backend, leaf_size)
    total = total + res.radiance
    samples = samples + 1
    out = total / samples.astype(jnp.float32)
    return total, samples, out, res.rays_traced
