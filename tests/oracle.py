"""Slow numpy oracle: a direct transliteration of the reference's recursive
tracer semantics (pathtracer.cpp:360-637), used ONLY in tests as the ground
truth for the wavefront engine.

It consumes the same random variates as the engine via the
``rand_override`` tensor [2*max_depth, 4, N] indexed by (bounce, stream,
ray), so engine-vs-oracle comparisons are exact up to float associativity.
"""

from __future__ import annotations

import math

import numpy as np

EPS = 1e-3
_C = 299792458.0
_K = 1.0 * 138064852e-31
_H = 2.0 * math.pi * 105457180e-42


def bbp(temp_k: float, wavenumbers: np.ndarray) -> np.ndarray:
    v = wavenumbers.astype(np.float64)
    if temp_k <= 0:
        return np.zeros_like(v)
    return 2e8 * (_H * _C * _C) * v ** 3 / (np.exp(100.0 * _H * _C * v / _K / temp_k) - 1.0)


class OracleScene:
    """Plain-python scene mirror built from the compiled SceneData."""

    def __init__(self, scene_data):
        import numpy as np
        g = lambda a: np.asarray(a)
        self.v1 = g(scene_data.tri_v1)
        self.e1 = g(scene_data.tri_e1)
        self.e2 = g(scene_data.tri_e2)
        self.n1 = g(scene_data.tri_n1)
        self.n2 = g(scene_data.tri_n2)
        self.n3 = g(scene_data.tri_n3)
        self.uv1 = g(scene_data.tri_uv1)
        self.uv2 = g(scene_data.tri_uv2)
        self.uv3 = g(scene_data.tri_uv3)
        self.face_n = g(scene_data.tri_face_n)
        self.tangent = g(scene_data.tri_tangent)
        self.bitangent = g(scene_data.tri_bitangent)
        self.d00 = g(scene_data.tri_d00)
        self.d01 = g(scene_data.tri_d01)
        self.d11 = g(scene_data.tri_d11)
        self.inv_denom = g(scene_data.tri_inv_denom)
        self.smoothing = g(scene_data.tri_smoothing)
        self.mat_id = g(scene_data.tri_material)
        self.mat_type = g(scene_data.mat_type)
        self.mat_rr = g(scene_data.mat_rr_prob)
        self.mat_rough = g(scene_data.mat_roughness)
        self.emis = g(scene_data.mat_emissivity)
        self.refl = g(scene_data.mat_reflectivity)
        self.eps_curve = g(scene_data.mat_eps_curve)
        self.ntex = g(scene_data.mat_normal_tex)
        self.rtex = g(scene_data.mat_roughness_tex)
        self.tgrid = g(scene_data.mat_temp_grid)
        self.textures = g(scene_data.textures)
        self.tex_sizes = g(scene_data.texture_sizes)
        self.grids = g(scene_data.temp_grids)
        self.grid_sizes = g(scene_data.temp_grid_sizes)
        self.waves = g(scene_data.wavenumbers)
        self.sky = g(scene_data.sky)


def _closest_hit(sc: OracleScene, ro, rd):
    best_t, best_i = np.inf, -1
    for i in range(sc.v1.shape[0]):
        n = sc.face_n[i]
        denom = float(np.dot(rd, n))
        if denom == 0.0:
            continue
        t = float(np.dot(sc.v1[i] - ro, n)) / denom
        if t < 0.0:
            continue
        p = ro + rd * t
        v1, v2, v3 = sc.v1[i], sc.v1[i] + sc.e1[i], sc.v1[i] + sc.e2[i]

        def same_side(p1, p2, a, b):
            ba = b - a
            return np.dot(np.cross(ba, p1 - a), np.cross(ba, p2 - a)) >= 0.0

        if (same_side(p, v1, v2, v3) and same_side(p, v2, v1, v3)
                and same_side(p, v3, v1, v2)):
            if t < best_t:
                best_t, best_i = t, i
    return best_i, best_t


def _tex2d(table, sizes, tid, u, v):
    if tid < 0 or u > 1.0 or u < 0.0 or v > 1.0 or v < 0.0:
        return np.zeros(table.shape[-1] if table.ndim == 4 else ())
    w, h = int(sizes[tid, 0]), int(sizes[tid, 1])
    x = min(int(w * u), w - 1)
    y = min(int(h * v), h - 1)
    return table[tid, y, x]


def trace(sc: OracleScene, ro, rd, max_depth, rand, ray_idx,
          depth=0, inside=False):
    """Recursive Trace (pathtracer.cpp:424-541). rand: [2D, 4, N]."""
    nw = sc.waves.shape[0]
    i, t = _closest_hit(sc, ro, rd)
    if i >= 0:
        mid = int(sc.mat_id[i])
        p = ro + rd * t
        # barycentric
        v2p = p - sc.v1[i]
        d20 = np.dot(v2p, sc.e1[i])
        d21 = np.dot(v2p, sc.e2[i])
        alpha = (sc.d11[i] * d20 - sc.d01[i] * d21) * sc.inv_denom[i]
        beta = (sc.d00[i] * d21 - sc.d01[i] * d20) * sc.inv_denom[i]
        uv = ((1 - alpha - beta) * sc.uv1[i] + alpha * sc.uv2[i]
              + beta * sc.uv3[i])
        n = sc.face_n[i].astype(np.float64)
        if sc.smoothing[i]:
            n = ((1 - alpha - beta) * sc.n1[i] + alpha * sc.n2[i]
                 + beta * sc.n3[i])
            n = n / np.linalg.norm(n)
        if np.dot(n, rd) > 0.0:
            n = -n
        if sc.ntex[mid] != -1:
            nt = np.asarray(_tex2d(sc.textures, sc.tex_sizes,
                                   int(sc.ntex[mid]), uv[0], uv[1]))[:3] * 2.0 - 1.0
            if nt[2] < 0.0:
                nt = np.array([nt[0], nt[1], 0.0])
            nt = nt / np.linalg.norm(nt)
            n = (sc.tangent[i] * nt[0] + sc.bitangent[i] * nt[1] + n * nt[2])
            n = n / np.linalg.norm(n)
        p = p + n * EPS

        roughness = float(sc.mat_rough[mid])
        if sc.rtex[mid] != -1:
            roughness = float(_tex2d(sc.textures, sc.tex_sizes,
                                     int(sc.rtex[mid]), uv[0], uv[1])[0])

        if depth < max_depth * 2:
            rr_rand, u_rand, th_rand, fr_rand = rand[depth, :, ray_idx]
            depth += 1
            if depth >= max_depth:
                if abs(rr_rand) > sc.mat_rr[mid]:
                    return sc.emis[mid].copy()

            r = rd - 2.0 * np.dot(rd, n) * n
            mt = int(sc.mat_type[mid])
            if mt == 1:  # SPECULAR
                refl_dir = r
            elif mt == 0:  # DIFFUSE
                u = (np.cross([1.0, 0, 0], n) if abs(n[0]) < 1.0 - EPS
                     else np.cross([1.0, 1.0, 1.0], n))
                u = u / np.linalg.norm(u)
                v = np.cross(u, n)
                v = v / np.linalg.norm(v)
                w, th = u_rand, th_rand
                refl_dir = (w * math.cos(2 * math.pi * th) * u
                            + w * math.sin(2 * math.pi * th) * v
                            + math.sqrt(1 - w * w) * n)
                refl_dir = refl_dir / np.linalg.norm(refl_dir)
            elif mt == 2:  # GLOSSY
                # pathtracer.cpp:484: the condition tests n.x while the frame
                # is built around r (re-transliterated from the C++).
                flt_eps = 1.1920929e-07
                u = (np.cross([1.0, 0, 0], r) if abs(n[0]) < 1 - flt_eps
                     else np.cross([1.0, 1.0, 1.0], r))
                u = u / np.linalg.norm(u)
                v = np.cross(u, r)
                w, th = u_rand * roughness, th_rand
                refl_dir = (w * math.cos(2 * math.pi * th) * u
                            + w * math.sin(2 * math.pi * th) * v
                            + math.sqrt(1 - w * w) * r)
            else:  # GLASS
                nc, ng = 1.0, 1.5
                eta = ng / nc if inside else nc / ng
                r0 = ((nc - ng) / (nc + ng)) ** 2
                c = abs(np.dot(rd, n))
                k = 1.0 - eta * eta * (1.0 - c * c)
                if k < 0.0:
                    refl_dir = r
                else:
                    re = r0 + (1.0 - r0) * (1.0 - c) ** 2
                    if abs(fr_rand) < re:
                        refl_dir = r
                    else:
                        refl_dir = (eta * rd - (eta * np.dot(n, rd)
                                                + math.sqrt(k)) * n)
                        refl_dir = refl_dir / np.linalg.norm(refl_dir)
                        p = p - n * EPS * 2.0
                        inside = not inside

            emissivity = sc.emis[mid].copy()
            reflectivity = sc.refl[mid].copy()
            if sc.tgrid[mid] != -1:
                temp = float(_tex2d(sc.grids, sc.grid_sizes,
                                    int(sc.tgrid[mid]), uv[0], uv[1]))
                b = bbp(temp + 273.15, sc.waves)
                emissivity = (b * sc.eps_curve[mid]).astype(np.float64)
                reflectivity = (b * (1.0 - sc.eps_curve[mid])).astype(np.float64)

            return emissivity + trace(sc, p, refl_dir, max_depth, rand,
                                      ray_idx, depth, inside) * reflectivity

    return sc.sky.copy()
