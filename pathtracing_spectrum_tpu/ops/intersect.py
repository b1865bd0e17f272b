"""Ray-triangle intersection (device side).

Reproduces the reference's intersection predicate exactly
(mesh.cpp:283-295 leaf test + the blackpawn same-side point-in-triangle test
at mesh.cpp:225-237):

* plane hit:  ``t = dot(v1 - ro, n) / dot(rd, n)``; parallel rays
  (``dot(rd, n) == 0`` — exact compare, like the reference) and ``t < 0``
  miss;
* inside test: three same-side checks with ``>= 0`` (edge-inclusive).

The reference walks a pointer BVH recursively and returns the nearer child
hit (mesh.cpp:239-280) — which is exactly "closest valid hit over all
triangles". On TPU the same result comes from a *dense* ray x triangle sweep:
a regular, divergence-free computation that maps to the VPU/MXU (the `denom`
term is literally a [N,3]x[3,C] matmul). For large scenes the BVH path
(ops/bvh.py) prunes; for small/medium scenes dense wins outright.

Triangles are processed in static chunks via ``lax.fori_loop`` so peak
memory stays ~[N, CHUNK, 3] regardless of scene size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


BIG = jnp.float32(3.0e38)


def _chunk_hits(ro, rd, v1, e1, e2, n):
    """Closest-hit candidates of one triangle chunk.

    Args:
      ro, rd: [N, 3] rays.
      v1, e1, e2, n: [C, 3] chunk triangle data (v2=v1+e1, v3=v1+e2, unit n).

    Returns:
      t: [N, C] hit distance, BIG where invalid.
    """
    # denom = dot(rd, n) per ray-triangle pair: an [N,3] x [3,C] contraction.
    denom = jnp.einsum("nk,ck->nc", rd, n, preferred_element_type=jnp.float32)
    v1n = jnp.einsum("ck,ck->c", v1, n, preferred_element_type=jnp.float32)
    ron = jnp.einsum("nk,ck->nc", ro, n, preferred_element_type=jnp.float32)
    safe_denom = jnp.where(denom == 0.0, 1.0, denom)
    t = (v1n[None, :] - ron) / safe_denom

    # p on the plane, for the same-side tests
    p = ro[:, None, :] + t[..., None] * rd[:, None, :]  # [N,C,3]

    v2 = v1 + e1
    # IsInside(p, a=v1, b=v2, c=v3) (mesh.cpp:234-237):
    #   edge (b,c): ba = v3-v2 = e2-e1 ; ref1 = a-b = -e1
    #   edge (a,c): ba = v3-v1 = e2   ; ref2 = b-a = e1
    #   edge (a,b): ba = v2-v1 = e1   ; ref3 = c-a = e2
    ba1 = e2 - e1
    cp2_1 = jnp.cross(ba1, -e1)        # [C,3] constant per tri
    cp2_2 = jnp.cross(e2, e1)
    cp2_3 = jnp.cross(e1, e2)

    pmb = p - v2[None, :, :]
    pma = p - v1[None, :, :]
    s1 = jnp.einsum("nck,nck->nc", jnp.cross(ba1[None, :, :], pmb),
                    jnp.broadcast_to(cp2_1[None, :, :], p.shape)) >= 0.0
    s2 = jnp.einsum("nck,nck->nc", jnp.cross(e2[None, :, :], pma),
                    jnp.broadcast_to(cp2_2[None, :, :], p.shape)) >= 0.0
    s3 = jnp.einsum("nck,nck->nc", jnp.cross(e1[None, :, :], pma),
                    jnp.broadcast_to(cp2_3[None, :, :], p.shape)) >= 0.0

    valid = (denom != 0.0) & (t >= 0.0) & s1 & s2 & s3
    return jnp.where(valid, t, BIG)


def intersect_bruteforce(ro, rd, tri_v1, tri_e1, tri_e2, tri_n,
                         chunk: int = 256):
    """Closest hit over all triangles.

    Args:
      ro, rd: [N, 3] ray origins/directions.
      tri_v1, tri_e1, tri_e2, tri_n: [T, 3] triangle SoA (may be padded with
        degenerate triangles — zero normal never hits).
      chunk: static triangle chunk size.

    Returns:
      (hit [N] bool, t [N] f32, idx [N] int32)
    """
    n_rays = ro.shape[0]
    n_tris = tri_v1.shape[0]
    if n_tris == 0:
        return (jnp.zeros(n_rays, bool), jnp.full(n_rays, BIG),
                jnp.zeros(n_rays, jnp.int32))

    chunk = min(chunk, max(1, n_tris))
    pad = (-n_tris) % chunk
    if pad:
        padz = lambda a: jnp.concatenate(
            [a, jnp.zeros((pad, 3), a.dtype)], axis=0)
        tri_v1, tri_e1, tri_e2, tri_n = map(padz, (tri_v1, tri_e1, tri_e2, tri_n))
    n_chunks = (n_tris + pad) // chunk

    def body(c, carry):
        best_t, best_i = carry
        s = c * chunk
        t = _chunk_hits(ro, rd,
                        jax.lax.dynamic_slice_in_dim(tri_v1, s, chunk),
                        jax.lax.dynamic_slice_in_dim(tri_e1, s, chunk),
                        jax.lax.dynamic_slice_in_dim(tri_e2, s, chunk),
                        jax.lax.dynamic_slice_in_dim(tri_n, s, chunk))
        local_i = jnp.argmin(t, axis=1)
        local_t = jnp.take_along_axis(t, local_i[:, None], axis=1)[:, 0]
        better = local_t < best_t
        best_i = jnp.where(better, s + local_i.astype(jnp.int32), best_i)
        best_t = jnp.where(better, local_t, best_t)
        return best_t, best_i

    best_t = jnp.full(n_rays, BIG)
    best_i = jnp.zeros(n_rays, jnp.int32)
    best_t, best_i = jax.lax.fori_loop(0, n_chunks, body, (best_t, best_i))
    return best_t < BIG, best_t, best_i
