"""Barycentric interpolation helpers (device side).

Reproduces ``PathTracer::GetUV`` and ``PathTracer::GetSmoothNormal``
(pathtracer.cpp:394-422) using the per-triangle cached dot products from
``Triangle::Init`` (mesh.cpp:63-71). ``alpha`` weights vertex 2, ``beta``
weights vertex 3.
"""

from __future__ import annotations

import jax.numpy as jnp


def barycentric_coords(p, v1, e1, e2, d00, d01, d11, inv_denom):
    """Returns (alpha, beta) per ray, shapes [N]."""
    v2p = p - v1
    d20 = jnp.sum(v2p * e1, axis=-1)
    d21 = jnp.sum(v2p * e2, axis=-1)
    alpha = (d11 * d20 - d01 * d21) * inv_denom
    beta = (d00 * d21 - d01 * d20) * inv_denom
    return alpha, beta


def interp_uv(alpha, beta, uv1, uv2, uv3):
    w = (1.0 - alpha - beta)[..., None]
    return w * uv1 + alpha[..., None] * uv2 + beta[..., None] * uv3


def interp_normal(alpha, beta, n1, n2, n3):
    """Smooth normal: barycentric interp then normalise (pathtracer.cpp:419-421)."""
    w = (1.0 - alpha - beta)[..., None]
    n = w * n1 + alpha[..., None] * n2 + beta[..., None] * n3
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    return n / jnp.where(norm > 0, norm, 1.0)
