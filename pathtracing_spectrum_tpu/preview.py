"""Raster-preview analog: headlight-shaded preview render and picking.

The reference's interactive previewer draws the scene with a two-pass GL
pipeline (shaders.h:54-125): pass 0 shades with a headlight diffuse term
(``max(dot(n, viewDir), ambient)``), pass 1 writes (objectId, elementId) into
a float attachment that mouse picking reads back (main.cpp:3666-3691).
Headless equivalent: one primary-ray intersection pass produces

* ``preview_render`` — a grayscale headlight shading of the scene (the
  authoring view, independent of the spectral result), and
* ``pick`` — object/element ids under a pixel.

Both run through the same compiled SceneData and intersection kernels as the
tracer, so what you pick is exactly what you trace.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models.camera import camera_rays
from .ops.intersect import intersect_bruteforce
from .scene import Scene, SceneData

_AMBIENT = 0.3  # preview.frag's floor term (shaders.h:97-105 behaviour)


def _element_table(scene: Scene) -> np.ndarray:
    """[M, 2] (object_id, element_id) per flat material index."""
    rows = []
    for oi, obj in enumerate(scene.objects):
        for ei in range(len(obj.elements)):
            rows.append((oi, ei))
    if not rows:
        rows = [(-1, -1)]
    return np.asarray(rows, np.int32)


def _primary_hits(scene_data: SceneData, scene: Scene, width: int,
                  height: int):
    cam = scene.camera()
    ro, rd = camera_rays(cam, width, height)
    hit, t, idx, _, _ = intersect_bruteforce(
        ro, rd, scene_data.tri_face_n, scene_data.tri_k1, scene_data.tri_k2,
        scene_data.tri_k3, scene_data.tri_consts)
    return ro, rd, hit, t, idx


def preview_render(scene: Scene, width: int, height: int,
                   scene_data: SceneData = None) -> np.ndarray:
    """Headlight-diffuse preview image, uint8 [H, W]."""
    scene_data = scene_data if scene_data is not None else scene.compile()
    ro, rd, hit, t, idx = _primary_hits(scene_data, scene, width, height)
    n = scene_data.tri_face_n[idx]
    # headlight: light direction = -view direction
    shade = jnp.abs(jnp.sum(n * rd, axis=-1))
    shade = jnp.maximum(shade, _AMBIENT)
    img = jnp.where(hit, shade, 0.0)
    return np.asarray(jnp.clip(img * 255.0, 0, 255).astype(jnp.uint8)
                      ).reshape(height, width)


def pick(scene: Scene, width: int, height: int, x: int, y: int,
         scene_data: SceneData = None) -> Tuple[int, int]:
    """(object_id, element_id) under pixel (x, y); (-1, -1) on miss.

    Mirrors the reference's pick-attachment readback (ids offset by one so 0
    means background, main.cpp:3682-3691) but returns plain 0-based ids.
    """
    scene_data = scene_data if scene_data is not None else scene.compile()
    ro, rd, hit, t, idx = _primary_hits(scene_data, scene, width, height)
    pixel = y * width + x
    if not bool(hit[pixel]):
        return (-1, -1)
    mat = int(scene_data.tri_material[idx[pixel]])
    table = _element_table(scene)
    if mat >= table.shape[0]:
        return (-1, -1)
    return int(table[mat, 0]), int(table[mat, 1])
