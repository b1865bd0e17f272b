"""Host texture loading + the reference's nearest/border-black sampling rule.

Reference ``Image`` (PathTracing/src/image.{h,cpp}): stb_image RGBA8 load,
``tex2D(uv)`` returns vec4 in [0,1]; UV outside [0,1] -> black/transparent
(image.cpp:51-52); nearest-neighbour fetch at ``(int(W*u), int(H*v))`` with
row 0 at the image top (stb default). Here PIL replaces stb on the host and
sampling happens on-device (see ops/texturing.py) over a padded texture table.
"""

from __future__ import annotations

import numpy as np


def load_rgba(path: str) -> "np.ndarray | None":
    """Load an image file as float32 RGBA [H, W, 4] in [0, 1].

    Returns None on failure — the reference fails soft to black
    (image.cpp:48-49).
    """
    if not path:
        return None
    try:
        from PIL import Image as PILImage
        with PILImage.open(path) as im:
            arr = np.asarray(im.convert("RGBA"), np.uint8)
    except Exception:
        return None
    return arr.astype(np.float32) / 255.0


def sample_nearest(img: "np.ndarray | None", u: float, v: float) -> np.ndarray:
    """Host-side ``tex2D`` for tests/tools (device path is ops/texturing.py)."""
    if img is None:
        return np.zeros(4, np.float32)
    if u > 1.0 or u < 0.0 or v > 1.0 or v < 0.0:
        return np.zeros(4, np.float32)
    h, w = img.shape[:2]
    x = min(int(w * u), w - 1)
    y = min(int(h * v), h - 1)
    return img[y, x]
