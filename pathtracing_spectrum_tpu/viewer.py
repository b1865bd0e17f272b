"""Framebuffer readback viewer.

The reference displays the running mean as a single-channel grayscale image:
each frame it converts ``spectrumResult[pixel][channel] * 255`` into an RGB8
texture (main.cpp:3437-3453) blitted by the quad shader, whose channel
selector mirrors the left-bar wave choice (shaders.h:29-52, main.cpp:2298+).
Here the GL/ImGui stack is replaced by host-side readback: grayscale
conversion, PNG export, and a terminal ASCII preview. Values are clamped to
[0, 255] (the reference's raw float->GLubyte conversion overflows instead).
"""

from __future__ import annotations

import numpy as np


def to_grayscale(image: np.ndarray, channel: int,
                 scale: float = 255.0) -> np.ndarray:
    """[H, W, nw] spectral image -> uint8 [H, W] for one wave channel."""
    img = np.asarray(image)
    if img.ndim != 3 or not (0 <= channel < img.shape[2]):
        return np.zeros(img.shape[:2], np.uint8)
    chan = np.nan_to_num(img[:, :, channel], nan=0.0)
    return np.clip(chan * scale, 0.0, 255.0).astype(np.uint8)


def normalized_grayscale(image: np.ndarray, channel: int) -> np.ndarray:
    """Auto-exposure variant: channel max -> white (useful for thermal
    radiance values far from [0,1])."""
    img = np.asarray(image)
    chan = np.nan_to_num(img[:, :, channel], nan=0.0)
    mx = chan.max()
    if mx <= 0:
        return np.zeros(chan.shape, np.uint8)
    return np.clip(chan / mx * 255.0, 0.0, 255.0).astype(np.uint8)


def save_png(image: np.ndarray, channel: int, path: str,
             normalize: bool = True) -> None:
    from PIL import Image as PILImage

    gray = (normalized_grayscale(image, channel) if normalize
            else to_grayscale(image, channel))
    PILImage.fromarray(gray, mode="L").save(path)


def save_all_channels_png(image: np.ndarray, path_prefix: str,
                          normalize: bool = True) -> list:
    paths = []
    for k in range(np.asarray(image).shape[2]):
        p = f"{path_prefix}_ch{k}.png"
        save_png(image, k, p, normalize=normalize)
        paths.append(p)
    return paths


_ASCII_RAMP = " .:-=+*#%@"


def ascii_preview(image: np.ndarray, channel: int, width: int = 64,
                  normalize: bool = True) -> str:
    """Terminal preview of one channel (rows subsampled 2:1 for aspect)."""
    gray = (normalized_grayscale(image, channel) if normalize
            else to_grayscale(image, channel)).astype(np.float32) / 255.0
    h, w = gray.shape
    step = max(1, w // width)
    sub = gray[::step * 2, ::step]
    idx = np.clip((sub * (len(_ASCII_RAMP) - 1)).astype(int), 0,
                  len(_ASCII_RAMP) - 1)
    return "\n".join("".join(_ASCII_RAMP[v] for v in row) for row in idx)
