"""Minimal PNG writer/reader (PIL-backed) for frame dumps and goldens."""

from __future__ import annotations

import numpy as np


def write_png(path: str, image: np.ndarray) -> None:
    """image: (H, W, 3|4) float [0,1] or uint8."""
    from PIL import Image

    arr = np.asarray(image)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    Image.fromarray(arr).save(path)


def read_png(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGBA"), np.uint8)
