"""Host-side asset types: meshes, surfaces, materials, texture library.

Mirrors ``assets/assets.hpp:30-244`` (``Mesh``, ``GeometrySurface``,
``MaterialData``) and the texture registry half of ``AssetLibrary``. TPU-first
differences from the Vulkan reference:

* Textures live in one fixed-shape array ``(N, S, S, 4) float32`` (linear
  light), replacing descriptor sets — per-pixel sampling is a gather indexed
  by material id. All textures are resampled to ``S x S`` at registration.
* Meshes are SoA numpy arrays; GPU upload happens when a Scene is packed into
  the static-shape device batch (see ``syzygy_tpu.scene.pack``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

DEFAULT_TEXTURE_SIZE = 256


@dataclasses.dataclass(frozen=True)
class MaterialData:
    """Texture ids for one surface (``renderer/material.hpp:16-24``)."""

    color: int
    normal: int
    orm: int


@dataclasses.dataclass(frozen=True)
class GeometrySurface:
    """Triangle range + material (``assets/assets.hpp`` GeometrySurface)."""

    first_tri: int
    tri_count: int
    material: MaterialData


@dataclasses.dataclass
class Mesh:
    """Indexed triangle mesh (``assets/assets.hpp`` Mesh), SoA host arrays."""

    positions: np.ndarray  # (V, 3) f32
    normals: np.ndarray  # (V, 3) f32
    uvs: np.ndarray  # (V, 2) f32
    colors: np.ndarray  # (V, 4) f32
    triangles: np.ndarray  # (T, 3) i32
    surfaces: list[GeometrySurface]
    name: str = "mesh"

    @property
    def vertex_bounds(self):
        """min/max corner pair (``Mesh::vertexBounds``)."""
        return self.positions.min(axis=0), self.positions.max(axis=0)

    def __post_init__(self):
        self.positions = np.ascontiguousarray(self.positions, np.float32)
        self.normals = np.ascontiguousarray(self.normals, np.float32)
        self.uvs = np.ascontiguousarray(self.uvs, np.float32)
        self.colors = np.ascontiguousarray(self.colors, np.float32)
        self.triangles = np.ascontiguousarray(self.triangles, np.int32)


def srgb_to_linear(srgb: np.ndarray) -> np.ndarray:
    """EOTF: inverse of the sRGB transfer in ``shaders/transfer/oetf_srgb.comp``."""
    srgb = srgb.astype(np.float32)
    return np.where(
        srgb <= 0.04045, srgb / 12.92, ((srgb + 0.055) / 1.055) ** 2.4
    ).astype(np.float32)


class TextureLibrary:
    """Registry of same-sized float32 textures (replaces descriptor arrays)."""

    def __init__(self, size: int = DEFAULT_TEXTURE_SIZE):
        self.size = size
        self._textures: list[np.ndarray] = []
        self._names: dict[str, int] = {}

    def register(
        self, name: str, rgba: np.ndarray, srgb: bool = False
    ) -> int:
        """Add a texture; uint8 input is normalized, sRGB decoded if flagged.

        Mirrors the color/UNORM format split at ``assets.cpp:701-711`` (color
        maps are sRGB; normal/ORM maps are linear UNORM).
        """
        if name in self._names:
            return self._names[name]
        img = np.asarray(rgba)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        img = img.astype(np.float32)
        if img.ndim != 3 or img.shape[2] != 4:
            raise ValueError(f"expected (H, W, 4) texture, got {img.shape}")
        if srgb:
            img = np.concatenate(
                [srgb_to_linear(img[..., :3]), img[..., 3:]], axis=-1
            )
        img = _resize_bilinear(img, self.size, self.size)
        idx = len(self._textures)
        self._textures.append(np.ascontiguousarray(img, np.float32))
        self._names[name] = idx
        return idx

    def lookup(self, name: str) -> Optional[int]:
        return self._names.get(name)

    def as_array(self) -> np.ndarray:
        """(N, S, S, 4) float32 stack for device upload."""
        if not self._textures:
            return np.zeros((1, self.size, self.size, 4), np.float32)
        return np.stack(self._textures)

    def __len__(self) -> int:
        return len(self._textures)


def _resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Separable bilinear resize (numpy; avoids a PIL float-RGBA dependency)."""
    h, w, _ = img.shape
    if (h, w) == (out_h, out_w):
        return img

    def axis_coords(n_in, n_out):
        # align texel centers
        x = (np.arange(n_out, dtype=np.float32) + 0.5) * (n_in / n_out) - 0.5
        x = np.clip(x, 0.0, n_in - 1)
        lo = np.floor(x).astype(np.int64)
        hi = np.minimum(lo + 1, n_in - 1)
        frac = (x - lo).astype(np.float32)
        return lo, hi, frac

    ylo, yhi, yf = axis_coords(h, out_h)
    xlo, xhi, xf = axis_coords(w, out_w)
    top = img[ylo][:, xlo] * (1 - xf)[None, :, None] + img[ylo][:, xhi] * xf[None, :, None]
    bot = img[yhi][:, xlo] * (1 - xf)[None, :, None] + img[yhi][:, xhi] * xf[None, :, None]
    return (top * (1 - yf)[:, None, None] + bot * yf[:, None, None]).astype(
        np.float32
    )
