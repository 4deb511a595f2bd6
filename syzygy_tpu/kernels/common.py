"""Shared kernel helpers: interpret-mode selection, tiling math."""

from __future__ import annotations

import jax


def use_interpret() -> bool:
    """Pallas kernels run interpreted off-TPU (CPU test mesh, debugging)."""
    return jax.default_backend() != "tpu"


def round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def cdiv(a: int, b: int) -> int:
    return -(-a // b)
