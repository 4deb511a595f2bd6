"""Device placement helpers.

The package pins eager ops to CPU (see ``__init__``); anything that should
live on the accelerator for the frame loop — geometry, textures — is placed
explicitly with :func:`place_on_accelerator`, after which jitted stages follow
the committed inputs onto the chip.
"""

from __future__ import annotations

import jax


def accelerator_device():
    """First non-CPU device, or the CPU if none exists."""
    for d in jax.devices():
        if d.platform != "cpu":
            return d
    return jax.devices()[0]


def place_on_accelerator(tree):
    """Commit a pytree to the accelerator (geometry upload path)."""
    return jax.device_put(tree, accelerator_device())
