"""Regenerate golden frames after intentional rendering changes."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
    )
    from test_golden import GOLDEN, golden_scene_setup

    from syzygy_tpu.renderer import render_frame
    from syzygy_tpu.scene import pack_frame_params, pack_geometry
    from syzygy_tpu.utils import write_png

    scene, lib, config = golden_scene_setup()
    geo = pack_geometry(scene, lib)
    img = np.asarray(
        render_frame(
            geo, pack_frame_params(scene, config.width / config.height), config
        )
    )
    write_png(GOLDEN, img)
    print(f"wrote {GOLDEN} (mean {img.mean():.4f})")


if __name__ == "__main__":
    main()
