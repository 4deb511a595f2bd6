"""Group-depth probe for the HEAVY dense scene (254k tris), one session.

Depth 16 measured a clear win on the default scene (queue_depth_probe:
215.4 -> 206.2 ms), but the dense extra regressed 486 -> 500 ms when its
groups deepened 8 -> 16. Dense frames hold far larger in-flight
intermediates (50 MB resolve records, 254k-tri setup tables), and deep
queues of heavy frames are the known pathological regime (HBM fills ->
allocator backoff; 50 in flight = 41.5 s/frame in r2). This measures
dense at depth 8 vs 16 in ONE session to decide bench's extras depth.

Usage: python tools/dense_depth_probe.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _measure_scene, _wait_healthy  # noqa: E402


def _dense():
    from syzygy_tpu.assets import (
        TextureLibrary,
        register_default_textures,
        sphere_mesh,
    )
    from syzygy_tpu.math.geometry import eulers_from_forward
    from syzygy_tpu.scene import Scene, TransformHost

    dense = Scene()
    dlib = TextureLibrary()
    mat = register_default_textures(dlib)
    mesh = sphere_mesh(mat, rings=32, segments=64)
    side = 8
    dense.add_mesh_instance(
        mesh,
        "spheres",
        [
            TransformHost.make(
                (
                    8.0 * (i % side) - 4.0 * side,
                    -6.0,
                    8.0 * (i // side) - 4.0 * side,
                )
            )
            for i in range(64)
        ],
    )
    dense.tick(0.0)
    eye = np.array([18.0, -16.0, -22.0], np.float32)
    target = np.array([0.0, -6.0, 0.0], np.float32)
    dense.camera.position = tuple(eye)
    dense.camera.euler_angles = tuple(
        np.asarray(eulers_from_forward(target - eye))
    )
    return dense, dlib


def main():
    if not _wait_healthy():
        print("device unavailable")
        return
    from syzygy_tpu.renderer import RenderConfig

    config = RenderConfig(
        width=1920, height=1080, n_shadow_maps=4, fuse_lighting_sky=True
    )
    # r5 follow-up: depth 8 vs 16 was a wash at ~500 ms/frame while the
    # stage sum is ~194-300 ms — if SHALLOW queues (1/2/4) are faster, the
    # gap is in-flight HBM pressure (allocator backoff), not compute.
    for group in (1, 2, 4, 8, 2):
        scene, library = _dense()
        ms = _measure_scene(
            scene, library, config, frames=max(8, group * 2), group=group
        )
        print(f"dense depth {group}: {ms:.1f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
