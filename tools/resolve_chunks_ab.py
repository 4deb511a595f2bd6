"""Device A/B: G-buffer resolve inside the sky row chunks
(RenderConfig.resolve_in_sky_chunks).

The geometry program stops at the visibility buffer + pre-joined
records; resolve, lighting and sky all run per row chunk in the second
program. Expected winners (tools/geom_budget_probe.py): the resolve is
the geometry stage's dominant line (32.6 ms default / 103.9 dense) and
the dense combined geometry program pays ~100 ms over its parts sum.

BABA on the bench default scene (candidate bench config: shadowless +
fuse chunks), then dense BABA. Usage: python tools/resolve_chunks_ab.py
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _flagship_scene, _measure_scene, _wait_healthy  # noqa: E402
from dense_depth_probe import _dense  # noqa: E402


def main():
    if not _wait_healthy():
        print("device unavailable")
        return
    from syzygy_tpu.renderer import RenderConfig

    base = RenderConfig(
        width=1920, height=1080, n_shadow_maps=4, fuse_lighting_sky=True,
        fuse_lighting_sky_chunks=True, shadowless_strength_eps=0.025,
    )
    for rc in (True, False, True, False):
        config = dataclasses.replace(base, resolve_in_sky_chunks=rc)
        scene, library = _flagship_scene()
        ms = _measure_scene(scene, library, config, frames=16)
        print(f"default resolve_chunks={rc}: {ms:.1f} ms/frame", flush=True)
    for rc in (True, False, True, False):
        config = dataclasses.replace(base, resolve_in_sky_chunks=rc)
        scene, library = _dense()
        ms = _measure_scene(scene, library, config, frames=8)
        print(f"dense resolve_chunks={rc}: {ms:.1f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
