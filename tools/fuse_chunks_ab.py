"""Device A/B: lighting inside the sky row chunks (fuse_lighting_sky_chunks).

Motivation (tools/share_pcf_ab.py + geom_budget_probe, r6): gathers hide
under co-scheduled compute — the sky pass's own sun PCF measures ~free
in situ while the same PCF in the separate gather-bound lighting phase
costs ~40 ms. This A/B moves the whole lighting pass into the sky's
per-chunk body (identical math, one program) vs the phase-separated
fused program.

BABA on the bench default scene with the dim-moon skip on (the candidate
bench config), then the plain (no fast modes) config, then dense once.
Usage: python tools/fuse_chunks_ab.py
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
        shadowless_strength_eps=0.025,
    )
    for chunks in (True, False, True, False):
        config = dataclasses.replace(
            base, fuse_lighting_sky_chunks=chunks
        )
        scene, library = _flagship_scene()
        ms = _measure_scene(scene, library, config, frames=16)
        print(
            f"default+shadowless chunks={chunks}: {ms:.1f} ms/frame",
            flush=True,
        )
    for chunks in (True, False):
        config = dataclasses.replace(
            base, fuse_lighting_sky_chunks=chunks,
            shadowless_strength_eps=0.0,
        )
        scene, library = _flagship_scene()
        ms = _measure_scene(scene, library, config, frames=16)
        print(f"default exact chunks={chunks}: {ms:.1f} ms/frame", flush=True)
    for chunks in (True, False):
        config = dataclasses.replace(
            base, fuse_lighting_sky_chunks=chunks
        )
        scene, library = _dense()
        ms = _measure_scene(scene, library, config, frames=8)
        print(
            f"dense+shadowless chunks={chunks}: {ms:.1f} ms/frame", flush=True
        )


if __name__ == "__main__":
    main()
