"""Device A/B: shared sun PCF (RenderConfig.share_sun_pcf).

The lighting loop (light 0) and the sky camera pass evaluate the
IDENTICAL per-pixel sun PCF chain; as differently-shaped programs XLA
cannot CSE them, so the frame pays the 5-row PCF (~40 ms at 1080p)
twice. share_sun_pcf hoists it once — bitwise-identical
(tests/test_lighting.py::test_share_sun_pcf_bitwise).

BABA on the bench default scene, then the dense stress field once.
Also crossed with shadowless_strength_eps (the candidate new default):
with the moon skipped AND the sun shared, the frame runs ONE PCF
instead of three. Usage: python tools/share_pcf_ab.py
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
        width=1920, height=1080, n_shadow_maps=4, fuse_lighting_sky=True
    )
    for share in (True, False, True, False):
        config = dataclasses.replace(base, share_sun_pcf=share)
        scene, library = _flagship_scene()
        ms = _measure_scene(scene, library, config, frames=16)
        print(f"default share={share}: {ms:.1f} ms/frame", flush=True)
    # the candidate r6 default: shared sun + dim-moon skip (one PCF/frame)
    for share in (True, False):
        config = dataclasses.replace(
            base, share_sun_pcf=share, shadowless_strength_eps=0.025
        )
        scene, library = _flagship_scene()
        ms = _measure_scene(scene, library, config, frames=16)
        print(
            f"default share={share} + shadowless: {ms:.1f} ms/frame",
            flush=True,
        )
    for share in (True, False):
        config = dataclasses.replace(
            base, share_sun_pcf=share, shadowless_strength_eps=0.025
        )
        scene, library = _dense()
        ms = _measure_scene(scene, library, config, frames=8)
        print(
            f"dense share={share} + shadowless: {ms:.1f} ms/frame", flush=True
        )


if __name__ == "__main__":
    main()
