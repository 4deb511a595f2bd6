"""Device A/B: IN-CHUNK shared sun PCF at the exact bench config.

The r6 share_sun_pcf result (tools/share_pcf_ab.py: wash/loss) hoisted
the PCF into its own (H, W) buffer ACROSS programs, which serialized
the passes. Since then resolve_in_sky_chunks landed: resolve, lighting
and sky all run inside one lax.map chunk body, so the share can now be
a chunk-local VALUE (renderer/frame.py::chunk_sun_pcf) — no HBM
round-trip, no serialization, and the sky's in-situ 5-row PCF + select
tree drops out. Bitwise equivalence:
tests/test_lighting.py::test_share_sun_pcf_bitwise (fused-chunks rows).

BABA on the bench default scene + dense stress field, bench config
(fuse_lighting_sky_chunks + resolve_in_sky_chunks + sky_row_chunks=16 +
the shadowless default). Usage: python tools/share_pcf_chunk_ab.py
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _flagship_scene, _measure_scene, _wait_healthy  # noqa: E402
from tools.dense_depth_probe import _dense  # noqa: E402


def main():
    if not _wait_healthy():
        print("device unavailable")
        return
    from syzygy_tpu.renderer import RenderConfig

    base = RenderConfig(
        width=1920,
        height=1080,
        n_shadow_maps=4,
        fuse_lighting_sky=True,
        fuse_lighting_sky_chunks=True,
        resolve_in_sky_chunks=True,
        sky_row_chunks=16,
    )
    for share in (True, False, True, False):
        config = dataclasses.replace(base, share_sun_pcf=share)
        scene, library = _flagship_scene()
        ms = _measure_scene(scene, library, config, frames=16)
        print(f"default share={share}: {ms:.1f} ms/frame", flush=True)
    for share in (True, False, True, False):
        config = dataclasses.replace(base, share_sun_pcf=share)
        scene, library = _dense()
        ms = _measure_scene(scene, library, config, frames=8)
        print(f"dense share={share}: {ms:.1f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
