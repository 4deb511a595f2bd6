"""CPU quality probe: can the skyview LUT shrink below the reference's
2048x1024 (skyview.cpp:175) within the parity budget?

Motivation (r5 ledger): after f16/q8 storage the skyview gather line is
~25-30 ms/frame and only weakly bytes-bound (q8 A/B won just ~2.5 ms), so
the next lever is the TOUCHED working set — a half-res LUT quarters the
rows (2M -> 524k, out of the big gather tier). Resolution (unlike storage
precision) changes the sampled field itself, so quality must be judged at
realistic frame dims: this probe renders the bench default scene at
960x540 on CPU with the reference dims vs candidates and reports
whole-frame RMSE/max against the 1e-3 RMSE parity budget.

Usage: python tools/skyview_dims_probe.py [--full]  (--full = 1920x1080)
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    full = "--full" in sys.argv
    from bench import _flagship_scene
    from syzygy_tpu.renderer import RenderConfig, render_frame
    from syzygy_tpu.scene import pack_frame_params, pack_geometry

    w, h = (1920, 1080) if full else (960, 540)
    base = RenderConfig(width=w, height=h, n_shadow_maps=4)

    scene, lib = _flagship_scene()
    geo = pack_geometry(scene, lib)
    params = pack_frame_params(scene, w / h)

    ref = None
    for dims in ((2048, 1024), (1536, 768), (1024, 512), (768, 384)):
        config = dataclasses.replace(
            base, skyview_width=dims[0], skyview_height=dims[1]
        )
        t0 = time.perf_counter()
        img = np.asarray(render_frame(geo, params, config))
        dt = time.perf_counter() - t0
        if ref is None:
            ref = img
            print(f"skyview {dims}: reference ({dt:.0f}s)", flush=True)
            continue
        d = np.abs(img - ref)
        rmse = float(np.sqrt((d**2).mean()))
        print(
            f"skyview {dims}: RMSE {rmse:.2e} max {d.max():.2e} ({dt:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
