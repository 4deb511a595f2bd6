"""Headless driver: the editor frame loop without a window.

Replaces ``editor/editor.cpp:441-779``: ticks the scene (sun animation,
instance animations, scripted fly-camera input), renders each frame through
the single jitted frame function, tracks an FPS ring buffer, and writes PNG
frames. ImGui/GLFW/swapchain are out of scope for a TPU engine; the metrics
report stands in for the performance window.

Usage:
    python -m syzygy_tpu.app --frames 8 --width 960 --height 540 \
        --out /tmp/szg --scene default
"""

from __future__ import annotations

import argparse
import logging
import os
import time

log = logging.getLogger("syzygy")


def main() -> None:
    parser = argparse.ArgumentParser(description="syzygy_tpu headless renderer")
    parser.add_argument("--frames", type=int, default=1)
    parser.add_argument("--width", type=int, default=1920)
    parser.add_argument("--height", type=int, default=1080)
    parser.add_argument("--out", type=str, default="frames")
    parser.add_argument(
        "--scene", type=str, default="default", choices=["default", "sphere"]
    )
    parser.add_argument("--gltf", type=str, default=None, help="path to .glb/.gltf")
    parser.add_argument("--no-atmosphere", action="store_true")
    parser.add_argument("--shadow-dim", type=int, default=1024)
    parser.add_argument("--skyview-scale", type=int, default=1,
                        help="divide skyview LUT resolution by this factor")
    parser.add_argument("--oetf", type=str, default="srgb",
                        choices=["srgb", "pure_gamma"])
    parser.add_argument("--dt", type=float, default=1.0 / 60.0)
    parser.add_argument("--time-of-day", type=float, default=None,
                        help="sun time in [0,1); 0.5 = noon")
    parser.add_argument("--sun-speed", type=float, default=100.0)
    parser.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = parser.parse_args()

    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s"
    )

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from syzygy_tpu.renderer import RenderConfig, render_frame
    from syzygy_tpu.scene import default_scene, pack_frame_params, pack_geometry
    from syzygy_tpu.utils import RingBuffer, write_png

    scene, library = _build_scene(args)
    if args.time_of_day is not None:
        scene.sun_animation.time = args.time_of_day
        scene.sun_animation.frozen = True
    scene.sun_animation.speed = args.sun_speed
    scene.render_atmosphere = not args.no_atmosphere
    scene.tick(0.0)

    config = RenderConfig(
        width=args.width,
        height=args.height,
        shadow_dim=args.shadow_dim,
        skyview_width=2048 // args.skyview_scale,
        skyview_height=1024 // args.skyview_scale,
        render_atmosphere=not args.no_atmosphere,
        oetf=args.oetf,
    )
    from syzygy_tpu.runtime import place_on_accelerator

    geometry = place_on_accelerator(pack_geometry(scene, library))
    aspect = args.width / args.height

    os.makedirs(args.out, exist_ok=True)
    fps_history = RingBuffer()

    log.info(
        "rendering %d frame(s) at %dx%d on %s",
        args.frames,
        args.width,
        args.height,
        jax.default_backend(),
    )
    t_compile = time.perf_counter()
    for frame_idx in range(args.frames):
        t0 = time.perf_counter()
        params = pack_frame_params(scene, aspect)
        image = render_frame(geometry, params, config)
        image = np.asarray(image)
        dt = time.perf_counter() - t0
        if frame_idx == 0:
            log.info("first frame (incl. compile): %.1fs", dt)
        else:
            fps_history.write(1.0 / max(dt, 1e-9))
        path = os.path.join(args.out, f"frame_{frame_idx:04d}.png")
        write_png(path, image)
        scene.tick(args.dt)

    log.info("wrote %d frames to %s", args.frames, args.out)
    if args.frames > 1:
        log.info("fps (steady, incl. host sync + png): %s", fps_history.report())
    log.info("total %.1fs", time.perf_counter() - t_compile)


def _build_scene(args):
    from syzygy_tpu.assets import (
        TextureLibrary,
        register_default_textures,
        sphere_mesh,
    )
    from syzygy_tpu.scene import Scene, TransformHost, default_scene

    if args.gltf:
        from syzygy_tpu.assets.gltf import load_gltf_scene

        return load_gltf_scene(args.gltf)
    if args.scene == "sphere":
        library = TextureLibrary()
        material = register_default_textures(library)
        scene = Scene()
        scene.add_mesh_instance(
            sphere_mesh(material),
            "Sphere",
            [TransformHost.make((0.0, -8.0, 0.0), scale=(5.0, 5.0, 5.0))],
        )
        return scene, library
    return default_scene()


if __name__ == "__main__":
    main()
