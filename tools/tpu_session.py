"""One consolidated TPU measurement session (run sparingly; tunnel is fragile).

Reports per-stage timings, the 5-config driver ladder, and geometry scaling.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def wait_healthy(attempts=20):
    import jax
    import jax.numpy as jnp

    for i in range(attempts):
        try:
            jax.block_until_ready(jax.jit(lambda x: x.sum())(jnp.ones(8)))
            print(f"device healthy (attempt {i + 1})", flush=True)
            return True
        except Exception:
            time.sleep(30)
    return False


def timed(name, fn, n=10):
    """DEPRECATED measurement: block_until_ready through this tunnel acks
    before the device finishes, so these numbers are enqueue-rate fantasy
    (see CLAUDE.md item 7). Use tools/stage_budget.py's chained-scalar
    double-pass method for honest per-stage timing; kept only for relative
    smoke comparisons."""
    import jax

    jax.block_until_ready(fn())  # compile
    t0 = time.perf_counter()
    outs = [fn() for _ in range(n)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"  {name}: {dt:8.3f} ms (NOT trustworthy; see docstring)", flush=True)
    return dt


def main():
    import jax

    from syzygy_tpu.math.geometry import eulers_from_forward
    from syzygy_tpu.renderer import RenderConfig, render_frame
    from syzygy_tpu.renderer.frame import _stage_geometry, _stage_lighting, _stage_sky
    from syzygy_tpu.runtime import place_on_accelerator
    from syzygy_tpu.scene import (
        Scene,
        TransformHost,
        default_scene,
        pack_frame_params,
        pack_geometry,
    )
    from syzygy_tpu.assets import TextureLibrary, register_default_textures, sphere_mesh

    if not wait_healthy():
        print("DEVICE UNAVAILABLE", flush=True)
        sys.exit(1)

    W, H = 1920, 1080

    def cam(scene):
        eye = np.array([18.0, -16.0, -22.0], np.float32)
        target = np.array([0.0, -6.0, 0.0], np.float32)
        scene.camera.position = tuple(eye)
        scene.camera.euler_angles = tuple(
            np.asarray(eulers_from_forward(target - eye))
        )

    scene, lib = default_scene()
    scene.sun_animation.time = 0.35
    scene.tick(0.0)
    cam(scene)
    cfg = RenderConfig(width=W, height=H)
    geo = place_on_accelerator(pack_geometry(scene, lib))
    params = pack_frame_params(scene, W / H)

    only = os.environ.get("SZG_SESSION_ONLY", "")
    if only == "scaling":
        _scaling(cfg, cam, timed)
        return
    print("== per-stage (1080p, default scene) ==", flush=True)
    # The decomposed 3-stage view needs the UNFUSED pipeline: under the
    # r8 defaults (resolve_in_sky_chunks=True) _stage_geometry returns
    # resolve RECORDS, not a G-buffer, and lighting runs inside the sky
    # chunks. Full-frame rows below still use the production defaults.
    import dataclasses

    cfg_st = dataclasses.replace(
        cfg,
        resolve_in_sky_chunks=False,
        fuse_lighting_sky_chunks=False,
        fuse_lighting_sky=False,
    )
    state, vis, gb, smaps = _stage_geometry(geo, params, cfg_st)
    timed("stage_geometry", lambda: _stage_geometry(geo, params, cfg_st))
    timed("stage_lighting", lambda: _stage_lighting(state, gb, smaps))
    lit = _stage_lighting(state, gb, smaps)
    timed("stage_sky", lambda: _stage_sky(state, lit, vis.depth, gb, smaps, cfg_st))
    timed("full frame", lambda: render_frame(geo, params, cfg))

    print("== config ladder ==", flush=True)
    # 1: fullscreen compute 800x600
    from syzygy_tpu.kernels.transfer import gradient_color, oetf_srgb

    from syzygy_tpu.runtime import accelerator_device

    with jax.default_device(accelerator_device()):
        grad = jax.jit(lambda: oetf_srgb(gradient_color(800, 600)[..., :3]))
        timed("1 gradient 800x600", grad)

    # 2: sphere G-buffer at 1080p
    lib2 = TextureLibrary()
    mat2 = register_default_textures(lib2)
    sphere_scene = Scene()
    sphere_scene.add_mesh_instance(
        sphere_mesh(mat2, rings=64, segments=128),
        "Sphere",
        [TransformHost.make((0.0, -8.0, 0.0), scale=(5.0, 5.0, 5.0))],
    )
    sphere_scene.tick(0.0)
    cam(sphere_scene)
    geo2 = place_on_accelerator(pack_geometry(sphere_scene, lib2))
    params2 = pack_frame_params(sphere_scene, W / H)
    timed(
        "2 sphere gbuffer",
        lambda: _stage_geometry(geo2, params2, cfg_st),
    )
    # 3: deferred + shadows, no atmosphere
    cfg3 = dataclasses.replace(cfg, render_atmosphere=False)
    timed("3 deferred+shadows", lambda: render_frame(geo, params, cfg3))
    # 4/5: full atmosphere frame (default scene stands in for ABeautifulGame)
    timed("4+5 full frame", lambda: render_frame(geo, params, cfg))

    _scaling(cfg, cam, timed)
    print("session complete", flush=True)


def _scaling(cfg, cam, timed):
    import numpy as np

    from syzygy_tpu.assets import TextureLibrary, register_default_textures, sphere_mesh
    from syzygy_tpu.renderer import render_frame
    from syzygy_tpu.runtime import place_on_accelerator
    from syzygy_tpu.scene import Scene, TransformHost, pack_frame_params, pack_geometry

    W, H = cfg.width, cfg.height
    print("== geometry scaling (full frame) ==", flush=True)
    for n_spheres, rings, segs in [(4, 32, 64), (16, 32, 64), (64, 32, 64)]:
        s = Scene()
        lib3 = TextureLibrary()
        mat3 = register_default_textures(lib3)
        mesh = sphere_mesh(mat3, rings=rings, segments=segs)
        side = int(np.ceil(np.sqrt(n_spheres)))
        transforms = [
            TransformHost.make(
                (8.0 * (i % side) - 4.0 * side, -6.0, 8.0 * (i // side) - 4.0 * side)
            )
            for i in range(n_spheres)
        ]
        s.add_mesh_instance(mesh, "spheres", transforms)
        s.tick(0.0)
        cam(s)
        g_host = pack_geometry(s, lib3)
        n_tris = n_spheres * mesh.triangles.shape[0]
        g = place_on_accelerator(g_host)
        p = pack_frame_params(s, W / H)
        dt = timed(f"{n_tris:7d} tris", lambda: render_frame(g, p, cfg))


if __name__ == "__main__":
    main()
