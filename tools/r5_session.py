"""Round-5 consolidated TPU session (one health-gated batch; tunnel is
fragile — see CLAUDE.md landmines 5/7/11).

Measurements, in wedge-risk order (cheap/safe first):

  A. persistent-compilation-cache probe (VERDICT r4 weak #4): does the
     axon remote-compile path honor ``jax_compilation_cache_dir``?
     Two subprocesses compile the SAME 512x256 frame; if run 2's
     time-to-first-dispatch collapses, the cache works.
  B. fetch_frame_u8 half-boundary edge values on the real device
     (ADVICE r4 #2): numpy vs on-device quantize, max LSB delta.
  C. n_shadow_maps 10 vs 4 BABA on the default scene (VERDICT r4 weak
     #5): the active-light fori_loop should make them equal; settle it.
  D. shard_map overhead at sp=1 on the one real chip (VERDICT r4 weak
     #3): render_frames_sharded (dp=1, sp=1) vs the staged single-chip
     path, same chained-group forcing, BABA at 1920x1080 — the
     measured overhead term for the Amdahl multi-chip model. A 512x256
     image equality sanity runs first.

Usage:  python tools/r5_session.py            # full session
        python tools/r5_session.py cache_child <cache_dir>   # internal
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# probe-local scratch cache (NOT the package default ~/.cache/syzygy_tpu —
# the probe rmtree's this dir to get a cold leg, so keep it out of the repo
# and away from any real cache)
CACHE_DIR = "/tmp/szg_cache_probe"


def cache_child(cache_dir: str) -> None:
    """Subprocess body for probe A: compile + force one 512x256 frame,
    print phase timings as JSON on the last line."""
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from bench import _flagship_scene, _wait_healthy
    from syzygy_tpu.renderer import RenderConfig
    from syzygy_tpu.renderer.frame import render_frame_packed
    from syzygy_tpu.runtime import place_on_accelerator
    from syzygy_tpu.scene import (
        flatten_frame_params,
        frame_param_spec,
        pack_frame_params,
        pack_geometry,
    )

    assert _wait_healthy(attempts=10), "device unavailable"
    scene, library = _flagship_scene()
    config = RenderConfig(
        width=512, height=256, n_shadow_maps=4, shadow_dim=512,
        skyview_width=512, skyview_height=256,
    )
    geometry = place_on_accelerator(pack_geometry(scene, library))
    params = pack_frame_params(scene, config.width / config.height)
    spec = frame_param_spec(params)
    flat = flatten_frame_params(params, spec, np.empty(spec.total, np.float32))

    t0 = time.perf_counter()
    img = render_frame_packed(geometry, flat, spec, config)
    t_dispatch = time.perf_counter() - t0  # trace + compile (sync)
    t0 = time.perf_counter()
    v = float(np.asarray(img[0, 0, 0]))  # forces exec incl. lazy exe upload
    t_force = time.perf_counter() - t0
    assert np.isfinite(v)
    print(json.dumps({"dispatch_s": t_dispatch, "force_s": t_force}))


def probe_cache() -> dict:
    import shutil

    if os.path.isdir(CACHE_DIR):
        shutil.rmtree(CACHE_DIR)
    out = {}
    for leg in ("cold", "warm"):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "cache_child", CACHE_DIR],
            capture_output=True, text=True, timeout=1800,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        last = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
        if not last:
            out[leg] = {"error": (r.stderr or r.stdout)[-400:]}
            return out
        out[leg] = json.loads(last[-1])
        entries = []
        if os.path.isdir(CACHE_DIR):
            for root, _, files in os.walk(CACHE_DIR):
                entries += [os.path.getsize(os.path.join(root, f)) for f in files]
        out[leg]["cache_entries"] = len(entries)
        out[leg]["cache_bytes"] = int(sum(entries))
        print(f"cache {leg}: {out[leg]}", flush=True)
    return out


def probe_u8_edges() -> dict:
    import jax

    from syzygy_tpu.runtime import fetch_frame_u8, place_on_accelerator

    # half-boundary values (k+0.5)/255 where fma contraction could flip the
    # LSB, plus exact levels and random values
    k = np.arange(256, dtype=np.float32)
    vals = np.concatenate([
        (k + 0.5) / 255.0,
        k / 255.0,
        np.nextafter((k + 0.5) / 255.0, 0.0).astype(np.float32),
        np.nextafter((k + 0.5) / 255.0, 1.0).astype(np.float32),
        np.linspace(0.0, 1.0, 1009, dtype=np.float32),
    ]).astype(np.float32)
    host = (np.clip(vals, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    dev = fetch_frame_u8(place_on_accelerator(vals))
    diff = np.abs(host.astype(np.int32) - dev.astype(np.int32))
    out = {
        "n": int(vals.size),
        "max_lsb_delta": int(diff.max()),
        "n_mismatch": int((diff > 0).sum()),
        "platform": jax.devices()[0].platform,
    }
    print(f"u8 edges: {out}", flush=True)
    return out


def probe_shadow_maps() -> dict:
    import dataclasses

    from bench import _flagship_scene, _measure_scene
    from syzygy_tpu.renderer import RenderConfig

    base = RenderConfig(width=1920, height=1080, n_shadow_maps=4)
    out = {"legs": []}
    for n_maps in (4, 10, 4, 10):  # BABA
        scene, library = _flagship_scene()
        cfg = dataclasses.replace(base, n_shadow_maps=n_maps)
        ms = _measure_scene(scene, library, cfg, frames=32, group=16)
        out["legs"].append({"n_shadow_maps": n_maps, "ms": round(ms, 2)})
        print(f"n_shadow_maps={n_maps}: {ms:.2f} ms/frame", flush=True)
    return out


def _perturb(params, s):
    from measure import perturb_params

    return perturb_params(params, s)


def _measure_chained(frame_scalar_fn, n=24, group=8, label=""):
    from measure import measure_chained

    return measure_chained(frame_scalar_fn, n=n, group=group, label=label)


def probe_sp1() -> dict:
    import jax
    import jax.numpy as jnp

    from bench import _flagship_scene
    from syzygy_tpu.parallel import (
        batch_params,
        make_mesh,
        render_frames_sharded,
        replicate_to_mesh,
    )
    from syzygy_tpu.renderer import RenderConfig
    from syzygy_tpu.renderer.frame import render_frame_packed
    from syzygy_tpu.runtime import fetch_frame_u8, place_on_accelerator
    from syzygy_tpu.scene import (
        flatten_frame_params,
        frame_param_spec,
        pack_frame_params,
        pack_geometry,
    )

    out = {}
    mesh = make_mesh(dp=1, sp=1)

    # --- small equality sanity: sharded sp=1 vs staged single-chip ------
    scene, library = _flagship_scene()
    cfg_s = RenderConfig(
        width=512, height=256, n_shadow_maps=4, shadow_dim=512,
        skyview_width=512, skyview_height=256,
    )
    geometry = place_on_accelerator(pack_geometry(scene, library))
    params = pack_frame_params(scene, cfg_s.width / cfg_s.height)
    spec = frame_param_spec(params)
    flat = flatten_frame_params(params, spec, np.empty(spec.total, np.float32))
    img_single = fetch_frame_u8(
        render_frame_packed(geometry, flat, spec, cfg_s)
    )
    geo_m = replicate_to_mesh(geometry, mesh)
    batch = batch_params([params])
    t0 = time.perf_counter()
    img_shard = fetch_frame_u8(
        render_frames_sharded(geo_m, batch, cfg_s, mesh)[0]
    )
    print(f"  sharded 512x256 compile+run {time.perf_counter()-t0:.1f} s",
          flush=True)
    d = np.abs(img_single.astype(np.int32) - img_shard.astype(np.int32))
    out["equality_512x256"] = {
        "max_lsb": int(d.max()),
        "mean_lsb": float(d.mean()),
        "frac_gt1": float((d > 1).mean()),
    }
    print(f"  sp=1 equality: {out['equality_512x256']}", flush=True)

    # --- 1080p BABA: sharded sp=1 vs staged single-chip ------------------
    cfg = RenderConfig(width=1920, height=1080, n_shadow_maps=4)
    scene, library = _flagship_scene()
    geometry = place_on_accelerator(pack_geometry(scene, library))
    params = pack_frame_params(scene, cfg.width / cfg.height)
    spec = frame_param_spec(params)
    flat = place_on_accelerator(
        jnp.asarray(
            flatten_frame_params(params, spec, np.empty(spec.total, np.float32))
        )
    )
    geo_m = replicate_to_mesh(geometry, mesh)
    batch = batch_params([params])
    batch_dev = replicate_to_mesh(batch, mesh)

    tail = jax.jit(lambda img: jnp.sum(img) * 1e-30)
    pert_flat = jax.jit(lambda f, s: f.at[0].add(jnp.minimum(s * 1e-30, 0.0)))
    pert_batch = jax.jit(_perturb)

    def single(prev):
        f = pert_flat(flat, prev)
        return tail(render_frame_packed(geometry, f, spec, cfg))

    def sharded(prev):
        b = pert_batch(batch_dev, prev)
        return tail(render_frames_sharded(geo_m, b, cfg, mesh))

    legs = []
    for name, fn in (
        ("sharded", sharded), ("single", single),
        ("sharded", sharded), ("single", single),
    ):
        legs.append({
            "path": name,
            "ms": round(_measure_chained(fn, n=24, group=8, label=name), 2),
        })
    out["baba_1080p"] = legs
    return out


def main() -> None:
    from bench import _wait_healthy

    t_session = time.perf_counter()
    results = {"session": time.strftime("%Y-%m-%d %H:%M")}
    assert _wait_healthy(), "device unavailable"

    for name, fn in (
        ("cache", probe_cache),
        ("u8_edges", probe_u8_edges),
        ("shadow_maps", probe_shadow_maps),
        ("sp1", probe_sp1),
    ):
        print(f"=== {name} ===", flush=True)
        try:
            results[name] = fn()
        except Exception as e:
            results[name] = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
            print(f"{name} FAILED: {results[name]['error']}", flush=True)
            if not _wait_healthy(attempts=12):
                print("device did not recover; stopping session", flush=True)
                break
    results["session_s"] = round(time.perf_counter() - t_session, 1)
    path = "/tmp/r5_session.json"
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    print(f"written to {path}", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "cache_child":
        cache_child(sys.argv[2])
    else:
        main()
