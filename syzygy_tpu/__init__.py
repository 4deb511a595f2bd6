"""syzygy_tpu — a TPU-native rebuild of the Syzygy deferred renderer.

The reference (EllarBooher/Syzygy) is a C++20 Vulkan 1.3 deferred renderer +
editor. This package reproduces its capabilities as an idiomatic JAX/XLA/Pallas
engine: the Vulkan graphics pipeline becomes a tile-binned software rasterizer
(a Pallas visibility-buffer kernel) plus vectorized per-pixel passes, and the
whole frame — vertex transform, raster, G-buffer resolve, shadow maps, deferred
PBR lighting, Hillaire atmosphere, tonemap, OETF — is one jitted program.

Layer map (mirrors SURVEY.md §7):
  math/     — geometry conventions, projections, transforms (geometry/ in ref)
  scene/    — Atmosphere, Camera, lights, instanced meshes  (renderer/scene.*)
  assets/   — glTF loading, procedural default assets       (assets/)
  kernels/  — Pallas + jnp GPU programs                     (shaders/)
  renderer/ — per-pass orchestration, frame graph           (renderer/)
  parallel/ — multi-chip image-space sharding               (no ref equivalent)
  app/      — headless driver loop, metrics                 (editor/)
"""

import os as _os
import sys as _sys

import jax as _jax

# Opt-in CPU platform BEFORE the backend initializes (the axon plugin
# ignores JAX_PLATFORMS, and `python -m syzygy_tpu.app` imports this
# package before any flag parsing can run). Honoring a literal `--cpu` in
# argv here matters for availability, not just convenience: probing the
# default backend below initializes the tunneled TPU plugin, which HANGS
# for minutes when the remote worker is down — a `--cpu` run must never
# touch it. (SZG_CPU=1 is the programmatic form; the app also re-execs
# with it set for safety.)
if _os.environ.get("SZG_CPU") == "1" or "--cpu" in _sys.argv:
    _jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache (the analog of the reference's runtime
# SPIR-V loading, renderer/shaders.cpp:491-641 — its shaders never
# recompile across runs; neither should our programs). Measured on the
# tunneled TPU (tools/r5_session.py, one session): the 512x256 viewer
# frame's cold start is 165 s dispatch + 1230 s to first pixel; with a
# warm cache 31 s + 180 s — the executable deserializes from disk instead
# of re-running the remote compiler. Opt out with SZG_NO_COMPILE_CACHE=1;
# override the location with JAX_COMPILATION_CACHE_DIR (which jax itself
# honors — we only set the config when nothing else has).
if (
    _os.environ.get("SZG_NO_COMPILE_CACHE") != "1"
    and not _os.environ.get("JAX_COMPILATION_CACHE_DIR")
    and _jax.config.jax_compilation_cache_dir is None
):
    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.path.expanduser("~/.cache/syzygy_tpu/xla"),
    )
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

# Geometry (4x4 transforms, vertex transforms, LUT math) needs true float32:
# the default matmul precision lowers to bf16 on TPU, which visibly warps
# projections (~1e-3 error). Hot kernels that can tolerate bf16 opt in locally
# via preferred_element_type / explicit precision instead.
_jax.config.update("jax_default_matmul_precision", "highest")

# Keep EAGER ops (constants created during tracing, tiny host-side math) on
# CPU. On a tunneled TPU backend, every `jnp.array([...])` literal otherwise
# lands on the remote device, and embedding it as an MLIR constant at lowering
# costs a ~30 s device->host fetch EACH — tracing a frame took minutes.
# Jitted computations still run on the accelerator: bulk inputs are committed
# there explicitly (see syzygy_tpu.runtime.place_on_accelerator).
# An UNAVAILABLE accelerator backend (wedged tunnel) degrades to CPU-only
# instead of failing the import — the reference's analog is logging the
# Vulkan init error and refusing only GPU work, not dying at dlopen.
try:
    _backend = _jax.default_backend()
except RuntimeError as _e:  # backend init failed (e.g. tunnel down)
    import logging as _logging

    _logging.getLogger("syzygy").warning(
        "accelerator backend unavailable (%s); CPU-only session", _e
    )
    _jax.config.update("jax_platforms", "cpu")
    _backend = "cpu"
if _backend != "cpu":
    try:
        _jax.config.update("jax_default_device", _jax.devices("cpu")[0])
    except RuntimeError:  # no CPU platform initialized
        pass

__version__ = "0.1.0"
