"""Multi-chip rendering: image-space + frame-batch sharding over a device mesh.

The reference is single-GPU (SURVEY.md §2c); the natural TPU scaling axes for
a renderer are:

* ``sp`` (spatial): shard the pixel grid's row-tiles across devices. Every
  per-pixel pass (raster, resolve, lighting, sky) is local to its rows; only
  the final image gather crosses chips — it rides ICI via the output sharding,
  no explicit collectives needed. Scene state and geometry are replicated
  (a few MB; broadcast once). The camera setup's O(T) slot math and the
  shadow-map lights ALSO partition over ``sp`` (rejoined via ``all_gather``)
  so triangle-heavy scenes don't replicate their setup per device.
* ``dp`` (data/frame): independent frames (cameras/time steps) across devices,
  e.g. offline animation or multi-view rendering.

Atmosphere LUTs are recomputed per device rather than sharded and gathered —
they are small next to the per-pixel work (~3 ms), and recompute avoids an
ICI round-trip on the frame critical path.

Measured overhead (tools/r5{,b,c,d}_session.py, one day): the sharded path
at (dp=1, sp=1) is a WASH vs the staged single-chip path (default 119.5 vs
119.5 ms/frame; dense +1.4 ms) with BITWISE-identical output (the raster
kernels evaluate global pixel coordinates — docs/BENCHMARKS.md round-11
items 9-10). Two early pitfalls are permanently encoded here: (1) NEVER vmap the per-device frame batch — it
cost 1.9x on the default scene and 15.6x on the dense field (batched
lax.cond runs both branches; batch dims wreck hot gather layouts) — see
:func:`_map_frames`; (2) the frame runs as TWO chained shard_map programs
(geometry, then lighting+sky) matching the single-chip chaining — measured
equal in rate to the one-program form once vmap was gone, but it compiles
~2x faster and keeps the single-chip program structure. The one-program
formulation stays under ``SHARDED_SPLIT_PROGRAMS=False`` for the
vma-checked CI trace, which cannot express the split path's
replicated-boundary out_specs (all_gather results are conservatively
sp-varying to the vma checker).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from syzygy_tpu.renderer.frame import (
    RenderConfig,
    _defers_resolve,
    _geometry_body,
    _stage_lighting_sky,
    render_frame_rows,
)
from syzygy_tpu.scene.pack import FrameParams, GeometryStatic


# shard_map vma checking. The frame graph is fully annotated (raster out
# vma, match_vma'd loop carries) but JAX cannot yet check vma through the
# listed raster's scalar-prefetch index_map, and the listed raster is the
# production path — so the default stays False. CI flips this with the
# listed raster disabled to get trace-time spec checking of everything
# else (tests/test_frame.py::test_sharded_vma_checked). vma checking also
# requires the ONE-program formulation: the split path's stage boundary
# declares state/records/shadow maps replicated over sp (true — but they
# derive from all_gather, whose output the checker keeps sp-varying).
CHECK_VMA = False

# Two chained programs (production: matches single-chip partitioning,
# compiles ~2x faster) vs one fused program (vma-checkable; same measured
# rate — see module docstring).
SHARDED_SPLIT_PROGRAMS = True


def make_mesh(dp: int = 1, sp: int = 1, devices=None) -> Mesh:
    """A (dp, sp) device mesh; dp x sp must equal the device count used."""
    devices = devices if devices is not None else jax.devices()[: dp * sp]
    if len(devices) != dp * sp:
        raise ValueError(f"need {dp * sp} devices, have {len(devices)}")
    import numpy as np

    return Mesh(np.asarray(devices).reshape(dp, sp), ("dp", "sp"))


def _map_frames(one, args_tree):
    """Apply ``one`` over the leading frame-batch axis WITHOUT vmap.

    vmap is the wrong tool for the per-device frame batch (measured,
    tools/r5b_session.py sp=1): a batched ``lax.cond`` predicate lowers to
    select-and-execute-BOTH-branches, so the listed raster's lossless
    overflow fallback ran the catastrophic full-iteration raster on every
    dense frame (3531 vs 227 ms — the landmine-14 pathology), and the
    batch dim on every hot per-pixel tensor perturbs gather layouts
    (landmine 15 class). B == 1 (the common case: dp shards frames)
    calls straight through; B > 1 uses ``lax.map`` — a scan whose body
    stays UNBATCHED, keeping conds structural and layouts flat."""
    b = jax.tree.leaves(args_tree)[0].shape[0]
    if b == 1:
        out = one(jax.tree.map(lambda x: x[0], args_tree))
        return jax.tree.map(lambda x: x[None], out)
    return jax.lax.map(one, args_tree)


def _local_rows(config: RenderConfig, sp: int) -> int:
    from syzygy_tpu.kernels.common import round_up
    from syzygy_tpu.kernels.raster import TILE_H

    # Pad the row axis up to a multiple of sp * TILE_H so EVERY (height, sp)
    # combination shards: each device renders an equal whole-tile row block,
    # and rows beyond the real framebuffer are off-screen (no geometry
    # coverage, sky rays below the frustum) and cropped away after the
    # gather. At 1920x1080 (padded_height 1088 = 17 tiles) this costs
    # 1 / 3 / 7 junk tile-rows at sp=2/4/8 — bounded waste, against which the
    # alternative (refusing non-divisible shapes) made the production shape
    # un-shardable (VERDICT r3 weak #2).
    return round_up(config.padded_height, sp * TILE_H) // sp


@functools.partial(jax.jit, static_argnames=("config", "mesh"))
def _sharded_geometry(
    geometry: GeometryStatic,
    params_batch: FrameParams,
    config: RenderConfig,
    mesh: Mesh,
):
    """Program 1 of the split sharded frame: prepare + vertex transform +
    shadow rasters (light-parallel over sp) + camera raster + records.

    Outputs: state / records / shadow maps are sp-replicated (their
    out_specs omit ``sp``; every device computed the identical value —
    state from replicated params, records and maps through all_gathers);
    the visibility buffer (or resolved G-buffer) is row-sharded."""
    sp = mesh.shape["sp"]
    rows = _local_rows(config, sp)

    def fn(geometry, params_local):
        row0 = jax.lax.axis_index("sp") * rows

        def one(params):
            return _geometry_body(
                geometry, params, config, row0, rows,
                shadow_shard_axis="sp",
            )

        return _map_frames(one, params_local)

    defers = _defers_resolve(config, geometry)
    out_specs = (
        P("dp"),  # FrameState
        P("dp", "sp"),  # VisibilityBuffer rows
        P("dp") if defers else P("dp", "sp"),  # records | G-buffer rows
        P("dp"),  # shadow maps
    )
    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(), P("dp")),
        out_specs=out_specs,
        check_vma=False,
    )(geometry, params_batch)


@functools.partial(jax.jit, static_argnames=("config", "mesh"))
def _sharded_finish(
    geometry: GeometryStatic,
    state,
    vis,
    gbuffer,  # records (T2, 49) when the resolve is deferred
    shadow_maps,
    config: RenderConfig,
    mesh: Mesh,
):
    """Program 2: resolve + lighting + sky per row chunk (the single-chip
    production formulation of ``_stage_lighting_sky``), on each device's
    row block. Crops to the real framebuffer inside the program."""
    sp = mesh.shape["sp"]
    rows = _local_rows(config, sp)
    defers = _defers_resolve(config, geometry)

    def fn(geometry, state_l, vis_l, gb_l, maps_l):
        row0 = jax.lax.axis_index("sp") * rows

        def one(args):
            state1, vis1, gb1, maps1 = args
            if defers:
                return _stage_lighting_sky.__wrapped__(
                    state1, vis1.depth, None, maps1, config, row0,
                    vis1, gb1, geometry,
                )
            return _stage_lighting_sky.__wrapped__(
                state1, vis1.depth, gb1, maps1, config, row0
            )

        return _map_frames(one, (state_l, vis_l, gb_l, maps_l))

    out = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(
            P(),
            P("dp"),
            P("dp", "sp"),
            P("dp") if defers else P("dp", "sp"),
            P("dp"),
        ),
        out_specs=P("dp", "sp", None, None),
        check_vma=False,
    )(geometry, state, vis, gbuffer, shadow_maps)
    return out[:, : config.height, : config.width]


@functools.partial(jax.jit, static_argnames=("config", "mesh"))
def _render_frames_sharded_mono(
    geometry: GeometryStatic,
    params_batch: FrameParams,
    config: RenderConfig,
    mesh: Mesh,
) -> jnp.ndarray:
    """One-program formulation (pre-r5; vma-checkable; measured 1.9x slower
    than the split at sp=1 — module docstring)."""
    sp = mesh.shape["sp"]
    rows = _local_rows(config, sp)

    def shard_fn(geometry, params_local):
        # params_local: leading dim B/dp; render each frame's local row block
        row0 = jax.lax.axis_index("sp") * rows

        def one_frame(params):
            # rows shard over sp; shadow lights + triangle setup also
            # partition over sp and rejoin via all_gather
            return render_frame_rows(
                geometry, params, config, row0, rows,
                shadow_shard_axis="sp",
            )

        return _map_frames(one_frame, params_local)

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P("dp")),
        out_specs=P("dp", "sp", None, None),
        # Trace-time spec checking (VERDICT r3 #7): the raster pallas_call
        # out_shapes carry `vma` (kernels/raster.py::_out_vma propagates the
        # union of the inputs' varying axes) and every loop carry that
        # starts from zeros/ones is pcast up via kernels.common.match_vma,
        # so the vma checker passes through the WHOLE frame graph except
        # one JAX limitation: the listed raster's scalar-prefetch index_map
        # (see kernels/raster.py::_coeff_index — ref-get discharge is not
        # vma-aware). check_vma therefore defaults to the module flag below
        # (False); tests/test_frame.py::test_sharded_vma_checked flips it
        # and traces the full production shape with the listed raster off,
        # so spec errors in everything else ARE caught at trace time in CI.
        check_vma=CHECK_VMA,
    )
    out = fn(geometry, params_batch)  # (B, h_pad, w_pad, 3)
    return out[:, : config.height, : config.width]


def render_frames_sharded(
    geometry: GeometryStatic,
    params_batch: FrameParams,  # leaves have leading batch dim B (B % dp == 0)
    config: RenderConfig,
    mesh: Mesh,
) -> jnp.ndarray:
    """Render a batch of frames over the (dp, sp) mesh.

    Returns (B, height, width, 3). Rows are sharded over ``sp`` during
    rendering; XLA inserts the gather implied by the output sharding.
    Two chained device programs (geometry, then lighting+sky) exactly like
    the single-chip path — the host enqueues both without syncing."""
    if not SHARDED_SPLIT_PROGRAMS:
        return _render_frames_sharded_mono(geometry, params_batch, config, mesh)
    state, vis, gbuffer, shadow_maps = _sharded_geometry(
        geometry, params_batch, config, mesh
    )
    return _sharded_finish(
        geometry, state, vis, gbuffer, shadow_maps, config, mesh
    )


def replicate_to_mesh(tree, mesh: Mesh):
    """Place a pytree replicated across the mesh (geometry broadcast)."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def batch_params(params_list) -> FrameParams:
    """Stack per-frame FrameParams into a leading batch axis."""
    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *params_list)
