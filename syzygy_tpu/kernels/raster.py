"""Tile-binned software rasterizer: the TPU replacement for Vulkan raster.

The reference rasterizes through the hardware pipeline
(``renderer/pipelines/deferred.cpp:503-713`` G-buffer pass,
``renderer/pipelines.cpp:593-806`` shadow depth pass). On TPU this becomes:

1. :func:`setup_triangles` (jnp, vectorized): clip-space vertices ->
   near-plane clipping (each triangle may split in two), screen-space
   barycentric linear forms, per-triangle bboxes, and a chunk x tile overlap
   mask (the "binning-lite" that lets the kernel skip whole triangle chunks
   per tile).
2. :func:`rasterize` (Pallas): a visibility-buffer kernel over a
   (tiles_y, tiles_x, chunks) grid. Each tile's depth/tri/bary block stays
   resident in VMEM across the chunk axis; per triangle it evaluates the two
   barycentric linear forms over the whole pixel tile on the VPU and performs
   a reverse-Z GREATER_OR_EQUAL depth test (``deferred.cpp:549``).

The raster emits only visibility (depth, clipped-triangle id, screen-space
barycentrics); attribute interpolation and texturing happen in the vectorized
resolve pass (``syzygy_tpu.kernels.resolve``) — the deferred-on-TPU split that
keeps this kernel payload-free.

Conventions: screen x right / y down, pixel centers at +0.5 (Vulkan), reverse-Z
(1 near, 0 far), front faces are CW on screen => positive doubled area
(``deferred.cpp:503-713``: CW front face, back-face cull).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from syzygy_tpu.kernels.common import cdiv, round_up, use_interpret

TILE_H = 64
TILE_W = 128
CHUNK = 64

W_CLIP_EPS = 1e-3  # near-plane clip guard in view-z units (w_clip = z_view)


class TriSetup(NamedTuple):
    """Screen-space triangle records after near-clip (capacity 2T)."""

    coeffs: jnp.ndarray  # (T2, 12) f32, see _PACK below
    orig_tri: jnp.ndarray  # (T2,) i32 -> original triangle id
    corner_bary: jnp.ndarray  # (T2, 3, 2) f32: corners' (b0,b1) wrt original
    corner_w: jnp.ndarray  # (T2, 3) f32 clip w of this (possibly clipped) tri
    # (chunks padded to 8, tiles_y * tiles_x) i32 overlap mask; paged into
    # SMEM 8 chunk-rows at a time so usage scales with tiles, not triangles
    chunk_mask: jnp.ndarray


# coeffs packing:
# 0:alpha0 1:beta0 2:gamma0 | 3:alpha1 4:beta1 5:gamma1 | 6:z2 7:dz0 8:dz1
# 9:valid (0/1) | 10: tx0*4096+tx1 | 11: ty0*4096+ty1 (per-triangle tile
# bbox, exact in f32 up to 4096 tiles/axis — the kernel's per-triangle
# skip test; invalid slots encode an empty range)
_COEFF_WIDTH = 12


def _out_vma(*arrays) -> frozenset:
    """Varying-manual-axes for pallas outputs: the union of the inputs'.

    Under ``jax.shard_map(check_vma=True)`` every output abstract value
    must state which mesh axes it varies over; ``pallas_call`` can't infer
    it, so we propagate the standard dataflow rule (outputs vary over every
    axis an input varies over) by hand. Outside shard_map this is the empty
    set, which ``ShapeDtypeStruct`` treats as unvarying (VERDICT r3 #7)."""
    vma: frozenset = frozenset()
    for a in arrays:
        v = getattr(jax.typeof(a), "vma", None)
        if v:
            vma |= frozenset(v)
    return vma


_TILE_PACK = 4096.0


def _rotate_corners(arr, rot):
    """Rotate the corner axis (axis 1, size 3) of ``arr`` by per-row ``rot``.

    Select between the three static rotations instead of a per-row
    ``take_along_axis`` — data-dependent gathers are the TPU bottleneck
    (tools/gather_bench.py) while whole-array selects are VPU-cheap.
    Identical values to the gather formulation."""
    r1 = jnp.concatenate([arr[:, 1:], arr[:, :1]], axis=1)
    r2 = jnp.concatenate([arr[:, 2:], arr[:, :2]], axis=1)
    expand = (slice(None),) + (None,) * (arr.ndim - 1)
    return jnp.where(
        (rot == 1)[expand], r1, jnp.where((rot == 2)[expand], r2, arr)
    )


def _setup_slots(
    tri_corner_clip: jnp.ndarray,  # (T, 3, 4) clip-space corners
    tri_valid: jnp.ndarray,  # (T,) bool
    width: int,
    height: int,
    cull_keep_sign: int,
    depth_bias_constant: float = 0.0,
    depth_bias_slope: float = 0.0,
):
    """Per-slot screen records INDEPENDENT of the raster grid and origin.

    The origin-free half of :func:`setup_triangles`: near-clip fan split,
    projection, affine barycentric/depth coefficients and screen bboxes.
    Everything here depends only on the triangles and the viewport — not on
    which row block of the frame a device rasters — so under image-space
    sharding this half can be computed on a triangle SLICE per device and
    rejoined with an ``all_gather`` (the origin fold + tile masks in
    :func:`_finish_setup` stay per-device).

    Returns ``(cols, all_bary, w_all)``: ``cols`` is (2T, 14) f32 packing
    [alpha0, beta0, gamma0, alpha1, beta1, gamma1, z2c, dz0, dz1, valid,
    bb_min_x, bb_max_x, bb_min_y, bb_max_y] (alphas WITHOUT the grid-origin
    fold); slot t is the clip fan's first triangle of input t, slot T+t the
    second."""
    w = tri_corner_clip[..., 3]  # (T, 3)
    inside = w >= W_CLIP_EPS  # (T, 3)
    n_in = inside.sum(axis=-1)  # (T,)

    # Canonical rotation: n_in==1 -> inside vertex first; n_in==2 -> outside
    # vertex first; else identity.
    rot_one = jnp.argmax(inside, axis=-1).astype(jnp.int32)
    rot_two = jnp.argmin(inside, axis=-1).astype(jnp.int32)
    rot = jnp.where(n_in == 1, rot_one, jnp.where(n_in == 2, rot_two, 0))

    v = _rotate_corners(tri_corner_clip, rot)  # (T, 3, 4)
    # original-triangle barycentric coords of the 3 original corners, rotated
    eye_bary = jnp.array([[1.0, 0.0], [0.0, 1.0], [0.0, 0.0]], jnp.float32)
    vb = _rotate_corners(
        jnp.broadcast_to(eye_bary[None], (rot.shape[0], 3, 2)), rot
    )  # (T, 3, 2)

    v0, v1, v2 = v[:, 0], v[:, 1], v[:, 2]
    b0c, b1c, b2c = vb[:, 0], vb[:, 1], vb[:, 2]

    def lerp_to_plane(pa, pb, ba, bb):
        t = (W_CLIP_EPS - pa[..., 3]) / jnp.where(
            jnp.abs(pb[..., 3] - pa[..., 3]) < 1e-12,
            1e-12,
            pb[..., 3] - pa[..., 3],
        )
        t = jnp.clip(t, 0.0, 1.0)[..., None]
        return pa + t * (pb - pa), ba + t[..., 0:1] * (bb - ba)

    i01, b01 = lerp_to_plane(v0, v1, b0c, b1c)
    i02, b02 = lerp_to_plane(v0, v2, b0c, b2c)
    i20, b20 = lerp_to_plane(v2, v0, b2c, b0c)

    # Case n_in==3: A=(v0,v1,v2); n_in==1: A=(v0, i01, i02);
    # n_in==2 (v0 outside): A=(i01, v1, v2), B=(i01, v2, i20)
    def case_select(three, one, two):
        return jnp.where(
            (n_in == 3)[:, None, None],
            three,
            jnp.where((n_in == 1)[:, None, None], one, two),
        )

    tri_a = case_select(
        jnp.stack([v0, v1, v2], 1),
        jnp.stack([v0, i01, i02], 1),
        jnp.stack([i01, v1, v2], 1),
    )
    bary_a = case_select(
        jnp.stack([b0c, b1c, b2c], 1),
        jnp.stack([b0c, b01, b02], 1),
        jnp.stack([b01, b1c, b2c], 1),
    )
    tri_b = jnp.stack([i01, v2, i20], 1)
    bary_b = jnp.stack([b01, b2c, b20], 1)

    valid_in = tri_valid & (n_in > 0)
    valid_a = valid_in
    valid_b = tri_valid & (n_in == 2)

    all_tris = jnp.concatenate([tri_a, tri_b], axis=0)  # (2T, 3, 4)
    all_bary = jnp.concatenate([bary_a, bary_b], axis=0)  # (2T, 3, 2)
    all_valid = jnp.concatenate([valid_a, valid_b], axis=0)  # (2T,)

    # Project to screen
    w_all = jnp.maximum(all_tris[..., 3], W_CLIP_EPS * 0.5)
    ndc = all_tris[..., :3] / w_all[..., None]
    sx = (ndc[..., 0] * 0.5 + 0.5) * width  # (2T, 3)
    sy = (ndc[..., 1] * 0.5 + 0.5) * height
    sz = ndc[..., 2]

    x0, x1, x2 = sx[:, 0], sx[:, 1], sx[:, 2]
    y0, y1, y2 = sy[:, 0], sy[:, 1], sy[:, 2]
    area2 = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)

    if cull_keep_sign > 0:
        facing = area2 > 0
    elif cull_keep_sign < 0:
        facing = area2 < 0
    else:
        facing = jnp.abs(area2) > 0
    all_valid = all_valid & facing & (jnp.abs(area2) > 1e-12)

    inv = jnp.where(jnp.abs(area2) < 1e-12, 0.0, 1.0 / area2)
    # b0 from edge v1->v2, b1 from edge v2->v0 (normalized by signed area)
    beta0 = -(y2 - y1) * inv
    gamma0 = (x2 - x1) * inv
    alpha0 = ((y2 - y1) * x1 - (x2 - x1) * y1) * inv
    beta1 = -(y0 - y2) * inv
    gamma1 = (x0 - x2) * inv
    alpha1 = ((y0 - y2) * x2 - (x0 - x2) * y2) * inv
    z2c = sz[:, 2]
    dz0 = sz[:, 0] - sz[:, 2]
    dz1 = sz[:, 1] - sz[:, 2]

    if depth_bias_constant != 0.0 or depth_bias_slope != 0.0:
        # z(px, py) is affine: dz/dx = dz0*beta0 + dz1*beta1, dz/dy likewise.
        slope_m = jnp.maximum(
            jnp.abs(dz0 * beta0 + dz1 * beta1),
            jnp.abs(dz0 * gamma0 + dz1 * gamma1),
        )
        z2c = z2c + (
            depth_bias_constant * jnp.float32(2.0**-23)
            + depth_bias_slope * slope_m
        )

    # screen bboxes (origin-free; the tile ranges derive from these)
    bb_min_x = jnp.where(all_valid, jnp.min(sx, axis=1), jnp.inf)
    bb_max_x = jnp.where(all_valid, jnp.max(sx, axis=1), -jnp.inf)
    bb_min_y = jnp.where(all_valid, jnp.min(sy, axis=1), jnp.inf)
    bb_max_y = jnp.where(all_valid, jnp.max(sy, axis=1), -jnp.inf)

    cols = jnp.stack(
        [
            alpha0, beta0, gamma0, alpha1, beta1, gamma1,
            z2c, dz0, dz1, all_valid.astype(jnp.float32),
            bb_min_x, bb_max_x, bb_min_y, bb_max_y,
        ],
        axis=-1,
    )
    return cols, all_bary, w_all


def _finish_setup(
    cols: jnp.ndarray,  # (2T, 14) from _setup_slots
    all_bary: jnp.ndarray,  # (2T, 3, 2)
    w_all: jnp.ndarray,  # (2T, 3)
    grid_width: int,
    grid_height: int,
    tile_h: int,
    tile_w: int,
    chunk: int,
    grid_origin,
) -> TriSetup:
    """The grid/origin-dependent half of :func:`setup_triangles`: derive
    the per-triangle/per-chunk tile ranges for THIS grid (the affine forms
    stay in GLOBAL pixel coordinates — the kernel adds the origin to its
    local pixel coords exactly), pad to the chunk multiple and assemble
    the TriSetup."""
    (
        alpha0, beta0, gamma0, alpha1, beta1, gamma1,
        z2c, dz0, dz1, valid_f, bb_min_x, bb_max_x, bb_min_y, bb_max_y,
    ) = [cols[:, i] for i in range(14)]
    all_valid = valid_f != 0.0

    # The affine forms stay in GLOBAL pixel coordinates: the raster kernel
    # adds the grid origin to its local pixel coords (an EXACT f32 integer
    # add), so a sharded row block evaluates bit-identical arithmetic to
    # the single-chip frame. (The earlier alpha-fold formulation —
    # alpha + beta*ox + gamma*oy — reassociated the rounding and flipped
    # knife-edge PCF taps on non-zero-origin blocks: ~6% of pixels moved
    # by one 1/25 tap step on the no-atmosphere default scene.) Only the
    # LOCAL tile ranges below depend on the origin.
    origin_y = jnp.asarray(grid_origin[0], jnp.float32)
    origin_x = jnp.asarray(grid_origin[1], jnp.float32)

    t2 = cols.shape[0]
    t2_pad = round_up(t2, chunk)
    n_t = t2 // 2
    orig_tri = jnp.concatenate(
        [jnp.arange(n_t, dtype=jnp.int32), jnp.arange(n_t, dtype=jnp.int32)]
    )

    # chunk x tile overlap mask from screen bboxes
    tiles_y = cdiv(grid_height, tile_h)
    tiles_x = cdiv(grid_width, tile_w)

    oy = origin_y
    ox = origin_x
    tx0 = jnp.clip(jnp.floor((bb_min_x - ox) / tile_w), 0, tiles_x).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((bb_max_x - ox) / tile_w), -1, tiles_x - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((bb_min_y - oy) / tile_h), 0, tiles_y).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((bb_max_y - oy) / tile_h), -1, tiles_y - 1).astype(jnp.int32)

    # per-triangle tile bbox for the kernel's skip test (tx1/ty1 stored +1
    # so the packed value stays non-negative; empty range for invalid slots)
    packx = tx0.astype(jnp.float32) * _TILE_PACK + (tx1 + 1).astype(jnp.float32)
    packy = ty0.astype(jnp.float32) * _TILE_PACK + (ty1 + 1).astype(jnp.float32)
    # ONE stacked assembly + pad (12 separate column scatters cost 12
    # full-array copies)
    coeffs = jnp.stack(
        [
            alpha0, beta0, gamma0, alpha1, beta1, gamma1,
            z2c, dz0, dz1, valid_f, packx, packy,
        ],
        axis=-1,
    )
    coeffs = jnp.concatenate(
        [coeffs, jnp.zeros((t2_pad - t2, _COEFF_WIDTH), jnp.float32)], axis=0
    )

    # Reduce per-triangle tile ranges to per-chunk tile bboxes BEFORE
    # expanding over tiles: materializing (T2, tiles) overlap masks costs
    # O(T * tiles) memory (OOM at ~250k tris x 18 shadow lights); the chunk
    # bbox union is what the kernel's skip test needs anyway.
    def pad_i32(x, fill):
        return jnp.concatenate(
            [x, jnp.full(t2_pad - t2, fill, jnp.int32)], axis=0
        )

    n_chunks = t2_pad // chunk
    tx0c = pad_i32(tx0, tiles_x).reshape(n_chunks, chunk).min(axis=1)
    tx1c = pad_i32(tx1, -1).reshape(n_chunks, chunk).max(axis=1)
    ty0c = pad_i32(ty0, tiles_y).reshape(n_chunks, chunk).min(axis=1)
    ty1c = pad_i32(ty1, -1).reshape(n_chunks, chunk).max(axis=1)

    tx_range = jnp.arange(tiles_x, dtype=jnp.int32)
    ty_range = jnp.arange(tiles_y, dtype=jnp.int32)
    in_x = (tx_range[None, :] >= tx0c[:, None]) & (tx_range[None, :] <= tx1c[:, None])
    in_y = (ty_range[None, :] >= ty0c[:, None]) & (ty_range[None, :] <= ty1c[:, None])
    chunk_mask = (
        (in_y[:, :, None] & in_x[:, None, :])
        .reshape(n_chunks, tiles_y * tiles_x)
        .astype(jnp.int32)
    )
    chunks_pad = round_up(max(n_chunks, 1), 8)
    chunk_mask = jnp.concatenate(
        [
            chunk_mask,
            jnp.zeros((chunks_pad - n_chunks, tiles_y * tiles_x), jnp.int32),
        ],
        axis=0,
    )

    return TriSetup(
        coeffs=coeffs,
        orig_tri=jnp.concatenate(
            [orig_tri, jnp.zeros(t2_pad - t2, jnp.int32)]
        ),
        corner_bary=jnp.concatenate(
            [all_bary, jnp.zeros((t2_pad - t2, 3, 2), jnp.float32)], axis=0
        ),
        corner_w=jnp.concatenate(
            [w_all, jnp.ones((t2_pad - t2, 3), jnp.float32)], axis=0
        ),
        chunk_mask=chunk_mask,
    )


def setup_triangles(
    clip: jnp.ndarray,  # (V, 4) clip-space positions
    triangles: jnp.ndarray,  # (T, 3) int32
    tri_valid: jnp.ndarray,  # (T,) bool
    width: int,
    height: int,
    cull_keep_sign: int,  # +1 keep CW/front (gbuffer), -1 keep CCW (shadow), 0 none
    tile_h: int = TILE_H,
    tile_w: int = TILE_W,
    chunk: int = CHUNK,
    grid_width: int | None = None,
    grid_height: int | None = None,
    grid_origin=(0, 0),  # global (y, x) pixel origin of the raster target
    corner_clip: jnp.ndarray | None = None,  # (T, 3, 4) pre-gathered corners
    depth_bias_constant: float = 0.0,
    depth_bias_slope: float = 0.0,
    shard_axis: str | None = None,
) -> TriSetup:
    """Vectorized triangle setup with near-plane clipping.

    ``shard_axis`` (inside shard_map only): partition the O(T) origin-free
    slot math — the corner gather, clip fan, projection, coefficient
    build — across the named mesh axis and rejoin via ``all_gather``,
    so image-space sharding stops replicating the triangle setup on every
    device (the grid-dependent tile masks are per-device and stay
    local). BITWISE-identical to the unsharded setup (slot order
    preserved; elementwise math on row slices). Requires the device count
    to divide T (pack_geometry's chunk padding guarantees it for
    power-of-two meshes; otherwise falls back to replicated setup).

    Replaces the fixed-function clipper + triangle setup. Each input triangle
    yields two slots (slot t and slot T+t); crossing triangles split into a
    fan of <= 2, others leave slot 2 invalid.

    ``width``/``height`` define the viewport (NDC -> pixel mapping, the
    reference's sceneSubregion extent); ``grid_width``/``grid_height`` the
    padded raster target the tile mask covers (default: rounded up to tiles).

    ``corner_clip`` lets callers that run the setup repeatedly (the shadow
    pass: one raster per light) supply per-triangle corner positions
    directly and skip the (T, 3)-row vertex gather — e.g. gather WORLD
    corners once and transform by each light's projView (``clip`` is then
    ignored and may be None).

    ``depth_bias_constant``/``depth_bias_slope`` reproduce
    ``vkCmdSetDepthBias(cmd, constant, 0, slope)`` as recorded by the
    reference's shadow depth pass (``renderer/pipelines.cpp:716``,
    ``shadowpass.hpp:26-27``): fragment depth gets ``constant * r +
    slope * m`` added, with r = 2^-23 (D32_SFLOAT minimum resolvable
    difference at z < 1) and m = max(|dz/dx|, |dz/dy|) per triangle. The
    offset is constant within a triangle, so it folds into the affine z
    coefficients; statically zero bias (the reference's default) leaves the
    setup bitwise unchanged.
    """
    grid_width = round_up(width, tile_w) if grid_width is None else grid_width
    grid_height = round_up(height, tile_h) if grid_height is None else grid_height

    if shard_axis is not None and (
        jax.lax.axis_size(shard_axis) == 1
        or triangles.shape[0] % jax.lax.axis_size(shard_axis) != 0
    ):
        # axis size 1: "sharding" would be identity dynamic_slice +
        # all_gather + reorder — pure full-table copies (measured ~+60 ms
        # on the dense field at sp=1, tools/r5d_session.py). pack_geometry
        # pads T to a chunk (64) multiple, so every power-of-two device
        # count divides it; an exotic mesh that does not simply keeps the
        # replicated setup (correct, just unsharded).
        shard_axis = None
    if shard_axis is not None:
        # Shard the origin-free per-triangle math over the mesh axis
        # (VERDICT r4 #4): each device computes the slot records for a
        # T/n_dev triangle slice, an all_gather rejoins them, and only the
        # cheap origin fold + tile/chunk masks (grid-dependent) run
        # replicated. Slot layout stays canonical ([all A slots, all B
        # slots] in global triangle order) so raster results — including
        # last-wins depth ties — are IDENTICAL to the unsharded setup.
        n_dev = jax.lax.axis_size(shard_axis)
        my = jax.lax.axis_index(shard_axis)
        n_t = triangles.shape[0]
        t_loc = n_t // n_dev
        start = my * t_loc
        val_l = jax.lax.dynamic_slice_in_dim(tri_valid, start, t_loc)
        if corner_clip is None:
            tri_l = jax.lax.dynamic_slice_in_dim(triangles, start, t_loc)
            corners_l = clip[tri_l]
        else:
            corners_l = jax.lax.dynamic_slice_in_dim(
                corner_clip, start, t_loc
            )
        cols_l, bary_l, w_l = _setup_slots(
            corners_l, val_l, width, height, cull_keep_sign,
            depth_bias_constant, depth_bias_slope,
        )

        def rejoin(x):
            # (n_dev, 2*t_loc, ...) -> canonical (2T, ...):
            # all A slots in global order, then all B slots
            g = jax.lax.all_gather(x, shard_axis)
            a = g[:, :t_loc].reshape((n_t,) + x.shape[1:])
            b = g[:, t_loc:].reshape((n_t,) + x.shape[1:])
            return jnp.concatenate([a, b], axis=0)

        cols, all_bary, w_all = (
            rejoin(cols_l), rejoin(bary_l), rejoin(w_l)
        )
    else:
        tri_corner_clip = (
            clip[triangles] if corner_clip is None else corner_clip
        )
        cols, all_bary, w_all = _setup_slots(
            tri_corner_clip, tri_valid, width, height, cull_keep_sign,
            depth_bias_constant, depth_bias_slope,
        )
    return _finish_setup(
        cols, all_bary, w_all, grid_width, grid_height,
        tile_h, tile_w, chunk, grid_origin,
    )


class VisibilityBuffer(NamedTuple):
    depth: jnp.ndarray  # (H, W) f32, reverse-Z, 0 = background
    tri: jnp.ndarray  # (H, W) i32 clipped-triangle id, -1 = background
    b0: jnp.ndarray  # (H, W) f32 screen-space barycentric
    b1: jnp.ndarray  # (H, W) f32


def _chunk_loop(
    coeffs_ref, ty, tx, depth_ref, tri_ref, b0_ref, b1_ref,
    *, chunk_base, tile_h, tile_w, chunk, depth_only, unroll=False,
    oy=0.0, ox=0.0,
):
    """Iterate one coefficient chunk over the (tile_h, tile_w) pixel tile.

    Each triangle first passes a SCALAR tile-bbox test (cols 10/11 pack its
    tile range) — triangles in the chunk that don't touch this tile skip
    the whole-tile vector evaluation (the per-triangle rejection that
    approximates the hardware rasterizer's variable-cost behavior).

    ``oy``/``ox``: the raster target's global pixel origin. Pixel coords
    are GLOBAL (local + origin — every term an exactly-representable
    integer+0.5, so the add never rounds) and the coefficients are global
    too: a sharded row block evaluates bitwise the same arithmetic as the
    single-chip frame."""
    row = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0).astype(
        jnp.float32
    )
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1).astype(
        jnp.float32
    )
    px = tx.astype(jnp.float32) * tile_w + col + 0.5 + ox
    py = ty.astype(jnp.float32) * tile_h + row + 0.5 + oy
    inv_pack = 1.0 / _TILE_PACK

    def body(t, carry):
        pkx = coeffs_ref[t, 10]
        pky = coeffs_ref[t, 11]
        tx0 = jnp.floor(pkx * inv_pack)
        ty0 = jnp.floor(pky * inv_pack)
        tx1p = pkx - tx0 * _TILE_PACK  # stored tx1 + 1
        ty1p = pky - ty0 * _TILE_PACK
        fx = tx.astype(jnp.float32)
        fy = ty.astype(jnp.float32)
        touches = (
            (fx >= tx0) & (fx < tx1p) & (fy >= ty0) & (fy < ty1p)
        )

        @pl.when(touches)
        def _work():
            a0 = coeffs_ref[t, 0]
            be0 = coeffs_ref[t, 1]
            g0 = coeffs_ref[t, 2]
            a1 = coeffs_ref[t, 3]
            be1 = coeffs_ref[t, 4]
            g1 = coeffs_ref[t, 5]
            z2 = coeffs_ref[t, 6]
            dz0 = coeffs_ref[t, 7]
            dz1 = coeffs_ref[t, 8]
            valid = coeffs_ref[t, 9]

            bb0 = a0 + be0 * px + g0 * py
            bb1 = a1 + be1 * px + g1 * py
            bb2 = 1.0 - bb0 - bb1
            z = z2 + dz0 * bb0 + dz1 * bb1

            current = depth_ref[:]
            hit = (
                (bb0 >= 0.0)
                & (bb1 >= 0.0)
                & (bb2 >= 0.0)
                & (z >= current)
                & (z <= 1.0)
                & (z >= 0.0)
                & (valid > 0.0)
            )
            depth_ref[:] = jnp.where(hit, z, current)
            if not depth_only:
                tid = chunk_base + t
                tri_ref[:] = jnp.where(hit, tid, tri_ref[:])
                b0_ref[:] = jnp.where(hit, bb0, b0_ref[:])
                b1_ref[:] = jnp.where(hit, bb1, b1_ref[:])

        return carry

    # Full unroll is the only Mosaic-supported unroll variant (landmine 8).
    # The serial 64-step loop costs ~205 ns/step on device against ~30 ns
    # of visible scalar work (tools/raster_occupancy_probe.py two-raster
    # fit) — unrolling lets Mosaic schedule the scalar loads/branches
    # across steps. Identical semantics/order either way.
    jax.lax.fori_loop(0, chunk, body, 0, unroll=chunk if unroll else 1)


def _chunk_loop_vector(
    coeffs_ref, ty, tx, depth_ref, tri_ref, b0_ref, b1_ref,
    *, chunk_base, tile_h, tile_w, chunk, depth_only,
    oy=0.0, ox=0.0,
):
    """Branch-free chunk evaluation: every triangle's plane eval is emitted
    unrolled WITHOUT the bbox branch or the serial depth read-modify-write
    chain, and a pairwise select tree picks the winner per pixel.

    Motivation (tools/raster_occupancy_probe.py, r8): the serial loop costs
    ~205 ns/STEP (scalar loads + branch + the depth_ref dependency) against
    ~30 ns of visible scalar work; full unroll alone recovered only ~1%
    (tools/raster_unroll_ab.py) because the per-step branch and the
    depth-buffer chain still serialize. Here the 64 evals are fully
    independent (Mosaic can pipeline them) and the only cross-triangle
    dependency is a log2(64)-deep select tree.

    Semantics are the serial loop's: per-pixel arithmetic uses the
    identical scalar-coefficient × (tile_h, tile_w)-plane expressions, the
    winner is the maximal reverse-Z depth with the LARGEST in-chunk index
    on ties (the serial ``z >= current`` overwrite: the tree's ``>=``
    toward the later half), and the chunk's best commits only where it
    beats the carried depth with the same ``>=``. NOT bitwise: even with
    textually identical expressions the compiler contracts
    ``a0 + be0*px + g0*py`` into fma differently across the two program
    shapes and the terms cancel — barycentrics drift <= ~8e-6 absolute
    (the sky_row_chunks <= 2e-5 equivalence class; the grouped (8, h, w)
    broadcast variant drifted the same way). Tri ids/depths stay exact in
    practice away from knife-edge z ties
    (tests/test_raster.py::test_vector_chunk_equivalence)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0).astype(
        jnp.float32
    )
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1).astype(
        jnp.float32
    )
    px = tx.astype(jnp.float32) * tile_w + col + 0.5 + ox
    py = ty.astype(jnp.float32) * tile_h + row + 0.5 + oy

    planes = []
    for t in range(chunk):
        a0 = coeffs_ref[t, 0]
        be0 = coeffs_ref[t, 1]
        g0 = coeffs_ref[t, 2]
        a1 = coeffs_ref[t, 3]
        be1 = coeffs_ref[t, 4]
        g1 = coeffs_ref[t, 5]
        z2 = coeffs_ref[t, 6]
        dz0 = coeffs_ref[t, 7]
        dz1 = coeffs_ref[t, 8]
        valid = coeffs_ref[t, 9]

        bb0 = a0 + be0 * px + g0 * py
        bb1 = a1 + be1 * px + g1 * py
        bb2 = 1.0 - bb0 - bb1
        z = z2 + dz0 * bb0 + dz1 * bb1
        cand = (
            (bb0 >= 0.0)
            & (bb1 >= 0.0)
            & (bb2 >= 0.0)
            & (z <= 1.0)
            & (z >= 0.0)
            & (valid > 0.0)
        )
        zm = jnp.where(cand, z, -1.0)  # carried depth >= 0: -1 never wins
        if depth_only:
            planes.append((zm,))
        else:
            planes.append((zm, jnp.int32(chunk_base + t), bb0, bb1))

    # pairwise tree, later index wins ties (serial z >= current overwrite)
    while len(planes) > 1:
        nxt = []
        for i in range(0, len(planes) - 1, 2):
            lo, hi = planes[i], planes[i + 1]
            take_hi = hi[0] >= lo[0]
            nxt.append(
                tuple(jnp.where(take_hi, h, l) for l, h in zip(lo, hi))
            )
        if len(planes) % 2:
            nxt.append(planes[-1])
        planes = nxt
    best = planes[0]

    current = depth_ref[:]
    hit = best[0] >= current
    depth_ref[:] = jnp.where(hit, best[0], current)
    if not depth_only:
        tri_ref[:] = jnp.where(hit, best[1], tri_ref[:])
        b0_ref[:] = jnp.where(hit, best[2], b0_ref[:])
        b1_ref[:] = jnp.where(hit, best[3], b1_ref[:])


def _raster_kernel(
    mask_ref,  # SMEM (8, tiles_y * tiles_x) i32: chunk-rows c//8*8 .. +8
    coeffs_ref,  # VMEM (CHUNK, 12) f32
    origin_ref,  # SMEM (1, 2) i32: the target's global (oy, ox) pixel origin
    depth_ref,
    tri_ref,
    b0_ref,
    b1_ref,
    *,
    tile_h: int,
    tile_w: int,
    chunk: int,
    depth_only: bool,
    unroll: bool,
    vector: bool,
):
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    c = pl.program_id(2)
    n_tx = pl.num_programs(1)

    @pl.when(c == 0)
    def _init():
        depth_ref[:] = jnp.zeros_like(depth_ref)
        if not depth_only:
            tri_ref[:] = jnp.full_like(tri_ref, -1)
            b0_ref[:] = jnp.zeros_like(b0_ref)
            b1_ref[:] = jnp.zeros_like(b1_ref)

    @pl.when(mask_ref[c % 8, ty * n_tx + tx] != 0)
    def _work():
        loop = _chunk_loop_vector if vector else functools.partial(
            _chunk_loop, unroll=unroll
        )
        loop(
            coeffs_ref, ty, tx, depth_ref, tri_ref, b0_ref, b1_ref,
            chunk_base=c * chunk, tile_h=tile_h, tile_w=tile_w, chunk=chunk,
            depth_only=depth_only,
            oy=origin_ref[0, 0].astype(jnp.float32),
            ox=origin_ref[0, 1].astype(jnp.float32),
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "tile_h", "tile_w", "chunk", "depth_only",
        "unroll", "vector",
    ),
)
def rasterize(
    setup: TriSetup,
    width: int,
    height: int,
    tile_h: int = TILE_H,
    tile_w: int = TILE_W,
    chunk: int = CHUNK,
    depth_only: bool = False,
    unroll: bool = False,
    vector: bool = False,
    origin=None,
) -> VisibilityBuffer:
    """Run the visibility kernel. Target dims must be tile multiples.

    ``origin`` = the target's global (oy, ox) pixel origin (may be traced;
    None = (0, 0)). The kernel evaluates the GLOBAL-coordinate affine forms
    at global pixel coords (local + origin, exact f32 integer adds), so a
    sharded row block's raster is bitwise identical to the single-chip
    frame's rows — pre-folding the origin into the coefficients instead
    reassociated the rounding (knife-edge PCF taps flipped downstream)."""
    assert width % tile_w == 0 and height % tile_h == 0, (width, height)
    tiles_y, tiles_x = height // tile_h, width // tile_w
    n_chunks = setup.coeffs.shape[0] // chunk

    kernel = functools.partial(
        _raster_kernel,
        tile_h=tile_h,
        tile_w=tile_w,
        chunk=chunk,
        depth_only=depth_only,
        unroll=unroll,
        vector=vector,
    )

    org = (
        jnp.zeros((1, 2), jnp.int32)
        if origin is None
        else jnp.asarray(origin, jnp.int32).reshape(1, 2)
    )
    vma = _out_vma(setup.chunk_mask, setup.coeffs, org)
    out_shape = [jax.ShapeDtypeStruct((height, width), jnp.float32, vma=vma)]
    if not depth_only:
        out_shape += [
            jax.ShapeDtypeStruct((height, width), jnp.int32, vma=vma),
            jax.ShapeDtypeStruct((height, width), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((height, width), jnp.float32, vma=vma),
        ]

    tile_spec = pl.BlockSpec(
        (tile_h, tile_w),
        lambda ty, tx, c: (ty, tx),
        memory_space=pltpu.VMEM,
    )
    out_specs = [tile_spec] * len(out_shape)

    grid_spec = pl.GridSpec(
        grid=(tiles_y, tiles_x, n_chunks),
        in_specs=[
            pl.BlockSpec(
                (8, tiles_y * tiles_x),
                lambda ty, tx, c: (c // 8, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (chunk, _COEFF_WIDTH),
                lambda ty, tx, c: (c, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 2),
                lambda ty, tx, c: (0, 0),
                memory_space=pltpu.SMEM,
            ),
        ],
        out_specs=out_specs,
    )

    if depth_only:
        # dummy refs for the unused outputs
        def kernel_depth(mask_ref, coeffs_ref, origin_ref, depth_ref):
            kernel(mask_ref, coeffs_ref, origin_ref, depth_ref, None, None, None)

        (depth,) = pl.pallas_call(
            kernel_depth,
            out_shape=out_shape,
            grid_spec=grid_spec,
            interpret=use_interpret(),
        )(setup.chunk_mask, setup.coeffs, org)
        empty = jnp.zeros((0, 0))
        return VisibilityBuffer(depth=depth, tri=empty, b0=empty, b1=empty)

    depth, tri, b0, b1 = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=use_interpret(),
    )(setup.chunk_mask, setup.coeffs, org)
    return VisibilityBuffer(depth=depth, tri=tri, b0=b0, b1=b1)


# ---------------------------------------------------------------------------
# compact-list raster (v2): per-tile chunk lists via scalar prefetch
# ---------------------------------------------------------------------------


def build_tile_lists(setup: TriSetup, capacity: int, chunk: int = CHUNK):
    """Per-tile compacted chunk lists from the overlap mask.

    Returns (table (tiles, capacity) i32, counts (tiles,) i32 clamped to
    capacity, dropped scalar i32). Padding (and steps past a tile's count)
    points at a dedicated all-invalid chunk id; a repeated block index costs
    no re-fetch, so padded grid steps are ~free (and the kernel's per-tile
    count guard skips them entirely). Overflowing chunks (count > capacity)
    are DROPPED — callers must branch on ``dropped`` (the production
    dispatcher falls back to :func:`rasterize`; the reference's analog is
    the shadow-map overflow warning, shadowpass.cpp:219-225).
    """
    n_chunks = setup.coeffs.shape[0] // chunk
    active = setup.chunk_mask[:n_chunks].astype(bool)  # (C, T)
    cap = min(capacity, n_chunks)
    empty_chunk = jnp.int32(n_chunks)  # one past the end: the zero pad chunk
    # per tile: the first `cap` active chunk ids ascending (submission order
    # for depth ties) = bottom-k over keys (active -> id, inactive -> C)
    keys = jnp.where(
        active.T, jnp.arange(n_chunks, dtype=jnp.int32)[None, :], empty_chunk
    )  # (T, C)
    table = -jax.lax.top_k(-keys, cap)[0]  # (T, cap) ascending
    counts = active.sum(axis=0).astype(jnp.int32)  # (T,)
    dropped = jnp.maximum(counts - cap, 0).sum()
    return table, jnp.minimum(counts, cap), dropped


def _raster_kernel_listed(
    table_ref,  # scalar prefetch: (tiles, cap) i32 chunk ids
    counts_ref,  # scalar prefetch: (tiles,) i32 list lengths (<= cap)
    origin_ref,  # scalar prefetch: (2,) i32 global (oy, ox) pixel origin
    coeffs_ref,  # VMEM (CHUNK, 12) f32 — the chunk named by the table
    depth_ref,
    tri_ref,
    b0_ref,
    b1_ref,
    *,
    tile_h: int,
    tile_w: int,
    chunk: int,
    tiles_x: int,
    depth_only: bool,
    unroll: bool,
    vector: bool,
):
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    s = pl.program_id(2)
    tile = ty * tiles_x + tx
    c = table_ref[tile, s]  # the CHUNK this step processes

    @pl.when(s == 0)
    def _init():
        depth_ref[:] = jnp.zeros_like(depth_ref)
        if not depth_only:
            tri_ref[:] = jnp.full_like(tri_ref, -1)
            b0_ref[:] = jnp.zeros_like(b0_ref)
            b1_ref[:] = jnp.zeros_like(b1_ref)

    @pl.when(s < counts_ref[tile])  # steps past the list are pure no-ops
    def _work():
        loop = _chunk_loop_vector if vector else functools.partial(
            _chunk_loop, unroll=unroll
        )
        loop(
            coeffs_ref, ty, tx, depth_ref, tri_ref, b0_ref, b1_ref,
            chunk_base=c * chunk, tile_h=tile_h, tile_w=tile_w, chunk=chunk,
            depth_only=depth_only,
            oy=origin_ref[0].astype(jnp.float32),
            ox=origin_ref[1].astype(jnp.float32),
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "capacity", "tile_h", "tile_w", "chunk",
        "depth_only", "unroll", "vector",
    ),
)
def rasterize_listed(
    setup: TriSetup,
    width: int,
    height: int,
    capacity: int,
    tile_h: int = TILE_H,
    tile_w: int = TILE_W,
    chunk: int = CHUNK,
    depth_only: bool = False,
    unroll: bool = False,
    vector: bool = False,
    table: jnp.ndarray | None = None,
    counts: jnp.ndarray | None = None,
    origin=None,
):
    """Compact-list variant of :func:`rasterize`: the grid's chunk axis is
    ``capacity`` (max chunks any tile may see) instead of ALL chunks; each
    step DMAs exactly the chunk its tile needs. Returns (vis, dropped) —
    ``dropped > 0`` means ``capacity`` was too small and triangles were lost.
    Callers that must never lose geometry pass a prebuilt ``table``/``counts``
    (from :func:`build_tile_lists`) and branch on ``dropped`` themselves —
    see ``renderer.frame._dispatch_raster``.
    """
    assert width % tile_w == 0 and height % tile_h == 0, (width, height)
    tiles_y, tiles_x = height // tile_h, width // tile_w
    n_chunks = setup.coeffs.shape[0] // chunk
    cap = min(capacity, n_chunks)
    table_bytes = tiles_y * tiles_x * (cap + 1) * 4
    if table_bytes > 512 * 1024:  # prefetch table must fit SMEM (~1 MB)
        raise ValueError(
            f"tile-list table {table_bytes} B exceeds the SMEM budget; "
            f"reduce capacity (= {cap}) or use rasterize() for scenes this "
            "dense/incoherent"
        )

    if table is None:
        table, counts, dropped = build_tile_lists(setup, cap, chunk)
    else:
        assert counts is not None, "table without counts"
        dropped = jnp.int32(0)
    # one extra all-invalid chunk as the padding target
    coeffs = jnp.concatenate(
        [setup.coeffs, jnp.zeros((chunk, _COEFF_WIDTH), jnp.float32)], axis=0
    )

    kernel = functools.partial(
        _raster_kernel_listed,
        tile_h=tile_h,
        tile_w=tile_w,
        chunk=chunk,
        tiles_x=tiles_x,
        depth_only=depth_only,
        unroll=unroll,
        vector=vector,
    )

    org = (
        jnp.zeros((2,), jnp.int32)
        if origin is None
        else jnp.asarray(origin, jnp.int32).reshape(2)
    )
    vma = _out_vma(table, counts, coeffs, org)
    out_shape = [jax.ShapeDtypeStruct((height, width), jnp.float32, vma=vma)]
    if not depth_only:
        out_shape += [
            jax.ShapeDtypeStruct((height, width), jnp.int32, vma=vma),
            jax.ShapeDtypeStruct((height, width), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((height, width), jnp.float32, vma=vma),
        ]

    tile_spec = pl.BlockSpec(
        (tile_h, tile_w),
        lambda ty, tx, s, tbl, cnt, o: (ty, tx),
        memory_space=pltpu.VMEM,
    )
    # KNOWN vma-checker GAP: under shard_map(check_vma=True) this index_map
    # is rejected — the scalar-prefetch ref-get discharges to a
    # dynamic_slice mixing the varying table with unvarying grid indices,
    # and the discharge machinery is not vma-aware (pcasting the indices
    # just moves the error into an internal pvary). Until JAX supports vma
    # through PrefetchScalarGridSpec index_maps, sharded tracing with the
    # checker ON must disable the listed raster (tile_list_capacity=0) —
    # tests/test_frame.py::test_sharded_vma_checked traces exactly that.
    def _coeff_index(ty, tx, s, tbl, cnt, o):
        return tbl[ty * tiles_x + tx, s], 0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(tiles_y, tiles_x, cap),
        in_specs=[
            pl.BlockSpec(
                (chunk, _COEFF_WIDTH),
                _coeff_index,
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[tile_spec] * len(out_shape),
    )

    if depth_only:
        def kernel_depth(tbl, cnt, org_ref, coeffs_ref, depth_ref):
            kernel(tbl, cnt, org_ref, coeffs_ref, depth_ref, None, None, None)

        (depth,) = pl.pallas_call(
            kernel_depth,
            out_shape=out_shape,
            grid_spec=grid_spec,
            interpret=use_interpret(),
        )(table, counts, org, coeffs)
        empty = jnp.zeros((0, 0))
        return VisibilityBuffer(depth=depth, tri=empty, b0=empty, b1=empty), dropped

    depth, tri, b0, b1 = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=use_interpret(),
    )(table, counts, org, coeffs)
    return VisibilityBuffer(depth=depth, tri=tri, b0=b0, b1=b1), dropped
