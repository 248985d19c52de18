"""Pallas TPU kernel for the per-tile z-buffer resolve.

Replaces ``ops.rasterize._raster_tiles_xla`` on TPU.  Design (see
ops/rasterize.py header for the full pipeline):

* Grid = (tile_rows, tile_cols) over (8 x 128)-pixel tiles — the native
  VPU register shape.  Each grid step's candidate slabs arrive in VMEM via
  BlockSpec index maps; ancestor-level slabs are shared by index-mapping
  many L0 tiles to one parent block (no duplication in HBM, and Pallas
  skips the re-DMA when consecutive grid steps map to the same block).
* Each candidate contributes FIVE affine planes over the image:
  3 edge planes, the 1/z depth plane, and a constant "face-id plane", so
  plane evaluation AND winner identification are a single
  ``(cand_chunk, 3) x (3, pixels)`` contraction on the MXU.  No gathers or
  transposes appear anywhere in the kernel.
* Per-tile candidate counts live in SMEM and bound a dynamic ``fori_loop``
  over 128-candidate chunks, so compute scales with actual tile occupancy
  rather than the static capacity.
* Depth resolve: within a chunk, maximize w = 1/z and break ties toward
  the lowest face id (candidates are id-sorted by the binning sort);
  across chunks/levels, strictly-greater keeps the earlier winner.  This
  exactly matches the XLA reference kernel, which tests assert against.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -3.0e38
CHUNK = 128  # candidates per inner step; also the slab padding quantum


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _prep_level_slab(cand: jax.Array, planes_ext: jax.Array, n_faces: int):
    """(T, C) candidate ids -> ((T, 3, 5*Cp) slab, (T, 1) counts).

    Slab columns are grouped [e0 | e1 | e2 | w | id] blocks of Cp columns
    each; rows are the (x, y, 1) coefficients.  Empty slots point at the
    sentinel plane row (coverage-false).
    """
    t, c = cand.shape
    cp = _round_up(max(c, CHUNK), CHUNK)
    if cp != c:
        cand = jnp.pad(cand, ((0, 0), (0, cp - c)), constant_values=-1)
    safe_ids = jnp.where(cand >= 0, cand, n_faces)
    p = planes_ext[safe_ids]  # (T, Cp, 12)
    id_plane = jnp.stack(
        [
            jnp.zeros_like(cand, jnp.float32),
            jnp.zeros_like(cand, jnp.float32),
            cand.astype(jnp.float32),
        ],
        axis=-1,
    )  # (T, Cp, 3)
    full = jnp.concatenate([p, id_plane], axis=-1)  # (T, Cp, 15)
    # Chunk-interleaved layout: per 128-candidate chunk, plane blocks
    # [e0|e1|e2|w|id] of 128 columns each, so the kernel evaluates all five
    # planes of a chunk with a single (3, 640) x (3, npix) contraction.
    nch = cp // CHUNK
    slab = (
        full.reshape(t, nch, CHUNK, 5, 3)
        .transpose(0, 4, 1, 3, 2)  # (T, coef, chunk, plane, cand)
        .reshape(t, 3, nch * 5 * CHUNK)
    )
    counts = jnp.sum(cand >= 0, axis=1, dtype=jnp.int32).reshape(t, 1)
    return slab, counts


def _make_kernel(
    caps_padded: Tuple[int, ...],
    tile_h: int,
    tile_w: int,
    grids,
    scales,
):
    npix = tile_h * tile_w
    (nty0, ntx0), (nty1, ntx1), (nty2, ntx2) = grids
    s1_, s2_ = scales[1], scales[2]

    def kernel(
        c0, c1, c2, c3, s0, s1, s2, s3, out_ref
    ):
        ty = pl.program_id(0)
        tx = pl.program_id(1)
        cnt_idx = (
            ty * ntx0 + tx,
            jnp.minimum(ty // s1_, nty1 - 1) * ntx1
            + jnp.minimum(tx // s1_, ntx1 - 1),
            jnp.minimum(ty // s2_, nty2 - 1) * ntx2
            + jnp.minimum(tx // s2_, ntx2 - 1),
            0,
        )
        pix = jax.lax.broadcasted_iota(jnp.int32, (1, npix), 1)
        xs = (pix % tile_w + tx * tile_w).astype(jnp.float32) + 0.5
        ys = (pix // tile_w + ty * tile_h).astype(jnp.float32) + 0.5
        pmat = jnp.concatenate(
            [xs, ys, jnp.ones_like(xs)], axis=0
        )  # (3, npix)

        def level(slab_ref, cnt_ref, tile_idx, carry):
            best_w, best_id = carry
            cnt = cnt_ref[tile_idx]
            n_chunks = (cnt + CHUNK - 1) // CHUNK

            def chunk(ci, carry):
                best_w, best_id = carry
                off = pl.multiple_of(ci * (5 * CHUNK), 5 * CHUNK)
                block = slab_ref[0, :, pl.ds(off, 5 * CHUNK)]  # (3, 5*CHUNK)
                vals = jax.lax.dot_general(
                    block,
                    pmat,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # (5*CHUNK, npix), plane-major blocks of CHUNK rows
                e0 = vals[0 * CHUNK : 1 * CHUNK]
                e1 = vals[1 * CHUNK : 2 * CHUNK]
                e2 = vals[2 * CHUNK : 3 * CHUNK]
                wv = vals[3 * CHUNK : 4 * CHUNK]
                idv = vals[4 * CHUNK : 5 * CHUNK]
                # covered iff min(e0, e1, e2) >= 0 (fewer VPU passes than
                # three compares + two ands)
                emin = jnp.minimum(jnp.minimum(e0, e1), e2)
                wm = jnp.where(emin >= 0, wv, NEG_INF)
                cmax = jnp.max(wm, axis=0, keepdims=True)  # (1, npix)
                # lowest face id among depth ties within the chunk
                neg_id = jnp.where(wm >= cmax, -idv, NEG_INF)
                cid = -jnp.max(neg_id, axis=0, keepdims=True)
                upd = cmax > best_w
                return (
                    jnp.where(upd, cmax, best_w),
                    jnp.where(upd, cid, best_id),
                )

            return jax.lax.fori_loop(0, n_chunks, chunk, (best_w, best_id))

        carry = (
            jnp.full((1, npix), NEG_INF, jnp.float32),
            jnp.full((1, npix), -1.0, jnp.float32),
        )
        carry = level(s0, c0, cnt_idx[0], carry)
        carry = level(s1, c1, cnt_idx[1], carry)
        carry = level(s2, c2, cnt_idx[2], carry)
        carry = level(s3, c3, cnt_idx[3], carry)
        out_ref[0, 0] = carry[1].astype(jnp.int32).reshape(tile_h, tile_w)

    return kernel


def raster_tiles_pallas(
    binned,
    planes: jax.Array,
    config,
    image_h: int,
    image_w: int,
) -> jax.Array:
    """Pallas counterpart of ops.rasterize._raster_tiles_xla.

    Args:
        binned: BinnedTriangles (per-level candidate lists).
        planes: (F, 12) triangle planes from setup_triangles.
    """
    n_faces = planes.shape[0]
    sentinel = jnp.asarray(
        [0, 0, -1, 0, 0, -1, 0, 0, -1, 0, 0, 0], planes.dtype
    )
    planes_ext = jnp.concatenate([planes, sentinel[None]], axis=0)

    slabs, counts = [], []
    for lvl in range(4):
        s, c = _prep_level_slab(binned.cand[lvl], planes_ext, n_faces)
        slabs.append(s)
        counts.append(c)

    grids = config.grids(image_h, image_w)
    (nty0, ntx0), (nty1, ntx1), (nty2, ntx2) = grids
    s1_, s2_ = config.level_scales[1], config.level_scales[2]
    th, tw = config.tile_h, config.tile_w
    npix = th * tw

    def slab_spec(lvl):
        cp5 = slabs[lvl].shape[-1]
        if lvl == 0:
            idx = lambda i, j, *_: (i * ntx0 + j, 0, 0)
        elif lvl == 1:
            idx = lambda i, j, *_: (
                jnp.minimum(i // s1_, nty1 - 1) * ntx1
                + jnp.minimum(j // s1_, ntx1 - 1),
                0,
                0,
            )
        elif lvl == 2:
            idx = lambda i, j, *_: (
                jnp.minimum(i // s2_, nty2 - 1) * ntx2
                + jnp.minimum(j // s2_, ntx2 - 1),
                0,
                0,
            )
        else:
            idx = lambda i, j, *_: (0, 0, 0)
        return pl.BlockSpec((1, 3, cp5), idx, memory_space=pltpu.VMEM)

    caps_padded = tuple(s.shape[-1] // 5 for s in slabs)
    kernel = _make_kernel(
        caps_padded, th, tw, grids, config.level_scales
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # the per-tile count arrays, in SMEM
        grid=(nty0, ntx0),
        in_specs=[slab_spec(lvl) for lvl in range(4)],
        out_specs=pl.BlockSpec(
            (1, 1, th, tw),
            lambda i, j, *_: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nty0, ntx0, th, tw), jnp.int32),
        grid_spec=grid_spec,
        interpret=jax.default_backend() == "cpu",
    )(
        counts[0].reshape(-1),
        counts[1].reshape(-1),
        counts[2].reshape(-1),
        counts[3].reshape(-1),
        *slabs,
    )

    img = out.transpose(0, 2, 1, 3).reshape(nty0 * th, ntx0 * tw)
    return img[:image_h, :image_w]
