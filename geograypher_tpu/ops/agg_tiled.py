"""Scatter-free per-face class-count aggregation (Pallas, TPU).

Replaces the flat XLA ``segment_sum`` in
:func:`geograypher_tpu.ops.aggregate.project_image_class_counts` on the hot
path (reference behavior: meshes.py:1961-1968 + 2016-2051).  The XLA
scatter is index-processing-bound at ~11 ns/element — ~89 ms for one 4K
view into 1M faces x 10 classes — and no scatter mode improves it
(docs/DESIGN.md); worse, scatters consuming Mosaic-kernel outputs corrupt
inside lax.scan on the current runtime.  This module computes identical
integer counts with ZERO scatters:

Stage 1 — per-tile match counts (MXU):
    The rasterizer already partitions every pixel's winning face into the
    pixel's (8 x 128) L0 tile candidate list or one of its ancestor lists
    (L1/L2/global).  For each tile, the (pixel, slot) equality matrix
    ``M[p, s] = (pix2face[p] == cand_ids[s])`` is produced WITHOUT any
    cross-lane transpose by one DEFAULT-precision matmul:
    ``D[p, s] = p2f[p] - ids[s]`` comes from contracting
    ``[a1 a2 a3 1 1 1]^T`` with ``[1 1 1 -b1 -b2 -b3]`` where ``a = Σ a_j``
    is an exact 3-plane bf16 digit split (ids < 2^24) — all products and
    the f32 accumulation are exact, one MXU pass (no 6-pass HIGHEST).
    ``M = (|D| < 0.5)``, and per-tile per-class counts are one one-hot
    matmul ``onehot(class) @ M`` (0/1 bf16 operands, exact).

Stage 2 — output-stationary face-block accumulation:
    Spatially ordered face ids (any roughly-coherent mesh ordering; see
    TexturedMesh.spatial_sort_faces) make each tile's candidate ids a
    narrow band, so each face block intersects only a small window of
    tiles.  Per-block windows are contiguous tmax-sorted tile RANGES
    (window starts from searchsorted on tmax, ends bounded by the
    suffix-min of tmin)
    (supersets; stale entries are skipped in-kernel by prefetched band
    scalars), and a Pallas kernel streams each window through a DMA ring,
    folding it into the block's dense (block, classes) slice via the same
    matmul-match trick — the "scatter" is a matrix product on the MXU.
    Counts ride as exact base-128 bf16 digit planes (``planes`` of them:
    2 cover counts < 16512, 4 cover anything < 2^24).

All four binning levels go through the same stage-2 kernel (the L2/global
levels with more digit planes); nothing in this module scatters.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EMPTY_ID = -2  # empty candidate slots; never equals any pix2face value
_BIG = 1 << 30


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _digit3(x: jax.Array):
    """Exact 3-plane bf16 split of integer-valued f32 (< 2^24): each plane
    is bf16-representable and their f32 sum reproduces x exactly."""
    p1 = x.astype(jnp.bfloat16).astype(jnp.float32)
    r = x - p1
    p2 = r.astype(jnp.bfloat16).astype(jnp.float32)
    p3 = r - p2
    return p1, p2, p3


def _match_rows(vals: jax.Array):
    """(1, n) f32 integer values -> (6, n) bf16 lhs rows for the exact
    difference dot (digit planes + ones)."""
    p1, p2, p3 = _digit3(vals)
    ones = jnp.ones_like(vals)
    return jnp.concatenate([p1, p2, p3, ones, ones, ones], axis=0).astype(
        jnp.bfloat16
    )


def _match_cols(ids: jax.Array):
    """(1, n) f32 integer ids -> (6, n) bf16 rhs rows (ones + negated
    digit planes)."""
    p1, p2, p3 = _digit3(ids)
    ones = jnp.ones_like(ids)
    return jnp.concatenate([ones, ones, ones, -p1, -p2, -p3], axis=0).astype(
        jnp.bfloat16
    )


_DIFF_DIMS = (((0,), (0,)), ((), ()))


# ---------------------------------------------------------------------------
# Stage 1: per-tile (class, slot) counts
# ---------------------------------------------------------------------------


def _stage1_kernel(kp: int, caps: Tuple[int, int, int, int], gx: int):
    """Kernel over (1, gx)-tile patches of the row-image pix2face.

    Ancestor levels whose candidate list is empty (leading id < 0) are
    skipped per step — zeros are written first, then overwritten under
    ``pl.when`` when the level has candidates.
    """

    def kernel(p2f_ref, cls_ref, c0_ref, c1_ref, c2_ref, c3_ref,
               o0_ref, o1_ref, o2_ref, o3_ref):
        th = p2f_ref.shape[1]
        tw = p2f_ref.shape[2] // gx
        npix = th * tw
        cls_iota = jax.lax.broadcasted_iota(jnp.int32, (kp, npix), 0)
        upper = (
            (c1_ref, o1_ref, caps[1]),
            (c2_ref, o2_ref, caps[2]),
            (c3_ref, o3_ref, caps[3]),
        )

        for g in range(gx):
            p2f = (
                p2f_ref[0, :, g * tw:(g + 1) * tw]
                .reshape(1, npix)
                .astype(jnp.float32)
            )
            cls = cls_ref[0, :, g * tw:(g + 1) * tw].reshape(1, npix)
            lhs = _match_rows(p2f)  # (6, npix)
            onehot = (cls_iota == cls).astype(jnp.bfloat16)  # (kp, npix)

            def level_counts(ids_i32):
                rhs = _match_cols(ids_i32.astype(jnp.float32))
                d = jax.lax.dot_general(
                    lhs, rhs, _DIFF_DIMS, preferred_element_type=jnp.float32
                )  # (npix, s_l) = p2f - id, exactly
                m = (jnp.abs(d) < 0.5).astype(jnp.bfloat16)
                return jax.lax.dot_general(
                    onehot, m, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (kp, s_l) exact integer counts

            o0_ref[0, g] = level_counts(c0_ref[0, g])
            for c_ref, o_ref, cap in upper:
                o_ref[0, g] = jnp.zeros((kp, cap), jnp.float32)

                @pl.when(c_ref[0, 0, 0, 0] >= 0)
                def _(c_ref=c_ref, o_ref=o_ref):
                    o_ref[0, g] = level_counts(c_ref[0, 0])

    return kernel


def tile_class_counts(
    p2f_tiles: jax.Array,
    class_image: jax.Array,
    cand: Tuple[jax.Array, jax.Array, jax.Array, jax.Array],
    config,
    image_h: int,
    image_w: int,
    n_classes: int,
):
    """Per-tile per-level (class, slot) pixel counts.

    Args:
        p2f_tiles: (nty0, th, ntx0x*tw) int32 row-image pix2face (the raw
            rasterizer layout from ``return_tiles``; ntx0x >= ntx0 tile
            columns, extras ignored).
        class_image: (H, W) int32 class labels (<0 = ignore).
        cand: the four per-level candidate-id lists from binning.
        config: RasterConfig (tile geometry + caps).

    Returns:
        ((out0..out3), kp): per-level f32 count arrays, each
        (nty0g, ntx0g, kp, caps[l]) with the L0 grid padded to the L1 grid
        times its scale, plus the padded class count kp.
    """
    th, tw = config.tile_h, config.tile_w
    grids = config.grids(image_h, image_w)
    (nty0, ntx0), (nty1, ntx1), (nty2, ntx2) = grids
    s1_sc = config.level_scales[1]
    s2_sc = config.level_scales[2]
    if config.bin_block != 1:
        raise ValueError(
            "tile_class_counts matches pixel FACE ids against candidate "
            "slots and requires bin_block=1 (block-granular binning "
            "routes through the fused raster+count kernel instead)"
        )
    if s2_sc % s1_sc or s2_sc * s2_sc * 1024 > 128 * 128 * 129:
        raise ValueError(
            f"level_scales[2]={s2_sc} must be a multiple of "
            f"level_scales[1]={s1_sc} and small enough for the 3-digit-"
            "plane count bound (s2^2*1024 <= 2113536, i.e. s2 <= 45)"
        )
    if s1_sc not in (1, 2, 4):
        # the gx=min(4, s1_sc) grid grouping maps each gx-group of L0
        # tiles to ONE L1 parent, and the fold's 2-digit-plane bf16
        # count encoding is exact only up to s1_sc^2 * 1024 px per L1
        # slot (16384 at 4; see face_counts_from_tiles) — larger scales
        # would mis-map parents and silently corrupt counts
        raise ValueError(
            f"level_scales[1] must be 1, 2 or 4 for the count kernels "
            f"(got {s1_sc})"
        )
    # pad the L0 grid so child->parent reductions are pure reshapes
    nty0g = nty1 * s1_sc
    ntx0g = ntx1 * s1_sc
    kp = _round_up(max(n_classes, 1), 16)

    # row-image pix2face padded with background; pixels beyond the true
    # image extent (partial edge tiles) are masked out.  Only
    # reshape/pad/where ops touch it (docs/DESIGN.md Mosaic hazard).
    wx = min(p2f_tiles.shape[2], ntx0g * tw)
    wy = min(p2f_tiles.shape[0], nty0g)
    p2f = jnp.full((nty0g, th, ntx0g * tw), -1, jnp.int32)
    p2f = p2f.at[:wy, :, :wx].set(
        p2f_tiles[:wy, :, :wx].astype(jnp.int32)
    )
    ty = jnp.arange(nty0g, dtype=jnp.int32)[:, None, None]
    ry = jnp.arange(th, dtype=jnp.int32)[None, :, None]
    cx = jnp.arange(ntx0g * tw, dtype=jnp.int32)[None, None, :]
    in_bounds = (ty * th + ry < image_h) & (cx < image_w)
    p2f = jnp.where(in_bounds, p2f, -1)

    # the row-image layout IS the padded image grouped by th rows
    cls_pad = jnp.full((nty0g * th, ntx0g * tw), -1, jnp.int32)
    cls_pad = cls_pad.at[:image_h, :image_w].set(
        class_image.astype(jnp.int32)[:image_h, :image_w]
    )
    cls_rows = cls_pad.reshape(nty0g, th, ntx0g * tw)

    # candidate lists: empty (-1) -> -2 so background pixels never match
    c0 = jnp.full((nty0g, ntx0g, 1, config.caps[0]), _EMPTY_ID, jnp.int32)
    c0 = c0.at[:nty0, :ntx0].set(
        jnp.where(cand[0] >= 0, cand[0], _EMPTY_ID).reshape(
            nty0, ntx0, 1, config.caps[0]
        )
    )
    c1 = jnp.where(cand[1] >= 0, cand[1], _EMPTY_ID).reshape(
        nty1, ntx1, 1, config.caps[1]
    )
    c2 = jnp.where(cand[2] >= 0, cand[2], _EMPTY_ID).reshape(
        nty2, ntx2, 1, config.caps[2]
    )
    c3 = jnp.where(cand[3] >= 0, cand[3], _EMPTY_ID).reshape(
        1, 1, 1, config.caps[3]
    )

    gx = min(4, s1_sc)
    kernel = _stage1_kernel(kp, config.caps, gx)
    specs = dict(memory_space=pltpu.VMEM)

    out_shapes = [
        jax.ShapeDtypeStruct((nty0g, ntx0g, kp, config.caps[l]), jnp.float32)
        for l in range(4)
    ]
    out_specs = [
        pl.BlockSpec(
            (1, gx, kp, config.caps[l]), lambda i, j: (i, j, 0, 0), **specs
        )
        for l in range(4)
    ]
    # barriers on operands and results: see pallas_raster + DESIGN.md
    p2f, cls_rows, c0, c1, c2, c3 = jax.lax.optimization_barrier(
        (p2f, cls_rows, c0, c1, c2, c3)
    )
    outs = pl.pallas_call(
        kernel,
        grid=(nty0g, ntx0g // gx),
        in_specs=[
            pl.BlockSpec((1, th, gx * tw), lambda i, j: (i, 0, j), **specs),
            pl.BlockSpec((1, th, gx * tw), lambda i, j: (i, 0, j), **specs),
            pl.BlockSpec(
                (1, gx, 1, config.caps[0]),
                lambda i, j: (i, j, 0, 0),
                **specs,
            ),
            pl.BlockSpec(
                (1, 1, 1, config.caps[1]),
                lambda i, j: (i // s1_sc, (j * gx) // s1_sc, 0, 0),
                **specs,
            ),
            pl.BlockSpec(
                (1, 1, 1, config.caps[2]),
                lambda i, j: (i // s2_sc, (j * gx) // s2_sc, 0, 0),
                **specs,
            ),
            pl.BlockSpec(
                (1, 1, 1, config.caps[3]),
                lambda i, j: (0, 0, 0, 0),
                **specs,
            ),
        ],
        out_shape=out_shapes,
        out_specs=out_specs,
        interpret=_interpret(),
    )(p2f, cls_rows, c0, c1, c2, c3)
    outs = jax.lax.optimization_barrier(tuple(outs))
    return outs, kp


# ---------------------------------------------------------------------------
# Stage 2: fold (tile, slot, class) counts into dense (face, class)
# ---------------------------------------------------------------------------


class _Windows(NamedTuple):
    order: jax.Array  # (T,) tile permutation sorting tiles by tmax
    lo: jax.Array  # (NB,) each block's window start in the sorted order
    win_len: jax.Array  # (NB,)
    overflow: jax.Array  # () tiles dropped by w_cap (0 when sized right)
    max_len: jax.Array  # () true (unclipped) max window over blocks


def _block_windows(
    tmin: jax.Array,
    tmax: jax.Array,
    n_blocks: int,
    block: int,
    w_cap: int,
):
    """Per-face-block windows as contiguous ranges of the tmax-sorted
    tile order.

    Tiles sorted by tmax: block b's window is [first tmax >= b0,
    first position whose suffix-min of tmin >= b0 + block) — an exact
    SUPERSET (every intersecting tile included; the few non-intersecting
    entries are skipped in-kernel by a prefetched-scalar predicate).  This replaces an earlier vmapped
    filter+sort compaction that cost ~40 ms/level at bench scale (more
    than the fold kernel itself) and whose (NB, w_cap) table overflowed
    the 1 MB SMEM at grouped-view window sizes; here the table is gone —
    the caller permutes the tile entries into sorted order once and the
    kernel's window DMAs become SEQUENTIAL HBM rows.  Unlike a
    tmin-sorted range bounded by the GLOBAL max band width, the
    suffix-min bound stays tight in the presence of outlier wide-band
    tiles.
    """
    t = tmin.shape[0]
    valid = tmax >= 0
    key = jnp.where(valid, tmax, _BIG)
    order = jnp.argsort(key).astype(jnp.int32)
    tmax_sorted = key[order]
    tmin_sorted = jnp.where(valid, tmin, _BIG)[order]
    # suffix min of tmin in tmax order: monotone nondecreasing, so the
    # first position whose whole suffix has tmin >= b1 bounds the window
    mn = jax.lax.cummin(tmin_sorted[::-1])[::-1]
    b0 = jnp.arange(n_blocks, dtype=jnp.int32) * block
    lo = jnp.searchsorted(tmax_sorted, b0, side="left").astype(jnp.int32)
    hi = jnp.searchsorted(mn, b0 + block, side="left").astype(jnp.int32)
    raw = jnp.maximum(hi - lo, 0)
    lens = jnp.minimum(raw, w_cap)
    over = jnp.sum(raw - lens)
    return _Windows(
        order=order,
        lo=lo,
        win_len=lens,
        overflow=over.astype(jnp.int32),
        max_len=jnp.max(raw).astype(jnp.int32),
    )


_RING = 4   # in-flight DMA batches (VMEM + semaphore bounded)
_KB = 8     # max window entries per DMA batch (entries are sequential rows)


def _stage2_batch_entries(block: int, kp: int, s: int, planes: int) -> int:
    """Largest power-of-two DMA batch width whose kernel VMEM footprint
    (ring buffers + the radix-deposit temporaries, all O(kb*s)) fits the
    16 MB scoped limit with margin.  Large per-tile slot counts s (census
    caps on oblique scenes) would otherwise stack-OOM the Mosaic kernel.
    """
    nq = block // 128
    fixed = planes * nq * kp * 128 * 4 + block * kp * 4
    kb = _KB
    while kb > 1:
        sb = kb * s
        vmem = (
            _RING * (kp + 1) * sb * 4  # cnt/ids ring buffers
            + 2 * nq * kp * sb * 2  # one plane's cq + its dot staging
            + nq * kp * 128 * 4  # per-plane dot output
            + sb * 128 * 2  # oh_r
            + nq * sb * 2  # oh_q
            + fixed
        )
        if vmem <= 12 * 1024 * 1024:
            break
        kb //= 2
    return kb


def _stage2_kernel(
    block: int, kp: int, s: int, planes: int, kb: int = _KB
):
    """Grid over face blocks; each step folds its window of tiles into the
    block's dense slice.

    Window entries are CONTIGUOUS lane ranges of the tmax-sorted entry
    arrays (see _block_windows), streamed through a ring of ``_KB``-entry
    batched DMAs, and each batch is folded by ONE unconditional radix
    deposit: an in-block id splits as ``rel = q * 128 + r`` and
      cq[(j, q, k), slot] = onehot_q * count_digit_j   (VPU broadcast)
      acc2 += cq @ onehot_r(slot, 128)                 (one MXU dot)
    Entries that don't intersect the block — stale rows, rows past the
    window end (tmin >= block end by the suffix-min construction),
    padding, empty slots, and slots belonging to a neighboring block —
    all get q = -1, match no one-hot row, and deposit nothing, so the
    batch needs NO branches at all.  A naive id-vs-face match matrix
    would cost block x s area per entry (~4096x redundant — profiled as
    the pipeline's dominant term); the radix split costs
    planes*nq*kp + 128 lanes per slot instead.  Counts ride as
    ``planes`` exact base-128 bf16 digit planes; onehot_r comes from an
    exact digit-dot lane->sublane transpose of r.  Once per block, acc2
    rows unpack into the dense (block, kp) output via exact HIGHEST
    eye-dot transposes.
    """
    ring = _RING
    nq = block // 128  # 128-face sub-blocks per block
    sb = kb * s        # slot-lanes per DMA batch

    def kernel(lo_ref, wl_ref, cnt_hbm, ids_hbm, out_ref,
               cnt_buf, ids_buf, acc2_ref, sems):
        b = pl.program_id(0)
        lo_b = lo_ref[b]
        wl = wl_ref[b]
        nwb = (wl + kb - 1) // kb  # DMA batches for this block
        b0i = b * block

        def dmas(w8):
            slot = jax.lax.rem(w8, ring)
            row0 = lo_b + w8 * kb
            return (
                # counts are chunk-major (E, kp, 128) entry ROWS: one
                # contiguous kb-row block per batch, no relayout anywhere
                pltpu.make_async_copy(
                    cnt_hbm.at[pl.ds(row0, kb)], cnt_buf.at[slot],
                    sems.at[slot, 0],
                ),
                pltpu.make_async_copy(
                    ids_hbm.at[:, pl.ds(row0 * s, sb)], ids_buf.at[slot],
                    sems.at[slot, 1],
                ),
            )

        def issue(w8, z):
            for dma in dmas(w8):
                dma.start()
            return z

        jax.lax.fori_loop(0, jnp.minimum(nwb, ring), issue, 0)
        acc2_ref[...] = jnp.zeros((planes * nq * kp, 128), jnp.float32)

        iota_q = jax.lax.broadcasted_iota(jnp.int32, (nq, sb), 0)
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        onesk = jnp.ones((1, 1), jnp.bfloat16)

        def batch(slot):
            ids_row = ids_buf[slot]  # (1, sb) int32
            rel = ids_row - b0i
            # anything outside this block gets q = -1: deposits nothing
            relm = jnp.where(
                (ids_row >= 0) & (rel >= 0) & (rel < block), rel, -1
            )
            q_row = relm >> 7  # (1, sb)
            r_row = jnp.where(relm >= 0, relm & 127, 0)
            oh_q = (iota_q == q_row).astype(jnp.bfloat16)  # (nq, sb)
            # r as an exact column via a tiny digit dot (r <= 127 is
            # bf16-exact), then the r one-hot: (sb, 128) block-diagonal
            # over the kb entries (entry e's rows only match its own
            # 128-lane segment of cq below)
            r_col = jax.lax.dot_general(
                r_row.astype(jnp.bfloat16), onesk,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (sb, 1)
            oh_r = (r_col == iota_r.astype(jnp.float32)).astype(
                jnp.bfloat16
            )  # (sb, 128)

            # per-entry (kp, 128) count rows -> (kp, sb) with entry e on
            # lanes [e*128, (e+1)*128): a lane-concat of sublane slices,
            # no transposes
            cnt = jnp.concatenate(
                [
                    cnt_buf[slot, e].astype(jnp.float32)
                    for e in range(kb)
                ],
                axis=1,
            )  # (kp, sb)
            c = cnt
            for j in range(planes):
                if j + 1 < planes:
                    hi_q = jnp.floor(c * (1.0 / 128.0))
                    dig = (c - 128.0 * hi_q).astype(jnp.bfloat16)
                    c = hi_q
                else:
                    dig = c.astype(jnp.bfloat16)
                # cq[(q, k), slot] = onehot_q[q, slot] * digit[k, slot];
                # one dot PER PLANE: peak live VMEM is one plane's cq
                # (a planes-stacked cq + concat kept two copies live and
                # stack-OOMed Mosaic at block >= 16384)
                cq = (oh_q[:, None, :] * dig[None, :, :]).reshape(
                    nq * kp, sb
                )
                acc2_ref[j * nq * kp:(j + 1) * nq * kp, :] += (
                    jax.lax.dot_general(
                        cq, oh_r, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )  # (nq*kp, 128): exact integer deposits

        def consume(w8, z):
            for dma in dmas(w8):
                dma.wait()
            batch(jax.lax.rem(w8, ring))
            # batch fully consumed: keep the ring full
            nxt = w8 + ring

            @pl.when(nxt < nwb)
            def _():
                for dma in dmas(nxt):
                    dma.start()

            return z

        jax.lax.fori_loop(0, nwb, consume, 0)

        # unpack acc2[(j, q, k), r] -> out[q*128 + r, k]: per (j, q) an
        # exact (kp, 128) -> (128, kp) transpose via a HIGHEST eye-dot
        # (f32 operands stay exact; one nonzero per output element)
        eye = (
            jax.lax.broadcasted_iota(jnp.int32, (kp, kp), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (kp, kp), 1)
        ).astype(jnp.float32)
        for q in range(nq):
            t = jnp.zeros((128, kp), jnp.float32)
            for j in range(planes):
                piece = acc2_ref[
                    (j * nq + q) * kp:(j * nq + q + 1) * kp, :
                ]  # (kp, 128)
                t = t + float(128 ** j) * jax.lax.dot_general(
                    piece, eye, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # (128, kp)
            out_ref[0, q * 128:(q + 1) * 128, :] = t

    return kernel


_KB_U = 8  # unit-kernel DMA batch: 8 entries x 16 units = one 128-lane row


def _stage2_kernel_units(
    block: int, kp_pad: int, planes: int, kb: int = _KB_U
):
    """Unit-granular radix deposit: the fast fold for 8-ALIGNED entries.

    Entry ids from the binning are runs of ``bin_block`` CONSECUTIVE
    faces starting at multiples of 8 (position-aligned: slot s of an
    entry holds face ``unit[s // 8] * 8 + s % 8``), so each group of 8
    slots shares ONE unit id.  Depositing at UNIT granularity with the
    (face-offset, class) pair on LANES shrinks the deposit matmul by
    ~8x versus the face-slot radix kernel (whose per-batch MACs are
    ``planes * block * kp * slot_lanes`` — measured block-size-invariant
    at ~0.5 us/entry-visit, the grouped pipeline's dominant term on
    oblique views whose far-field entries span many face blocks):

      oh_u[u, slot16]      = (unit16[slot16] == u)          (nu, 128)
      acc[(j, u), f*16+k] += oh_u @ count_digit_j           one MXU dot
                                                            per plane

    Count rows arrive pre-relayouted as (E*16, 128) unit-major rows
    (lane = face-offset * 16 + class, classes padded to 16 so a unit row
    is exactly one 128-lane vreg) and unit ids as a flat (1, E*16) row;
    window starts are rounded DOWN to 8-entry multiples so every DMA
    slice is 128-lane aligned (the extra leading entries belong to
    earlier blocks and mask to q = -1, depositing nothing).  The final
    (block, kp) unpack is a pure XLA reshape — no in-kernel transposes
    at all.
    """
    ring = _RING
    nu = block // 8  # units per face block
    sbu = kb * 16  # unit slots per DMA batch (kb % 8 == 0 -> 128-lane
    #               multiples; kb > 8 amortizes DMA issue/semaphore
    #               latency over more entries per batch)

    def kernel(lo_ref, wl_ref, cnt_hbm, ids_hbm, out_ref,
               cnt_buf, ids_buf, acc_ref, sems):
        b = pl.program_id(0)
        lo_b = lo_ref[b]
        wl = wl_ref[b]
        nwb = (wl + kb - 1) // kb
        bu0 = b * nu  # first unit id of this block

        def dmas(w8):
            slot = jax.lax.rem(w8, ring)
            row0 = pl.multiple_of((lo_b + w8 * kb) * 16, sbu)
            return (
                pltpu.make_async_copy(
                    cnt_hbm.at[pl.ds(row0, sbu)], cnt_buf.at[slot],
                    sems.at[slot, 0],
                ),
                pltpu.make_async_copy(
                    ids_hbm.at[:, pl.ds(row0, sbu)], ids_buf.at[slot],
                    sems.at[slot, 1],
                ),
            )

        def issue(w8, z):
            for dma in dmas(w8):
                dma.start()
            return z

        jax.lax.fori_loop(0, jnp.minimum(nwb, ring), issue, 0)
        acc_ref[...] = jnp.zeros((planes * nu, 128), jnp.float32)

        iota_u = jax.lax.broadcasted_iota(jnp.int32, (nu, sbu), 0)

        def batch(slot):
            ids_row = ids_buf[slot]  # (1, sbu) int32 unit ids
            rel = ids_row - bu0
            relm = jnp.where(
                (ids_row >= 0) & (rel >= 0) & (rel < nu), rel, -1
            )
            oh_u = (iota_u == relm).astype(jnp.bfloat16)  # (nu, sbu)
            c = cnt_buf[slot].astype(jnp.float32)  # (sbu, 128)
            for j in range(planes):
                if j + 1 < planes:
                    hi = jnp.floor(c * (1.0 / 128.0))
                    dig = (c - 128.0 * hi).astype(jnp.bfloat16)
                    c = hi
                else:
                    dig = c.astype(jnp.bfloat16)
                acc_ref[j * nu:(j + 1) * nu, :] += jax.lax.dot_general(
                    oh_u, dig, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (nu, 128): exact integer digit deposits

        def consume(w8, z):
            for dma in dmas(w8):
                dma.wait()
            batch(jax.lax.rem(w8, ring))
            nxt = w8 + ring

            @pl.when(nxt < nwb)
            def _():
                for dma in dmas(nxt):
                    dma.start()

            return z

        jax.lax.fori_loop(0, nwb, consume, 0)

        # recombine digit planes: out[u, f*16+k] = sum_j 128^j acc[(j,u)]
        t = acc_ref[0:nu, :]
        for j in range(1, planes):
            t = t + float(128 ** j) * acc_ref[j * nu:(j + 1) * nu, :]
        out_ref[0, :, :] = t

    return kernel


_ENTRY_SLOTS = 128  # fold entry width: one 128-slot chunk of a tile's row


def _chunk_entries(counts: Optional[jax.Array], ids: jax.Array):
    """Split (T, kp, S) / (T, S) tile rows into 128-slot CHUNK entries.

    Wide slot rows (census-sized caps reach S ~ 768+) made the fold pay
    the full row area for every window entry, and a tile's whole-row id
    band can span several face blocks (oblique near-field tiles collect
    faces from many mesh rows) — measured 110 ms/view at bench scale.
    Each 128-slot chunk is a contiguous subrange of the tile's SORTED
    candidate ids, so its band is ~S/128x narrower, empty chunks drop out
    of the windows entirely, and the per-entry deposit area shrinks to
    (kp, 128).  Entries come out as (E, kp, 128) / (E, 128) — the
    layout the stage-2 kernel DMAs directly.

    This is the LEGACY/test adapter: the slot-major (T, kp, S) form
    needs a full-stack (kp, nch) relayout transpose, which at grouped 4K
    scale materializes multi-GB copies.  The production raster kernel
    emits counts ALREADY chunk-major (see pallas_raster: om is
    (ty, tx, nch, kp, 128)), so ``_per_level_entries`` bypasses this.
    """
    t, s = ids.shape
    se = _ENTRY_SLOTS
    pad = (-s) % se
    if pad:
        ids = jnp.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
        if counts is not None:
            counts = jnp.pad(counts, ((0, 0), (0, 0), (0, pad)))
        s += pad
    nch = s // se
    ids = ids.reshape(t * nch, se)
    if counts is not None:
        kp = counts.shape[1]
        if nch == 1:
            counts = counts.reshape(t, kp, se)
        else:
            counts = (
                counts.reshape(t, kp, nch, se)
                .transpose(0, 2, 1, 3)
                .reshape(t * nch, kp, se)
            )
    return counts, ids


def _chunk_ids(ids: jax.Array, nch: int) -> jax.Array:
    """(T, S) slot-row face ids -> (T*nch, 128) chunk-entry ids."""
    t, s = ids.shape
    se = _ENTRY_SLOTS
    if s != nch * se:
        ids = jnp.pad(
            ids, ((0, 0), (0, nch * se - s)), constant_values=-1
        )
    return ids.reshape(t * nch, se)


def _compact_entries(counts: jax.Array, ids: jax.Array, e_cap: int):
    """Keep only NONEMPTY chunk entries: (E, kp, 128)/(E, 128) ->
    (e_cap, ...) plus an overflow count.

    Census-sized caps make the dense entry stack ~5x larger than actual
    occupancy (caps fit the WORST tile; typical tiles fill a few chunks).
    A stable argsort on emptiness packs the occupied entries first —
    entries past ``n_nonempty`` in the gathered stack are genuinely empty
    rows (all ids -1) and match nothing downstream, so no fill handling
    is needed.  ``overflow = max(0, n_nonempty - e_cap)`` counts DROPPED
    nonempty entries; callers must raise on it (drops lose counts, never
    corrupt — same contract as the fold windows).

    Emptiness is ``any(id >= 0)`` per chunk, NOT slot-0 validity: the
    merged L2+global candidate list has a hole between its L2 prefix and
    the global section (pallas_raster merges them at a fixed offset).
    """
    e = ids.shape[0]
    e_cap = max(int(e_cap), 1)  # a zero-occupancy level keeps one row
    nonempty = jnp.any(ids >= 0, axis=1)
    n_nonempty = jnp.sum(nonempty.astype(jnp.int32))
    over = jnp.maximum(n_nonempty - e_cap, 0).astype(jnp.int32)
    if e_cap >= e:
        return counts, ids, jnp.zeros((), jnp.int32)
    sel = jnp.argsort(
        jnp.where(nonempty, 0, 1).astype(jnp.int32), stable=True
    )[:e_cap].astype(jnp.int32)
    return counts[sel], ids[sel], over


@functools.partial(
    jax.jit, static_argnames=("config", "image_h", "image_w")
)
def entry_occupancy(binned, config, image_h: int, image_w: int):
    """Exact per-level nonempty chunk-entry counts (n0, n1, n2) of the
    merged fold path for ONE view — sizes ``RasterConfig.entry_caps``.

    Matches the flags ``_compact_entries`` computes inside
    ``_per_level_entries`` (grid-padding tiles are all-empty and never
    count), and needs only the binning lists — no raster output.
    """
    from geograypher_tpu.ops.rasterize import expand_block_ids

    bb = config.bin_block
    se = _ENTRY_SLOTS
    nch0 = -(-config.caps[0] * bb // se)
    nch1 = -(-config.caps[1] * bb // se)
    nch2 = -(-(config.caps[2] + config.caps[3]) * bb // se)
    grids = config.grids(image_h, image_w)
    nty2, ntx2 = grids[2]
    occ = []
    for lvl, nch in ((0, nch0), (1, nch1)):
        ids = _chunk_ids(expand_block_ids(binned.cand[lvl], bb), nch)
        occ.append(jnp.sum(jnp.any(ids >= 0, axis=1).astype(jnp.int32)))
    cand2m = expand_block_ids(
        jnp.concatenate(
            [
                binned.cand[2],
                jnp.broadcast_to(
                    binned.cand[3], (nty2 * ntx2, config.caps[3])
                ),
            ],
            axis=1,
        ),
        bb,
    )
    ids2 = _chunk_ids(cand2m, nch2)
    occ.append(jnp.sum(jnp.any(ids2 >= 0, axis=1).astype(jnp.int32)))
    return jnp.stack(occ)


def _level_w_caps(w_cap, n_levels: int) -> tuple:
    """Resolve an int-or-per-level ``w_cap`` into one cap per fold level.

    The fold launches once per level (L0, L1, L2+global[, S]) and each
    launch pads every face block's window to ``w_cap`` entries — but the
    levels' demands are structurally different (see
    :func:`level_fold_windows`), so a shared scalar either undersizes the
    L2+global level (dropped counts) or oversizes the hot L0 one (wasted
    window DMA).  A tuple shorter than the level count reuses its last
    value (a 3-tuple sizes level S like L2)."""
    if isinstance(w_cap, (tuple, list)):
        caps = tuple(int(c) for c in w_cap)
        if len(caps) < n_levels:
            caps = caps + (caps[-1],) * (n_levels - len(caps))
        return caps[:n_levels]
    return (int(w_cap),) * n_levels


@functools.partial(
    jax.jit, static_argnames=("config", "image_h", "image_w", "n_faces")
)
def level_fold_windows(
    binned, config, image_h: int, image_w: int, n_faces: int, sb=None
):
    """Exact per-level fold-window demand ``[L0, L1, L2+global, S]`` for
    one view — sizes a per-level ``RasterConfig.fold_w_cap``.

    The merged L2+global candidate list's windows are structurally unlike
    L0's: every nonempty global chunk's face-id band can span the whole
    mesh and is replicated into EVERY occupied L2 tile, so on meshes
    where the global census level is non-empty (irregular TINs with
    locally large faces — the reference ingests arbitrary Metashape TINs,
    meshes.py:157-229) the L2 fold's per-block window demand routinely
    exceeds the L0 one.  An L0-only probe undersizes it: the round-5
    irregular-TIN benchmark overflowed its grouped fold by ~1000 entries
    while the L0-probed cap claimed 1.25x headroom.  The S slot is 0
    when the subtile level is off.
    """
    from geograypher_tpu.ops.rasterize import expand_block_ids, l0_face_ids

    bb = config.bin_block
    nty2, ntx2 = config.grids(image_h, image_w)[2]
    cand2m = jnp.concatenate(
        [
            binned.cand[2],
            jnp.broadcast_to(binned.cand[3], (nty2 * ntx2, config.caps[3])),
        ],
        axis=1,
    )
    wins = []
    for ids in (
        l0_face_ids(binned, config),
        expand_block_ids(binned.cand[1], bb),
        expand_block_ids(cand2m, bb),
    ):
        _over, win = fold_window_overflow(
            ids, n_faces=n_faces, w_cap=504, block=config.fold_block
        )
        wins.append(win)
    if sb is not None:
        from geograypher_tpu.ops.subtile import s_entry_ids

        _over, s_win = fold_window_overflow(
            s_entry_ids(sb, config), n_faces=n_faces, w_cap=504,
            block=config.fold_block,
        )
        wins.append(s_win)
    else:
        wins.append(jnp.zeros((), jnp.int32))
    return jnp.stack(wins)


@functools.partial(jax.jit, static_argnames=("n_faces", "block", "w_cap"))
def fold_window_overflow(
    ids: jax.Array, n_faces: int, block: int = 1024, w_cap: int = 96
):
    """(dropped entries, max window) of the face-block fold at ``w_cap``.

    The fold's per-block windows are a static capacity, like the
    rasterizer caps: run this once per survey configuration
    (cf. TexturedMesh.check_raster_capacity) and size ``w_cap`` from the
    returned max — it is the TRUE (unclipped) per-block maximum, exact
    regardless of the probe ``w_cap``, so a single probe sizes the
    capacity in one shot.  ``ids`` as passed to
    :func:`face_counts_from_tiles`; windows are counted in the same
    128-slot chunk entries the fold uses."""
    _, ids = _chunk_entries(None, ids)
    t = ids.shape[0]
    valid = ids >= 0
    tmin = jnp.min(jnp.where(valid, ids, _BIG), axis=1).astype(jnp.int32)
    tmax = jnp.max(jnp.where(valid, ids, -1), axis=1).astype(jnp.int32)
    nb = _round_up(n_faces, block) // block
    w_cap = min(_round_up(max(w_cap, 1), 8), _round_up(max(t, 8), 8))
    win = _block_windows(tmin, tmax, nb, block, w_cap)
    return win.overflow, win.max_len


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_faces", "block", "planes", "w_cap", "return_overflow",
        "units_aligned", "units_kb",
    ),
)
def face_counts_from_tiles(
    counts: jax.Array,
    ids: jax.Array,
    n_faces: int,
    block: int = 1024,
    planes: int = 2,
    w_cap: int = 96,
    return_overflow: bool = False,
    units_aligned: bool = False,
    units_kb: int = _KB_U,
):
    """Dense (n_faces_padded, kp) face-class counts from per-tile counts.

    Args:
        counts: (T, kp, S) f32 per-tile per-slot class counts; values must
            be < 128**(planes-1) * 129 for the bf16 digit planes to stay
            exact (planes=2 -> 16512, planes=4 -> any count < 2^24).
        ids: (T, S) int32 slot face ids (< 0 = empty slot).
        w_cap: max tiles whose id band can overlap one face block; windows
            beyond it are truncated (counted in _Windows.overflow — size it
            generously, DMA for unused entries is skipped via win_len...
            entries are also id-masked so truncation never corrupts, only
            drops).

    Returns (NB*block, kp) f32 with NB = ceil(n_faces / block).
    """
    if counts.shape[-1] != _ENTRY_SLOTS or counts.shape[-1] != ids.shape[-1]:
        counts, ids = _chunk_entries(counts, ids)  # legacy slot-major form
    t, kp, s = counts.shape
    nb = _round_up(n_faces, block) // block
    valid = ids >= 0
    tmin = jnp.min(jnp.where(valid, ids, _BIG), axis=1).astype(jnp.int32)
    tmax = jnp.max(jnp.where(valid, ids, -1), axis=1).astype(jnp.int32)
    w_cap = min(_round_up(max(w_cap, 1), 8), _round_up(max(t, 8), 8))
    win = _block_windows(tmin, tmax, nb, block, w_cap)
    if units_aligned and s == _ENTRY_SLOTS and kp <= 16 and block % 8 == 0:
        return _face_counts_units(
            counts, ids, win, t, kp, nb, block, planes, w_cap,
            return_overflow, kb=units_kb,
        )
    kb = _stage2_batch_entries(block, kp, s, planes)
    # permute entries into the sorted window order (block windows become
    # contiguous ENTRY-ROW ranges: one sequential (kb, kp, 128) block DMA
    # per kb entries, unconditionally radix-deposited) and pad so the
    # last batch of the largest window never reads OOB — padding holds
    # empty ids, which match nothing.  Entries are chunk-major rows, so
    # the permutation is a contiguous axis-0 row gather and NO transpose
    # ever touches the count stack (the old slot-major flat relayouted
    # the whole multi-GB group stack).
    pad_n = _round_up(w_cap, kb) + kb
    # fold the pad into the gather: OOB indices (= t) make take duplicate
    # (clip) or fill rows, so the permuted stack materializes ONCE — a
    # separate jnp.pad(counts[win.order]) made a second full-stack copy
    # (8 GB at grouped-4K scale, half the round-3 OOM).  COUNTS use clip:
    # the kernel's radix deposit is gated entirely by the id-derived
    # one-hots (stale/padding/empty slots get q = -1 and deposit
    # nothing), so duplicated count VALUES in pad rows are inert and the
    # f32 stack skips take-fill's separate full-size select pass
    # (measured 6.7 ms on a grouped-4K L0 stack).  IDS must genuinely be
    # -1 in pad rows — they keep the fill path (int32, 16x smaller).
    order_p = jnp.concatenate(
        [win.order, jnp.full((pad_n,), t, jnp.int32)]
    )
    counts = jnp.take(counts, order_p, axis=0, mode="clip")
    ids = jnp.take(ids, order_p, axis=0, mode="fill", fill_value=-1)
    tp = t + pad_n
    ids = ids.reshape(1, tp * s)

    kernel = _stage2_kernel(block, kp, s, planes, kb=kb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, block, kp), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((_RING, kb, kp, s), counts.dtype),
            pltpu.VMEM((_RING, 1, kb * s), jnp.int32),
            pltpu.VMEM((planes * (block // 128) * kp, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((_RING, 2)),
        ],
    )
    operands = jax.lax.optimization_barrier(
        (win.lo, win.win_len, counts, ids)
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, block, kp), jnp.float32),
        interpret=_interpret(),
    )(*operands)
    out = jax.lax.optimization_barrier(out)
    out = out.reshape(nb * block, kp)
    if return_overflow:
        # the TRUE window overflow of THIS fold (entries clipped by
        # w_cap = counts dropped) — callers guard on it directly instead
        # of re-building the windows in a second pass
        return out, win.overflow
    return out


def _face_counts_units(
    counts: jax.Array,
    ids: jax.Array,
    win: _Windows,
    t: int,
    kp: int,
    nb: int,
    block: int,
    planes: int,
    w_cap: int,
    return_overflow: bool,
    kb: int = _KB_U,
):
    """Unit-granular fold driver (see _stage2_kernel_units).

    CONTRACT (asserted by the caller flag ``units_aligned``): every
    group of 8 slots of an entry holds 8 CONSECUTIVE face ids starting
    at a multiple of 8 (or is all empty) — true for all tile-level entry
    ids built from ``expand_block_ids`` with ``bin_block % 8 == 0``.
    """
    if kb % 8 or kb < 8:
        raise ValueError(f"fold_unit_kb must be a positive multiple of 8 "
                         f"(got {kb})")
    pad_n = _round_up(w_cap + kb, kb) + kb  # + kb covers the lo rounding
    order_p = jnp.concatenate(
        [win.order, jnp.full((pad_n,), t, jnp.int32)]
    )
    # unit-major count rows: (E, kp, 128) -> (E, 16 units, 8 faces, kp)
    # -> lanes (face*16 + class), classes padded to 16 so each unit row
    # is exactly one 128-lane vreg
    cu = counts.reshape(t, kp, 16, 8).transpose(0, 2, 3, 1)
    if kp < 16:
        cu = jnp.pad(cu, ((0, 0), (0, 0), (0, 0), (0, 16 - kp)))
    cu = cu.reshape(t, 16, 128)
    iu = jnp.where(ids[:, ::8] >= 0, ids[:, ::8] >> 3, -1).astype(
        jnp.int32
    )  # (E, 16) unit ids
    cu = jnp.take(cu, order_p, axis=0, mode="clip").reshape(-1, 128)
    iu = jnp.take(iu, order_p, axis=0, mode="fill", fill_value=-1)
    tp = t + pad_n
    iu = iu.reshape(1, tp * 16)
    # round window starts DOWN to kb entries: every DMA offset becomes a
    # provable 128-lane multiple; the extra leading entries have
    # tmax < block start, mask to rel < 0, and deposit nothing
    lo_a = (win.lo // kb) * kb
    len_a = win.win_len + (win.lo - lo_a)

    nu = block // 8
    kernel = _stage2_kernel_units(block, 16, planes, kb=kb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, nu, 128), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((_RING, kb * 16, 128), cu.dtype),
            pltpu.VMEM((_RING, 1, kb * 16), jnp.int32),
            pltpu.VMEM((planes * nu, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((_RING, 2)),
        ],
    )
    operands = jax.lax.optimization_barrier((lo_a, len_a, cu, iu))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, nu, 128), jnp.float32),
        interpret=_interpret(),
    )(*operands)
    out = jax.lax.optimization_barrier(out)
    # (nb, nu, 128) -> (nb*block faces, kp): lane = face_off*16 + class
    out = out.reshape(nb * block, 16)[:, :kp]
    if return_overflow:
        return out, win.overflow
    return out


# ---------------------------------------------------------------------------
# Orchestration
# ---------------------------------------------------------------------------


def _child_sum(level_counts: jax.Array, scale_y: int, scale_x: int):
    """(ny, nx, ...) -> (ny/scale_y, nx/scale_x, ...) by summation."""
    ny, nx = level_counts.shape[:2]
    tail = level_counts.shape[2:]
    return level_counts.reshape(
        (ny // scale_y, scale_y, nx // scale_x, scale_x) + tail
    ).sum(axis=(1, 3))


def _per_level_entries(outs, binned, config, image_h, image_w):
    """One view's per-level (counts, ids, digit_planes) fold entries.

    Two input forms:
    * fused raster kernel: ``outs = (om, cand2m)`` — ONE merged
      CHUNK-MAJOR count array (ty, tx, nch_tot, kp, 128) whose chunk
      axis is [L0 chunks | L1 chunks | L2+global chunks] (the global
      list was folded into L2 by raster_tiles_pallas), plus the merged
      L2+global candidate lists.  Entries come out pre-chunked as
      (E, kp, 128) / (E, 128) via PURE reshapes — the earlier
      slot-major layout needed full-stack relayout transposes that
      materialized multi-GB copies at grouped 4K scale (the round-3
      group-20 OOM).
    * stage-1 kernel (tile_class_counts): ``outs = (o0, o1, o2, o3)``
      slot-major per-level arrays (four levels; converted by the legacy
      ``_chunk_entries`` adapter inside face_counts_from_tiles).

    Count arrays may arrive on ANY L0-grid padding — extra tiles beyond
    the true grid must be all-zero.  Ancestor levels are child-summed
    here, so their entries are small.
    """
    from geograypher_tpu.ops.rasterize import expand_block_ids

    grids = config.grids(image_h, image_w)
    (nty1, ntx1), (nty2, ntx2) = grids[1], grids[2]
    s1_sc, s2_sc = config.level_scales[1], config.level_scales[2]
    bb = config.bin_block
    # count-array columns and candidate ids are FACE slots: bin_block
    # packs bb faces per binned unit, so capacities scale by bb
    cap0f, cap1f = config.caps[0] * bb, config.caps[1] * bb
    se = _ENTRY_SLOTS
    # merged fused-kernel form: om is the 5-D chunk-major count array
    # (optionally followed by the level-S entry pair); the legacy
    # stage-1 form is four 4-D slot-major per-level arrays
    merged = outs[0].ndim == 5
    if merged:
        om, cand2m = outs[0], outs[1]
        kp = om.shape[3]
        nch0 = -(-cap0f // se)
        nch1 = -(-cap1f // se)
        o0 = om[:, :, :nch0]
        o1 = om[:, :, nch0:nch0 + nch1]
        o2 = om[:, :, nch0 + nch1:]
        nch2 = o2.shape[2]
        grid_tail = 3  # trailing non-grid dims of o_l
        levels3 = True
    else:
        if bb != 1:
            raise NotImplementedError(
                "stage-1 tile_class_counts path requires bin_block == 1; "
                "use the fused raster kernel for block-granular binning"
            )
        o0, o1, o2, o3 = outs
        kp = o0.shape[2]
        grid_tail = 2
        levels3 = False
    # grid covering both the L1-aligned grid and the rasterizer's
    # pair-padded grid (pair can exceed s1, e.g. 8 tiles/step vs scale 4),
    # rounded to s1 so child->parent reductions stay pure reshapes
    nty0g = _round_up(max(nty1 * s1_sc, o0.shape[0]), s1_sc)
    ntx0g = _round_up(max(ntx1 * s1_sc, o0.shape[1]), s1_sc)

    def pad_grid(o):
        ty, tx = o.shape[:2]
        if ty == nty0g and tx == ntx0g:
            return o  # already aligned (the rasterizer pads its grid)
        return jnp.pad(
            o,
            ((0, nty0g - ty), (0, ntx0g - tx)) + ((0, 0),) * grid_tail,
        )

    ids0_rows = expand_block_ids(
        jnp.pad(
            binned.cand[0].reshape(grids[0][0], grids[0][1], -1),
            (
                (0, nty0g - grids[0][0]),
                (0, ntx0g - grids[0][1]),
                (0, 0),
            ),
            constant_values=-1,
        ).reshape(nty0g * ntx0g, -1),
        bb,
    )
    ids1_rows = expand_block_ids(
        binned.cand[1].reshape(nty1 * ntx1, -1), bb
    )

    if merged:
        c0 = pad_grid(o0).reshape(nty0g * ntx0g * nch0, kp, se)
        ids0 = _chunk_ids(ids0_rows, nch0)
        # parent columns beyond the true L1 grid (possible when the pair
        # padding exceeds s1) hold only padded tiles' all-zero counts
        c1 = _child_sum(pad_grid(o1), s1_sc, s1_sc)[
            :nty1, :ntx1
        ].reshape(nty1 * ntx1 * nch1, kp, se)
        ids1 = _chunk_ids(ids1_rows, nch1)
        c2 = jnp.pad(
            pad_grid(o2),
            (
                (0, nty2 * s2_sc - nty0g),
                (0, ntx2 * s2_sc - ntx0g),
            )
            + ((0, 0),) * grid_tail,
        )
        c2 = _child_sum(c2, s2_sc, s2_sc).reshape(
            nty2 * ntx2 * nch2, kp, se
        )
        ids2 = _chunk_ids(cand2m.reshape(nty2 * ntx2, -1), nch2)
        # compact each level to its occupied chunks HERE, per view, so
        # the dense census-cap om buffer dies right after its raster
        # instead of aliasing into the group concat (the grouped-4K OOM:
        # 10 live ~850 MB oms + an equally dense permuted fold stack)
        ecaps = getattr(config, "entry_caps", None) or (None,) * 3
        zero = jnp.zeros((), jnp.int32)
        # tile-level entry ids are expand_block_ids position-aligned
        # bin_block runs: 8-slot groups share one 8-aligned unit when
        # bin_block % 8 == 0, enabling the unit-granular fold kernel
        aligned = bb % 8 == 0
        levels = []
        for c_l, ids_l, pl_l, cap_l in (
            (c0, ids0, 2, ecaps[0]),
            (c1, ids1, 2, ecaps[1]),
            # merged L2+global slot counts can reach the whole image
            (c2, ids2, 4, ecaps[2]),
        ):
            if cap_l is None:
                levels.append((c_l, ids_l, pl_l, zero, aligned))
            else:
                c_l, ids_l, ov = _compact_entries(c_l, ids_l, cap_l)
                levels.append((c_l, ids_l, pl_l, ov, aligned))
        if len(outs) == 4:
            # level-S sub-tile entries (subtile.s_count_pallas /
            # s_entry_ids): already compact CSR chunks, pre-chunked in
            # the fold's (E, kp, 128)/(E, 128) entry shape; counts are
            # bounded by the 128-pixel sub-tile, so 2 digit planes.
            # S chunks pack 4-face runs at arbitrary slot positions, so
            # the unit kernel's 8-slot grouping does NOT hold.
            s_counts, s_ids = outs[2], outs[3]
            levels.append((s_counts, s_ids, 2, zero, False))
        return levels

    c0 = pad_grid(o0).reshape(nty0g * ntx0g, kp, cap0f)
    c1 = _child_sum(pad_grid(o1), s1_sc, s1_sc)[:nty1, :ntx1].reshape(
        nty1 * ntx1, kp, cap1f
    )
    c2 = jnp.pad(
        pad_grid(o2),
        (
            (0, nty2 * s2_sc - nty0g),
            (0, ntx2 * s2_sc - ntx0g),
            (0, 0),
            (0, 0),
        ),
    )
    s2_slots = o2.shape[3]
    c2 = _child_sum(c2, s2_sc, s2_sc).reshape(nty2 * ntx2, kp, s2_slots)
    ids2 = binned.cand[2].reshape(nty2 * ntx2, -1)

    c3 = o3.sum(axis=(0, 1)).reshape(1, kp, config.caps[3])
    ids3 = binned.cand[3].reshape(1, -1)
    zero = jnp.zeros((), jnp.int32)
    # slot-major legacy rows (bin_block == 1): ids are per-tile sorted
    # candidates, NOT consecutive 8-runs — the unit fold does not apply
    return [
        (c0, ids0_rows, 2, zero, False), (c1, ids1_rows, 2, zero, False),
        (c2, ids2, 3, zero, False), (c3, ids3, 4, zero, False),
    ]



def fold_tile_counts(
    outs,
    binned,
    config,
    image_h: int,
    image_w: int,
    n_faces: int,
    n_classes: int,
    w_cap: int = 96,
    block: int = 1024,
    return_overflow: bool = False,
):
    """Fold per-tile per-level (class, slot) counts into (F, C) counts.

    (level_scales validation happens in fold_tile_counts_grouped, which
    this delegates to.)"""
    return fold_tile_counts_grouped(
        [(outs, binned)], config, image_h, image_w, n_faces, n_classes,
        w_cap=w_cap, block=block, return_overflow=return_overflow,
    )


def fold_tile_counts_grouped(
    views,
    config,
    image_h: int,
    image_w: int,
    n_faces: int,
    n_classes: int,
    w_cap: int = 96,
    block: int = 1024,
    return_overflow: bool = False,
):
    """Fold SEVERAL views' per-tile counts into one (F, C) count sum.

    Cross-view aggregation sums per-view counts, and the face-block fold
    is agnostic to which view a tile came from — so concatenating views'
    tiles into one fold launch amortizes the per-block setup (window
    DMA issue, accumulator zero/write, lhs construction) across the
    group.  ``views`` is a list of (outs, binned) pairs as accepted by
    :func:`fold_tile_counts`; size ``w_cap`` ~ per-view window x group.

    With ``return_overflow=True`` the total number of nonempty chunk
    entries dropped (fold-window truncation + ``config.entry_caps``
    compaction) rides along as an int32 scalar — callers that enable
    compaction MUST check it (a nonzero value means counts were lost;
    raise, don't return wrong labels).  With ``return_overflow="split"``
    the two overflow kinds return separately as ``(dense, win_over,
    entry_over)``: window overflow is fixed by widening ``w_cap``
    (guaranteed sufficient — see planner._group_w_cap), entry overflow
    only by re-censusing/raising ``entry_caps`` — runners that retry
    must not conflate them (the round-5 sustained bench burned ~17
    grouped-program compiles widening windows against a constant
    entry-cap overflow, and the accumulated executables OOMed the chip).
    """
    if config.level_scales[1] not in (1, 2, 4):
        raise ValueError(
            f"level_scales[1] must be 1, 2 or 4 for the count fold "
            f"(got {config.level_scales[1]})"
        )
    per_level = [
        _per_level_entries(outs, binned, config, image_h, image_w)
        for outs, binned in views
    ]
    w_caps = _level_w_caps(w_cap, len(per_level[0]))
    dense = None
    win_tot = jnp.zeros((), jnp.int32)
    entry_tot = jnp.zeros((), jnp.int32)
    for lvl in range(len(per_level[0])):
        counts = jnp.concatenate([v[lvl][0] for v in per_level], axis=0)
        ids = jnp.concatenate([v[lvl][1] for v in per_level], axis=0)
        d, win_over = face_counts_from_tiles(
            counts, ids, n_faces=n_faces, planes=per_level[0][lvl][2],
            w_cap=w_caps[lvl], block=block, return_overflow=True,
            units_aligned=all(v[lvl][4] for v in per_level),
            units_kb=getattr(config, "fold_unit_kb", _KB_U),
        )
        dense = d if dense is None else dense + d
        win_tot = win_tot + win_over
        for v in per_level:
            entry_tot = entry_tot + v[lvl][3]
    dense = dense[:n_faces, :n_classes]
    if return_overflow == "split":
        return dense, win_tot, entry_tot
    if return_overflow:
        return dense, win_tot + entry_tot
    return dense


@functools.partial(
    jax.jit,
    static_argnames=("config", "image_h", "image_w", "n_faces", "n_classes"),
)
def project_image_class_counts_tiled(
    p2f_tiles: jax.Array,
    class_image: jax.Array,
    binned,
    config,
    image_h: int,
    image_w: int,
    n_faces: int,
    n_classes: int,
) -> jax.Array:
    """Per-face per-class pixel counts, scatter-free (see module docstring).

    Drop-in numerical equal of
    :func:`geograypher_tpu.ops.aggregate.project_image_class_counts`,
    taking the rasterizer's row-image pix2face plus its binning lists.

    Returns ((n_faces, n_classes) float32 counts, int32 overflow) — the
    fold sizes from ``config.fold_w_cap``/``fold_block`` and callers
    MUST check the overflow scalar (nonzero = counts were dropped).
    """
    outs, _kp = tile_class_counts(
        p2f_tiles, class_image, binned.cand, config, image_h, image_w,
        n_classes,
    )
    return fold_tile_counts(
        outs, binned, config, image_h, image_w, n_faces, n_classes,
        w_cap=config.fold_w_cap, block=config.fold_block,
        return_overflow=True,
    )
