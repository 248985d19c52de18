"""Sub-tile (level S) rasterization: lane-packed fine raster for tiny
triangles.

The L0 kernel evaluates every candidate against its full (8, 128)-pixel
tile — ~170x pixel waste for the far-field triangles that dominate
oblique drone views (the reference's pytorch3d rasterizer has the same
bin-then-test structure, derived_meshes.py:642-737, but on CUDA warps).
Level S bins SMALL candidate units to (8, 16)-pixel SUB-TILES and
evaluates each against only those 128 pixels — one vreg row per
candidate — cutting resolve VPU work ~3.5x on the varied survey
workload (scratch/probe_subtile2.py sweep; winner (8,16) cells,
(3,2) window, 4-face units).

Structure (all static-shape, jit-safe):

* Units are ``s_block`` consecutive faces (finer than the L0
  ``bin_block``: 8-face unions project too tall on azimuth-aligned
  oblique views and fail the fit exactly where the win matters).  An L0
  ``bin_block`` block is diverted to S only when EVERY occupied s_block
  sub-unit fits an ``s_window`` window of sub-tile cells — assignment is
  exclusive, so no face is ever resolved or counted twice.
* Binned S units live in a COMPACT CSR chunk list, not a dense per-tile
  cap layout (a dense census cap over ~65K sub-tiles would be GBs):
  chunk = 128 face slots = 4 quarters of 32 slots; all of a quarter's
  slots belong to ONE sub-tile (quarter padding <= s_block*?-1 slots);
  each L0 tile PAIR's chunk range is padded to the kernel DMA batch
  ``kb`` so every batch starts on a whole block.  Per-quarter sub-tile
  ids ride a scalar-prefetch array; pad quarters inherit a neighboring
  sub-tile id and carry only -1 units (sentinel planes: resolve no-ops).
* The S z-kernel revisits one output block per tile pair while marching
  the pair's chunk range via scalar-prefetch index maps (steps beyond
  the range re-map to the same slab block: no DMA, compute predicated
  off) and emits IMAGE-layout (best_w, best_id) planes that the L0
  kernel consumes as its carry init.  A second pass matches final
  winner ids against the S candidates into fold-ready (kp, 128) chunk
  count entries.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

CHUNK = 128  # face slots per chunk
QUARTER = 32  # face slots per quarter (one sub-tile each)

INT32_MAX = jnp.iinfo(jnp.int32).max


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class SubtileBinned(NamedTuple):
    """One view's level-S CSR chunk layout (shapes are census-capped)."""

    units: jax.Array  # (cap_chunks*32,) int32 s_block-unit ids, -1 pad
    qsub: jax.Array  # (cap_chunks*4,) int32 absolute sub-tile id/quarter
    pair_start: jax.Array  # (n_pairs,) int32 first chunk of each pair
    pair_cnt: jax.Array  # (n_pairs,) int32 kb-aligned chunks per pair
    n_chunks: jax.Array  # () int32 real chunk demand (pre-cap)
    s_mask8: jax.Array  # (F/bin_block,) bool: block diverted to level S
    overflow: jax.Array  # () int32 chunks dropped by cap_chunks


def _unit_fit(setup, config):
    """Per-s_block-unit sub-tile cell spans + the diversion masks.

    Returns (cy0, cy1, cx0, cx1, uvalid, s_mask8, s_unit): cell bbox per
    unit, unit validity, the per-bin_block-BLOCK level-S diversion mask,
    and the per-unit "actually binned to S" mask.
    """
    sh, sw = config.subtile
    wy, wx = config.s_window
    sbb = config.s_block
    bb = config.bin_block
    py0, px0, py1, px1 = (setup.bbox[k] for k in range(4))
    valid = setup.valid
    big = jnp.asarray(INT32_MAX, jnp.int32)
    py0u = jnp.min(jnp.where(valid, py0, big).reshape(-1, sbb), axis=1)
    px0u = jnp.min(jnp.where(valid, px0, big).reshape(-1, sbb), axis=1)
    py1u = jnp.max(jnp.where(valid, py1, -1).reshape(-1, sbb), axis=1)
    px1u = jnp.max(jnp.where(valid, px1, -1).reshape(-1, sbb), axis=1)
    uvalid = jnp.any(valid.reshape(-1, sbb), axis=1)

    cy0, cy1 = py0u // sh, py1u // sh
    cx0, cx1 = px0u // sw, px1u // sw
    fits = (cy1 - cy0 < wy) & (cx1 - cx0 < wx)
    if config.global_from is not None:
        # oversized-tail faces are never diverted to level S: their
        # trailing ids would contaminate the S entries' id bands exactly
        # like the tile levels' (RasterConfig.global_from)
        n_units = fits.shape[0]
        unit_last = jnp.arange(n_units, dtype=jnp.int32) * sbb + (sbb - 1)
        fits = fits & (unit_last < config.global_from)
    # empty sub-units never block their parent's diversion
    ok_unit = fits | ~uvalid
    k8 = bb // sbb
    s_mask8 = jnp.all(ok_unit.reshape(-1, k8), axis=1)
    s_unit = uvalid & jnp.repeat(s_mask8, k8)
    return cy0, cy1, cx0, cx1, uvalid, s_mask8, s_unit


def subtile_mask8(setup, config) -> jax.Array:
    """The level-S diversion mask alone (for censusing the L0..L3 caps
    with ``bin_triangles(..., exclude_blocks=...)`` before the full S
    capacities are known)."""
    return _unit_fit(setup, config)[5]


def subtile_counts_census(setup, config, image_h, image_w, ntx0p, pair,
                          kb: int = 4):
    """Exact chunk demand: (total_chunks, worst_pair_chunks) for sizing
    ``cap_chunks`` and the kernel's per-pair grid depth (both kb-aligned,
    matching :func:`bin_subtiles`)."""
    sb = bin_subtiles(
        setup, config, image_h, image_w, ntx0p, pair,
        cap_chunks=kb, kb=kb, _census_only=True,
    )
    return sb


def bin_subtiles(
    setup,
    config,
    image_h: int,
    image_w: int,
    ntx0p: int,
    pair: int,
    cap_chunks: int,
    kb: int = 4,
    _census_only: bool = False,
):
    """Bin small units to sub-tile cells; returns :class:`SubtileBinned`
    (or, with ``_census_only``, the (total, worst-pair) chunk demand).

    ``setup`` is the view's TriangleSetup with faces padded to a
    bin_block multiple exactly as for ``rasterize.bin_triangles``;
    ``ntx0p`` is the rasterizer's pair-padded L0 column count and the
    sub-tile grid rows are padded to the rasterizer's row padding via
    ``config`` (callers pass the same padded grid the kernel uses).
    """
    sh, sw = config.subtile
    wy, wx = config.s_window
    sbb = config.s_block
    bb = config.bin_block
    if bb % sbb:
        raise ValueError("bin_block must be a multiple of s_block")
    if QUARTER % sbb:
        raise ValueError("s_block must divide the 32-slot quarter")
    if config.tile_w % sw or config.tile_h != sh:
        raise ValueError("subtile cells must tile one (tile_h, tile_w) row")
    upq = QUARTER // sbb  # units per quarter
    spt = config.tile_w // sw  # sub-tiles per L0 tile

    cy0, cy1, cx0, cx1, uvalid, s_mask8, s_unit = _unit_fit(setup, config)
    n_units = uvalid.shape[0]

    # sub-tile grid on the kernel's padded L0 grid (rows padded to the
    # L1 scale like the rasterizer's nty0p)
    nty0 = -(-image_h // config.tile_h)
    nty0p = _round_up(nty0, config.level_scales[1])
    ntx_s = ntx0p * spt
    n_sub = nty0p * ntx_s
    n_pairs = nty0p * (ntx0p // pair)

    keys, units = [], []
    uids = jnp.arange(n_units, dtype=jnp.int32)
    for dy in range(wy):
        for dx in range(wx):
            cy = cy0 + dy
            cx = cx0 + dx
            okw = s_unit & (cy <= cy1) & (cx <= cx1)
            keys.append(jnp.where(okw, cy * ntx_s + cx, INT32_MAX))
            units.append(uids)
    key_flat = jnp.concatenate(keys, axis=0)
    unit_flat = jnp.concatenate(units, axis=0)
    sorted_keys, sorted_units = jax.lax.sort(
        (key_flat, unit_flat), num_keys=2
    )

    sub_iota = jnp.arange(n_sub + 1, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_keys, sub_iota, side="left").astype(
        jnp.int32
    )
    c_s = starts[1:] - starts[:-1]  # units per sub-tile

    # quarters per sub-tile; chunks per tile pair, kb-aligned
    q_s = -(-c_s // upq)
    q_pair = jnp.sum(q_s.reshape(n_pairs, pair * spt), axis=1)
    ch_pair = (((-(-q_pair // 4)) + kb - 1) // kb) * kb
    pair_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(ch_pair)[:-1]]
    ).astype(jnp.int32)
    n_chunks = (pair_start[-1] + ch_pair[-1]).astype(jnp.int32)
    if _census_only:
        return n_chunks, jnp.max(ch_pair).astype(jnp.int32)

    cap_q = cap_chunks * 4
    cap_u = cap_q * upq

    # quarter offset of each sub-tile: pair chunk base + within-pair csum
    q_in_pair = q_s.reshape(n_pairs, pair * spt)
    q_off_in = jnp.cumsum(q_in_pair, axis=1) - q_in_pair
    q_off = (pair_start[:, None] * 4 + q_off_in).reshape(-1)

    # per-quarter sub-tile id: run-start scatter + cumsum (pad quarters
    # inherit the previous run's id; their units are -1)
    occ = q_s > 0
    d = jnp.zeros((cap_q,), jnp.int32)
    d = d.at[jnp.where(occ, q_off, cap_q)].add(1, mode="drop")
    run = jnp.cumsum(d) - 1
    # occupied sub-tile ids in q_off (== sid) order
    order = jnp.argsort(jnp.where(occ, q_off, INT32_MAX))
    run_sid = jnp.arange(n_sub, dtype=jnp.int32)[order]
    qsub = run_sid[jnp.clip(run, 0, n_sub - 1)]

    # unit slots: quarter-local source ranks into the sorted unit list
    q_iota = jnp.arange(cap_q, dtype=jnp.int32)
    sid_c = jnp.clip(qsub, 0, n_sub - 1)
    st_q = starts[sid_c]
    qo_q = q_off[sid_c]
    cs_q = c_s[sid_c]
    rank_q = (q_iota - qo_q) * upq  # first unit rank of this quarter
    u_iota = jnp.arange(cap_u, dtype=jnp.int32)
    rank = jnp.repeat(rank_q, upq) + (u_iota % upq)
    src = jnp.repeat(st_q, upq) + rank
    live = rank < jnp.repeat(cs_q, upq)
    units_out = jnp.where(
        live & (rank >= 0),
        sorted_units[jnp.clip(src, 0, sorted_units.shape[0] - 1)],
        -1,
    )

    overflow = jnp.maximum(n_chunks - cap_chunks, 0).astype(jnp.int32)
    return SubtileBinned(
        units=units_out,
        qsub=qsub.astype(jnp.int32),
        pair_start=pair_start,
        pair_cnt=ch_pair.astype(jnp.int32),
        n_chunks=n_chunks,
        s_mask8=s_mask8,
        overflow=overflow,
    )


# ---------------------------------------------------------------------------
# slab prep + kernels


def _batch_pairs(pair_start: jax.Array, n_batches: int, kb: int,
                 n_pairs: int) -> jax.Array:
    """(n_batches,) tile-pair index of each kb-chunk batch.

    Pair ranges are kb-aligned and partition [0, n_chunks) in pair
    order, so every batch belongs to exactly one pair; batches beyond
    n_chunks clamp to the last pair (their chunks hold sentinel ids and
    contribute nothing).  Empty pairs share their successor's start and
    are never returned (searchsorted-right skips ties).
    """
    chunk0 = jnp.arange(n_batches, dtype=jnp.int32) * kb
    return jnp.clip(
        jnp.searchsorted(pair_start, chunk0, side="right").astype(
            jnp.int32
        )
        - 1,
        0,
        n_pairs - 1,
    )


def prep_s_slab(sb: SubtileBinned, planes: jax.Array, config, ntx0p: int):
    """CSR level-S slab (cap_chunks, 6, 5*CHUNK).

    Lane layout per chunk: [e0 | e1 | e2 | w] plane blocks of 128
    candidate rows each (rows 0-2 bf16-hi of (a, b, c_local), 3-5 the
    bf16-lo halves — the kernel's one K=6 [hi; lo] dot, exactly the L0
    slab's number format) then a 128-lane id block whose rows 0-2 are
    base-256 face-id digits.  Plane coefficients are localized to each
    candidate's SUB-TILE origin, so one fixed (8, sw)-local pixel matrix
    serves every quarter.
    """
    from geograypher_tpu.ops.pallas_raster import _split_hi_lo

    sh, sw = config.subtile
    sbb = config.s_block
    spt = config.tile_w // sw
    ntx_s = ntx0p * spt
    n_faces = planes.shape[0]
    n_units = n_faces // sbb
    sentinel = jnp.asarray(
        [0, 0, -1, 0, 0, -1, 0, 0, -1, 0, 0, 0], planes.dtype
    )
    # coefficient-major unit rows ([coef0 x sbb | coef1 x sbb | ...])
    pe = jnp.concatenate(
        [
            planes.T.reshape(12, n_units, sbb)
            .transpose(1, 0, 2)
            .reshape(n_units, sbb * 12),
            jnp.repeat(sentinel, sbb)[None],
        ],
        axis=0,
    )
    units = sb.units  # (cap_chunks * (CHUNK // sbb),)
    cap_chunks = units.shape[0] * sbb // CHUNK
    safe = jnp.where(units >= 0, units, n_units)
    p2 = pe[safe].reshape(-1, 12, sbb)  # (cap_u, 12, sbb)

    def coef(k):  # (cap_chunks, CHUNK) candidate-minor
        return p2[:, k, :].reshape(cap_chunks, CHUNK)

    # per-slot sub-tile origins (quarter -> 32 slots)
    sid = jnp.repeat(sb.qsub, QUARTER).reshape(cap_chunks, CHUNK)
    x0 = ((sid % ntx_s) * sw).astype(jnp.float32)
    y0 = ((sid // ntx_s) * sh).astype(jnp.float32)

    # per-slot face ids; empty slots get digit id 2^24 - 1 (sentinel
    # planes already make them coverage-false)
    offs = jnp.arange(sbb, dtype=jnp.int32)
    fid = jnp.where(
        (units >= 0)[:, None], units[:, None] * sbb + offs, (1 << 24) - 1
    ).reshape(cap_chunks, CHUNK)
    digs = (
        (fid % 256).astype(jnp.float32),
        ((fid // 256) % 256).astype(jnp.float32),
        (fid // 65536).astype(jnp.float32),
    )

    his, los = [], []
    for p in range(4):
        a, b, cc = coef(3 * p), coef(3 * p + 1), coef(3 * p + 2)
        c_local = a * x0 + b * y0 + cc
        hi3, lo3 = [], []
        for v in (a, b, c_local):
            h, l = _split_hi_lo(v)
            hi3.append(h)
            lo3.append(l)
        his.append(hi3)
        los.append(lo3)
    zeros = jnp.zeros((cap_chunks, CHUNK), jnp.float32)
    rows = []
    for r in range(6):
        half, j = (his, r) if r < 3 else (los, r - 3)
        pieces = [half[p][j] for p in range(4)]
        pieces.append(digs[r] if r < 3 else zeros)
        rows.append(jnp.concatenate(pieces, axis=1))
    return jnp.stack(rows, axis=1)  # (cap_chunks, 6, 5*CHUNK)


def s_raster_pallas(
    sb: SubtileBinned,
    planes: jax.Array,
    config,
    image_h: int,
    image_w: int,
    ntx0p: int,
    pair: int,
    kb: int = 4,
    slab: jax.Array = None,
):
    """Level-S z-pass: resolve every S candidate against its own sub-tile.

    Returns IMAGE-layout ``(best_w, best_id)`` planes of shape
    (nty0p, tile_h, ntx0p * tile_w) f32 — the L0 kernel's carry init.

    Grid: ONE dimension over kb-chunk batches of the concatenated CSR
    chunk list — every step does real work (a dense (pair, steps) grid
    would pay the census WORST-pair step count at every pair).  Pair
    ranges are kb-aligned, so each batch belongs to one tile pair; a
    scalar-prefetched batch->pair map drives the output index map.
    Sub-tile carries live in a (pair*spt, 128) VMEM scratch reset at
    each pair transition and written through to the pair's output block
    every step (the block flushes to HBM when the map changes).  Pairs
    with no S chunks are never visited — the caller masks their rows to
    (-inf, -1) on the XLA side via ``pair_cnt``.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from geograypher_tpu.ops.pallas_raster import NEG_INF

    sh, sw = config.subtile
    spt = config.tile_w // sw
    npx = ntx0p // pair
    n_pairs = sb.pair_start.shape[0]
    nty0p = n_pairs // npx
    if slab is None:
        slab = prep_s_slab(sb, planes, config, ntx0p)
    cap_chunks = slab.shape[0]
    if cap_chunks % kb:
        raise ValueError("s_cap_chunks must be a multiple of kb")
    n_batches = cap_chunks // kb
    nsub_step = pair * spt
    bp = _batch_pairs(sb.pair_start, n_batches, kb, n_pairs)

    def kernel(bp_ref, qs_ref, slab_ref, w_ref, id_ref, scr_w, scr_id):
        k = pl.program_id(0)
        pidx = bp_ref[k]
        prev = bp_ref[jnp.maximum(k - 1, 0)]

        @pl.when((k == 0) | (pidx != prev))
        def _():
            scr_w[...] = jnp.full((nsub_step, CHUNK), NEG_INF, jnp.float32)
            scr_id[...] = jnp.full((nsub_step, CHUNK), -1.0, jnp.float32)

        pix = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
        xs = (pix % sw).astype(jnp.float32) + 0.5
        ys = (pix // sw).astype(jnp.float32) + 0.5
        ones = jnp.ones_like(xs)
        pmat = jnp.concatenate([xs, ys, ones], axis=0)
        pmat2 = jnp.concatenate([pmat, pmat], axis=0)  # (6, 128)
        _ri = jax.lax.broadcasted_iota(jnp.int32, (3, 1), 0)
        w256 = jnp.where(
            _ri == 0, 1.0, jnp.where(_ri == 1, 256.0, 65536.0)
        ).astype(jnp.bfloat16)
        sub_iota = jax.lax.broadcasted_iota(
            jnp.int32, (nsub_step, CHUNK), 0
        )
        sub_base = (pidx // npx) * ntx0p * spt + (pidx % npx) * pair * spt

        w_cur = scr_w[...]
        id_cur = scr_id[...]
        for b in range(kb):
            ci = k * kb + b
            # cap-padding chunks hold sentinel planes (qmax = -inf) and
            # out-of-range qsub rows: both update nothing — no branch
            lhs = slab_ref[b, :, : 4 * CHUNK]  # (6, 512)
            vals = jax.lax.dot_general(
                lhs, pmat2, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (512, 128) = hi@p + lo@p
            e0 = vals[0 * CHUNK:1 * CHUNK]
            e1 = vals[1 * CHUNK:2 * CHUNK]
            e2 = vals[2 * CHUNK:3 * CHUNK]
            wv = vals[3 * CHUNK:4 * CHUNK]
            emin = jnp.minimum(jnp.minimum(e0, e1), e2)
            wm = jnp.where(emin >= 0, wv, NEG_INF)
            idcol = jax.lax.dot_general(
                slab_ref[b, 0:3, 4 * CHUNK:5 * CHUNK].astype(
                    jnp.bfloat16
                ),
                w256,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (128, 1) exact f32 face ids
            # per-quarter segmented max over the 32 candidate rows
            qmax = jnp.max(
                wm.reshape(4, QUARTER, CHUNK), axis=1
            )  # (4, 128)
            cmaxb = jnp.broadcast_to(
                qmax[:, None, :], (4, QUARTER, CHUNK)
            ).reshape(CHUNK, CHUNK)
            neg_id = jnp.where(wm >= cmaxb, -idcol, NEG_INF)
            qid = -jnp.max(
                neg_id.reshape(4, QUARTER, CHUNK), axis=1
            )  # (4, 128)
            for q in range(4):
                loc = qs_ref[ci * 4 + q] - sub_base
                qw = qmax[q:q + 1]
                upd = (sub_iota == loc) & (qw > w_cur)
                w_cur = jnp.where(upd, qw, w_cur)
                id_cur = jnp.where(upd, qid[q:q + 1], id_cur)
        scr_w[...] = w_cur
        scr_id[...] = id_cur
        # write-through every step: the block only flushes to HBM when
        # the output index (the pair) changes, so the last batch of each
        # pair is what lands
        w_ref[0] = w_cur
        id_ref[0] = id_cur

    out_block = pl.BlockSpec(
        (1, nsub_step, CHUNK),
        lambda k, bp, qs: (bp[k] // npx, bp[k] % npx, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_batches,),
        in_specs=[
            pl.BlockSpec(
                (kb, 6, 5 * CHUNK), lambda k, *_: (k, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[out_block, out_block],
        scratch_shapes=[
            pltpu.VMEM((nsub_step, CHUNK), jnp.float32),
            pltpu.VMEM((nsub_step, CHUNK), jnp.float32),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((nty0p, ntx0p * spt, CHUNK), jnp.float32),
        jax.ShapeDtypeStruct((nty0p, ntx0p * spt, CHUNK), jnp.float32),
    ]
    operands = jax.lax.optimization_barrier((bp, sb.qsub, slab))
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=jax.default_backend() == "cpu",
    )(*operands)
    outs = jax.lax.optimization_barrier(tuple(outs))
    # pairs with no S chunks were never visited — mask their rows to the
    # empty carry (their output blocks are uninitialized memory).  Pairs
    # whose chunk range starts at/beyond an undersized cap_chunks are
    # equally unvisited: mask them too, so cap overflow degrades to
    # DETERMINISTIC dropped candidates (reported via sb.overflow, same
    # contract as the L0..L3 caps) instead of garbage carries.
    occ = (
        (sb.pair_cnt > 0) & (sb.pair_start < cap_chunks)
    ).reshape(nty0p, npx)[:, :, None, None]
    fills = (jnp.float32(NEG_INF), jnp.float32(-1.0))
    outs = tuple(
        jnp.where(
            occ, o.reshape(nty0p, npx, nsub_step, CHUNK), fill
        ).reshape(nty0p, ntx0p * spt, CHUNK)
        for o, fill in zip(outs, fills)
    )
    return tuple(
        subtile_to_image(o, config, nty0p, ntx0p) for o in outs
    )


def subtile_to_image(o: jax.Array, config, nty0p: int, ntx0p: int):
    """(nty0p, ntx0p*spt, 128) sub-tile-major -> row-image layout
    (nty0p, tile_h, ntx0p*tile_w).  Row T*spt+s lane y*sw+x maps to image
    row y, lane T*tile_w + s*sw + x."""
    sh, sw = config.subtile
    th, tw = config.tile_h, config.tile_w
    spt = tw // sw
    return (
        o.reshape(nty0p, ntx0p, spt, th, sw)
        .transpose(0, 3, 1, 2, 4)
        .reshape(nty0p, th, ntx0p * tw)
    )


def image_to_subtile(img: jax.Array, config, nty0p: int, ntx0p: int):
    """Inverse of :func:`subtile_to_image`."""
    sh, sw = config.subtile
    th, tw = config.tile_h, config.tile_w
    spt = tw // sw
    return (
        img.reshape(nty0p, th, ntx0p, spt, sw)
        .transpose(0, 2, 3, 1, 4)
        .reshape(nty0p, ntx0p * spt, th * sw)
    )


def s_entry_ids(sb: SubtileBinned, config) -> jax.Array:
    """(cap_chunks, 128) int32 face ids in the S chunk-slot layout.

    The fold-entry twin of the counts :func:`s_count_pallas` emits:
    slot c of chunk i holds the face id the kernel matched there, or -1
    for empty/pad slots (inert in the face-block fold's radix deposit).
    A face appearing in several sub-tile cells appears in several
    chunks; each counts a disjoint pixel set, so the fold's sum is
    exact.
    """
    sbb = config.s_block
    offs = jnp.arange(sbb, dtype=jnp.int32)
    fid = jnp.where(
        (sb.units >= 0)[:, None], sb.units[:, None] * sbb + offs, -1
    )
    return fid.reshape(-1, CHUNK)


def s_count_pallas(
    sb: SubtileBinned,
    slab: jax.Array,
    p2f_tiles: jax.Array,
    class_image: jax.Array,
    config,
    image_h: int,
    image_w: int,
    ntx0p: int,
    pair: int,
    kp: int,
    kb: int = 4,
):
    """Per-chunk (class, slot) pixel counts for the level-S candidates.

    The S counterpart of the L0 kernel's fused class counting: final
    winner ids (``p2f_tiles``, the raster kernel's row-image output)
    are matched against each S chunk's candidate ids — every quarter's
    32 slots against its own sub-tile's 128 pixels — and a one-hot
    class contraction turns matches into counts.  Output
    (cap_chunks, kp, 128) f32 rides the face-block fold as one more
    entry level (ids from :func:`s_entry_ids`).

    Grid: ONE dimension over kb-chunk batches.  Pair ranges are
    kb-aligned, so every batch belongs to exactly one tile pair; a
    scalar-prefetched batch->pair map drives the p2f/class block index
    maps (consecutive same-pair batches keep their block, no re-DMA),
    and each batch writes its own distinct output block — no revisiting
    and no clamped-map write hazards.  Chunks beyond ``n_chunks`` hold
    sentinel ids and produce zero counts.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sh, sw = config.subtile
    spt = config.tile_w // sw
    th, tw = config.tile_h, config.tile_w
    npx = ntx0p // pair
    n_pairs = sb.pair_start.shape[0]
    nty0p = n_pairs // npx
    nsub_step = pair * spt
    ntx_s = ntx0p * spt

    # digit rows only (3, CHUNK) per chunk — the slab's id block
    digs = slab[:, 0:3, 4 * CHUNK:5 * CHUNK]
    cap_chunks = digs.shape[0]
    if cap_chunks % kb:
        raise ValueError("s_cap_chunks must be a multiple of kb")
    n_batches = cap_chunks // kb

    bp = _batch_pairs(sb.pair_start, n_batches, kb, n_pairs)

    # class image in the kernel's row-image layout, -1 beyond extent,
    # then relayouted to the sub-tile-major rows the kernel indexes
    cls_pad = jnp.full((nty0p * th, ntx0p * tw), -1, jnp.int32)
    cls_pad = cls_pad.at[:image_h, :image_w].set(
        class_image.astype(jnp.int32)[:image_h, :image_w]
    )
    cls_sub = image_to_subtile(
        cls_pad.reshape(nty0p, th, ntx0p * tw), config, nty0p, ntx0p
    )
    p2f_sub = image_to_subtile(
        p2f_tiles.astype(jnp.float32), config, nty0p, ntx0p
    )

    def kernel(bp_ref, qs_ref, digs_ref, p2f_ref, cls_ref, out_ref):
        k = pl.program_id(0)
        pidx = bp_ref[k]
        i = pidx // npx
        j = pidx % npx
        sub_base = i * ntx_s + j * pair * spt
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
        cls_iota = jax.lax.broadcasted_iota(jnp.int32, (kp, CHUNK), 0)
        w3 = jnp.ones((3, 1), jnp.bfloat16)

        for b in range(kb):
            ci = k * kb + b
            d = digs_ref[b]  # (3, CHUNK)
            ids_row = d[0:1] + 256.0 * d[1:2] + 65536.0 * d[2:3]
            cnt = jnp.zeros((kp, CHUNK), jnp.float32)
            for q in range(4):
                loc = jnp.clip(
                    qs_ref[ci * 4 + q] - sub_base, 0, nsub_step - 1
                )
                wrow = p2f_ref[0, pl.ds(loc, 1), :]  # (1, 128) winner ids
                crow = cls_ref[0, pl.ds(loc, 1), :]  # (1, 128) classes
                # exact lane->sublane transpose of the winner ids via the
                # 3-way bf16 digit split (ids < 2^24; -1 background stays
                # exactly -1 and matches nothing)
                b1 = wrow.astype(jnp.bfloat16).astype(jnp.float32)
                r = wrow - b1
                b2 = r.astype(jnp.bfloat16).astype(jnp.float32)
                b3 = r - b2
                dw = jnp.concatenate([b1, b2, b3], axis=0).astype(
                    jnp.bfloat16
                )
                wcol = jax.lax.dot_general(
                    dw, w3, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (128, 1)
                qmask = (lane // QUARTER) == q
                m = ((wcol == ids_row) & qmask).astype(jnp.bfloat16)
                onehot = (cls_iota == crow).astype(jnp.bfloat16)
                cnt = cnt + jax.lax.dot_general(
                    onehot, m, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (kp, CHUNK)
            # counts <= 128 (one sub-tile's pixels) are bf16-EXACT; the
            # halved entry stack is what lets ~20 views' S entries stay
            # live through the grouped fold without OOMing HBM
            out_ref[b] = cnt.astype(jnp.bfloat16)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_batches,),
        in_specs=[
            pl.BlockSpec(
                (kb, 3, CHUNK), lambda k, *_: (k, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, nsub_step, CHUNK),
                lambda k, bp, qs: (bp[k] // npx, bp[k] % npx, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, nsub_step, CHUNK),
                lambda k, bp, qs: (bp[k] // npx, bp[k] % npx, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (kb, kp, CHUNK), lambda k, *_: (k, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    operands = jax.lax.optimization_barrier(
        (bp, sb.qsub, digs, p2f_sub, cls_sub)
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (cap_chunks, kp, CHUNK), jnp.bfloat16
        ),
        grid_spec=grid_spec,
        interpret=jax.default_backend() == "cpu",
    )(*operands)
    return jax.lax.optimization_barrier(out)
