"""Census-bucketed aggregation planner: the flagship multi-view plan as a
library component.

This is the production home of the plan that delivers the benchmark rate
(per-view exact binning census, cap bucketing with a bounded merge, view-
exact entry/occupied-pair sizing, grouped per-bucket fold programs).  The
reference keeps ALL of its performance behind its public API
(meshes.py:1971 ``aggregate_projected_images``); until round 5 this
rebuild's fastest path lived only in ``bench.py`` — now ``bench.py`` is a
thin caller of this module, and :class:`PlannedAggregator` is reachable
from ``TexturedMesh`` and the distributed pipeline.

Why bucketing: every static capacity (per-tile candidate caps, fold
windows, entry compaction, occupied-pair grids) must cover the WORST view
it runs, and on a mixed nadir/oblique survey the worst oblique's caps make
every nadir view pay ~1.5x its own cost (measured: a nadir view at L0 cap
96 runs 83 ms vs 55 at its own cap 48 — docs/DESIGN.md round 4).  Views
are therefore censused individually (exact, ~18 ms/view), bucketed by
rounded caps, and each bucket runs its own statically-shaped jit program.

Overflow doctrine (VERDICT r4 #6): a group whose fold/entry/binning
capacity would drop counts contributes NOTHING to the accumulator (the
program gates its contribution on ``overflow == 0``), reports the
overflow, and the runner re-censuses exactly those views, re-sizes the
bucket config, and re-runs just those groups — a survey never raises
after partial work and never silently drops counts.

All jitted programs are built through ``functools.lru_cache`` keyed on
their full static configuration, so repeated calls (and the benchmark's
warm/timed pairs) never recompile.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import time
import typing

import numpy as np

import jax
import jax.numpy as jnp

from geograypher_tpu.ops.rasterize import (
    RasterConfig,
    bin_all,
    bin_triangles,
    fused_counts_pallas,
    l0_face_ids,
    l0_geometry,
    setup_from_soa,
)

logger = logging.getLogger(__name__)

# packed per-view parameter row: [w2c (16), f, dist (8), pcx, pcy, valid]
PROW = 28

# coarse rounding grid for bucket keys: views whose margined caps round to
# the same grid point share one compiled program (compiles through this
# environment's remote compiler cost minutes each — fine granularity would
# never pay for itself)
CAP_GRID = (16, 32, 48, 64, 96, 128, 192, 256, 384, 512, 768, 1024)


def pack_view_params(
    world_to_cam: np.ndarray,
    f: np.ndarray,
    distortion: typing.Optional[np.ndarray] = None,
    cx: typing.Optional[np.ndarray] = None,
    cy: typing.Optional[np.ndarray] = None,
    valid: typing.Optional[np.ndarray] = None,
) -> np.ndarray:
    """(N, 28) float32 packed per-view parameter rows.

    One packed row array means exactly ONE host->device transfer per step
    for all camera scalars.  Layout: [w2c (16), f, dist8, pcx, pcy, valid].
    """
    n = np.asarray(f).shape[0]
    z = np.zeros((n, 1), np.float32)
    return np.concatenate(
        [
            np.asarray(world_to_cam, np.float32).reshape(n, 16),
            np.asarray(f, np.float32).reshape(n, 1),
            (
                np.asarray(distortion, np.float32).reshape(n, 8)
                if distortion is not None
                else np.zeros((n, 8), np.float32)
            ),
            np.asarray(cx, np.float32).reshape(n, 1) if cx is not None else z,
            np.asarray(cy, np.float32).reshape(n, 1) if cy is not None else z,
            (
                np.asarray(valid, np.float32).reshape(n, 1)
                if valid is not None
                else np.ones((n, 1), np.float32)
            ),
        ],
        axis=1,
    )


def pack_camera_batch(batch, valid: np.ndarray) -> np.ndarray:
    """Pack a ``CameraBatch`` into (N, 28) parameter rows."""
    n = valid.shape[0]
    return pack_view_params(
        np.asarray(batch.world_to_cam, np.float32),
        np.asarray(batch.f, np.float32).reshape(n),
        np.asarray(batch.distortion, np.float32).reshape(n, 8),
        np.asarray(batch.cx, np.float32).reshape(n),
        np.asarray(batch.cy, np.float32).reshape(n),
        valid.astype(np.float32).reshape(n),
    )


def unpack_row(row: jax.Array, use_dist: bool):
    """One packed parameter row -> (w2c, f, distortion-or-None, valid)."""
    w2c = row[:16].reshape(4, 4)
    f = row[16]
    distortion = (row[17:25], row[25], row[26]) if use_dist else None
    return w2c, f, distortion, row[27]


# ---------------------------------------------------------------------------
# Plan data model
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class BucketPlan:
    """One census bucket: its sized config and the views it runs."""

    config: RasterConfig  # fully sized (caps, entry_caps, occ_pairs, S)
    view_indices: typing.Tuple[int, ...]
    # worst per-block fold-window demand over probed views, PER FOLD
    # LEVEL (L0, L1, L2+global, S) — see agg_tiled.level_fold_windows
    max_win: typing.Tuple[int, int, int, int]


@dataclasses.dataclass(frozen=True)
class AggregationPlan:
    """A compiled-shape plan for one survey's aggregation."""

    buckets: typing.Tuple[BucketPlan, ...]
    image_h: int
    image_w: int
    n_faces: int
    use_dist: bool
    n_views: int
    plan_seconds: float  # census + sizing device time (the "cold" cost)
    # True when built from a sampled census: un-censused views may exceed
    # their bucket's caps/entry caps, which the runner's overflow gating +
    # finalize() retry covers — the warm check must TOLERATE cap overflow
    # on such plans instead of shrinking the group (it cannot help)
    sampled: bool = False

    @property
    def cover_config(self) -> RasterConfig:
        """ONE config whose binning caps cover every view (elementwise max
        over buckets) with the view-exact sizings dropped — for downstream
        consumers that need a single static shape (e.g. the streaming
        pipeline sizes its own fold/entry caps)."""
        caps = tuple(
            max(b.config.caps[i] for b in self.buckets) for i in range(4)
        )
        return dataclasses.replace(
            self.buckets[0].config, caps=caps, entry_caps=None,
            occ_pairs=None,
        )


# ---------------------------------------------------------------------------
# Jitted probe programs (lru-cached per static configuration)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _build_census(census_cfg: RasterConfig, use_dist: bool, w: int, h: int):
    """Per-view exact binning census: (level maxes (4,), s_tot, s_worst)."""
    subtile_on = census_cfg.subtile is not None
    if subtile_on:
        s_pair, _, s_ntx0p = l0_geometry(census_cfg, h, w)

    @jax.jit
    def census(tri_soa, row):
        w2c_k, f_k, dist_k, _ = unpack_row(row, use_dist)
        setup = setup_from_soa(
            tri_soa, w2c_k, f_k, w, h, census_cfg.znear, distortion=dist_k
        )
        if not subtile_on:
            lvl = bin_triangles(setup, census_cfg, h, w, return_census=True)
            z = jnp.zeros((), jnp.int32)
            return lvl, z, z
        from geograypher_tpu.ops.subtile import (
            subtile_counts_census,
            subtile_mask8,
        )

        mask = subtile_mask8(setup, census_cfg)
        s_tot, s_worst = subtile_counts_census(
            setup, census_cfg, h, w, s_ntx0p, s_pair, kb=census_cfg.s_kb
        )
        lvl = bin_triangles(
            setup, census_cfg, h, w, return_census=True, exclude_blocks=mask
        )
        return lvl, s_tot, s_worst

    return census


@functools.lru_cache(maxsize=32)
def _build_window_stats(
    config: RasterConfig, use_dist: bool, w: int, h: int, n_faces: int
):
    """Per-view fold/entry/occupied-pair demand under a bucket config:
    (per-level windows (4,), binning overflow, entry occupancy (3,),
    occupied pairs).  Windows are probed PER FOLD LEVEL
    (agg_tiled.level_fold_windows): the L2+global level's demand is
    structurally larger than L0's whenever the global census level is
    non-empty (irregular TINs), and an L0-only probe undersized the
    grouped fold by ~1000 entries on the round-5 irregular benchmark."""
    from geograypher_tpu.ops.agg_tiled import (
        entry_occupancy,
        level_fold_windows,
    )
    from geograypher_tpu.ops.rasterize import _occupied_pairs

    pair_, nty0p_, ntx0p_ = l0_geometry(config, h, w)
    n_pairs_tot = nty0p_ * (ntx0p_ // pair_)

    @jax.jit
    def window_stats(tri_soa, row):
        w2c_k, f_k, dist_k, _ = unpack_row(row, use_dist)
        setup = setup_from_soa(
            tri_soa, w2c_k, f_k, w, h, config.znear, distortion=dist_k
        )
        binned, sb = bin_all(setup, config, h, w)
        wins = level_fold_windows(binned, config, h, w, n_faces, sb=sb)
        bin_over = binned.overflow
        if sb is not None:
            bin_over = bin_over + sb.overflow
        _pids, occ_mask, _oo = _occupied_pairs(
            setup, binned, sb,
            dataclasses.replace(config, occ_pairs=n_pairs_tot), h, w,
        )
        return (
            wins, bin_over, entry_occupancy(binned, config, h, w),
            jnp.sum(occ_mask.astype(jnp.int32)),
        )

    return window_stats, n_pairs_tot


# ---------------------------------------------------------------------------
# Planning
# ---------------------------------------------------------------------------


def _margin_caps(lvl: np.ndarray, margin: float) -> tuple:
    """Censused per-level maxes -> margined, 16-aligned cap tuple."""
    return tuple(
        int(max(16, -(-int(np.ceil(c * margin)) // 16) * 16)) for c in lvl
    )


def _bucket_key(caps: tuple) -> tuple:
    return tuple(
        min((g for g in CAP_GRID if g >= c), default=c) for c in caps
    )


def _merge_buckets(buckets: dict, max_buckets: int) -> dict:
    """Merge the smallest buckets until <= max_buckets remain.

    Each merge moves the smallest-view-count bucket into whichever other
    bucket minimizes the added static-shape work (sum of elementwise-max
    caps weighted by merged view count)."""
    while len(buckets) > max(1, max_buckets):
        keys = sorted(buckets, key=lambda key: (len(buckets[key]), sum(key)))
        src = keys[0]

        def merge_cost(dst):
            merged = tuple(max(a, b) for a, b in zip(src, dst))
            return sum(merged) * (len(buckets[src]) + len(buckets[dst])) - (
                sum(src) * len(buckets[src]) + sum(dst) * len(buckets[dst])
            )

        dst = min((key for key in keys[1:]), key=merge_cost)
        merged_key = tuple(max(a, b) for a, b in zip(src, dst))
        views_merged = buckets.pop(src) + buckets.pop(dst)
        buckets.setdefault(merged_key, []).extend(views_merged)
    return buckets


def census_config_of(config: RasterConfig) -> RasterConfig:
    """The config the census/probe programs run under: same geometry
    (bin_block, windows, levels, subtile cells), sizing fields cleared."""
    return dataclasses.replace(
        config, caps=(8, 8, 8, 8), entry_caps=None, occ_pairs=None,
        s_cap_chunks=None, s_pair_chunks=None,
    )


def plan_aggregation(
    tri_soa: jax.Array,
    params: np.ndarray,
    config: RasterConfig,
    image_h: int,
    image_w: int,
    n_faces: int,
    *,
    use_dist: bool = False,
    max_buckets: int = 4,
    cap_margin: float = 1.25,
    entry_margin: float = 1.25,
    census_sample: typing.Optional[int] = None,
    sample_extra_margin: float = 1.4,
) -> AggregationPlan:
    """Census views, bucket them, and size each bucket's static shapes.

    Args:
        tri_soa: (9, F_pad) device coordinate rows (``tri_to_soa``).
        params: (N, 28) packed view rows (:func:`pack_view_params`).
        config: base RasterConfig (geometry fields are honored; sizing
            fields — caps, entry_caps, occ_pairs, S caps — are replaced
            by censused values per bucket).
        census_sample: census only this many evenly-spaced views (plus
            first/last) instead of all N.  Un-censused views adopt the
            caps of their nearest censused neighbor, every capacity gets
            ``sample_extra_margin`` on top, and the runner's overflow
            gating + resize-retry covers the tail.  Use for 1000-view
            surveys where an exact 18 ms/view census pass would rival the
            aggregation itself.

    Returns an :class:`AggregationPlan`; ``plan_seconds`` records the
    census + sizing wall time (the honest "cold" cost — compiles of the
    probe programs excluded, they are cached across calls).
    """
    n_views = params.shape[0]
    if n_views == 0:
        raise ValueError("no views to plan")
    t_plan0 = time.perf_counter()

    census_cfg = census_config_of(config)
    subtile_on = config.subtile is not None
    if subtile_on and census_cfg.backend != "pallas":
        raise ValueError("subtile planning requires the pallas backend")
    census = _build_census(census_cfg, use_dist, image_w, image_h)

    sampled = (
        census_sample is not None and 0 < census_sample < n_views
    )
    if sampled:
        idx = np.unique(
            np.round(np.linspace(0, n_views - 1, census_sample)).astype(int)
        )
        census_idx = [int(i) for i in idx]
        extra = sample_extra_margin
    else:
        census_idx = list(range(n_views))
        extra = 1.0

    params_dev = jnp.asarray(params)
    view_caps: dict = {}
    view_s: dict = {}
    # dispatch every census asynchronously, then ONE host fetch for the
    # stacked results: per-view np.asarray round trips through the dev
    # tunnel (~100 ms each) dominated plan_seconds at 20+ views
    results = [census(tri_soa, params_dev[k]) for k in census_idx]
    lvls = np.asarray(jnp.stack([r[0] for r in results]))
    s_stats = np.asarray(
        jnp.stack([jnp.stack([r[1], r[2]]) for r in results])
    )
    for i, k in enumerate(census_idx):
        view_caps[k] = _margin_caps(lvls[i], cap_margin * extra)
        view_s[k] = (int(s_stats[i, 0]), int(s_stats[i, 1]))
    if sampled:
        # nearest censused neighbor by view index: survey views are
        # ordered along flight lines, so adjacent views share pose regime
        carr = np.asarray(census_idx)
        for k in range(n_views):
            if k not in view_caps:
                near = int(carr[np.argmin(np.abs(carr - k))])
                view_caps[k] = view_caps[near]
                view_s[k] = view_s[near]

    buckets: dict = {}
    for k in range(n_views):
        buckets.setdefault(_bucket_key(view_caps[k]), []).append(k)
    buckets = _merge_buckets(buckets, max_buckets)
    logger.info(
        "census buckets: %s",
        ", ".join(f"{key} x{len(v)}" for key, v in buckets.items()),
    )

    plans = []
    for key, idxs in sorted(buckets.items()):
        config_b = dataclasses.replace(config, caps=key)
        if subtile_on:
            probed = [k for k in idxs if k in view_s] or idxs
            s_tot_w = max(view_s[k][0] for k in probed)
            s_pair_w = max(view_s[k][1] for k in probed)
            kb = config.s_kb
            s_cap = -(-int(np.ceil(s_tot_w * extra)) // kb) * kb
            s_pc = -(-int(np.ceil(s_pair_w * extra)) // kb) * kb
            config_b = dataclasses.replace(
                config_b, s_cap_chunks=max(s_cap, kb),
                s_pair_chunks=max(s_pc, kb),
            )
        window_stats, n_pairs_tot = _build_window_stats(
            config_b, use_dist, image_w, image_h, n_faces
        )
        probe_idx = [k for k in idxs if k in census_idx] or idxs[:1]
        # async dispatch + one stacked fetch (see census loop above)
        stats = [window_stats(tri_soa, params_dev[k]) for k in probe_idx]
        scal = np.asarray(
            jnp.stack(
                [jnp.stack([s[1], s[3]]) for s in stats]
            )
        )
        wins = np.asarray(jnp.stack([s[0] for s in stats]))
        occs = np.asarray(jnp.stack([s[2] for s in stats]))
        max_win = np.zeros(4, np.int64)
        max_occ = 0
        worst_entries = np.zeros(3, np.int64)
        for i, k in enumerate(probe_idx):
            bin_over = int(scal[i, 0])
            if bin_over and not sampled:
                # an exactly-censused view must fit its margined caps;
                # overflow here means the margin rounding lost to the
                # bucket merge — widen by retrying is the runner's job,
                # but for exact census this is a real sizing bug
                raise RuntimeError(
                    f"view {k}: rasterizer cap overflow ({bin_over} "
                    f"candidates dropped) under its own bucket caps {key}"
                )
            max_win = np.maximum(max_win, wins[i])
            max_occ = max(max_occ, int(scal[i, 1]))
            worst_entries = np.maximum(worst_entries, occs[i])
        entry_caps = tuple(
            int(8 * (-(-int(np.ceil(n * entry_margin * extra)) // 8)))
            for n in worst_entries
        )
        occ_cap = min(
            8 * (-(-int(np.ceil(max_occ * extra)) // 8)) + 8, n_pairs_tot
        )
        config_b = dataclasses.replace(
            config_b, entry_caps=entry_caps, occ_pairs=occ_cap
        )
        logger.info(
            "bucket %s: %d views, entry caps %s, occ pairs %d/%d, "
            "max windows %s", key, len(idxs), entry_caps, occ_cap,
            n_pairs_tot, max_win.tolist(),
        )
        plans.append(
            BucketPlan(
                config=config_b,
                view_indices=tuple(idxs),
                max_win=tuple(
                    int(np.ceil(v * extra)) for v in max_win
                ),
            )
        )

    return AggregationPlan(
        buckets=tuple(plans),
        image_h=image_h,
        image_w=image_w,
        n_faces=n_faces,
        use_dist=use_dist,
        n_views=n_views,
        plan_seconds=time.perf_counter() - t_plan0,
        sampled=sampled,
    )


def clear_program_caches() -> None:
    """Release every cached planner program (census/probe/grouped/single)
    AND their compiled executables (``jax.clear_caches``).

    A multi-survey runner (the benchmark's eight suites, a batch job over
    several missions) should call this between surveys: loaded TPU
    executables hold device memory, and the grouped 4K programs are large
    enough that a few surveys' worth accumulating exhausted the chip in
    round 5 (three bench metrics died RESOURCE_EXHAUSTED).  Re-running a
    cleared program costs a reload from the persistent compile cache, not
    a recompile."""
    _build_census.cache_clear()
    _build_window_stats.cache_clear()
    _build_group_step_counts.cache_clear()
    _build_group_step_weighted.cache_clear()
    _build_single_view_counts.cache_clear()
    jax.clear_caches()


# ---------------------------------------------------------------------------
# Grouped count programs
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=64)
def _build_group_step_counts(
    config: RasterConfig, g: int, w: int, h: int, n_faces: int,
    n_classes: int, w_cap: int, use_dist: bool,
):
    """One bucket's grouped program: g views' fused raster+count chains
    sharing ONE face-block fold launch, chained on a donated accumulator.

    The group's contribution is GATED on its total overflow (binning caps
    + S chunk caps + entry compaction + fold windows): an overflowing
    group adds zero and reports the count, so the accumulator stays clean
    for a resize-and-retry (module docstring).  Overflow returns SPLIT as
    ``(over_caps, over_fold)``: cap/entry overflow (re-census to fix) vs
    fold-window overflow (widen ``w_cap`` to fix) — the warm check's
    remedies differ and conflating them burned ~17 grouped compiles in
    round 5.  The view loop is python-unrolled and no XLA scatter
    consumes a Mosaic output (docs/DESIGN.md corruption doctrine)."""
    from geograypher_tpu.ops.agg_tiled import fold_tile_counts_grouped

    @functools.partial(jax.jit, donate_argnums=(3,))
    def group_step(tri_soa, params_g, labels_g, acc):
        views = []
        over_caps = jnp.zeros((), jnp.int32)
        for k in range(g):
            w2c_k, f_k, dist_k, _valid = unpack_row(params_g[k], use_dist)
            setup = setup_from_soa(
                tri_soa, w2c_k, f_k, w, h, config.znear, distortion=dist_k
            )
            binned, sb = bin_all(setup, config, h, w)
            outs = fused_counts_pallas(
                setup, binned, sb, labels_g[k], config, h, w, n_classes
            )
            over_caps = over_caps + binned.overflow
            if sb is not None:
                over_caps = over_caps + sb.overflow
            views.append((outs, binned))
        counts, over_fold, entry_over = fold_tile_counts_grouped(
            views, config, h, w, n_faces, n_classes,
            w_cap=w_cap, block=config.fold_block, return_overflow="split",
        )
        over_caps = over_caps + entry_over
        counts = jnp.where(over_caps + over_fold == 0, counts, 0.0)
        return acc + counts, over_caps, over_fold

    return group_step


@functools.lru_cache(maxsize=64)
def _build_group_step_weighted(
    config: RasterConfig, g: int, w: int, h: int, n_faces: int,
    n_classes: int, w_cap: tuple, use_dist: bool,
):
    """One bucket's grouped VIEW-WEIGHTED program: g views' fused
    raster+count chains, each followed by its OWN per-view fold and
    normalization (counts/total per face), accumulated into
    (value_sum, view_count) — the reference's ``aggregate_projected_images``
    semantics (meshes.py:2016-2051) at the bucketed flagship rate.

    Per-view folds share none of the grouped fold's launch amortization,
    but their window work is identical (windows are per-view either way);
    ``w_cap`` here is sized for ONE view.  The group's contribution is
    gated on its total overflow exactly like the pooled program."""
    from geograypher_tpu.ops.agg_tiled import fold_tile_counts

    @functools.partial(jax.jit, donate_argnums=(3, 4))
    def group_step(tri_soa, params_g, labels_g, acc, n_seen):
        over_caps = jnp.zeros((), jnp.int32)
        over_fold = jnp.zeros((), jnp.int32)
        contrib = jnp.zeros_like(acc)
        seen_c = jnp.zeros_like(n_seen)
        for k in range(g):
            w2c_k, f_k, dist_k, _valid = unpack_row(params_g[k], use_dist)
            setup = setup_from_soa(
                tri_soa, w2c_k, f_k, w, h, config.znear, distortion=dist_k
            )
            binned, sb = bin_all(setup, config, h, w)
            outs = fused_counts_pallas(
                setup, binned, sb, labels_g[k], config, h, w, n_classes
            )
            over_caps = over_caps + binned.overflow
            if sb is not None:
                over_caps = over_caps + sb.overflow
            counts_k, win_over, entry_over = fold_tile_counts(
                outs, binned, config, h, w, n_faces, n_classes,
                w_cap=w_cap, block=config.fold_block,
                return_overflow="split",
            )
            over_caps = over_caps + entry_over
            over_fold = over_fold + win_over
            counts_k = counts_k[:, :n_classes]
            tot = jnp.sum(counts_k, axis=1, keepdims=True)
            contrib = contrib + jnp.where(
                tot > 0, counts_k / jnp.maximum(tot, 1.0), 0.0
            )
            seen_c = seen_c + (tot[:, 0] > 0).astype(jnp.float32)
        gate = (over_caps + over_fold == 0).astype(jnp.float32)
        return (
            acc + gate * contrib, n_seen + gate * seen_c,
            over_caps, over_fold,
        )

    return group_step


class _SizingBug(RuntimeError):
    """Cap/entry overflow under an exactly-censused plan: neither widening
    nor a smaller group can fix it, so the group-size ladder must NOT
    retry — propagate to the caller."""


class _WarmOverflow(RuntimeError):
    """Warm-check overflow carrying the exact dropped-entry total, so the
    bucket builder can widen the fold windows by a GUARANTEED-sufficient
    amount (overflow sums per-block excesses, so ``cap + n_over`` covers
    the worst block) instead of abandoning the group size."""

    def __init__(self, msg: str, n_over: int):
        super().__init__(msg)
        self.n_over = n_over


def _group_w_cap(
    g: int, max_win, margin: float, entry_caps=None, extra: int = 0
) -> tuple:
    """Static per-level fold-window capacities for a g-view grouped fold.

    The ESTIMATE per level is ``g * max_win[level] * margin`` (8-aligned)
    — but merged-group windows are NOT subadditive in the per-view
    maxima: ``_block_windows`` windows are contiguous ranges of the
    tmax-sorted merged entry order, and one view's wide-band entry (the
    merged L2+global level always has some: global-list chunks span the
    whole mesh) extends every block's range past OTHER views'
    non-intersecting entries.  On the round-5 irregular-TIN benchmark the
    merged L2+global window exceeded the ``g x max`` estimate by exactly
    the views' total entry counts (~1080 entries), failing every warm
    check.

    The AIRTIGHT bound: with entry compaction on, a level's merged fold
    holds exactly ``g * entry_caps[level]`` rows, and no block window can
    exceed the total row count — so where that product is affordable
    (every level but L0; window capacity only costs gather padding, the
    kernel DMAs ``win_len`` actual entries) it replaces the estimate and
    makes window overflow at that level impossible.

    L0's airtight product is NOT affordable (its pad-row gather would
    double a multi-hundred-MB grouped stack), so L0 keeps the margined
    estimate — and the irregular-TIN benchmark's grouped L0 demand
    exceeded even that by ~9 % (the same wide-band mechanism).  ``extra``
    adds that many rows to every estimated (non-airtight) level, clamped
    at the airtight total: the warm check's overflow count is a
    guaranteed-sufficient ``extra`` because the per-block excesses it
    sums bound the worst block's shortfall."""
    if not isinstance(max_win, (tuple, list, np.ndarray)):
        max_win = (max_win,)
    ecs = tuple(entry_caps) if entry_caps else ()
    caps = []
    for lvl, v in enumerate(max_win):
        est = max(
            8,
            8 * ((int(np.ceil(g * int(v) * margin)) + int(extra) + 7) // 8),
        )
        if lvl < len(ecs) and ecs[lvl] is not None:
            tight = max(8, 8 * ((g * int(ecs[lvl]) + 7) // 8))
            if tight <= max(2 * est, 16384):
                est = tight  # airtight: overflow structurally impossible
            else:
                est = min(est, tight)  # never exceed the total row count
        caps.append(est)
    return tuple(caps)


@functools.lru_cache(maxsize=16)
def _build_single_view_counts(
    config: RasterConfig, w: int, h: int, n_faces: int, n_classes: int,
    use_dist: bool,
):
    """Standalone single-view fused program (the one structure never
    observed corrupt on this runtime) for the warmup integrity check."""
    from geograypher_tpu.ops.rasterize import fused_view_class_counts

    @jax.jit
    def one_view(tri_soa, row, label):
        w2c_k, f_k, dist_k, _ = unpack_row(row, use_dist)
        counts = fused_view_class_counts(
            tri_soa, w2c_k, f_k, row[17:25], row[25], row[26], label,
            w, h, config, n_faces, n_classes, use_dist,
        )[0]
        return jnp.sum(counts), jnp.sum(
            jnp.any(counts > 0, axis=1).astype(jnp.float32)
        )

    return one_view


# ---------------------------------------------------------------------------
# Execution
# ---------------------------------------------------------------------------


class PlannedAggregator:
    """Executes an :class:`AggregationPlan`: device-resident labels in,
    (n_faces, n_classes) pixel-count sums out.

    Semantics: by default the POOLED pixel-count aggregation (sum over
    views of each view's per-face per-class pixel counts), whose grouped
    path shares one fold across the group.  With ``weighted=True`` each
    view gets its own fold + per-face normalization (counts / total) and
    the accumulators are (value_sum, view_count) — EXACTLY the
    reference's view-weighted ``aggregate_projected_images`` semantics
    (meshes.py:2016-2051) at the bucketed rate; ``finalize()`` then
    returns the (value_sum, view_count) pair.

    Typical use::

        plan = plan_aggregation(tri_soa, params, config, H, W, n_faces)
        agg = PlannedAggregator(plan, n_classes, group=20)
        agg.prepare(tri_soa, params, labels)     # compiles + warm check
        acc = agg.run()                          # pure dispatch, device acc
        counts = agg.finalize()                  # overflow retry + fetch
    """

    def __init__(
        self,
        plan: AggregationPlan,
        n_classes: int,
        group: int = 20,
        window_margin: float = 1.25,
        warm_check: bool = True,
        max_retries: int = 2,
        retry_margin: float = 1.6,
        weighted: bool = False,
    ):
        self.plan = plan
        self.n_classes = n_classes
        self.group = max(1, int(group))
        self.window_margin = window_margin
        self.warm_check = warm_check
        self.max_retries = max_retries
        self.retry_margin = retry_margin
        self.weighted = weighted
        self._programs = None  # [(group_step, g, bucket)]
        self.resizes = 0  # buckets re-sized by the overflow retry

    # -- preparation -------------------------------------------------------

    def prepare(
        self, tri_soa, params: np.ndarray, labels, label_index=None
    ) -> None:
        """Bind inputs, build + warm every bucket program.

        ``labels`` is a device (or numpy) (M, H, W) integer class stack;
        it is padded with one all-ignore (-1) image for group padding.
        ``label_index`` maps view id -> row of ``labels`` (default: the
        identity, M == n_views) — a survey larger than device memory for
        its label stack can share rows.  Per bucket, group sizes fall
        back (g -> 10 -> 5 -> ... -> 1) if a size fails to produce sane
        output (the runtime's structure-dependent Mosaic corruption,
        docs/DESIGN.md) or OOMs.
        """
        plan = self.plan
        h, w = plan.image_h, plan.image_w
        self.tri_soa = tri_soa
        n = plan.n_views
        # device label stack in int8 when class ids fit (the raster kernel
        # widens per view at its input): a padded 4K 20-view int32 stack is
        # ~700 MB and round-5's bench OOMed its later suites on
        # accumulated stacks.  Out-of-range ids (>= 128) would wrap, but
        # they are ignore values either way (only 0..n_classes-1 count).
        ldt = jnp.int8 if self.n_classes <= 127 else jnp.int32
        if isinstance(labels, np.ndarray):
            labels = jnp.asarray(labels.astype(ldt))  # cast host-side
        else:
            labels = jnp.asarray(labels).astype(ldt)
        n_label_rows = labels.shape[0]
        self._labels_pad = jnp.concatenate(
            [labels, jnp.full((1, h, w), -1, ldt)], axis=0
        )
        if label_index is None:
            if n_label_rows != n:
                raise ValueError(
                    f"{n_label_rows} label rows for {n} views without a "
                    "label_index"
                )
            label_index = np.arange(n)
        # view id -> label row; the pad view id (n) -> the ignore image
        self._lidx = np.concatenate(
            [np.asarray(label_index, np.int64), [n_label_rows]]
        )
        params_pad = np.concatenate(
            [np.asarray(params, np.float32), params[:1]], axis=0
        )
        params_pad[n, PROW - 1] = 0.0
        # make the pad view rasterize NOTHING under any caps: negate the
        # camera-z row of its world_to_cam so every triangle lands behind
        # the near plane and is culled at setup
        params_pad[n, 8:12] = -params_pad[n, 8:12]
        self._params_pad = jnp.asarray(params_pad)

        self._programs = []
        for bucket in plan.buckets:
            built = self._build_bucket_program(bucket)
            self._programs.append(built)

    def _build_bucket_program(self, bucket: BucketPlan):
        plan = self.plan
        h, w = plan.image_h, plan.image_w
        idxs = bucket.view_indices
        g_tries = []
        for g in (min(self.group, len(idxs)), 10, 5, 4, 3, 2, 1):
            if 1 <= g <= len(idxs) and g not in g_tries:
                g_tries.append(g)
        last_err = None
        for g in g_tries:
            # widen-and-retry before shrinking the group: a warm window
            # overflow reports the exact dropped-entry total, and adding
            # it to the estimated windows is guaranteed sufficient (the
            # grouped L0 demand on irregular TINs runs ~9 % past the
            # margined per-view estimate — same wide-band mechanism as
            # the airtight levels, but L0's airtight bound costs too
            # much pad gather to use outright)
            extra_w = 0
            for _w_try in range(3):
                step = self._build_step(
                    bucket.config, g, bucket.max_win, 1.0, extra_w=extra_w
                )
                try:
                    self._warm_one(step, g, bucket)
                    return (step, g, bucket)
                except _WarmOverflow as e:
                    logger.warning(
                        "bucket %s group=%d: %s; widening fold windows by "
                        "%d", bucket.config.caps, g, e, e.n_over,
                    )
                    last_err = f"{e}"
                    extra_w += e.n_over
                    step = None
                except _SizingBug:
                    raise  # no group size can fix a cap-sizing bug
                except (RuntimeError, jax.errors.JaxRuntimeError) as e:
                    logger.warning(
                        "bucket %s group=%d failed warm check (%s); "
                        "retrying smaller", bucket.config.caps, g, e,
                    )
                    last_err = f"{e}"
                    oom = "RESOURCE_EXHAUSTED" in str(e)
                    e = None
                    step = None
                    import gc

                    gc.collect()
                    if oom:
                        # failed grouped executables (this attempt's and
                        # earlier widen attempts') hold device memory;
                        # release them before trying a smaller group, or
                        # every following size inherits the exhaustion
                        # (round-5: one bucket's failures poisoned three
                        # whole bench metrics).  Live buckets reload from
                        # the persistent compile cache.
                        jax.clear_caches()
                    break
        raise RuntimeError(
            f"bucket {bucket.config.caps}: all group sizes produced "
            f"corrupted output (last: {last_err})"
        )

    def _build_step(
        self, config, g: int, max_win, extra_margin: float,
        extra_w: int = 0,
    ):
        """The bucket's grouped program for this aggregator's semantics.

        Pooled: one fold shared by the whole group (w_cap scales with g).
        Weighted: per-view folds (w_cap sized for one view).  ``extra_w``
        widens the estimated (non-airtight) fold windows by that many
        rows — the warm check's measured overflow feeds back through it."""
        plan = self.plan
        margin = self.window_margin * extra_margin
        ecs = config.entry_caps
        if self.weighted:
            w_cap = _group_w_cap(
                1, max_win, margin, entry_caps=ecs, extra=extra_w
            )
            return _build_group_step_weighted(
                config, g, plan.image_w, plan.image_h, plan.n_faces,
                self.n_classes, w_cap, plan.use_dist,
            )
        w_cap = _group_w_cap(
            g, max_win, margin, entry_caps=ecs, extra=extra_w
        )
        return _build_group_step_counts(
            config, g, plan.image_w, plan.image_h, plan.n_faces,
            self.n_classes, w_cap, plan.use_dist,
        )

    def _init_accs(self):
        plan = self.plan
        acc = jnp.zeros((plan.n_faces, self.n_classes), jnp.float32)
        if self.weighted:
            return (acc, jnp.zeros((plan.n_faces,), jnp.float32))
        return (acc,)

    @staticmethod
    def _apply_step(step, tri_soa, params_g, labels_g, accs):
        """Dispatch one group; returns (new accs tuple, (over_caps,
        over_fold)) — cap/entry overflow (re-census to fix) vs fold-window
        overflow (widen to fix)."""
        out = step(tri_soa, params_g, labels_g, *accs)
        return out[:-2], (out[-2], out[-1])

    def _groups(self, idxs, g):
        n = self.plan.n_views
        padded = list(idxs) + [n] * (-len(idxs) % g)
        return [padded[i:i + g] for i in range(0, len(padded), g)]

    def _label_sel(self, idx):
        """View ids -> the group's (g, H, W) label rows via label_index."""
        return self._labels_pad[
            jnp.asarray([int(self._lidx[i]) for i in idx], jnp.int32)
        ]

    def _warm_one(self, step, g, bucket) -> None:
        """Run the bucket's first group once and verify its output against
        the standalone single-view program (corruption doctrine).

        Overflow handling is KIND-aware: fold-WINDOW overflow raises
        :class:`_WarmOverflow` (the builder widens the windows by the
        measured drop — guaranteed sufficient); cap/entry overflow cannot
        be fixed by widening or by a smaller group, so on a SAMPLED plan
        it is tolerated here (the group's contribution was gated to zero
        and ``finalize()`` re-censuses exactly those views), while on an
        exactly-censused plan it is a sizing bug and raises."""
        plan = self.plan
        idx = self._groups(bucket.view_indices, g)[0]
        sel = jnp.asarray(idx, jnp.int32)
        accs, (over_caps, over_fold) = self._apply_step(
            step, self.tri_soa, self._params_pad[sel], self._label_sel(idx),
            self._init_accs(),
        )
        n_fold = int(np.asarray(over_fold))
        n_caps = int(np.asarray(over_caps))
        if n_fold:
            raise _WarmOverflow(
                f"warm group fold windows overflowed {n_fold} entries "
                f"(caps {bucket.config.caps}, entry "
                f"{bucket.config.entry_caps})",
                n_fold,
            )
        if n_caps:
            if not plan.sampled:
                raise _SizingBug(
                    f"warm group overflowed {n_caps} cap/entry slots under "
                    f"an exactly-censused plan (caps {bucket.config.caps}, "
                    f"entry {bucket.config.entry_caps}) — sizing bug"
                )
            # sampled plan: an un-censused view exceeded the bucket's
            # caps; the warm group contributed zero and finalize()'s
            # re-census retry will re-run it — the program itself is fine
            logger.info(
                "bucket %s group=%d: warm group cap overflow (%d slots) "
                "on a sampled plan; deferring to the finalize retry",
                bucket.config.caps, g, n_caps,
            )
            return
        if not self.warm_check:
            return
        got = float(np.asarray(jnp.sum(accs[0])))
        one_view = _build_single_view_counts(
            bucket.config, plan.image_w, plan.image_h, plan.n_faces,
            self.n_classes, plan.use_dist,
        )
        k0 = idx[0]
        ref_sum, ref_seen = one_view(
            self.tri_soa, self._params_pad[k0],
            self._labels_pad[int(self._lidx[k0])],
        )
        # pooled: group total >= the first view's count total; weighted:
        # each seen face contributes exactly 1 to value_sum's total, so
        # the group total >= the first view's seen-face count
        ref = float(np.asarray(ref_seen if self.weighted else ref_sum))
        if ref > 0.0 and got < 0.5 * ref:
            raise RuntimeError(
                f"grouped program count total {got:.6g} < half the single-"
                f"view reference {ref:.6g} — corrupted Mosaic output "
                "(docs/DESIGN.md)"
            )

    # -- execution ---------------------------------------------------------

    def run(self, positions: typing.Optional[typing.Sequence[int]] = None):
        """Dispatch every group of every bucket; returns the device
        accumulator (callers time this + one sync).  Per-group overflow
        scalars are retained (device) for :meth:`finalize`.  ``positions``
        restricts to those bucket indices (per-bucket attribution)."""
        accs = self._init_accs()
        self._group_overs = []  # (bucket_pos, idx, over)
        for pos, (step, g, bucket) in enumerate(self._programs):
            if positions is not None and pos not in positions:
                continue
            for idx in self._groups(bucket.view_indices, g):
                sel = jnp.asarray(idx, jnp.int32)
                accs, overs = self._apply_step(
                    step, self.tri_soa, self._params_pad[sel],
                    self._label_sel(idx), accs,
                )
                self._group_overs.append((pos, idx, overs))
        self._accs = accs
        return accs[0]

    def finalize(self):
        """Fetch overflow flags; re-census + re-size + re-run any
        overflowed groups (their contributions were gated to zero), then
        return the (n_faces, n_classes) numpy counts — or, when
        ``weighted``, the ``(value_sum, view_count)`` numpy pair."""
        plan = self.plan
        retries = 0
        while True:
            bad: dict = {}
            for pos, idx, overs in self._group_overs:
                if any(int(np.asarray(o)) for o in overs):
                    bad.setdefault(pos, []).extend(
                        i for i in idx if i < plan.n_views
                    )
            if not bad:
                break
            if retries >= self.max_retries:
                raise RuntimeError(
                    "aggregation overflow persisted after "
                    f"{self.max_retries} resize retries (buckets "
                    f"{[self._programs[p][2].config.caps for p in bad]})"
                )
            retries += 1
            self.resizes += len(bad)
            new_overs = []
            for pos, views in bad.items():
                step, g, bucket = self._programs[pos]
                logger.warning(
                    "bucket %s: %d views overflowed their static "
                    "capacities; re-censusing and re-running them",
                    bucket.config.caps, len(views),
                )
                sub_plan = plan_aggregation(
                    self.tri_soa,
                    np.asarray(self._params_pad[jnp.asarray(views)]),
                    census_config_of(bucket.config),
                    plan.image_h, plan.image_w, plan.n_faces,
                    use_dist=plan.use_dist, max_buckets=1,
                    cap_margin=1.25 * self.retry_margin,
                    entry_margin=1.25 * self.retry_margin,
                )
                nb = sub_plan.buckets[0]
                g2 = min(g, len(views))
                step2 = self._build_step(
                    nb.config, g2, nb.max_win, self.retry_margin
                )
                # map survey view ids through the retry's local params
                sub_params = np.concatenate(
                    [
                        np.asarray(
                            self._params_pad[jnp.asarray(views)], np.float32
                        ),
                        np.asarray(self._params_pad[-1:], np.float32),
                    ],
                    axis=0,
                )
                sub_params = jnp.asarray(sub_params)
                local_pad = len(views)
                for lidx in [
                    list(range(i, min(i + g2, len(views))))
                    for i in range(0, len(views), g2)
                ]:
                    lidx = lidx + [local_pad] * (g2 - len(lidx))
                    gidx = [
                        views[i] if i < local_pad else plan.n_views
                        for i in lidx
                    ]
                    self._accs, overs = self._apply_step(
                        step2, self.tri_soa,
                        sub_params[jnp.asarray(lidx, jnp.int32)],
                        self._label_sel(gidx), self._accs,
                    )
                    new_overs.append((pos, gidx, overs))
            # only the re-run groups can still overflow
            self._group_overs = new_overs
        if self.weighted:
            return np.asarray(self._accs[0]), np.asarray(self._accs[1])
        return np.asarray(self._accs[0])

    def close(self) -> None:
        """Release this aggregator's device buffers (padded label stack,
        params, accumulators).  A runner that builds several aggregators
        back-to-back (the benchmark's suites, a multi-survey batch) MUST
        close each one — the label stacks otherwise accumulate in device
        memory until allocation fails (the round-5 bench lost four of its
        eight metrics to exactly that cascade)."""
        for name in ("_labels_pad", "_params_pad"):
            arr = getattr(self, name, None)
            if arr is not None:
                try:
                    arr.delete()
                except Exception:  # already donated/deleted
                    pass
                setattr(self, name, None)
        for arr in getattr(self, "_accs", None) or ():
            try:
                arr.delete()
            except Exception:
                pass
        self._accs = None
        self._group_overs = []
        self._programs = None
        self.tri_soa = None  # shared with the caller: drop the ref only


def aggregate_counts_planned(
    tri_soa,
    params: np.ndarray,
    labels,
    config: RasterConfig,
    image_h: int,
    image_w: int,
    n_faces: int,
    n_classes: int,
    *,
    use_dist: bool = False,
    max_buckets: int = 4,
    group: int = 20,
    census_sample: typing.Optional[int] = None,
    plan: typing.Optional[AggregationPlan] = None,
    label_index=None,
) -> typing.Tuple[np.ndarray, AggregationPlan]:
    """One-call planned aggregation: census -> buckets -> grouped programs
    -> overflow-checked (n_faces, n_classes) pixel counts.

    The single-call convenience over :func:`plan_aggregation` +
    :class:`PlannedAggregator`; pass ``plan`` to reuse a previous survey's
    plan (identical cameras/shapes)."""
    if plan is None:
        plan = plan_aggregation(
            tri_soa, params, config, image_h, image_w, n_faces,
            use_dist=use_dist, max_buckets=max_buckets,
            census_sample=census_sample,
        )
    agg = PlannedAggregator(plan, n_classes, group=group)
    agg.prepare(tri_soa, params, labels, label_index=label_index)
    agg.run()
    return agg.finalize(), plan


def aggregate_projected_planned(
    tri_soa,
    params: np.ndarray,
    labels,
    config: RasterConfig,
    image_h: int,
    image_w: int,
    n_faces: int,
    n_classes: int,
    *,
    use_dist: bool = False,
    max_buckets: int = 4,
    group: int = 20,
    census_sample: typing.Optional[int] = None,
    plan: typing.Optional[AggregationPlan] = None,
    label_index=None,
) -> typing.Tuple[np.ndarray, np.ndarray, AggregationPlan]:
    """One-call VIEW-WEIGHTED planned aggregation.

    The reference's ``aggregate_projected_images`` semantics
    (meshes.py:2016-2051: per view, per-face class distribution
    counts/total; averaged over the views that saw the face) at the
    census-bucketed rate.  Returns ``(value_sum (F, C), view_count (F,),
    plan)`` — the average is ``value_sum / view_count`` (NaN where
    unseen), exactly ``ops.aggregate.finalize_aggregation``."""
    if plan is None:
        plan = plan_aggregation(
            tri_soa, params, config, image_h, image_w, n_faces,
            use_dist=use_dist, max_buckets=max_buckets,
            census_sample=census_sample,
        )
    agg = PlannedAggregator(plan, n_classes, group=group, weighted=True)
    agg.prepare(tri_soa, params, labels, label_index=label_index)
    agg.run()
    value_sum, view_count = agg.finalize()
    return value_sum, view_count, plan
