"""Distributed aggregation pipeline: host image loading overlapped with
sharded device compute.

The production path for ``aggregate_images`` at survey scale: a thread
pool loads + segments label images ahead of the device (cv2/PIL release
the GIL), class-index images are shipped as int8 (1 byte/pixel), and each
device in the view-axis mesh rasterizes + aggregates its own views with
the FUSED scatter-free kernel chain (``ops.rasterize.rasterize_and_count``
— the raster kernel emits per-tile class counts, face-block fold kernels
densify them; no XLA scatter ever consumes a Mosaic output, per the
docs/DESIGN.md corruption doctrine).  Per-face accumulators stay DEVICE
RESIDENT across view groups (donated into each step, one host fetch at
the end) and are psum-combined over ICI inside each step.

Throughput structure (the round-2 pipeline ran ONE view per device per
step behind 8 eager per-step ``device_put``s, ~100 ms each through this
runtime — 32x below the kernel rate):

* ``views_per_step`` views run per device per jitted step (python-
  unrolled inside the program, like bench.py's grouped path);
* all per-view camera scalars are packed into ONE ``(n_dev, G, 28)``
  row array — exactly two host->device transfers per step (params +
  the int8 image stack);
* the accumulators are donated, so steps update them in place.

Integrity doctrine (docs/DESIGN.md: every entry pipeline carries a cheap
runtime guard; this runtime has silently corrupted Mosaic outputs after
toolchain rolls):

* the fold's static per-block tile-window capacity is AUTO-SIZED from a
  probe of the first step's views, and every view's true window demand
  is re-measured inside the step — a step exceeding a static capacity
  contributes NOTHING to the accumulator (gated on overflow == 0) and is
  re-censused, re-sized, and re-run at the end (resize-and-retry,
  VERDICT r4 #6) instead of silently dropping counts or raising after
  partial work;
* at warmup the grouped program's first-step count total is checked
  against the same view computed by the standalone single-view fused
  program (the one structure never observed corrupt) — a disagreement
  means the grouped program compiled into a corrupting structure, and
  the pipeline refuses to run.

Lens distortion is applied IN the rasterizer (vertices warped into the
sensor's distorted pixel space — ``setup_from_soa(distortion=...)``),
matching the single-device production path; the reference instead warps
the rendered map through a NN remap (meshes.py:1805-1821), which this
supersedes with sub-pixel accuracy at survey triangle sizes.

Semantics match ``TexturedMesh.aggregate_projected_images`` over one-hot
segmentor images exactly: each view contributes its per-face class
fraction (class pixel counts / face pixel count — the per-view mean of
the one-hot image), and the cross-view result averages those per-view
fractions over the views that saw the face (VIEW-weighted, exactly like
``ops.aggregate.accumulate_view`` / ``finalize_aggregation``), not a
pixel-weighted pool of raw counts.
"""

from __future__ import annotations

import concurrent.futures
import dataclasses
import functools
import logging
import time
import typing

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from geograypher_tpu.ops.rasterize import (
    RasterConfig,
    bin_all,
    bin_triangles,
    l0_face_ids,
    rasterize_and_count,
    setup_from_soa,
)
from geograypher_tpu.parallel.sharding import VIEW_AXIS, make_view_mesh

logger = logging.getLogger(__name__)

# packed per-view parameter row: [w2c (16), f, dist (8), pcx, pcy, valid]
_PROW = 28


def _pack_params(batch, valid: np.ndarray) -> np.ndarray:
    """(N, 28) float32 per-view parameter rows (one transfer per step)."""
    n = valid.shape[0]
    return np.concatenate(
        [
            np.asarray(batch.world_to_cam, np.float32).reshape(n, 16),
            np.asarray(batch.f, np.float32).reshape(n, 1),
            np.asarray(batch.distortion, np.float32).reshape(n, 8),
            np.asarray(batch.cx, np.float32).reshape(n, 1),
            np.asarray(batch.cy, np.float32).reshape(n, 1),
            valid.astype(np.float32).reshape(n, 1),
        ],
        axis=1,
    )


def _unpack_row(row: jax.Array, use_dist: bool):
    """One packed parameter row -> (w2c, f, distortion-or-None, valid)."""
    w2c = row[:16].reshape(4, 4)
    f = row[16]
    distortion = (row[17:25], row[25], row[26]) if use_dist else None
    return w2c, f, distortion, row[27]


# ---------------------------------------------------------------------------
# RLE label transport.  Real segmentation label images are spatially
# coherent (large constant regions), so shipping them through a slow
# host<->device link as dense pixels wastes nearly all the bytes: the
# run-length form is typically 10-100x smaller.  The device reconstructs
# the dense image EXACTLY with one scatter-add of per-run value DELTAS at
# the run starts followed by an integer cumsum (no gathers — gathers are
# the expensive op class on TPU; see docs/DESIGN.md measured table).
# ---------------------------------------------------------------------------


def _rle_encode_class_image(img: np.ndarray, cap: int):
    """Row-major RLE of an integer class image, scatter-decode form.

    Returns (starts (cap,) int32, deltas (cap,) int8, n_runs) with
    padding starts = img.size (dropped by the device scatter's
    ``mode="drop"``), or None when the image needs more than ``cap``
    runs (caller falls back to dense transport).  Deltas telescope:
    ``cumsum(scatter(deltas at starts)) == flat image`` exactly.  Class
    values must fit int8 after deltas, i.e. classes in [-1, 126] — the
    int8 dense transport has the same bound.
    """
    flat = np.ascontiguousarray(img, dtype=np.int16).ravel()
    change = np.nonzero(np.diff(flat))[0]
    n_runs = change.size + 1
    if n_runs > cap:
        return None
    starts = np.empty(cap, np.int32)
    starts[0] = 0
    starts[1:n_runs] = change + 1
    starts[n_runs:] = flat.size
    vals = flat[starts[:n_runs]]
    deltas = np.zeros(cap, np.int16)
    deltas[0] = vals[0]
    deltas[1:n_runs] = np.diff(vals)
    return starts, deltas.astype(np.int8), n_runs


def _rle_decode_device(starts: jax.Array, deltas: jax.Array, h: int, w: int):
    """Exact device-side inverse of :func:`_rle_encode_class_image`."""
    d = (
        jnp.zeros((h * w,), jnp.int32)
        .at[starts]
        .add(deltas.astype(jnp.int32), mode="drop")
    )
    return jnp.cumsum(d).reshape(h, w)


# ---------------------------------------------------------------------------
# Program builders.  jax.jit caches per wrapped-function OBJECT, so programs
# must be built once per static configuration and reused across
# ``aggregate_class_images_distributed`` calls — a fresh closure per call
# recompiles the full multi-view 4K program every time (minutes through this
# environment's remote compiler; the round-2 pipeline lost ~30x to exactly
# this).  All static context rides in the hashable cache key.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _build_probe_windows(
    config: RasterConfig, use_dist: bool, n_probe: int, w: int, h: int,
    n_faces: int, fold_block: int,
):
    @jax.jit
    def probe_windows(tri_soa, params_probe):
        from geograypher_tpu.ops.agg_tiled import (
            entry_occupancy,
            level_fold_windows,
        )

        # per-LEVEL window maxes: the L2+global fold's demand is
        # structurally larger than L0's on meshes with global-level
        # candidates (agg_tiled.level_fold_windows)
        worst = jnp.zeros((4,), jnp.int32)
        worst_occ = jnp.zeros((3,), jnp.int32)
        for k in range(n_probe):
            w2c_k, f_k, dist_k, _ = _unpack_row(params_probe[k], use_dist)
            setup = setup_from_soa(
                tri_soa, w2c_k, f_k, w, h, config.znear, distortion=dist_k
            )
            binned, sb = bin_all(setup, config, h, w)
            worst = jnp.maximum(
                worst,
                level_fold_windows(binned, config, h, w, n_faces, sb=sb),
            )
            worst_occ = jnp.maximum(
                worst_occ, entry_occupancy(binned, config, h, w)
            )
        return worst, worst_occ

    return probe_windows


@functools.lru_cache(maxsize=32)
def _build_device_step(
    device_mesh: Mesh, config: RasterConfig, use_dist: bool, fused: bool,
    group: int, w: int, h: int, n_faces: int, n_classes: int,
    rle_cap: int = 0,
):
    """The jitted per-step program (``config.fold_w_cap`` is the auto-sized
    fold-window capacity; part of the cache key via ``config``).

    With ``rle_cap > 0`` the image operand is the RLE pair
    ``(starts (n_dev, G, cap) int32, deltas (n_dev, G, cap) int8)`` and
    each view's class image is reconstructed on device
    (:func:`_rle_decode_device`) — the host->device transfer shrinks
    from h*w bytes to 5*cap per view."""
    fold_block = config.fold_block
    w_cap = config.fold_w_cap

    def count_one_view(setup, binned, sb, cls_img):
        """((F, C) counts, entry-compaction overflow) for one prepared
        view, sharing its binning."""
        if fused:
            from geograypher_tpu.ops import agg_tiled
            from geograypher_tpu.ops.rasterize import fused_counts_pallas

            outs = fused_counts_pallas(
                setup, binned, sb, cls_img, config, h, w, n_classes
            )
            counts, over = agg_tiled.fold_tile_counts(
                outs, binned, config, h, w, n_faces, n_classes,
                w_cap=w_cap, block=fold_block, return_overflow=True,
            )
            # cap drops (L0..L3 + S) surface like fold drops: only one
            # view per survey is probed, later views may demand more
            over = over + binned.overflow
            if sb is not None:
                over = over + sb.overflow
            return counts, over
        from geograypher_tpu.ops.aggregate import project_image_class_counts
        from geograypher_tpu.ops.rasterize import (
            _raster_tiles_xla,
            concat_candidates_for_tiles,
        )

        cand = concat_candidates_for_tiles(binned, config, h, w)
        p2f = _raster_tiles_xla(cand, setup.planes, config, h, w)
        return project_image_class_counts(
            p2f, cls_img, n_faces=n_faces, n_classes=n_classes
        ), binned.overflow

    @functools.partial(jax.jit, donate_argnums=(3, 4))
    def device_step(tri_soa, params_shard, imgs_shard, acc_fracs, acc_views):
        def per_device(tri_soa, params_b, imgs_b, acc_fracs, acc_views):
            # collapse the local-shard=1 leading axis
            params_b = params_b.reshape(-1, _PROW)
            if rle_cap:
                starts_b, deltas_b = imgs_b
                starts_b = starts_b.reshape(-1, rle_cap)
                deltas_b = deltas_b.reshape(-1, rle_cap)
            else:
                imgs_b = imgs_b.reshape((-1,) + imgs_b.shape[2:])

            fracs = jnp.zeros((n_faces, n_classes), jnp.float32)
            views = jnp.zeros((n_faces,), jnp.float32)
            csum = jnp.zeros((), jnp.float32)
            over = jnp.zeros((), jnp.int32)
            # python-unrolled view loop: Mosaic kernels inside lax.scan
            # corrupt on the current runtime (docs/DESIGN.md)
            for k in range(group):
                w2c_k, f_k, dist_k, valid_k = _unpack_row(
                    params_b[k], use_dist
                )
                setup = setup_from_soa(
                    tri_soa, w2c_k, f_k, w, h, config.znear,
                    distortion=dist_k,
                )
                binned, sb = bin_all(setup, config, h, w)
                if rle_cap:
                    cls_k = _rle_decode_device(starts_b[k], deltas_b[k], h, w)
                else:
                    cls_k = imgs_b[k].astype(jnp.int32)
                counts, eover_k = count_one_view(setup, binned, sb, cls_k)
                counts = counts * valid_k
                if fused:
                    # eover_k from the fold itself covers dropped window
                    # entries AND entry-compaction drops at every level
                    # (no separate window rebuild per view)
                    over = jnp.maximum(
                        over,
                        (eover_k * valid_k.astype(jnp.int32)).astype(
                            jnp.int32
                        ),
                    )
                face_total = jnp.sum(counts, axis=1)
                seen = (face_total > 0).astype(jnp.float32)
                # per-view class fraction: this view's vote, weighted
                # equally with every other view that saw the face
                fracs = fracs + counts / jnp.maximum(face_total, 1.0)[:, None]
                views = views + seen
                csum = csum + jnp.sum(face_total)
            # overflow gating (resize-and-retry doctrine, planner.py): a
            # step whose static capacities would drop counts contributes
            # NOTHING — the caller re-sizes and re-runs it, so the
            # accumulator never mixes in undercounted views.  The gate is
            # global (pmax) so the step is atomic across devices.
            over_all = jax.lax.pmax(over, VIEW_AXIS)
            gate = (over_all == 0).astype(jnp.float32)
            return (
                acc_fracs + jax.lax.psum(fracs, VIEW_AXIS) * gate,
                acc_views + jax.lax.psum(views, VIEW_AXIS) * gate,
                jax.lax.psum(csum, VIEW_AXIS),
                over_all,
            )

        return jax.shard_map(
            per_device,
            mesh=device_mesh,
            in_specs=(P(), P(VIEW_AXIS), P(VIEW_AXIS), P(), P()),
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        )(tri_soa, params_shard, imgs_shard, acc_fracs, acc_views)

    return device_step


@functools.lru_cache(maxsize=32)
def _build_one_view_counts(
    config: RasterConfig, use_dist: bool, w: int, h: int, n_faces: int,
    n_classes: int,
):
    @jax.jit
    def one_view_counts(tri_soa, row, img):
        w2c_k, f_k, dist_k, _ = _unpack_row(row, use_dist)
        setup = setup_from_soa(
            tri_soa, w2c_k, f_k, w, h, config.znear, distortion=dist_k
        )
        return jnp.sum(
            rasterize_and_count(
                setup, img.astype(jnp.int32), config, h, w,
                n_faces, n_classes,
            )
        )

    return one_view_counts


def _bucket_step_config(bucket, fold_block: int):
    """A :class:`planner.BucketPlan`'s config readied for the pipeline's
    per-view-fold device step: per-level fold windows sized for ONE view
    at the bucket's probed maxima, with the airtight ``entry_caps`` bound
    where affordable (planner._group_w_cap)."""
    from geograypher_tpu.parallel import planner as _planner

    w_cap = _planner._group_w_cap(
        1, bucket.max_win, 1.25, entry_caps=bucket.config.entry_caps
    )
    return dataclasses.replace(
        bucket.config, fold_block=fold_block, fold_w_cap=w_cap
    )


def _cover_step_config(plan, fold_block: int):
    """One config covering every bucket, for the < step_views tail views
    pooled across buckets: elementwise-max binning caps (plan.cover_config,
    entry compaction off), max subtile chunk capacities, and fold windows
    at 2x the worst bucket's probed maxima (tail views were censused under
    their own bucket; the margin absorbs the cap change, and the step's
    overflow gate + resize-retry covers the rest)."""
    from geograypher_tpu.parallel import planner as _planner

    cfg = plan.cover_config
    if cfg.subtile is not None:
        s_cap = max(b.config.s_cap_chunks or 0 for b in plan.buckets)
        s_pc = max(b.config.s_pair_chunks or 0 for b in plan.buckets)
        cfg = dataclasses.replace(
            cfg, s_cap_chunks=s_cap or None, s_pair_chunks=s_pc or None
        )
    max_win = tuple(
        max(b.max_win[i] for b in plan.buckets) for i in range(4)
    )
    w_cap = _planner._group_w_cap(1, max_win, 2.0)
    return dataclasses.replace(cfg, fold_block=fold_block, fold_w_cap=w_cap)


def aggregate_class_images_distributed(
    mesh,
    cameras,
    n_classes: int,
    class_image_provider: typing.Optional[typing.Callable[[int], np.ndarray]] = None,
    aggregate_img_scale: float = 1.0,
    device_mesh: typing.Optional[Mesh] = None,
    prefetch_workers: int = 4,
    config: typing.Optional[RasterConfig] = None,
    apply_distortion: typing.Optional[bool] = None,
    views_per_step: int = 4,
    integrity_check: bool = True,
    auto_size_fold: bool = True,
    label_transport: str = "auto",
):
    """Aggregate per-view class images onto mesh faces across all devices.

    Args:
        mesh: TexturedMesh.
        cameras: CameraSet (or SegmentorCameraSet).
        n_classes: number of classes in the label images.
        class_image_provider: ``f(view_index) -> (H, W)`` integer class
            image (negative/255 = unlabeled).  Defaults to argmaxing
            ``cameras.get_image_by_index`` (segmentor one-hots).
        aggregate_img_scale: label/raster scale fraction.
        device_mesh: jax device mesh (defaults to all devices).
        apply_distortion: None (default) rasterizes each view directly in
            the sensor's distorted pixel space whenever the sensor is
            calibrated with distortion (reference behavior:
            meshes.py:1805-1821, via NN remap there); False disables.
        views_per_step: views processed per device per jitted step.
        integrity_check: verify the grouped program against the
            standalone single-view fused program at warmup (see module
            docstring).  Disable only for micro-benchmarks of known-good
            configurations.
        auto_size_fold: size the fold-window capacity from a probe of the
            first step's views (default).  When False, ``config.fold_w_cap``
            is used as-is.  Either way, a later step exceeding the static
            capacities contributes nothing (gated on overflow == 0), is
            re-censused, re-sized, and re-run — never silently dropped
            and never raised after partial work (VERDICT r4 #6).
        label_transport: "auto" (default), "dense", or "rle".  Real
            segmentation masks are spatially coherent, so their
            run-length form is typically 10-100x smaller than dense
            pixels — decisive when the host<->device link, not compute,
            bounds the pipeline.  "auto" probes the first step's images
            and picks RLE when it saves >= 2x bytes; the capacity is
            sized at 2x the probed worst run count, and any later step
            whose images exceed it falls back to the dense program for
            that step (correct, just slower).  Decoding on device is
            exact (scatter of run deltas + integer cumsum).

    Returns (fraction_sums (F, n_classes), view_counts (F,)) as numpy
    arrays: ``fraction_sums`` is the sum over views of each view's
    per-face class fraction; the cross-view average is
    ``fraction_sums / view_counts`` (NaN where ``view_counts == 0``),
    identical to ``TexturedMesh.aggregate_projected_images``.
    """
    if device_mesh is None:
        device_mesh = make_view_mesh()
    n_dev = device_mesh.devices.size
    group = max(1, int(views_per_step))
    config = config or mesh.raster_config
    n_faces = mesh.n_faces
    fold_block = config.fold_block
    # device-resident (9, F) SOA, cached on the mesh (re-transferring the
    # ~36 MB mesh per call costs ~1 s through the dev tunnel alone)
    tri_soa = mesh._tri_soa_device(cameras)
    batch = cameras.get_camera_batch(image_scale=aggregate_img_scale)
    h, w = batch.image_height, batch.image_width

    if class_image_provider is None:

        def class_image_provider(i: int) -> np.ndarray:
            img = np.asarray(cameras.get_image_by_index(i, aggregate_img_scale))
            if img.ndim == 3:
                finite = np.isfinite(img).all(axis=-1)
                cls = np.argmax(np.nan_to_num(img), axis=-1)
                return np.where(finite, cls, -1).astype(np.int32)
            return np.nan_to_num(img, nan=-1).astype(np.int32)

    sharding = NamedSharding(device_mesh, P(VIEW_AXIS))
    replicated = NamedSharding(device_mesh, P())

    use_dist = bool(
        (apply_distortion is None or apply_distortion)
        and (
            np.any(np.asarray(batch.distortion))
            or np.any(np.asarray(batch.cx))
            or np.any(np.asarray(batch.cy))
        )
    )
    fused = config.backend == "pallas"

    n = len(cameras)
    step_views = n_dev * group
    params_all = _pack_params(batch, np.ones(n, np.float32))

    # -- cached auto-sizing ----------------------------------------------------
    # The census + sizing probes cost several views of device work;
    # re-running them on every call would put them on the steady-state
    # critical path (the timed bench calls this twice with identical
    # inputs).  The plan (or legacy sized config) is cached on the MESH
    # keyed by everything the probes see; geometry edits clear it via
    # _invalidate_geometry_caches.
    _cfg_cache = getattr(mesh, "_pipeline_cfg_cache", None)
    if _cfg_cache is None:
        _cfg_cache = {}
        mesh._pipeline_cfg_cache = _cfg_cache

    # -- census-bucketed step plan ---------------------------------------------
    # ONE worst-case config across a mixed nadir/oblique survey ran every
    # view at oblique-sized shapes and measured ~60-70 % of the bucketed
    # rate (docs/DESIGN.md round-4 table); reuse the library planner to
    # census the views, bucket them, and run bucket-homogeneous steps at
    # each bucket's own exactly-sized shapes.  Bucket tails shorter than
    # a step run under one covering config so padding stays < 1 step per
    # bucket.  Reference anchor: the per-camera python loop this
    # pipelines, meshes.py:1911-2051.
    plan = None
    if fused and n > 0 and auto_size_fold:
        from geograypher_tpu.parallel import planner as _planner

        _plan_key = (
            "plan", config, use_dist, w, h, cameras.get_camera_hash(),
        )
        plan = _cfg_cache.get(_plan_key)
        if plan is None:
            plan = _planner.plan_aggregation(
                tri_soa, params_all, config, h, w, n_faces,
                use_dist=use_dist,
                census_sample=None if n <= 64 else max(12, n // 16),
            )
            _cfg_cache[_plan_key] = plan

    if plan is not None:
        step_specs: list = []  # (config index, view ids of this step)
        tail: list = []
        for bi, b in enumerate(plan.buckets):
            idxs = list(b.view_indices)
            nfull = len(idxs) // step_views * step_views
            for s0 in range(0, nfull, step_views):
                step_specs.append((bi, idxs[s0:s0 + step_views]))
            tail.extend(idxs[nfull:])
        for s0 in range(0, len(tail), step_views):
            step_specs.append((len(plan.buckets), tail[s0:s0 + step_views]))
        order, valid_l, step_cfg_idx = [], [], []
        for ci, ids in step_specs:
            pad = step_views - len(ids)
            order.extend(ids + [ids[0]] * pad)
            valid_l.extend([1.0] * len(ids) + [0.0] * pad)
            step_cfg_idx.append(ci)
        n_pad = len(order)
        valid = np.asarray(valid_l, np.float32)
        step_configs = [
            _bucket_step_config(b, fold_block) for b in plan.buckets
        ]
        if len(step_specs) > len(
            [ci for ci, _ in step_specs if ci < len(plan.buckets)]
        ):
            step_configs.append(_cover_step_config(plan, fold_block))
        else:
            step_configs.append(None)  # no tail steps
        config = step_configs[step_cfg_idx[0]]
        auto_size_fold = False  # the plan sized everything
    else:
        n_pad = -(-n // step_views) * step_views
        order = list(range(n)) + [0] * (n_pad - n)
        valid = np.array([1.0] * n + [0.0] * (n_pad - n), np.float32)
        step_cfg_idx = [0] * (n_pad // step_views)
        step_configs = None  # filled after legacy sizing below
    params = params_all[order]
    params[:, _PROW - 1] = valid

    _cfg_key = None
    if plan is None and fused and n > 0 and (auto_size_fold or (
        config.subtile is not None and config.s_cap_chunks is None
    )):
        _cfg_key = (
            config, use_dist, w, h, n_dev, group, min(n, n_dev * group),
            cameras.get_camera_hash(),
        )
        cached_cfg = _cfg_cache.get(_cfg_key)
        if cached_cfg is not None:
            config = cached_cfg
            auto_size_fold = False  # already sized

    # -- census-size level-S chunk capacities (no-op without subtile) ----------
    # One probe view, 1.5x margin; undersizing for later views surfaces
    # as SubtileBinned.overflow, summed into each step's overflow output
    # and raised below.
    if (
        fused
        and n > 0
        and config.subtile is not None
        and config.s_cap_chunks is None
    ):
        from geograypher_tpu.ops.rasterize import (
            probe_subtile_census,
            size_subtile_caps,
        )

        # probe the whole first step's views (not just view 0): a survey
        # slice whose first view sees no far-field would size the caps to
        # the floor and overflow on the next view
        s_tot_w = s_worst_w = 0
        for row in params[: min(n, step_views)]:
            s_tot, s_worst = probe_subtile_census(
                tri_soa,
                jnp.asarray(row[:16].reshape(4, 4)),
                jnp.asarray(row[16]),
                jnp.asarray(row[17:25]),
                jnp.asarray(row[25]),
                jnp.asarray(row[26]),
                w, h, config, use_dist,
            )
            s_tot_w = max(s_tot_w, int(np.asarray(s_tot)))
            s_worst_w = max(s_worst_w, int(np.asarray(s_worst)))
        config = size_subtile_caps(config, s_tot_w, s_worst_w)

    # -- auto-size the fold's static window capacity --------------------------
    # Probe the first step's views for the worst per-block tile-window
    # demand; later views are re-measured inside every step and overflow
    # the run loudly (never silently dropping counts).
    w_cap = config.fold_w_cap
    if fused and auto_size_fold:
        n_probe = min(n, step_views)
        probe_windows = _build_probe_windows(
            config, use_dist, n_probe, w, h, n_faces, fold_block
        )
        max_win, worst_occ = probe_windows(tri_soa, params[:n_probe])
        # 2x + 64 margins: only the FIRST step's views are probed, and
        # unprobed oblique views can need noticeably more than nadir
        # ones (window padding is nearly free — the kernel loops over
        # TRUE window lengths — and compacted entries stay well under
        # the dense stacks); undersizing is still caught by the in-step
        # overflow guard below.  One cap per fold level (the L2+global
        # level outgrows L0 on irregular TINs).
        w_cap = tuple(
            8 * ((int(v) * 2 + 64 + 7) // 8) for v in np.asarray(max_win)
        )
        entry_caps = tuple(
            8 * max(1, -(-(int(v) * 2 + 64) // 8))
            for v in np.asarray(worst_occ)
        )
        config = dataclasses.replace(
            config, fold_w_cap=w_cap, entry_caps=entry_caps
        )

    if _cfg_key is not None:
        _cfg_cache[_cfg_key] = config

    img_dtype = np.int8 if n_classes < 128 else np.int32

    # -- label transport selection --------------------------------------------
    # RLE requires int8-range classes (deltas must fit int8) and pays off
    # only when runs are long; probe the first step's images once and keep
    # them seeded for the prefetch pool below.
    if label_transport not in ("auto", "dense", "rle"):
        raise ValueError(f"unknown label_transport {label_transport!r}")
    rle_cap = 0
    _seed_imgs: dict = {}
    if label_transport != "dense" and img_dtype == np.int8 and n > 0:
        probe_runs = 0
        for i in range(min(n, step_views)):
            img = np.clip(class_image_provider(order[i]), -1, None).astype(
                img_dtype
            )
            _seed_imgs[i] = img
            flat = img.ravel()
            probe_runs = max(
                probe_runs, int(np.count_nonzero(np.diff(flat))) + 1
            )
        cap = 8 * (-(-2 * probe_runs // 8))
        if label_transport == "rle" or 5 * cap * 2 <= h * w:
            rle_cap = cap
        logger.debug(
            "label transport: probed worst %d runs -> %s", probe_runs,
            f"rle cap {rle_cap}" if rle_cap else "dense",
        )

    if step_configs is None:
        step_configs = [config]  # legacy single-config path
    # per-config step programs: [ci] -> jitted step; RLE-decoding primary
    # and dense fallback built lazily (tail/cover entries may never run)
    _rle_steps: list = [None] * len(step_configs)
    _dense_steps: list = [None] * len(step_configs)

    def _get_step(ci: int, use_rle: bool):
        cache = _rle_steps if use_rle else _dense_steps
        if cache[ci] is None:
            cache[ci] = _build_device_step(
                device_mesh, step_configs[ci], use_dist, fused, group,
                w, h, n_faces, n_classes,
                rle_cap=rle_cap if use_rle else 0,
            )
        return cache[ci]

    total_fracs = jax.device_put(
        jnp.zeros((n_faces, n_classes), jnp.float32), replicated
    )
    total_views = jax.device_put(jnp.zeros((n_faces,), jnp.float32), replicated)
    first_csum = None
    first_imgs = None

    overflows = []
    # Two-stage prefetch: an image pool loads + casts label images, and a
    # dedicated single-thread put pool stacks each step's images and
    # device_puts them (params + int8 stack) WHILE the device computes the
    # previous step.  Through this environment's ~40 MB/s host<->device
    # tunnel the puts are the dominant cost (8.3 MB per int8 4K view) —
    # on the main thread they serialized with compute and capped the
    # round-2/3 pipeline at ~1/4 of the transfer ceiling.
    with concurrent.futures.ThreadPoolExecutor(
        prefetch_workers
    ) as pool, concurrent.futures.ThreadPoolExecutor(1) as put_pool:
        futures: dict = {}
        put_futures: dict = {}

        def fetch(i: int):
            # clip/cast (and RLE-encode) in the worker: the main loop
            # stays free to keep the device dispatch queue full
            img = _seed_imgs.pop(i, None)
            if img is None:
                img = np.clip(
                    class_image_provider(order[i]), -1, None
                ).astype(img_dtype)
            enc = _rle_encode_class_image(img, rle_cap) if rle_cap else None
            return img, enc

        def ensure(i: int):
            if i not in futures and i < n_pad:
                futures[i] = pool.submit(fetch, i)

        def put_step(start: int):
            t0 = time.perf_counter()
            idx = list(range(start, start + step_views))
            fetched = [futures.pop(i).result() for i in idx]
            t1 = time.perf_counter()
            params_dev = jax.device_put(
                params[idx].reshape(n_dev, group, _PROW), sharding
            )
            use_rle = rle_cap and all(enc is not None for _, enc in fetched)
            if use_rle:
                starts = np.stack([enc[0] for _, enc in fetched], axis=0)
                deltas = np.stack([enc[1] for _, enc in fetched], axis=0)
                imgs_dev = (
                    jax.device_put(
                        starts.reshape(n_dev, group, rle_cap), sharding
                    ),
                    jax.device_put(
                        deltas.reshape(n_dev, group, rle_cap), sharding
                    ),
                )
            else:
                if rle_cap:
                    logger.warning(
                        "step %d: an image exceeded the RLE capacity %d "
                        "runs; falling back to dense transport for this "
                        "step", start, rle_cap,
                    )
                imgs = np.stack([img for img, _ in fetched], axis=0)
                imgs_dev = jax.device_put(
                    imgs.reshape((n_dev, group) + imgs.shape[1:]), sharding
                )
            # block until the transfer lands so the put thread's timeline
            # reflects the tunnel (and the next put starts immediately)
            jax.block_until_ready(imgs_dev)
            if logger.isEnabledFor(logging.DEBUG):
                logger.debug(
                    "put_step %d: fetch-wait %.0f ms, put %.0f ms",
                    start, (t1 - t0) * 1e3,
                    (time.perf_counter() - t1) * 1e3,
                )
            host_imgs = (
                np.stack([img for img, _ in fetched], axis=0)
                if start == 0
                else None
            )
            return params_dev, imgs_dev, host_imgs, bool(use_rle)

        def ensure_put(start: int):
            if start not in put_futures and start < n_pad:
                for i in range(start, start + step_views):
                    ensure(i)
                put_futures[start] = put_pool.submit(put_step, start)

        ensure_put(0)
        ensure_put(step_views)
        for si, start in enumerate(range(0, n_pad, step_views)):
            t0 = time.perf_counter()
            params_dev, imgs_dev, host_imgs, step_rle = put_futures.pop(
                start
            ).result()
            t1 = time.perf_counter()
            ensure_put(start + 2 * step_views)
            # put_step already logged any per-step dense RLE fallback
            step_fn = _get_step(
                step_cfg_idx[si], bool(rle_cap) and step_rle
            )
            total_fracs, total_views, csum, over = step_fn(
                tri_soa, params_dev, imgs_dev, total_fracs, total_views
            )
            if logger.isEnabledFor(logging.DEBUG):
                logger.debug(
                    "step %d: put-wait %.0f ms, dispatch %.0f ms",
                    start, (t1 - t0) * 1e3,
                    (time.perf_counter() - t1) * 1e3,
                )
            # keep only device handles here: fetching any scalar now
            # would sync the step and serialize transfer with compute
            # (the round-2 pipeline lost ~2x to exactly this)
            overflows.append((start, over))
            if start == 0:
                first_csum = csum
                first_imgs = host_imgs

    # -- resize-and-retry on capacity overflow ---------------------------------
    # A step whose views exceeded the first-step probe's margins contributed
    # NOTHING (gated in the device step); re-census exactly those views,
    # re-size one covering config, and re-run the steps — a survey never
    # raises after partial work and never silently drops counts
    # (VERDICT r4 #6; same doctrine as planner.PlannedAggregator.finalize).
    if fused:
        bad_starts = [s for s, over in overflows if int(np.asarray(over))]
        attempt = 0
        while bad_starts:
            if attempt >= 2:
                raise RuntimeError(
                    "fold/entry/binning capacity overflow persisted after "
                    f"{attempt} resize retries (steps {bad_starts}); the "
                    "gated steps contributed nothing — result would be "
                    "missing those views"
                )
            attempt += 1
            from geograypher_tpu.parallel import planner as _planner

            bad_idx = [
                i
                for s in bad_starts
                for i in range(s, s + step_views)
                if params[i, _PROW - 1] > 0
            ]
            logger.warning(
                "capacity overflow: %d views in %d steps exceeded the "
                "probed static capacities; re-censusing and re-running "
                "them (attempt %d)", len(bad_idx), len(bad_starts), attempt,
            )
            sub_plan = _planner.plan_aggregation(
                tri_soa, params[bad_idx],
                _planner.census_config_of(config), h, w, n_faces,
                use_dist=use_dist, max_buckets=1,
                cap_margin=2.0 * attempt, entry_margin=2.0 * attempt,
            )
            nb = sub_plan.buckets[0]
            retry_cfg = dataclasses.replace(
                nb.config, fold_block=fold_block,
                fold_w_cap=tuple(
                    8 * ((int(v) * 2 * attempt + 64 + 7) // 8)
                    for v in nb.max_win
                ),
            )
            retry_step = _build_device_step(
                device_mesh, retry_cfg, use_dist, fused, group, w, h,
                n_faces, n_classes, rle_cap=0,
            )
            new_overflows = []
            for s in bad_starts:
                idx = list(range(s, s + step_views))
                imgs = np.stack(
                    [
                        np.clip(
                            class_image_provider(order[i]), -1, None
                        ).astype(img_dtype)
                        for i in idx
                    ]
                )
                params_dev = jax.device_put(
                    params[idx].reshape(n_dev, group, _PROW), sharding
                )
                imgs_dev = jax.device_put(
                    imgs.reshape((n_dev, group) + imgs.shape[1:]), sharding
                )
                total_fracs, total_views, _csum, over = retry_step(
                    tri_soa, params_dev, imgs_dev, total_fracs, total_views
                )
                new_overflows.append((s, over))
            bad_starts = [
                s for s, over in new_overflows if int(np.asarray(over))
            ]

    if integrity_check and fused and first_csum is not None:
        _check_first_step(
            tri_soa, params, first_imgs, first_csum, config, use_dist,
            w, h, n_faces, n_classes, step_views,
        )

    return np.asarray(total_fracs), np.asarray(total_views)


def _check_first_step(
    tri_soa, params, imgs, group_csum, config, use_dist,
    w, h, n_faces, n_classes, step_views,
):
    """Warmup corruption guard: recompute one first-step view with the
    standalone single-view fused program (the structure validated clean on
    this runtime, docs/DESIGN.md) and require the grouped program's count
    total to cover it.  A grouped program that compiled into a corrupting
    structure returns (near-)zero counts and fails here instead of
    returning wrong labels."""
    one_view_counts = _build_one_view_counts(
        config, use_dist, w, h, n_faces, n_classes
    )
    got = float(np.asarray(group_csum))
    for k in range(step_views):
        if params[k, _PROW - 1] == 0:
            continue
        ref = float(np.asarray(one_view_counts(tri_soa, params[k], imgs[k])))
        if ref == 0.0:
            continue  # view saw nothing labeled; try the next one
        if got < 0.5 * ref:
            raise RuntimeError(
                "aggregation integrity check failed: grouped-program count "
                f"total {got:.6g} < half the single-view reference {ref:.6g} "
                "— the compiled program is corrupting Mosaic outputs "
                "(docs/DESIGN.md); reduce views_per_step or report the "
                "toolchain roll"
            )
        logger.debug(
            "integrity check ok: group counts %.6g vs single-view %.6g",
            got, ref,
        )
        return
    logger.warning(
        "integrity check inconclusive: no first-step view saw labeled "
        "pixels; corruption guard not exercised"
    )
