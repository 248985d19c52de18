"""Distributed aggregation pipeline: host image loading overlapped with
sharded device compute.

The production path for ``aggregate_images`` at survey scale: a thread
pool loads + segments label images ahead of the device (cv2/PIL release
the GIL), class-index images are shipped (8 bits/pixel rather than one-hot
floats), and each device in the view-axis mesh rasterizes + aggregates its
own views, with per-face accumulators psum-combined over ICI at the end.

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
import typing

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from geograypher_tpu.cameras.distortion import remap_image_jax
from geograypher_tpu.ops.aggregate import project_image_class_counts
from geograypher_tpu.ops.rasterize import (
    RasterConfig,
    rasterize_triangles,
    transform_to_camera,
)
from geograypher_tpu.parallel.sharding import VIEW_AXIS, make_view_mesh


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
        apply_distortion: None (default) warps each view's pix2face to the
            sensor's distorted geometry whenever the sensor is calibrated
            with distortion (on-device NN remap, matching the single-device
            path and reference meshes.py:1805-1821); False disables.

    Returns (fraction_sums (F, n_classes), view_counts (F,)) as numpy
    arrays: ``fraction_sums`` is the sum over views of each view's
    per-face class fraction; the cross-view average is
    ``fraction_sums / view_counts`` (NaN where ``view_counts == 0``),
    identical to ``TexturedMesh.aggregate_projected_images``.
    """
    if device_mesh is None:
        device_mesh = make_view_mesh()
    n_dev = device_mesh.devices.size
    config = config or mesh.raster_config
    n_faces = mesh.n_faces
    tri = mesh.get_tri_verts_device(cameras)
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

    # Per-sensor warped->ideal distortion maps (None disables the remap for
    # a sensor-less/undistorted view).  Map index -1 = identity.
    n = len(cameras)
    map_idx_all = np.full(n, -1, np.int32)
    w2i_list: typing.List[np.ndarray] = []
    if apply_distortion is None or apply_distortion:
        sensor_to_map: dict = {}
        for i in range(n):
            sid = cameras.sensor_IDs[i]
            if sid not in sensor_to_map:
                m = mesh._distortion_map_device(
                    cameras, i, aggregate_img_scale
                )
                if m is None:
                    sensor_to_map[sid] = -1
                else:
                    sensor_to_map[sid] = len(w2i_list)
                    w2i_list.append(np.asarray(m))
            map_idx_all[i] = sensor_to_map[sid]
    if w2i_list:
        w2i_maps = jax.device_put(
            jnp.asarray(np.stack(w2i_list, axis=0), jnp.float32), replicated
        )
    else:
        w2i_maps = jax.device_put(
            jnp.zeros((1, 2, h, w), jnp.float32), replicated
        )

    @jax.jit
    def device_step(
        tri, w2i_maps, w2c_shard, f_shard, valid_shard, imgs_shard, midx_shard
    ):
        def per_device(tri, w2i_maps, w2c_b, f_b, valid_b, imgs_b, midx_b):
            # collapse the (local-shard=1, steps) leading axes
            w2c_b = w2c_b.reshape(-1, 4, 4)
            f_b = f_b.reshape(-1)
            valid_b = valid_b.reshape(-1)
            imgs_b = imgs_b.reshape((-1,) + imgs_b.shape[2:])
            midx_b = midx_b.reshape(-1)

            def one(carry, inputs):
                w2c_k, f_k, valid_k, img_k, midx_k = inputs
                frac_acc, views_acc = carry
                p2f = rasterize_triangles(
                    transform_to_camera(tri, w2c_k),
                    f_k,
                    image_w=w,
                    image_h=h,
                    config=config,
                )
                p2f = jax.lax.cond(
                    midx_k >= 0,
                    lambda p: remap_image_jax(
                        p, w2i_maps[jnp.maximum(midx_k, 0)], fill_value=-1
                    ),
                    lambda p: p,
                    p2f,
                )
                counts = project_image_class_counts(
                    p2f, img_k, n_faces=n_faces, n_classes=n_classes
                )
                counts = counts * valid_k
                face_total = jnp.sum(counts, axis=1)
                seen = (face_total > 0).astype(jnp.float32)
                # per-view class fraction: this view's vote, weighted
                # equally with every other view that saw the face
                frac = counts / jnp.maximum(face_total, 1.0)[:, None]
                return (frac_acc + frac, views_acc + seen), None

            init = (
                jnp.zeros((n_faces, n_classes), jnp.float32),
                jnp.zeros((n_faces,), jnp.float32),
            )
            from geograypher_tpu.parallel.sharding import unrolled_view_scan

            (fracs, views), _ = unrolled_view_scan(
                one, init, (w2c_b, f_b, valid_b, imgs_b, midx_b)
            )
            return (
                jax.lax.psum(fracs, VIEW_AXIS),
                jax.lax.psum(views, VIEW_AXIS),
            )

        return jax.shard_map(
            per_device,
            mesh=device_mesh,
            in_specs=(
                P(), P(), P(VIEW_AXIS), P(VIEW_AXIS), P(VIEW_AXIS),
                P(VIEW_AXIS), P(VIEW_AXIS),
            ),
            out_specs=(P(), P()),
            check_vma=False,
        )(tri, w2i_maps, w2c_shard, f_shard, valid_shard, imgs_shard,
          midx_shard)

    n_pad = -(-n // n_dev) * n_dev
    order = list(range(n)) + [0] * (n_pad - n)
    valid = np.array([1.0] * n + [0.0] * (n_pad - n), np.float32)
    w2c_all = np.asarray(batch.world_to_cam)
    f_all = np.asarray(batch.f)

    total_fracs = np.zeros((n_faces, n_classes), np.float32)
    total_views = np.zeros((n_faces,), np.float32)

    with concurrent.futures.ThreadPoolExecutor(prefetch_workers) as pool:
        futures: dict = {}

        def ensure(i: int):
            if i not in futures and i < n_pad:
                futures[i] = pool.submit(class_image_provider, order[i])

        window = n_dev * 3  # slots kept in flight ahead of the device
        for i in range(min(n_pad, window)):
            ensure(i)
        for start in range(0, n_pad, n_dev):
            idx = list(range(start, start + n_dev))
            imgs = np.stack([futures.pop(i).result() for i in idx], axis=0)
            for j in range(start + n_dev, min(start + n_dev + window, n_pad)):
                ensure(j)
            # reshape per-device leading dim: (n_dev, 1, ...) so scan runs
            # once per step per device
            fracs, views = device_step(
                tri,
                w2i_maps,
                jax.device_put(
                    w2c_all[[order[i] for i in idx]][:, None], sharding
                ),
                jax.device_put(f_all[[order[i] for i in idx]][:, None], sharding),
                jax.device_put(valid[idx][:, None], sharding),
                jax.device_put(
                    jnp.asarray(imgs[:, None], jnp.int32), sharding
                ),
                jax.device_put(
                    map_idx_all[[order[i] for i in idx]][:, None], sharding
                ),
            )
            total_fracs += np.asarray(fracs)
            total_views += np.asarray(views)
    return total_fracs, total_views
