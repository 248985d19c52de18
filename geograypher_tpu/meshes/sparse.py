"""Sparse aggregation for huge discrete label spaces.

Port of the reference's ``TexturedPhotogrammetryMeshIndexPredictions``
(/root/reference/geograypher/meshes/derived_meshes.py:414-550): when the
"classes" are per-detection instances or per-image ids (tens of thousands
to millions), a dense (faces x classes) accumulator is infeasible.

TPU-native design: each view's pix2face + detection-index image reduce to
COO (face, class, count) triples via one on-device sort-free segment-sum
over the PER-VIEW compact class set (each image only contains a handful of
detections), and the host accumulates scipy CSR across views.
"""

from __future__ import annotations

import typing

import numpy as np
import scipy.sparse

import jax.numpy as jnp

from geograypher_tpu.cameras.core import CameraSet
from geograypher_tpu.meshes.mesh import TexturedMesh
from geograypher_tpu.ops.aggregate import project_image_class_counts


def aggregate_index_predictions(
    mesh: TexturedMesh,
    cameras: CameraSet,
    n_classes: int,
    aggregate_img_scale: float = 1.0,
    check_null_image: bool = True,
    **pix2face_kwargs,
) -> typing.Tuple[scipy.sparse.csr_array, np.ndarray]:
    """Accumulate sparse per-face class counts across views.

    Args:
        mesh: the textured mesh.
        cameras: camera set whose images are detection-index rasters
            (NaN = background, else global class/detection index).
        n_classes: total number of global classes/detections.

    Returns:
        counts: (n_faces, n_classes) CSR of pixel counts
        faces_seen: (n_faces,) number of views seeing each face
    """
    n_faces = mesh.n_faces
    rows, cols, vals = [], [], []
    faces_seen = np.zeros(n_faces)
    for i in range(len(cameras)):
        img = cameras.get_image_by_index(i, aggregate_img_scale)
        img = np.asarray(img, dtype=np.float64)
        if img.ndim == 3:
            img = img[..., 0]
        finite = np.isfinite(img)
        if check_null_image and not finite.any():
            continue
        p2f = mesh.pix2face(
            cameras, [i], render_img_scale=aggregate_img_scale,
            **pix2face_kwargs,
        )[0]
        # remap this view's classes to a compact local set
        local_classes = np.unique(img[finite]).astype(np.int64)
        local_img = np.full(img.shape, -1, np.int32)
        # vectorized global-id -> compact-local-id remap; local_classes is
        # sorted+unique so searchsorted is an exact inverse LUT.  This must
        # stay O(pixels) vectorized: the ImageIDSegmentor visibility path
        # has EVERY pixel finite (~8M at 4K).
        local_img[finite] = np.searchsorted(
            local_classes, img[finite].astype(np.int64)
        ).astype(np.int32)
        counts = np.asarray(
            project_image_class_counts(
                jnp.asarray(p2f),
                jnp.asarray(local_img),
                n_faces=n_faces,
                n_classes=max(len(local_classes), 1),
            )
        )
        f_idx, c_idx = np.nonzero(counts)
        rows.append(f_idx)
        cols.append(local_classes[c_idx])
        vals.append(counts[f_idx, c_idx])
        faces_seen_view = np.zeros(n_faces, bool)
        faces_seen_view[np.unique(p2f[p2f >= 0])] = True
        faces_seen += faces_seen_view
    if rows:
        counts = scipy.sparse.csr_array(
            (
                np.concatenate(vals),
                (np.concatenate(rows), np.concatenate(cols)),
            ),
            shape=(n_faces, n_classes),
        )
    else:
        counts = scipy.sparse.csr_array((n_faces, n_classes))
    return counts, faces_seen


def normalize_sparse_counts(
    counts: scipy.sparse.csr_array,
    faces_seen: typing.Optional[np.ndarray] = None,
) -> scipy.sparse.csr_array:
    """Per-face reciprocal normalization of a CSR count matrix.

    With ``faces_seen`` (the views-seeing-each-face vector from
    :func:`aggregate_index_predictions`), counts divide by the VIEW
    count — the reference's semantics (derived_meshes.py:522-548:
    summed projections x reciprocal projection_counts).  Without it,
    each face's counts divide by its own total, so rows sum to 1
    (pixel-fraction normalization).
    """
    if faces_seen is not None:
        totals = np.asarray(faces_seen, dtype=float).reshape(-1)
    else:
        totals = np.asarray(counts.sum(axis=1)).reshape(-1)
    inv = np.zeros_like(totals)
    nz = totals > 0
    inv[nz] = 1.0 / totals[nz]
    d = scipy.sparse.diags_array(inv)
    return (d @ counts).tocsr()


def sparse_argmax(counts: scipy.sparse.csr_array) -> np.ndarray:
    """Per-face argmax class over a CSR count matrix; NaN for empty rows.

    Fully vectorized (segmented reduceat over the CSR structure) — this
    runs at survey scale (1M+ faces) on the project_detections path.  Ties
    break toward the first stored (lowest) class index, like np.argmax.
    """
    counts = counts.tocsr()
    out = np.full(counts.shape[0], np.nan)
    row_nnz = np.diff(counts.indptr)
    rows = np.nonzero(row_nnz > 0)[0]
    if rows.size == 0:
        return out
    starts = counts.indptr[rows]
    row_max = np.maximum.reduceat(counts.data, starts)
    # first position per row whose value equals the row max
    pos = np.arange(counts.data.size)
    pos = np.where(
        counts.data == np.repeat(row_max, row_nnz[rows]), pos, counts.data.size
    )
    first = np.minimum.reduceat(pos, starts)
    out[rows] = counts.indices[first]
    return out
