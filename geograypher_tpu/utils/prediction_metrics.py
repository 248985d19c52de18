"""Evaluation metrics for geospatial predictions.

Counterpart of /root/reference/geograypher/utils/prediction_metrics.py:
confusion matrices between predicted and ground-truth maps (raster or
vector), accuracy, and class-averaged precision/recall.  Vector-vs-vector
comparison rasterizes both layers onto a common grid so the pixel joint
histogram approximates the reference's polygon-intersection-area matrix
(cf_from_vector_vector, reference :95-145).
"""

from __future__ import annotations

import typing
from pathlib import Path

import numpy as np

from geograypher_tpu.constants import PATH_TYPE


def check_if_raster(filename: PATH_TYPE) -> bool:
    """Classify a geodata file as raster or vector (reference :27-35)."""
    suffix = Path(filename).suffix.lower()
    if suffix in (".tif", ".tiff"):
        return True
    if suffix in (".geojson", ".json", ".gpkg", ".shp"):
        return False
    raise ValueError(f"Unknown geodata extension {suffix}")


def cf_from_vector_vector(
    predicted,
    true,
    column_name: str,
    class_names: typing.Optional[list] = None,
    grid: int = 2048,
    include_unlabeled: bool = True,
    mode: str = "raster",
):
    """Confusion matrix weighted by intersection area between two polygon
    layers (reference :95-145).

    ``mode="raster"`` (default) burns both layers onto a common grid;
    ``mode="exact"`` computes true pairwise polygon intersection areas
    by convex clipping (utils/exact_geometry) — the reference's GEOS
    behavior, with no grid quantization.

    Returns (cf (C[+1], C[+1]) areas, class_names).  The trailing
    row/column is the unlabeled class when requested.
    """
    from geograypher_tpu.utils.vector import VectorData, rasterize_polygons

    if not isinstance(predicted, VectorData):
        predicted = VectorData.read_file(predicted)
    if not isinstance(true, VectorData):
        true = VectorData.read_file(true)
    if predicted.epsg is not None:
        predicted = predicted.ensure_projected()
        if true.epsg is not None:
            true = true.to_crs(predicted.epsg)

    if class_names is None:
        vals = set(predicted.attributes.get(column_name, [])) | set(
            true.attributes.get(column_name, [])
        )
        class_names = sorted({v for v in vals if v is not None}, key=str)
    name_to_id = {c: i for i, c in enumerate(class_names)}
    n = len(class_names)

    if mode == "exact":
        from geograypher_tpu.utils.exact_geometry import (
            polygon_intersection_area,
        )

        size = n + 1 if include_unlabeled else n
        cf = np.zeros((size, size))

        def ids_areas(vd):
            ids = [
                name_to_id.get(v, n)
                for v in vd.attributes.get(column_name, [None] * len(vd))
            ]
            return ids, [g.area for g in vd.geometries]

        from geograypher_tpu.utils.exact_geometry import ear_clip

        t_ids, t_areas = ids_areas(true)
        p_ids, p_areas = ids_areas(predicted)
        p_overlap = np.zeros(len(predicted))
        for ti, tg in enumerate(true.geometries):
            t_cov = 0.0
            # hoist the O(K^2) triangulation of tg out of the P-loop
            tg_tris = ear_clip(tg.exterior)
            tg_hole_tris = [ear_clip(h) for h in tg.holes]
            for pi, pg in enumerate(predicted.geometries):
                inter = polygon_intersection_area(
                    tg, pg, a_tris=tg_tris, a_hole_tris=tg_hole_tris
                )
                if inter <= 0:
                    continue
                t_cov += inter
                p_overlap[pi] += inter
                if t_ids[ti] < size and p_ids[pi] < size:
                    cf[t_ids[ti], p_ids[pi]] += inter
            if include_unlabeled and t_ids[ti] < size:
                # parts of the true polygon no prediction covers
                cf[t_ids[ti], n] += max(t_areas[ti] - t_cov, 0.0)
        if include_unlabeled:
            for pi in range(len(predicted)):
                if p_ids[pi] < size:
                    cf[n, p_ids[pi]] += max(
                        p_areas[pi] - p_overlap[pi], 0.0
                    )
        return cf, class_names

    bounds = true.total_bounds()
    px0, py0, px1, py1 = predicted.total_bounds()
    bounds = (
        min(bounds[0], px0), min(bounds[1], py0),
        max(bounds[2], px1), max(bounds[3], py1),
    )
    area_per_px = ((bounds[2] - bounds[0]) / grid) * ((bounds[3] - bounds[1]) / grid)

    def burn(vd):
        vals = [
            name_to_id.get(v, n)
            for v in vd.attributes.get(column_name, [None] * len(vd))
        ]
        return rasterize_polygons(
            vd.geometries, vals, bounds, (grid, grid), background=n
        )

    pred_img = burn(predicted)
    true_img = burn(true)
    size = n + 1 if include_unlabeled else n
    mask = np.ones_like(pred_img, bool)
    if not include_unlabeled:
        mask = (pred_img < n) & (true_img < n)
    flat = true_img[mask] * size + pred_img[mask]
    cf = np.bincount(flat, minlength=size * size).reshape(size, size).astype(float)
    cf *= area_per_px
    return cf, class_names


def compute_confusion_matrix_from_geospatial(
    prediction_file: PATH_TYPE,
    groundtruth_file: PATH_TYPE,
    column_name: str,
    class_names: typing.Optional[list] = None,
    grid: int = 2048,
):
    """Dispatch raster/vector comparison (reference :147-230).  Raster
    inputs are compared pixelwise after resampling to the coarser grid."""
    pred_is_raster = check_if_raster(prediction_file)
    true_is_raster = check_if_raster(groundtruth_file)
    if not pred_is_raster and not true_is_raster:
        return cf_from_vector_vector(
            prediction_file, groundtruth_file, column_name,
            class_names=class_names, grid=grid,
        )
    if pred_is_raster and true_is_raster:
        from geograypher_tpu.utils.raster import read_geotiff

        pred = read_geotiff(prediction_file)
        true = read_geotiff(groundtruth_file)
        # align through the geotransforms: resample the finer raster at
        # the coarser raster's pixel centers (shapes/resolutions need
        # not match; naive array cropping would compare misaligned
        # pixels)
        def px_area(r):
            return abs(r.transform[0] * r.transform[4]) or 1.0

        coarse, fine = (
            (true, pred) if px_area(true) >= px_area(pred) else (pred, true)
        )
        if (
            fine.epsg is not None
            and coarse.epsg is not None
            and fine.epsg != coarse.epsg
        ):
            fine = fine.reprojected(coarse.epsg)
        h, w = coarse.data.shape[:2]
        cc, rr = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
        xs, ys = coarse.pixel_to_world(cc.ravel(), rr.ravel())
        fv = fine.sample(xs, ys, method="nearest").reshape(
            (h, w) + fine.data.shape[2:]
        )
        if fv.ndim == 3:
            fv = fv[..., 0]
        fine_vals = np.where(np.isnan(fv), -1, fv).astype(int)
        coarse_vals = np.asarray(
            coarse.data if coarse.data.ndim == 2 else coarse.data[..., 0]
        ).astype(int)
        if coarse is true:
            t, p = coarse_vals, fine_vals
        else:
            p, t = coarse_vals, fine_vals
        if class_names is None:
            class_names = sorted(set(np.unique(p)) | set(np.unique(t)))
        n = len(class_names)
        lut = {c: i for i, c in enumerate(class_names)}
        pi = np.vectorize(lambda v: lut.get(v, n))(p)
        ti = np.vectorize(lambda v: lut.get(v, n))(t)
        ok = (pi < n) & (ti < n)
        cf = np.bincount(
            ti[ok] * n + pi[ok], minlength=n * n
        ).reshape(n, n).astype(float)
        return cf, class_names
    raise NotImplementedError("Mixed raster/vector comparison")


def plot_geodata(
    filename: PATH_TYPE,
    ax=None,
    raster_downsample_factor: int = 8,
    class_column: typing.Optional[str] = None,
    ignore_class: int = 255,
    vis: bool = False,
):
    """Quick-look plot of a raster or vector geofile
    (reference prediction_metrics.py:37-93), headless matplotlib."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots()
    if check_if_raster(filename):
        from geograypher_tpu.utils.raster import read_geotiff

        raster = read_geotiff(filename).downsampled(raster_downsample_factor)
        data = raster.data.astype(float)
        if data.ndim == 2:
            data[data == ignore_class] = np.nan
        x0, y0, x1, y1 = raster.bounds
        ax.imshow(data, extent=(x0, x1, y0, y1))
    else:
        from geograypher_tpu.utils.vector import VectorData, rasterize_polygons

        vd = VectorData.read_file(filename)
        col = vd.attributes.get(class_column) if class_column else None
        if col is not None:
            classes = sorted({v for v in col if v is not None}, key=str)
            vals = [classes.index(v) if v in classes else -1 for v in col]
        else:
            vals = list(range(len(vd)))
        bounds = vd.total_bounds()
        img = rasterize_polygons(vd.geometries, vals, bounds, (512, 512))
        ax.imshow(
            np.where(img >= 0, img, np.nan),
            extent=(bounds[0], bounds[2], bounds[1], bounds[3]),
        )
    return ax


def compute_and_show_cf(
    pred_labels: np.ndarray,
    gt_labels: np.ndarray,
    labels: typing.Optional[list] = None,
    use_labels_from: str = "both",
    vis: bool = False,
    savefile: typing.Optional[PATH_TYPE] = None,
):
    """Confusion matrix from per-sample label lists + optional plot
    (reference prediction_metrics.py:232-291).

    Returns (cf, labels, accuracy)."""
    pred_labels = np.asarray(pred_labels)
    gt_labels = np.asarray(gt_labels)
    if labels is None:
        if use_labels_from == "pred":
            labels = sorted(set(pred_labels.tolist()), key=str)
        elif use_labels_from == "gt":
            labels = sorted(set(gt_labels.tolist()), key=str)
        else:
            labels = sorted(
                set(pred_labels.tolist()) | set(gt_labels.tolist()), key=str
            )
    lut = {l: i for i, l in enumerate(labels)}
    n = len(labels)
    cf = np.zeros((n, n), dtype=np.int64)
    for g, p in zip(gt_labels, pred_labels):
        if g in lut and p in lut:
            cf[lut[g], lut[p]] += 1
    accuracy = np.trace(cf) / max(cf.sum(), 1)
    if vis or savefile is not None:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        im = ax.imshow(cf)
        ax.set_xticks(range(n), [str(l) for l in labels], rotation=45)
        ax.set_yticks(range(n), [str(l) for l in labels])
        ax.set_xlabel("predicted")
        ax.set_ylabel("true")
        fig.colorbar(im)
        if savefile is not None:
            fig.savefig(savefile, dpi=120, bbox_inches="tight")
        plt.close(fig)
    return cf, labels, float(accuracy)


def compute_comprehensive_metrics(cf: np.ndarray) -> dict:
    """Accuracy + class-averaged precision/recall from a confusion matrix
    (true on rows, predicted on columns; reference :293-335)."""
    cf = np.asarray(cf, dtype=float)
    total = cf.sum()
    accuracy = np.trace(cf) / total if total else np.nan
    with np.errstate(invalid="ignore", divide="ignore"):
        recall = np.diag(cf) / cf.sum(axis=1)
        precision = np.diag(cf) / cf.sum(axis=0)
    return {
        "accuracy": float(accuracy),
        "per_class_recall": recall,
        "per_class_precision": precision,
        "class_averaged_recall": float(np.nanmean(recall)),
        "class_averaged_precision": float(np.nanmean(precision)),
    }
