"""Orthomosaic chip/assemble pipeline (non-multiview baseline).

Behavioral port of the reference's predictors/ortho_segmentor.py: slice a
large orthomosaic into overlapping training/inference chips with
rasterized vector labels (``write_chips``, reference :96-270), then
re-assemble per-chip predictions into a single class raster with ramped
edge down-weighting (``assemble_tiled_predictions``, reference :273-431).
Windows are encoded in chip filenames exactly like the reference
(:32-38) so chips and predictions pair up by name.
"""

from __future__ import annotations

import typing
from pathlib import Path

import numpy as np

from geograypher_tpu.constants import PATH_TYPE
from geograypher_tpu.utils.files import ensure_folder
from geograypher_tpu.utils.numeric import create_ramped_weighting
from geograypher_tpu.utils.raster import Raster, read_geotiff, write_geotiff


def get_str_from_window(window: dict, suffix: str) -> str:
    """'<row>:<col>:<height>:<width><suffix>' filename encoding
    (reference ortho_segmentor.py:32-38)."""
    return (
        f"{window['row']}:{window['col']}:{window['height']}:{window['width']}"
        + suffix
    )


def parse_windows_from_files(
    files: typing.Sequence[Path],
) -> typing.List[dict]:
    """Recover window dicts from chip filenames (reference :40-81)."""
    windows = []
    for f in files:
        row, col, height, width = (int(x) for x in Path(f).stem.split(":"))
        windows.append(
            {"row": row, "col": col, "height": height, "width": width}
        )
    return windows


def create_windows(
    data_shape: typing.Tuple[int, int], chip_size: int, chip_stride: int
):
    """Sliding windows covering an (H, W) raster (reference :24-30)."""
    h, w = data_shape[:2]
    for row in range(0, h, chip_stride):
        for col in range(0, w, chip_stride):
            yield {
                "row": row,
                "col": col,
                "height": min(chip_size, h - row),
                "width": min(chip_size, w - col),
            }


def write_chips(
    raster_file: PATH_TYPE,
    output_folder: PATH_TYPE,
    chip_size: int,
    chip_stride: int,
    label_vector_file: typing.Optional[PATH_TYPE] = None,
    label_column: typing.Optional[str] = None,
    label_remap: typing.Optional[dict] = None,
    write_empty_tile_if_no_labels: bool = True,
    output_suffix: str = ".png",
    background_ind: int = 255,
    skip_all_nodata_tiles: bool = True,
) -> typing.Optional[dict]:
    """Chip an orthomosaic (+ optional rasterized vector labels) to disk
    (reference ortho_segmentor.py:96-270).

    Returns the label->index mapping when labels are written.
    """
    import cv2

    raster = read_geotiff(raster_file)
    data = raster.data
    imgs_folder = ensure_folder(Path(output_folder, "imgs"))

    label_img = None
    label_to_index = None
    if label_vector_file is not None:
        from geograypher_tpu.utils.vector import (
            VectorData,
            rasterize_polygons,
        )

        vd = VectorData.read_file(label_vector_file)
        if vd.epsg is not None and raster.epsg is not None:
            vd = vd.to_crs(raster.epsg)
        if label_column is not None and label_column in vd.attributes:
            col = vd.attributes[label_column]
            if label_remap is not None:
                values = [label_remap.get(v, background_ind) for v in col]
                label_to_index = dict(label_remap)
            else:
                classes = sorted({v for v in col if v is not None}, key=str)
                label_to_index = {c: i for i, c in enumerate(classes)}
                values = [label_to_index.get(v, background_ind) for v in col]
        else:
            values = list(range(len(vd)))
            label_to_index = {i: i for i in values}
        h, w = data.shape[:2]
        label_img = rasterize_polygons(
            [g for g in vd.geometries],
            values,
            raster.bounds,
            (h, w),
            background=background_ind,
        )
        anns_folder = ensure_folder(Path(output_folder, "anns"))

    for window in create_windows(data.shape, chip_size, chip_stride):
        r, c = window["row"], window["col"]
        hh, ww = window["height"], window["width"]
        chip = data[r : r + hh, c : c + ww]
        if skip_all_nodata_tiles and chip.ndim == 3 and chip.shape[-1] == 4:
            if (chip[..., 3] == 0).all():
                continue
        name = get_str_from_window(window, output_suffix)
        img_out = chip[..., :3] if chip.ndim == 3 else chip
        label_chip = None
        if label_img is not None:
            label_chip = label_img[r : r + hh, c : c + ww]
            if (
                not write_empty_tile_if_no_labels
                and (label_chip == background_ind).all()
            ):
                # skip BEFORE writing the image chip: imgs/ and anns/
                # pair up by name (reference ortho_segmentor.py:228-231)
                continue
        cv2.imwrite(str(imgs_folder / name), np.asarray(img_out))
        if label_chip is not None:
            cv2.imwrite(
                str(anns_folder / name),
                label_chip.astype(np.uint8),
            )
    return label_to_index


def assemble_tiled_predictions(
    raster_file: PATH_TYPE,
    pred_files: typing.Sequence[PATH_TYPE],
    num_classes: int,
    class_savefile: PATH_TYPE,
    counts_savefile: typing.Optional[PATH_TYPE] = None,
    downweight_edge_frac: float = 0.25,
    nodataval: int = 255,
    count_dtype=np.uint8,
    max_overlapping_tiles: int = 4,
) -> None:
    """Merge per-chip prediction rasters into one class GeoTIFF
    (reference ortho_segmentor.py:273-431).

    Per-class accumulation with a linear edge down-weighting ramp, scaled
    into ``count_dtype`` so at most ``max_overlapping_tiles`` chips can
    stack without overflow, then per-pixel argmax.
    """
    from geograypher_tpu.utils.io import read_image_or_numpy

    raster = read_geotiff(raster_file)
    h, w = raster.data.shape[:2]
    windows = parse_windows_from_files([Path(f) for f in pred_files])

    scale = np.iinfo(count_dtype).max / max_overlapping_tiles
    counts = np.zeros((h, w, num_classes), dtype=count_dtype)
    observed = np.zeros((h, w), dtype=bool)

    weight_cache: dict = {}
    for f, window in zip(pred_files, windows):
        pred = read_image_or_numpy(f)
        if pred.ndim == 3:
            pred = pred[..., 0]
        r, c = window["row"], window["col"]
        hh, ww = window["height"], window["width"]
        if pred.shape[:2] != (hh, ww):
            raise ValueError(
                f"prediction {f} shape {pred.shape[:2]} does not match "
                f"its filename-encoded window ({hh}, {ww}) — chips from "
                "write_chips are already edge-clipped; un-pad model "
                "outputs before assembly"
            )
        key = (hh, ww)
        if key not in weight_cache:
            weight_cache[key] = create_ramped_weighting(
                (hh, ww), downweight_edge_frac
            )
        weight = weight_cache[key]
        valid = pred != nodataval
        scaled = (weight * scale).astype(count_dtype)
        for cls in np.unique(pred[valid]):
            mask = pred == cls
            block = counts[r : r + hh, c : c + ww, int(cls)]
            counts[r : r + hh, c : c + ww, int(cls)] = np.clip(
                block.astype(np.int64) + scaled * mask,
                0,
                np.iinfo(count_dtype).max,
            ).astype(count_dtype)
        # ramp-zero border pixels contribute no counts: marking them
        # observed would argmax all-zero histograms to class 0 at the
        # mosaic border instead of nodata
        observed[r : r + hh, c : c + ww] |= valid & (scaled > 0)

    classes = np.argmax(counts, axis=-1).astype(np.uint8)
    classes[~observed] = nodataval
    out = Raster(
        data=classes,
        transform=raster.transform,
        epsg=raster.epsg,
        nodata=nodataval,
    )
    write_geotiff(class_savefile, out)
    if counts_savefile is not None:
        write_geotiff(
            counts_savefile,
            Raster(
                data=counts.sum(axis=-1).astype(np.uint16),
                transform=raster.transform,
                epsg=raster.epsg,
            ),
        )
