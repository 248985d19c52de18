"""Minimal GeoTIFF raster IO + sampling (replaces rasterio usage).

The reference uses rasterio for DTM sampling (meshes.py:1443-1461),
windowed chip IO and prediction assembly (predictors/ortho_segmentor.py).
rasterio/GDAL are absent here; this module reads/writes GeoTIFFs through
PIL with manual handling of the Geo tags:

* 33550 ModelPixelScaleTag, 33922 ModelTiepointTag (geotransform)
* 34264 ModelTransformationTag (full 4x4, read path)
* 34735 GeoKeyDirectoryTag (EPSG code)

Only the north-up affine case is produced on write, which is what the
reference's outputs use.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from geograypher_tpu.constants import PATH_TYPE

TAG_MODEL_PIXEL_SCALE = 33550
TAG_MODEL_TIEPOINT = 33922
TAG_MODEL_TRANSFORM = 34264
TAG_GEO_KEY_DIRECTORY = 34735

# GeoKey ids
KEY_GT_MODEL_TYPE = 1024
KEY_GEOGRAPHIC_TYPE = 2048
KEY_PROJECTED_CS_TYPE = 3072


@dataclasses.dataclass
class Raster:
    """An in-memory georeferenced raster.

    ``transform`` is the affine (a, b, c, d, e, f) mapping pixel (col, row)
    -> (x, y): x = a*col + b*row + c ; y = d*col + e*row + f  (GDAL-style,
    pixel edge origin).
    """

    data: np.ndarray  # (H, W) or (H, W, C)
    transform: Tuple[float, float, float, float, float, float]
    epsg: Optional[int] = None
    nodata: Optional[float] = None

    @property
    def shape(self):
        return self.data.shape

    @property
    def bounds(self) -> Tuple[float, float, float, float]:
        h, w = self.data.shape[:2]
        corners = np.array([[0, 0], [w, 0], [0, h], [w, h]], dtype=np.float64)
        xs, ys = self.pixel_to_world(corners[:, 0], corners[:, 1])
        return float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max())

    def pixel_to_world(self, col, row):
        a, b, c, d, e, f = self.transform
        return a * col + b * row + c, d * col + e * row + f

    def world_to_pixel(self, x, y):
        a, b, c, d, e, f = self.transform
        det = a * e - b * d
        col = (e * (np.asarray(x) - c) - b * (np.asarray(y) - f)) / det
        row = (-d * (np.asarray(x) - c) + a * (np.asarray(y) - f)) / det
        return col, row

    def sample(self, xs, ys, method: str = "nearest"):
        """Sample raster values at world coordinates; NaN outside / nodata."""
        col, row = self.world_to_pixel(xs, ys)
        h, w = self.data.shape[:2]
        data = self.data.astype(np.float64)
        if self.nodata is not None:
            data = np.where(data == self.nodata, np.nan, data)
        if method == "nearest":
            ci = np.floor(col).astype(int)
            ri = np.floor(row).astype(int)
            ok = (ci >= 0) & (ci < w) & (ri >= 0) & (ri < h)
            out = np.full(
                np.shape(ci) + data.shape[2:], np.nan, dtype=np.float64
            )
            out[ok] = data[ri[ok], ci[ok]]
            return out
        if method == "bilinear":
            cf = col - 0.5
            rf = row - 0.5
            c0 = np.floor(cf).astype(int)
            r0 = np.floor(rf).astype(int)
            wc = cf - c0
            wr = rf - r0
            out = np.zeros(np.shape(c0) + data.shape[2:], dtype=np.float64)
            total = np.zeros(np.shape(c0), dtype=np.float64)
            for dc, dr, wt in (
                (0, 0, (1 - wc) * (1 - wr)),
                (1, 0, wc * (1 - wr)),
                (0, 1, (1 - wc) * wr),
                (1, 1, wc * wr),
            ):
                ci, ri = c0 + dc, r0 + dr
                ok = (ci >= 0) & (ci < w) & (ri >= 0) & (ri < h)
                val = np.where(
                    ok[..., None] if data.ndim == 3 else ok,
                    data[np.clip(ri, 0, h - 1), np.clip(ci, 0, w - 1)],
                    0.0,
                )
                good = ok & ~np.isnan(
                    val if data.ndim == 2 else val[..., 0]
                )
                out += np.where(
                    good[..., None] if data.ndim == 3 else good, val * (
                        wt[..., None] if data.ndim == 3 else wt
                    ), 0.0
                )
                total += np.where(good, wt, 0.0)
            with np.errstate(invalid="ignore", divide="ignore"):
                out = out / (total[..., None] if data.ndim == 3 else total)
            out[total == 0] = np.nan
            return out
        raise ValueError(f"Unknown sampling method {method}")

    def reprojected(
        self,
        dst_epsg: int,
        resolution: Optional[float] = None,
        method: str = "nearest",
    ) -> "Raster":
        """Resample this raster into another CRS (reference
        utils/geospatial.py:333-360 ``reproject_raster``).

        The destination grid is north-up, covering the reprojected corner
        bounds at ``resolution`` (defaults to the source pixel size
        expressed in destination units via the corner mapping).  Each
        destination pixel center is mapped BACK to the source CRS and
        sampled (inverse warping — no holes).
        """
        from geograypher_tpu.utils import crs as crs_utils

        if self.epsg is None:
            raise ValueError("Raster has no CRS to reproject from")
        h, w = self.data.shape[:2]
        # reproject a corner+edge ring to bound the destination footprint
        cols = np.linspace(0, w, 9)
        rows = np.linspace(0, h, 9)
        ring_c = np.concatenate([cols, np.full(9, w), cols, np.zeros(9)])
        ring_r = np.concatenate([np.zeros(9), rows, np.full(9, h), rows])
        xs, ys = self.pixel_to_world(ring_c, ring_r)
        # rasters follow the GDAL axis order (x=easting/lon, y=northing/
        # lat) while transform_points uses pyproj's (lat, lon) columns
        # for geographic CRSs — swap on the way in and out
        src_geo = self.epsg in crs_utils.GEOGRAPHIC_EPSG
        dst_geo = dst_epsg in crs_utils.GEOGRAPHIC_EPSG
        pts = np.stack(
            ([ys, xs] if src_geo else [xs, ys]) + [np.zeros_like(xs)],
            axis=1,
        )
        dst = crs_utils.transform_points(pts, self.epsg, dst_epsg)
        if dst_geo:
            dst = dst[:, [1, 0, 2]]
        dx0, dy0 = dst[:, 0].min(), dst[:, 1].min()
        dx1, dy1 = dst[:, 0].max(), dst[:, 1].max()
        if resolution is None:
            # source pixel footprint in destination units
            src_res = float(
                np.hypot(self.transform[0], self.transform[3])
            ) or 1.0
            span_ratio = np.hypot(dx1 - dx0, dy1 - dy0) / max(
                np.hypot(*np.subtract(self.bounds[2:], self.bounds[:2])),
                1e-12,
            )
            resolution = src_res * span_ratio
        dw = max(int(np.ceil((dx1 - dx0) / resolution)), 1)
        dh = max(int(np.ceil((dy1 - dy0) / resolution)), 1)
        dcol, drow = np.meshgrid(
            np.arange(dw) + 0.5, np.arange(dh) + 0.5
        )
        dxs = dx0 + dcol * resolution
        dys = dy1 - drow * resolution
        bpts = np.stack(
            (
                [dys.ravel(), dxs.ravel()]
                if dst_geo
                else [dxs.ravel(), dys.ravel()]
            )
            + [np.zeros(dxs.size)],
            axis=1,
        )
        back = crs_utils.transform_points(bpts, dst_epsg, self.epsg)
        if src_geo:
            back = back[:, [1, 0, 2]]
        vals = self.sample(back[:, 0], back[:, 1], method=method)
        data = vals.reshape((dh, dw) + self.data.shape[2:])
        nodata = self.nodata
        if nodata is not None:
            # preserve the source dtype + nodata tag (integer class
            # rasters must stay integer: NaN.astype(int) is undefined)
            data = np.where(np.isnan(data), nodata, data).astype(
                self.data.dtype
            )
        elif not np.isnan(data).any():
            data = data.astype(self.data.dtype)
        return Raster(
            data,
            (resolution, 0.0, dx0, 0.0, -resolution, dy1),
            dst_epsg,
            nodata=nodata,
        )

    def downsampled(self, factor: int) -> "Raster":
        """Blockwise-subsampled raster (reference geospatial.py:362-392)."""
        import cv2

        h, w = self.data.shape[:2]
        data = cv2.resize(
            self.data,
            (max(1, w // factor), max(1, h // factor)),
            interpolation=cv2.INTER_AREA,
        )
        a, b, c, d, e, f = self.transform
        fx = w / data.shape[1]
        fy = h / data.shape[0]
        return Raster(
            data, (a * fx, b * fx, c, d * fy, e * fy, f), self.epsg, self.nodata
        )


def read_geotiff(path: PATH_TYPE) -> Raster:
    from PIL import Image

    Image.MAX_IMAGE_PIXELS = None
    with Image.open(path) as img:
        tags = getattr(img, "tag_v2", {}) or {}
        data = np.asarray(img)
        transform = None
        if TAG_MODEL_TRANSFORM in tags:
            m = np.asarray(tags[TAG_MODEL_TRANSFORM], dtype=np.float64)
            transform = (m[0], m[1], m[3], m[4], m[5], m[7])
        elif TAG_MODEL_PIXEL_SCALE in tags and TAG_MODEL_TIEPOINT in tags:
            sx, sy = tags[TAG_MODEL_PIXEL_SCALE][:2]
            tp = tags[TAG_MODEL_TIEPOINT]
            # tiepoint: (i, j, k, x, y, z): pixel (i, j) -> world (x, y)
            i0, j0, _, x0, y0, _ = tp[:6]
            transform = (
                float(sx), 0.0, float(x0) - float(i0) * float(sx),
                0.0, -float(sy), float(y0) + float(j0) * float(sy),
            )
        else:
            transform = (1.0, 0.0, 0.0, 0.0, -1.0, float(data.shape[0]))
        epsg = None
        if TAG_GEO_KEY_DIRECTORY in tags:
            kd = list(tags[TAG_GEO_KEY_DIRECTORY])
            for k in range(4, len(kd), 4):
                key, loc, cnt, val = kd[k : k + 4]
                if key in (KEY_PROJECTED_CS_TYPE, KEY_GEOGRAPHIC_TYPE) and loc == 0:
                    epsg = int(val)
                    if key == KEY_PROJECTED_CS_TYPE:
                        break
        nodata = None
        if 42113 in tags:  # GDAL_NODATA ascii tag
            try:
                nodata = float(str(tags[42113]).strip("\x00 "))
            except ValueError:
                pass
        return Raster(data=data, transform=transform, epsg=epsg, nodata=nodata)


def write_geotiff(path: PATH_TYPE, raster: Raster) -> None:
    from PIL import Image
    from PIL.TiffImagePlugin import ImageFileDirectory_v2

    from geograypher_tpu.utils.files import ensure_containing_folder

    ensure_containing_folder(path)
    a, b, c, d, e, f = raster.transform
    if abs(b) > 1e-12 or abs(d) > 1e-12:
        raise ValueError("write_geotiff only supports north-up affine")
    ifd = ImageFileDirectory_v2()
    ifd[TAG_MODEL_PIXEL_SCALE] = (float(a), float(-e), 0.0)
    ifd[TAG_MODEL_TIEPOINT] = (0.0, 0.0, 0.0, float(c), float(f), 0.0)
    if raster.epsg is not None:
        is_geo = int(raster.epsg) == 4326
        key = KEY_GEOGRAPHIC_TYPE if is_geo else KEY_PROJECTED_CS_TYPE
        model = 2 if is_geo else 1
        ifd[TAG_GEO_KEY_DIRECTORY] = tuple(
            int(v)
            for v in (
                1, 1, 0, 2,
                KEY_GT_MODEL_TYPE, 0, 1, model,
                key, 0, 1, int(raster.epsg),
            )
        )
    if raster.nodata is not None:
        ifd[42113] = str(raster.nodata)
    img = Image.fromarray(raster.data)
    img.save(str(path), format="TIFF", tiffinfo=ifd)


def reproject_raster(
    input_filename: PATH_TYPE,
    output_filename: PATH_TYPE,
    dst_epsg: int,
    resolution: Optional[float] = None,
    method: str = "nearest",
) -> None:
    """File-level raster reprojection (reference utils/geospatial.py:333).

    Reads a GeoTIFF, resamples it into ``dst_epsg`` (see
    :meth:`Raster.reprojected`), writes the result.
    """
    write_geotiff(
        output_filename,
        read_geotiff(input_filename).reprojected(
            dst_epsg, resolution=resolution, method=method
        ),
    )
