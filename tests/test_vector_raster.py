"""Vector engine (polygons, GeoJSON/GPKG IO, rasterize/vectorize) and
GeoTIFF raster IO tests."""

import json
import sqlite3
import struct

import numpy as np
import pytest

from geograypher_tpu.utils.raster import Raster, read_geotiff, write_geotiff
from geograypher_tpu.utils.vector import (
    Polygon,
    VectorData,
    buffer_polygons,
    polygons_from_mask,
    rasterize_polygons,
    union_all,
)


def square(x0, y0, size):
    return Polygon(
        np.array(
            [[x0, y0], [x0 + size, y0], [x0 + size, y0 + size], [x0, y0 + size]]
        )
    )


def test_polygon_basics():
    p = square(0, 0, 2)
    assert np.isclose(p.area, 4.0)
    assert p.bounds == (0, 0, 2, 2)
    assert np.allclose(p.centroid, (1, 1))
    pts = np.array([[1, 1], [3, 1], [-0.1, 0.5], [1.99, 1.99]])
    assert p.contains_points(pts).tolist() == [True, False, False, True]


def test_polygon_with_hole():
    outer = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], float)
    hole = np.array([[1, 1], [3, 1], [3, 3], [1, 3]], float)
    p = Polygon(outer, [hole])
    assert np.isclose(p.area, 16 - 4)
    assert not p.contains_points(np.array([[2.0, 2.0]]))[0]
    assert p.contains_points(np.array([[0.5, 0.5]]))[0]


def test_geojson_roundtrip(tmp_path):
    vd = VectorData(
        [square(0, 0, 1), square(5, 5, 2)],
        {"name": ["a", "b"], "value": [1, 2]},
        epsg=32611,
    )
    path = tmp_path / "t.geojson"
    vd.to_file(path)
    back = VectorData.read_file(path)
    assert len(back) == 2
    assert back.epsg == 32611
    assert back["name"] == ["a", "b"]
    assert np.allclose(back.geometries[1].exterior, vd.geometries[1].exterior)


def test_gpkg_read(tmp_path):
    """Write a minimal GeoPackage by hand (sqlite + WKB) and read it."""
    path = tmp_path / "t.gpkg"
    con = sqlite3.connect(path)
    con.execute(
        "CREATE TABLE gpkg_geometry_columns (table_name TEXT, column_name "
        "TEXT, geometry_type_name TEXT, srs_id INTEGER, z TINYINT, m TINYINT)"
    )
    con.execute(
        "INSERT INTO gpkg_geometry_columns VALUES ('feats', 'geom', "
        "'POLYGON', 32611, 0, 0)"
    )
    con.execute("CREATE TABLE feats (geom BLOB, label TEXT)")
    # WKB polygon: little endian, type 3, 1 ring, 5 points
    ring = [(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)]
    wkb = struct.pack("<BII", 1, 3, 1) + struct.pack("<I", len(ring))
    for x, y in ring:
        wkb += struct.pack("<dd", float(x), float(y))
    blob = b"GP" + bytes([0, 1]) + struct.pack("<i", 32611) + wkb
    con.execute("INSERT INTO feats VALUES (?, 'tree')", (blob,))
    con.commit()
    con.close()
    vd = VectorData.read_file(path)
    assert len(vd) == 1
    assert vd.epsg == 32611
    assert vd["label"] == ["tree"]
    assert np.isclose(vd.geometries[0].area, 4.0)


def test_rasterize_vectorize_roundtrip():
    polys = [square(10, 10, 30), square(60, 50, 20)]
    bounds = (0, 0, 100, 100)
    img = rasterize_polygons(polys, [1, 1], bounds, (200, 200), 0)
    assert (img == 1).sum() > 0
    out = polygons_from_mask(img > 0, bounds)
    assert len(out) == 2
    areas = sorted(p.area for p in out)
    assert abs(areas[0] - 400) / 400 < 0.15
    assert abs(areas[1] - 900) / 900 < 0.15


def test_union_and_buffer():
    merged = union_all([square(0, 0, 2), square(1, 0, 2)])
    assert len(merged) == 1
    assert abs(merged[0].area - 6.0) / 6.0 < 0.05
    buffered = buffer_polygons([square(0, 0, 2)], 1.0)
    assert len(buffered) == 1
    assert buffered[0].area > 4.0


def test_geotiff_roundtrip(tmp_path):
    data = np.arange(20 * 30, dtype=np.float32).reshape(20, 30)
    r = Raster(
        data=data,
        transform=(2.0, 0.0, 1000.0, 0.0, -2.0, 5000.0),
        epsg=32611,
        nodata=-1.0,
    )
    path = tmp_path / "t.tif"
    write_geotiff(path, r)
    back = read_geotiff(path)
    assert back.epsg == 32611
    assert np.allclose(back.transform, r.transform)
    assert np.allclose(back.data, data)
    assert back.nodata == -1.0
    # sampling: pixel (0, 0) center is at (1001, 4999)
    val = back.sample(np.array([1001.0]), np.array([4999.0]))
    assert np.isclose(val[0], data[0, 0])
    # out of bounds -> NaN
    assert np.isnan(back.sample(np.array([0.0]), np.array([0.0]))[0])


def test_crs_transform_of_vector():
    vd = VectorData([square(499000, 4000000, 1000)], epsg=32611)
    geo = vd.to_crs(4326)
    assert geo.epsg == 4326
    lon, lat = geo.geometries[0].centroid
    assert -118 < lon < -116 and 30 < lat < 40
    back = geo.to_crs(32611)
    assert np.allclose(
        back.geometries[0].exterior, vd.geometries[0].exterior, atol=1e-6
    )


def test_gpkg_write_read_roundtrip(tmp_path):
    vd = VectorData(
        [square(0, 0, 5), Polygon(
            np.array([[10, 10], [20, 10], [20, 20], [10, 20]], float),
            [np.array([[12, 12], [15, 12], [15, 15], [12, 15]], float)],
        )],
        {"species": ["oak", "pine"], "height": [12.5, 8.0]},
        epsg=32611,
    )
    path = tmp_path / "out.gpkg"
    vd.to_file(path)
    back = VectorData.read_file(path)
    assert back.epsg == 32611
    assert len(back) == 2
    assert back["species"] == ["oak", "pine"]
    assert np.isclose(back.geometries[0].area, 25.0)
    assert np.isclose(back.geometries[1].area, 100.0 - 9.0)  # hole kept


def _write_test_shapefile(base):
    """Hand-rolled minimal shapefile: one polygon (with hole) + one point."""
    import struct

    def shp_record(num, content):
        return struct.pack(">2i", num, len(content) // 2) + content

    # record 1: polygon, exterior CW + hole CCW
    ext = [(0, 0), (0, 4), (4, 4), (4, 0), (0, 0)]  # CW in y-up
    hole = [(1, 1), (2, 1), (2, 2), (1, 2), (1, 1)]  # CCW
    pts = ext + hole
    content = struct.pack("<i", 5)
    content += struct.pack("<4d", 0, 0, 4, 4)
    content += struct.pack("<2i", 2, len(pts))
    content += struct.pack("<2i", 0, len(ext))
    for x, y in pts:
        content += struct.pack("<2d", x, y)
    rec1 = shp_record(1, content)
    # record 2: point
    rec2 = shp_record(2, struct.pack("<i2d", 1, 7.5, 8.5))
    body = rec1 + rec2
    header = struct.pack(">i5i", 9994, 0, 0, 0, 0, 0)
    header += struct.pack(">i", (100 + len(body)) // 2)
    header += struct.pack("<2i", 1000, 5)
    header += struct.pack("<8d", 0, 0, 8, 9, 0, 0, 0, 0)
    (base.with_suffix(".shp")).write_bytes(header + body)

    # dbf: fields NAME (C,8), AREA (N,10,2)
    fields = [(b"NAME", "C", 8, 0), (b"AREA", "N", 10, 2)]
    fdesc = b""
    for name, ftype, flen, fdec in fields:
        fdesc += name.ljust(11, b"\x00") + ftype.encode()
        fdesc += b"\x00" * 4 + bytes([flen, fdec]) + b"\x00" * 14
    rec_size = 1 + sum(f[2] for f in fields)
    header_size = 32 + len(fdesc) + 1
    dbf_header = struct.pack(
        "<4BIHH20x", 3, 24, 1, 1, 2, header_size, rec_size
    )
    recs = b" " + b"plot    " + b"     14.50"
    recs += b" " + b"tree    " + b"      0.25"
    (base.with_suffix(".dbf")).write_bytes(dbf_header + fdesc + b"\x0d" + recs)
    (base.with_suffix(".prj")).write_text(
        'PROJCS["NAD83 / UTM zone 10N",AUTHORITY["EPSG","26910"]]'
    )


def test_read_shapefile(tmp_path):
    base = tmp_path / "detections.shp"
    _write_test_shapefile(base)
    vd = VectorData.read_file(base)
    assert vd.epsg == 26910
    assert len(vd) == 2
    poly = vd.geometries[0]
    assert isinstance(poly, Polygon)
    assert len(poly.holes) == 1
    # shoelace: 16 outer - 1 hole
    assert np.isclose(poly.area, 15.0)
    pt = np.asarray(vd.geometries[1])
    assert np.allclose(pt, [7.5, 8.5])
    assert vd.attributes["NAME"] == ["plot", "tree"]
    assert vd.attributes["AREA"] == [14.5, 0.25]


def test_reproject_raster_round_trip(tmp_path):
    """reproject_raster twin (reference geospatial.py:333): values survive
    a UTM-zone change, sampled back at transformed coordinates."""
    from geograypher_tpu.utils import crs as crs_utils
    from geograypher_tpu.utils.raster import (
        Raster, read_geotiff, reproject_raster, write_geotiff,
    )

    e0, n0 = crs_utils.lla_to_tm(
        36.0, -119.0, np.deg2rad(-117.0), crs_utils.UTM_K0, 500000.0, 0.0
    )
    # smooth field: NN resampling across the rotated zone-10 grid lands
    # within one source cell, so values must agree to one cell's gradient
    col, row = np.meshgrid(np.arange(60), np.arange(40))
    data = (0.5 * col + 0.25 * row).astype(np.float32)
    src = Raster(
        data, (2.0, 0.0, e0, 0.0, -2.0, n0), epsg=32611
    )
    p_in = tmp_path / "src.tif"
    p_out = tmp_path / "dst.tif"
    write_geotiff(p_in, src)
    reproject_raster(p_in, p_out, 32610)
    out = read_geotiff(p_out)
    assert out.epsg == 32610
    # sample both rasters at the same world points
    xs = e0 + np.linspace(5, 115, 12)
    ys = n0 - np.linspace(5, 75, 12)
    src_vals = src.sample(xs, ys)
    pts10 = crs_utils.transform_points(
        np.stack([xs, ys, np.zeros_like(xs)], axis=1), 32611, 32610
    )
    dst_vals = out.sample(pts10[:, 0], pts10[:, 1])
    ok = np.isfinite(src_vals) & np.isfinite(dst_vals)
    assert ok.mean() > 0.9
    # one destination-cell NN displacement = at most ~1.5 source cells of
    # the ramp's gradient (0.5/cell + 0.25/cell)
    assert np.abs(src_vals[ok] - dst_vals[ok]).max() < 1.5 * 0.75 + 1e-6


def test_geographic_axis_convention_all_datums(tmp_path):
    """(lon, lat) file coordinates must transform correctly for EVERY
    geographic datum, not just 4326 (review regression: the lon/lat
    swap was keyed on ==4326, so NAD83 4269 data transformed with axes
    swapped)."""
    from geograypher_tpu.utils.vector import Polygon, VectorData

    lon, lat = -119.0, 36.0
    sq = np.array(
        [[lon, lat], [lon + 0.001, lat], [lon + 0.001, lat + 0.001],
         [lon, lat + 0.001]]
    )
    out_wgs = VectorData([Polygon(sq)], {}, epsg=4326).to_crs(32611)
    out_nad = VectorData([Polygon(sq)], {}, epsg=4269).to_crs(26911)
    a = out_wgs.geometries[0].exterior
    b = out_nad.geometries[0].exterior
    # same numeric zone-11 coordinates to within the ~1-2 m datum shift
    assert np.allclose(a, b, atol=5.0)
    assert 200000 < a[0, 0] < 800000  # a plausible UTM easting


def test_geojson_crs_name_parsing(tmp_path):
    """Versioned EPSG URNs and CRS84 names parse to the right code
    (review regression: every digit was concatenated)."""
    import json

    from geograypher_tpu.utils.vector import VectorData

    def write(name):
        doc = {
            "type": "FeatureCollection",
            "crs": {"type": "name", "properties": {"name": name}},
            "features": [{
                "type": "Feature", "properties": {},
                "geometry": {"type": "Point", "coordinates": [1.0, 2.0]},
            }],
        }
        f = tmp_path / "t.geojson"
        f.write_text(json.dumps(doc))
        return VectorData.read_file(f).epsg

    assert write("urn:ogc:def:crs:OGC:1.3:CRS84") == 4326
    assert write("urn:ogc:def:crs:EPSG:8.9:32611") == 32611
    assert write("EPSG:26911") == 26911


def test_reprojected_preserves_integer_nodata():
    """Reprojecting an integer class raster keeps dtype + nodata
    (review regression: silent float64/NaN widening)."""
    from geograypher_tpu.utils.raster import Raster

    data = np.full((40, 40), 255, np.uint8)
    data[10:30, 10:30] = 3
    r = Raster(
        data, (1.0, 0.0, 500000.0, 0.0, -1.0, 4000000.0), epsg=32611,
        nodata=255,
    )
    out = r.reprojected(26911)
    assert out.data.dtype == np.uint8
    assert out.nodata == 255
    vals = set(np.unique(out.data))
    assert vals <= {3, 255} and 3 in vals


def test_overlap_raster_negative_nodata(tmp_path):
    """Negative nodata pixels (int16 -9999 style) must be ignored, not
    crash the bincount (review regression)."""
    from geograypher_tpu.utils.geospatial import get_overlap_raster
    from geograypher_tpu.utils.raster import Raster, write_geotiff
    from geograypher_tpu.utils.vector import Polygon, VectorData

    data = np.full((20, 20), -9999, np.int16)
    data[5:15, 5:15] = 2
    path = tmp_path / "cls.tif"
    write_geotiff(
        path,
        Raster(
            data, (1.0, 0.0, 500000.0, 0.0, -1.0, 4000000.0),
            epsg=32611, nodata=-9999,
        ),
    )
    sq = np.array(
        [[500002.0, 3999998.0], [500018.0, 3999998.0],
         [500018.0, 3999982.0], [500002.0, 3999982.0]]
    )
    vd = VectorData([Polygon(sq)], {}, epsg=32611)
    counts, _ = get_overlap_raster(vd, path, nodata=-9999)
    assert counts.shape[0] == 1
    assert counts[0, 2] > 0
    assert counts.sum() == counts[0, 2]  # only class 2 counted
