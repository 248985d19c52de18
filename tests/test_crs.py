"""CRS engine tests: analytic ECEF points, UTM invariants, roundtrips."""

import numpy as np
import pytest

from geograypher_tpu.utils import crs


def test_ecef_analytic_points():
    # Equator / prime meridian at zero altitude -> (a, 0, 0)
    x, y, z = crs.lla_to_ecef(0.0, 0.0, 0.0)
    assert np.allclose([x, y, z], [crs.WGS84_A, 0, 0], atol=1e-6)
    # North pole -> (0, 0, b)
    x, y, z = crs.lla_to_ecef(90.0, 0.0, 0.0)
    assert np.allclose([x, y, z], [0, 0, crs.WGS84_B], atol=1e-6)
    # 90E on the equator -> (0, a, 0)
    x, y, z = crs.lla_to_ecef(0.0, 90.0, 100.0)
    assert np.allclose([x, y, z], [0, crs.WGS84_A + 100, 0], atol=1e-6)


def test_ecef_roundtrip():
    rng = np.random.default_rng(0)
    lat = rng.uniform(-89, 89, 100)
    lon = rng.uniform(-180, 180, 100)
    alt = rng.uniform(-100, 9000, 100)
    x, y, z = crs.lla_to_ecef(lat, lon, alt)
    lat2, lon2, alt2 = crs.ecef_to_lla(x, y, z)
    assert np.allclose(lat, lat2, atol=1e-9)
    assert np.allclose(lon, lon2, atol=1e-9)
    assert np.allclose(alt, alt2, atol=1e-5)


def test_utm_central_meridian_invariants():
    # On the central meridian of zone 31N (lon=3), easting is exactly the
    # false easting and the meridian arc is scaled by k0.
    e, n = crs.lla_to_tm(0.0, 3.0, np.deg2rad(3.0), crs.UTM_K0, 500000.0, 0.0)
    assert np.isclose(e, 500000.0, atol=1e-6)
    assert np.isclose(n, 0.0, atol=1e-6)
    # A degree of longitude at the equator ~ 111.32 km, scaled by k0 and
    # slightly stretched by TM distortion away from the meridian.
    e, n = crs.lla_to_tm(0.0, 4.0, np.deg2rad(3.0), crs.UTM_K0, 500000.0, 0.0)
    dist = e - 500000.0
    assert 111000 * crs.UTM_K0 < dist < 111500
    assert np.isclose(n, 0.0, atol=1e-3)


def test_utm_known_point():
    # Sydney Opera House-ish point, zone 56S. Values cross-checked against
    # the standard UTM formulas (independent redundant-series check below).
    lat, lon = -33.8568, 151.2153
    pts = crs.transform_points(np.array([[lat, lon, 0.0]]), 4326, 32756)
    e, n = pts[0, 0], pts[0, 1]
    # Zone 56 central meridian = 153E; point is west of it -> easting < 500k
    assert 300000 < e < 500000
    # Southern hemisphere: northing measured from 10,000,000 going south
    assert 6000000 < n < 6300000
    # Roundtrip
    back = crs.transform_points(pts, 32756, 4326)
    assert np.allclose(back[0, :2], [lat, lon], atol=1e-9)


def test_utm_roundtrip_many():
    rng = np.random.default_rng(1)
    lat = rng.uniform(-80, 80, 200)
    for epsg in (32610, 32611, 32733, 32601):
        lon0 = (epsg % 100) * 6.0 - 183.0
        lon = lon0 + rng.uniform(-2.5, 2.5, 200)
        pts = np.stack([lat, lon, np.zeros_like(lat)], axis=1)
        fwd = crs.transform_points(pts, 4326, epsg)
        back = crs.transform_points(fwd, epsg, 4326)
        assert np.allclose(back[:, :2], pts[:, :2], atol=1e-8)


def test_utm_epsg_for():
    # Mirrors reference geospatial.py:51-58 formula behavior
    assert crs.utm_epsg_for(37.77, -122.41) == 32610  # SF -> 10N
    assert crs.utm_epsg_for(-33.85, 151.21) == 32756  # Sydney -> 56S
    assert crs.utm_epsg_for(37.77, 122.41, assume_western_hem=True) == 32610


def test_ecef_to_utm_composition():
    # ECEF -> UTM must equal ECEF -> LLA -> UTM
    lat, lon, alt = 36.0, -118.9, 1900.0
    ecef = crs.transform_points(np.array([[lat, lon, alt]]), 4326, 4978)
    utm_direct = crs.transform_points(ecef, 4978, 32611)
    lla = crs.transform_points(ecef, 4978, 4326)
    utm_via = crs.transform_points(lla, 4326, 32611)
    assert np.allclose(utm_direct, utm_via, atol=1e-6)
    assert np.isclose(utm_direct[0, 2], alt, atol=1e-5)


def test_nad83_utm_matches_wgs84_utm():
    """NAD83 UTM (269xx, GRS80) and WGS84 UTM (326xx) differ only by the
    ellipsoid's 0.1 mm semi-minor-axis delta under the identity-datum
    convention; transforms must agree to sub-mm and round-trip exactly."""
    pts = np.array(
        [[40.5, -123.5, 100.0], [39.0, -121.1, 0.0], [47.9, -119.9, 55.0]]
    )
    wgs = crs.transform_points(pts, 4326, 32610)
    nad = crs.transform_points(pts, 4326, 26910)
    assert np.allclose(wgs, nad, atol=1e-3)
    back = crs.transform_points(nad, 26910, 4326)
    assert np.allclose(back, pts, atol=1e-9)


def test_etrs89_utm_roundtrip():
    pts = np.array([[48.0, 7.85, 250.0], [50.9, 6.96, 40.0]])
    proj = crs.transform_points(pts, 4326, 25832)
    back = crs.transform_points(proj, 25832, 4326)
    assert np.allclose(back, pts, atol=1e-9)
    # zone 32 central meridian is 9E; Freiburg (7.85E) must be west of it
    assert proj[0, 0] < 500000


def test_web_mercator_known_points():
    """EPSG:3857 control points: x at lon=90E is a quarter circumference;
    y at lat=45N is the textbook 5,621,521.49 m."""
    out = crs.transform_points(np.array([[45.0, 90.0, 0.0]]), 4326, 3857)
    assert np.isclose(out[0, 0], 10018754.171394622, atol=1e-3)
    assert np.isclose(out[0, 1], 5621521.486192823, atol=1e-3)
    back = crs.transform_points(out, 3857, 4326)
    assert np.allclose(back[0, :2], [45.0, 90.0], atol=1e-12)


def test_nad83_geographic_identity_datum():
    pts = np.array([[40.0, -120.0, 10.0]])
    assert np.allclose(crs.transform_points(pts, 4269, 4326), pts)
    # and through a projection both geographic datums agree (ballpark datum)
    a = crs.transform_points(pts, 4269, 26911)
    b = crs.transform_points(pts, 4326, 26911)
    assert np.allclose(a, b)


def test_unsupported_epsg_raises_with_families():
    with pytest.raises(ValueError, match="supported families"):
        crs.transform_points(np.zeros((1, 3)), 4326, 2227)  # state plane
    with pytest.raises(ValueError, match="supported families"):
        crs.crs_is_projected(9999)
    assert crs.crs_is_projected(3857)
    assert crs.crs_is_projected(26910)
    assert not crs.crs_is_projected(4269)


# -- conic projections / WKT registry / datum shift (round 3) --------------


def test_lcc_round_trip_and_origin():
    """CA State Plane zone 3 (EPSG:26943, LCC 2SP): the false origin maps
    exactly to (FE, FN), round trips are sub-mm, and scale is 1 on the
    standard parallels (the defining property of the projection)."""
    p = crs._proj_def(26943)
    e0, n0 = crs.lcc_forward(p, p["lat0"], p["lon0"])
    assert abs(e0 - 2000000.0) < 1e-6 and abs(n0 - 500000.0) < 1e-6

    pts = np.array([
        [37.5, -121.0, 10.0], [38.0, -120.0, 0.0], [36.8, -121.9, 250.0],
    ])
    proj = crs.transform_points(pts, 4269, 26943)
    back = crs.transform_points(proj, 26943, 4269)
    assert np.allclose(back[:, :2], pts[:, :2], atol=1e-9)
    assert np.allclose(back[:, 2], pts[:, 2])

    # unit scale on a standard parallel: a 0.01-deg east step projects to
    # its ellipsoidal parallel arc length
    sp1 = p["sp1"]
    a, e2 = crs._ellipsoid(p["datum"])
    nu = a / np.sqrt(1 - e2 * np.sin(np.deg2rad(sp1)) ** 2)
    arc = np.deg2rad(0.01) * nu * np.cos(np.deg2rad(sp1))
    q = crs.transform_points(
        np.array([[sp1, -120.5, 0.0], [sp1, -120.49, 0.0]]), 4269, 26943
    )
    assert abs(np.hypot(*(q[1, :2] - q[0, :2])) / arc - 1) < 1e-6


def test_albers_conus_round_trip():
    """EPSG:5070 (CONUS Albers): origin property + sub-mm round trip +
    scale 1 along the standard parallels."""
    p = crs._proj_def(5070)
    e0, n0 = crs.aea_forward(p, p["lat0"], p["lon0"])
    assert abs(e0) < 1e-6 and abs(n0) < 1e-6
    pts = np.array([[45.0, -110.0, 0.0], [30.0, -85.0, 5.0], [40.0, -96.0, 0.0]])
    proj = crs.transform_points(pts, 4269, 5070)
    back = crs.transform_points(proj, 5070, 4269)
    assert np.allclose(back[:, :2], pts[:, :2], atol=1e-9)
    a, e2 = crs._ellipsoid("NAD83")
    sp = 29.5
    nu = a / np.sqrt(1 - e2 * np.sin(np.deg2rad(sp)) ** 2)
    arc = np.deg2rad(0.01) * nu * np.cos(np.deg2rad(sp))
    q = crs.transform_points(
        np.array([[sp, -96.0, 0.0], [sp, -95.99, 0.0]]), 4269, 5070
    )
    assert abs(np.hypot(*(q[1, :2] - q[0, :2])) / arc - 1) < 1e-6


CA3_FT_WKT = (
    'PROJCS["NAD83 / California zone 3 (ftUS)",'
    'GEOGCS["NAD83",DATUM["North_American_Datum_1983",'
    'SPHEROID["GRS 1980",6378137,298.257222101]],'
    'UNIT["degree",0.0174532925199433]],'
    'PROJECTION["Lambert_Conformal_Conic_2SP"],'
    'PARAMETER["standard_parallel_1",38.43333333333333],'
    'PARAMETER["standard_parallel_2",37.06666666666667],'
    'PARAMETER["latitude_of_origin",36.5],'
    'PARAMETER["central_meridian",-120.5],'
    'PARAMETER["false_easting",6561666.667],'
    'PARAMETER["false_northing",1640416.667],'
    'UNIT["US survey foot",0.3048006096012192]]'
)


def test_wkt_projcs_registration_matches_epsg_table():
    """A state-plane WKT in US survey feet (no usable AUTHORITY code)
    registers as a custom CRS whose output matches the metric EPSG twin
    after unit conversion."""
    from geograypher_tpu.utils.parsing import crs_from_srs_text

    code = crs_from_srs_text(CA3_FT_WKT)
    assert code is not None and code >= 900001
    pts = np.array([[37.5, -121.0, 0.0]])
    ft = crs.transform_points(pts, 4269, code)
    m = crs.transform_points(pts, 4269, 26943)
    assert np.allclose(ft[0, :2] * 0.3048006096012192, m[0, :2], atol=5e-3)
    # and the inverse round-trips through the custom code
    back = crs.transform_points(ft, code, 4269)
    assert np.allclose(back[:, :2], pts[:, :2], atol=1e-9)
    # re-registering the same WKT reuses the code
    assert crs_from_srs_text(CA3_FT_WKT) == code


def test_wkt_tm_with_origin_round_trip():
    """A custom Transverse Mercator PROJCS with nonzero latitude_of_origin
    (the common national-grid form) round-trips exactly."""
    p = crs.make_projdef(
        "tm", lat0=49.0, lon0=-2.0, k0=0.9996012717,
        fe=400000.0, fn=-100000.0,
    )
    code = crs.register_projected_crs(p)
    pts = np.array([[52.0, 1.0, 0.0], [50.5, -4.0, 0.0]])
    proj = crs.transform_points(pts, 4326, code)
    back = crs.transform_points(proj, code, 4326)
    assert np.allclose(back[:, :2], pts[:, :2], atol=1e-9)
    e0, n0 = crs.transform_points(
        np.array([[49.0, -2.0, 0.0]]), 4326, code
    )[0, :2]
    assert abs(e0 - 400000.0) < 1e-6 and abs(n0 + 100000.0) < 1e-6


def test_datum_shift_opt_in():
    """datum_shift=True applies the published ~1.2-1.5 m WGS84->NAD83
    Helmert (CONUS magnitude) and is self-consistent; the default stays
    the identity mapping the reference's pyproj usage implies."""
    pts = np.array([[38.0, -120.0, 100.0]])
    ident = crs.transform_points(pts, 4326, 4269)
    assert np.allclose(ident, pts)
    shifted = crs.transform_points(pts, 4326, 4269, datum_shift=True)
    dxyz = np.stack(
        crs.lla_to_ecef(*shifted[0]), axis=0
    ) - np.stack(crs.lla_to_ecef(*pts[0]), axis=0)
    mag = np.linalg.norm(dxyz)
    assert 0.5 < mag < 3.0
    back = crs.transform_points(shifted, 4269, 4326, datum_shift=True)
    assert np.allclose(back, pts, atol=1e-9)
    # no shift when both endpoints share the datum
    same = crs.transform_points(pts, 4269, 26911, datum_shift=True)
    assert np.allclose(same, crs.transform_points(pts, 4269, 26911))


def test_crs_from_srs_text_warns_on_garbage(caplog):
    from geograypher_tpu.utils.parsing import crs_from_srs_text

    import logging

    with caplog.at_level(logging.WARNING):
        out = crs_from_srs_text('LOCAL_CS["arbitrary mesh frame"]')
    assert out is None
    assert any("LOCAL-FRAME" in r.message for r in caplog.records)
