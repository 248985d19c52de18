"""Self-contained coordinate-reference-system engine (replaces pyproj).

The reference delegates all CRS work to pyproj/PROJ (e.g.
/root/reference/geograypher/utils/geospatial.py:51-72,
/root/reference/geograypher/meshes/meshes.py:230-269).  pyproj is not part of
this environment, so we implement the subset of transforms geograypher
actually uses, in vectorized numpy (float64, host side):

* Geographic lat/lon/alt: WGS84 (EPSG:4326), NAD83 (4269), ETRS89 (4258)
* Geocentric ECEF (EPSG:4978)
* Transverse-Mercator projected families via Karney's 6th-order series
  (sub-millimeter accuracy): WGS84 UTM (326xx N / 327xx S), NAD83 UTM
  (269xx, zones 1-23 N), ETRS89 UTM (258xx, zones 28-38)
* Web Mercator / pseudo-Mercator (EPSG:3857)
* UTM zone selection from lat/lon (reference geospatial.py:51-58)

Datum note: NAD83/ETRS89 use the GRS80 ellipsoid, whose flattening differs
from WGS84's by ~1e-10 (semi-minor axes differ by 0.1 mm); the series
coefficients are shared.  Datum SHIFTS between WGS84 and NAD83/ETRS89
(~1-2 m, time-dependent) are NOT applied — the identity ("ballpark") datum
mapping matches what pyproj does without an explicit transformation
pipeline for most survey exports, and is well under the scale of the
meshes' own georeferencing error.  Unsupported EPSG codes raise ValueError
naming the supported families.

Axis conventions follow the reference's pyproj usage
(``convert_CRS_3D_points`` geospatial.py:60-72, which calls
``Transformer.from_crs`` WITHOUT always_xy): EPSG:4326 point columns are
``(lat, lon, alt)``; projected/ECEF CRSs are ``(x/easting, y/northing, z)``.
"""

from __future__ import annotations

import numpy as np

# WGS84 ellipsoid
WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
WGS84_B = WGS84_A * (1.0 - WGS84_F)
WGS84_E2 = WGS84_F * (2.0 - WGS84_F)  # first eccentricity squared
WGS84_E = np.sqrt(WGS84_E2)

# Third flattening and rectifying radius for the transverse Mercator series
_N = WGS84_F / (2.0 - WGS84_F)
_A_RECT = (WGS84_A / (1.0 + _N)) * (
    1.0 + _N**2 / 4.0 + _N**4 / 64.0 + _N**6 / 256.0
)

# Karney forward (alpha) and inverse (beta) series coefficients, order 6
_ALPHA = np.array(
    [
        _N / 2 - 2 * _N**2 / 3 + 5 * _N**3 / 16 + 41 * _N**4 / 180
        - 127 * _N**5 / 288 + 7891 * _N**6 / 37800,
        13 * _N**2 / 48 - 3 * _N**3 / 5 + 557 * _N**4 / 1440
        + 281 * _N**5 / 630 - 1983433 * _N**6 / 1935360,
        61 * _N**3 / 240 - 103 * _N**4 / 140 + 15061 * _N**5 / 26880
        + 167603 * _N**6 / 181440,
        49561 * _N**4 / 161280 - 179 * _N**5 / 168 + 6601661 * _N**6 / 7257600,
        34729 * _N**5 / 80640 - 3418889 * _N**6 / 1995840,
        212378941 * _N**6 / 319334400,
    ]
)
_BETA = np.array(
    [
        _N / 2 - 2 * _N**2 / 3 + 37 * _N**3 / 96 - _N**4 / 360
        - 81 * _N**5 / 512 + 96199 * _N**6 / 604800,
        _N**2 / 48 + _N**3 / 15 - 437 * _N**4 / 1440 + 46 * _N**5 / 105
        - 1118711 * _N**6 / 3870720,
        17 * _N**3 / 480 - 37 * _N**4 / 840 - 209 * _N**5 / 4480
        + 5569 * _N**6 / 90720,
        4397 * _N**4 / 161280 - 11 * _N**5 / 504 - 830251 * _N**6 / 7257600,
        4583 * _N**5 / 161280 - 108847 * _N**6 / 3991680,
        20648693 * _N**6 / 638668800,
    ]
)

UTM_K0 = 0.9996
UTM_FALSE_EASTING = 500000.0
UTM_FALSE_NORTHING_SOUTH = 10000000.0


def lla_to_ecef(lat_deg, lon_deg, alt):
    """WGS84 geodetic -> ECEF (EPSG:4326 -> EPSG:4978). Returns (x, y, z)."""
    lat = np.deg2rad(np.asarray(lat_deg, dtype=np.float64))
    lon = np.deg2rad(np.asarray(lon_deg, dtype=np.float64))
    alt = np.asarray(alt, dtype=np.float64)
    sin_lat, cos_lat = np.sin(lat), np.cos(lat)
    n = WGS84_A / np.sqrt(1.0 - WGS84_E2 * sin_lat**2)
    x = (n + alt) * cos_lat * np.cos(lon)
    y = (n + alt) * cos_lat * np.sin(lon)
    z = (n * (1.0 - WGS84_E2) + alt) * sin_lat
    return x, y, z


def ecef_to_lla(x, y, z, iterations: int = 6):
    """ECEF -> WGS84 geodetic. Returns (lat_deg, lon_deg, alt).

    Iterative method; converges to well below 1e-9 deg / 1e-6 m for
    terrestrial points in a handful of iterations.
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    lon = np.arctan2(y, x)
    p = np.hypot(x, y)
    # Initial guess (spherical)
    lat = np.arctan2(z, p * (1.0 - WGS84_E2))
    alt = np.zeros_like(p)
    for _ in range(iterations):
        sin_lat = np.sin(lat)
        n = WGS84_A / np.sqrt(1.0 - WGS84_E2 * sin_lat**2)
        alt = p / np.cos(lat) - n
        lat = np.arctan2(z, p * (1.0 - WGS84_E2 * n / (n + alt)))
    return np.rad2deg(lat), np.rad2deg(lon), alt


def utm_epsg_for(lat, lon, assume_western_hem: bool = False) -> int:
    """UTM EPSG code containing (lat, lon).

    Mirrors the reference formula (geospatial.py:51-58).  The reference's
    ``assume_western_hem`` default is True (forest plots in the US); here it
    defaults to False and is opt-in.
    """
    lat = float(lat)
    lon = float(lon)
    if assume_western_hem and lon > 0:
        lon = -lon
    return int(32700 - round((45 + lat) / 90) * 100 + round((183 + lon) / 6))


# Geographic (lat, lon, alt) codes sharing the identity datum mapping
GEOGRAPHIC_EPSG = frozenset({4326, 4269, 4258})
WEB_MERCATOR_EPSG = 3857
_SUPPORTED_FAMILIES = (
    "4326/4269/4258 (geographic lat/lon), 4978 (ECEF), 3857 (Web Mercator), "
    "326xx/327xx (WGS84 UTM), 269xx (NAD83 UTM), 258xx (ETRS89 UTM)"
)


def _utm_zone_params(epsg: int):
    """(lon0_rad, false_northing) for any supported UTM family code."""
    epsg = int(epsg)
    if 32601 <= epsg <= 32660:  # WGS84 north
        zone, north = epsg - 32600, True
    elif 32701 <= epsg <= 32760:  # WGS84 south
        zone, north = epsg - 32700, False
    elif 26901 <= epsg <= 26923:  # NAD83 north (GRS80; shared series)
        zone, north = epsg - 26900, True
    elif 25828 <= epsg <= 25838:  # ETRS89 north (GRS80; shared series)
        zone, north = epsg - 25800, True
    else:
        raise ValueError(
            f"EPSG:{epsg} is not a supported projected code; supported "
            f"families: {_SUPPORTED_FAMILIES}"
        )
    lon0 = np.deg2rad(zone * 6.0 - 183.0)
    return lon0, (0.0 if north else UTM_FALSE_NORTHING_SOUTH)


def _is_utm(epsg: int) -> bool:
    try:
        _utm_zone_params(epsg)
        return True
    except ValueError:
        return False


def web_mercator_from_lla(lat_deg, lon_deg):
    """WGS84 geodetic -> EPSG:3857 (spherical pseudo-Mercator; geodetic
    latitude used directly, per the 3857 definition)."""
    lat = np.deg2rad(np.asarray(lat_deg, dtype=np.float64))
    lon = np.deg2rad(np.asarray(lon_deg, dtype=np.float64))
    x = WGS84_A * lon
    y = WGS84_A * np.log(np.tan(np.pi / 4.0 + lat / 2.0))
    return x, y


def lla_from_web_mercator(x, y):
    """EPSG:3857 -> WGS84 geodetic (lat_deg, lon_deg)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.rad2deg(x / WGS84_A)
    lat = np.rad2deg(2.0 * np.arctan(np.exp(y / WGS84_A)) - np.pi / 2.0)
    return lat, lon


def lla_to_tm(lat_deg, lon_deg, lon0_rad, k0, false_e, false_n):
    """Geodetic -> transverse Mercator easting/northing (Karney series)."""
    lat = np.deg2rad(np.asarray(lat_deg, dtype=np.float64))
    lon = np.deg2rad(np.asarray(lon_deg, dtype=np.float64)) - lon0_rad
    # wrap to [-pi, pi]
    lon = np.arctan2(np.sin(lon), np.cos(lon))
    sin_lat = np.sin(lat)
    # Conformal latitude
    t = np.sinh(
        np.arctanh(sin_lat) - WGS84_E * np.arctanh(WGS84_E * sin_lat)
    )
    xi_p = np.arctan2(t, np.cos(lon))
    eta_p = np.arcsinh(np.sin(lon) / np.hypot(t, np.cos(lon)))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j in range(6):
        m = 2.0 * (j + 1)
        xi += _ALPHA[j] * np.sin(m * xi_p) * np.cosh(m * eta_p)
        eta += _ALPHA[j] * np.cos(m * xi_p) * np.sinh(m * eta_p)
    easting = false_e + k0 * _A_RECT * eta
    northing = false_n + k0 * _A_RECT * xi
    return easting, northing


def tm_to_lla(easting, northing, lon0_rad, k0, false_e, false_n):
    """Transverse Mercator -> geodetic (lat_deg, lon_deg)."""
    xi = (np.asarray(northing, dtype=np.float64) - false_n) / (k0 * _A_RECT)
    eta = (np.asarray(easting, dtype=np.float64) - false_e) / (k0 * _A_RECT)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j in range(6):
        m = 2.0 * (j + 1)
        xi_p -= _BETA[j] * np.sin(m * xi) * np.cosh(m * eta)
        eta_p -= _BETA[j] * np.cos(m * xi) * np.sinh(m * eta)
    sinh_eta = np.sinh(eta_p)
    cos_xi = np.cos(xi_p)
    lon = np.arctan2(sinh_eta, cos_xi)
    tau_p = np.sin(xi_p) / np.hypot(sinh_eta, cos_xi)
    # Invert the conformal latitude with Newton's method (Karney 2011 eq. 19-21)
    tau = tau_p / (1.0 - WGS84_E2)
    for _ in range(5):
        sqrt1t = np.sqrt(1.0 + tau**2)
        sigma = np.sinh(WGS84_E * np.arctanh(WGS84_E * tau / sqrt1t))
        f_tau = tau * np.sqrt(1.0 + sigma**2) - sigma * sqrt1t - tau_p
        d_tau = (
            (np.sqrt((1.0 + sigma**2) * (1.0 + tau**2)) - sigma * tau)
            * (1.0 - WGS84_E2)
            * sqrt1t
            / (1.0 + (1.0 - WGS84_E2) * tau**2)
        )
        tau = tau - f_tau / d_tau
    lat = np.arctan(tau)
    return np.rad2deg(lat), np.rad2deg(lon) + np.rad2deg(lon0_rad)


def crs_is_projected(epsg: int) -> bool:
    """True for supported projected codes, False for geographic/geocentric;
    ValueError (naming the supported families) otherwise — matching how
    reference code relies on pyproj's CRS.is_projected."""
    epsg = int(epsg)
    if epsg in GEOGRAPHIC_EPSG or epsg == 4978:
        return False
    if epsg == WEB_MERCATOR_EPSG or _is_utm(epsg):
        return True
    raise ValueError(
        f"EPSG:{epsg} is not supported; supported families: "
        f"{_SUPPORTED_FAMILIES}"
    )


def crs_is_geocentric(epsg: int) -> bool:
    return int(epsg) == 4978


def transform_points(points: np.ndarray, input_epsg: int, output_epsg: int):
    """Transform an (N, 3) point array between supported CRSs.

    Column convention matches the reference's ``convert_CRS_3D_points``
    (geospatial.py:60-72): EPSG:4326 columns are (lat, lon, alt); ECEF and
    UTM are (x, y, z)/(easting, northing, alt).
    """
    points = np.asarray(points, dtype=np.float64)
    squeeze = points.ndim == 1
    if squeeze:
        points = points[None]
    input_epsg = int(input_epsg)
    output_epsg = int(output_epsg)
    if input_epsg == output_epsg:
        out = points.copy()
        return out[0] if squeeze else out

    # Stage 1: to geodetic (lat, lon, alt)
    if input_epsg in GEOGRAPHIC_EPSG:
        lat, lon, alt = points[:, 0], points[:, 1], points[:, 2]
    elif input_epsg == 4978:
        lat, lon, alt = ecef_to_lla(points[:, 0], points[:, 1], points[:, 2])
    elif input_epsg == WEB_MERCATOR_EPSG:
        lat, lon = lla_from_web_mercator(points[:, 0], points[:, 1])
        alt = points[:, 2]
    else:
        lon0, fn = _utm_zone_params(input_epsg)
        lat, lon = tm_to_lla(
            points[:, 0], points[:, 1], lon0, UTM_K0, UTM_FALSE_EASTING, fn
        )
        alt = points[:, 2]

    # Stage 2: from geodetic to target
    if output_epsg in GEOGRAPHIC_EPSG:
        out = np.stack([lat, lon, alt], axis=1)
    elif output_epsg == 4978:
        x, y, z = lla_to_ecef(lat, lon, alt)
        out = np.stack([x, y, z], axis=1)
    elif output_epsg == WEB_MERCATOR_EPSG:
        x, y = web_mercator_from_lla(lat, lon)
        out = np.stack([x, y, alt], axis=1)
    else:
        lon0, fn = _utm_zone_params(output_epsg)
        e, n = lla_to_tm(lat, lon, lon0, UTM_K0, UTM_FALSE_EASTING, fn)
        out = np.stack([e, n, alt], axis=1)
    return out[0] if squeeze else out


def convert_CRS_3D_points(points, input_CRS, output_CRS):
    """Drop-in for the reference's convert_CRS_3D_points (geospatial.py:60)."""
    return transform_points(points, input_CRS, output_CRS)
