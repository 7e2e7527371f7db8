"""WGS84 ⇄ UTM coordinate transforms, pure numpy, fully vectorized.

Replaces the reference's pyproj usage (utils.py:253-270 ``get_utm_crs`` and
the GeoDataFrame ``to_crs`` calls in cmds.py:319-349, partitions.py:38-48).
No pyproj exists in this environment, so we implement the transverse
Mercator projection directly with the Krüger/Karney flattening series
(6th order in n) — public formulas from Karney, "Transverse Mercator with an
accuracy of a few nanometers" (2011), as tabulated in standard references.
Accuracy ≲ 1 nm within a UTM zone; forward/inverse round-trip < 1e-12 deg
(tested).

All functions are numpy-vectorized over points — they are used inside
``map_batches`` over Arrow batches, never per row.
"""

from __future__ import annotations

import numpy as np

# WGS84
_A = 6378137.0
_F = 1.0 / 298.257223563
_E2 = _F * (2.0 - _F)
_E = np.sqrt(_E2)
_N = _F / (2.0 - _F)

_K0 = 0.9996
_FALSE_EASTING = 500000.0
_FALSE_NORTHING_SOUTH = 10000000.0

# Rectifying radius A = a/(1+n) (1 + n^2/4 + n^4/64 + n^6/256)
_AA = _A / (1.0 + _N) * (1.0 + _N**2 / 4.0 + _N**4 / 64.0 + _N**6 / 256.0)

n = _N
_ALPHA = np.array([
    n/2 - 2*n**2/3 + 5*n**3/16 + 41*n**4/180 - 127*n**5/288 + 7891*n**6/37800,
    13*n**2/48 - 3*n**3/5 + 557*n**4/1440 + 281*n**5/630 - 1983433*n**6/1935360,
    61*n**3/240 - 103*n**4/140 + 15061*n**5/26880 + 167603*n**6/181440,
    49561*n**4/161280 - 179*n**5/168 + 6601661*n**6/7257600,
    34729*n**5/80640 - 3418889*n**6/1995840,
    212378941*n**6/319334400,
])
_BETA = np.array([
    n/2 - 2*n**2/3 + 37*n**3/96 - n**4/360 - 81*n**5/512 + 96199*n**6/604800,
    n**2/48 + n**3/15 - 437*n**4/1440 + 46*n**5/105 - 1118711*n**6/3870720,
    17*n**3/480 - 37*n**4/840 - 209*n**5/4480 + 5569*n**6/90720,
    4397*n**4/161280 - 11*n**5/504 - 830251*n**6/7257600,
    4583*n**5/161280 - 108847*n**6/3991680,
    20648693*n**6/638668800,
])
del n


def utm_zone(lon: float, lat: float) -> tuple[int, bool]:
    """UTM zone number and hemisphere (north=True) for a lon/lat.

    Matches the EPSG code pyproj's ``query_utm_crs_info`` resolves for
    in-zone points (utils.py:253-270): EPSG 326{zone} north / 327{zone}
    south. Special zones (Norway/Svalbard 31V-37X exceptions) are ignored,
    as the standard zone formula is what WGS84/UTM EPSG lookup uses.
    """
    zone = int((float(lon) + 180.0) // 6.0) + 1
    zone = min(max(zone, 1), 60)
    return zone, float(lat) >= 0.0


def utm_epsg(lon: float, lat: float) -> int:
    zone, north = utm_zone(lon, lat)
    return (32600 if north else 32700) + zone


def zone_central_meridian(zone: int) -> float:
    return -183.0 + 6.0 * zone


def lonlat_to_utm(lon, lat, zone: int, north: bool = True):
    """Forward transverse Mercator: degrees → UTM meters (easting, northing).

    Vectorized; lon/lat may be scalars or arrays.
    """
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    lam0 = np.deg2rad(zone_central_meridian(zone))
    phi = np.deg2rad(lat)
    lam = np.deg2rad(lon) - lam0

    sphi = np.sin(phi)
    # conformal latitude via Gauss-Schreiber: t = sinh(atanh(sin phi) - e*atanh(e*sin phi))
    t = np.sinh(np.arctanh(sphi) - _E * np.arctanh(_E * sphi))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arctanh(np.sin(lam) / np.sqrt(1.0 + t * t))

    xi = xi_p.copy()
    eta = eta_p.copy()
    for j in range(6):
        w = 2.0 * (j + 1)
        xi = xi + _ALPHA[j] * np.sin(w * xi_p) * np.cosh(w * eta_p)
        eta = eta + _ALPHA[j] * np.cos(w * xi_p) * np.sinh(w * eta_p)

    easting = _FALSE_EASTING + _K0 * _AA * eta
    northing = _K0 * _AA * xi
    if not north:
        northing = northing + _FALSE_NORTHING_SOUTH
    return easting, northing


def _tau_from_taup(taup: np.ndarray) -> np.ndarray:
    """Invert the conformal-latitude tangent (GeographicLib Math::tauf):
    find tau with taup = tau*sqrt(1+sig^2) - sig*sqrt(1+tau^2)."""
    e2m = 1.0 - _E2
    tau = taup / e2m  # initial guess
    for _ in range(6):  # Newton; converges to machine eps in <=4 iters
        tau1 = np.sqrt(1.0 + tau * tau)
        sig = np.sinh(_E * np.arctanh(_E * tau / tau1))
        sig1 = np.sqrt(1.0 + sig * sig)
        f = sig1 * tau - sig * tau1 - taup
        df = (sig1 * tau1 - sig * tau) * e2m * tau1 / (1.0 + e2m * tau * tau)
        # df formulation from GeographicLib: d(taup)/d(tau)
        tau = tau - f / df
    return tau


def utm_to_lonlat(easting, northing, zone: int, north: bool = True):
    """Inverse transverse Mercator: UTM meters → degrees (lon, lat)."""
    easting = np.asarray(easting, dtype=np.float64)
    northing = np.asarray(northing, dtype=np.float64)
    if not north:
        northing = northing - _FALSE_NORTHING_SOUTH
    xi = northing / (_K0 * _AA)
    eta = (easting - _FALSE_EASTING) / (_K0 * _AA)

    xi_p = xi.copy()
    eta_p = eta.copy()
    for j in range(6):
        w = 2.0 * (j + 1)
        xi_p = xi_p - _BETA[j] * np.sin(w * xi) * np.cosh(w * eta)
        eta_p = eta_p - _BETA[j] * np.cos(w * xi) * np.sinh(w * eta)

    sinh_eta = np.sinh(eta_p)
    cos_xi = np.cos(xi_p)
    taup = np.sin(xi_p) / np.sqrt(sinh_eta * sinh_eta + cos_xi * cos_xi)
    tau = _tau_from_taup(taup)

    lam0 = np.deg2rad(zone_central_meridian(zone))
    lat = np.rad2deg(np.arctan(tau))
    lon = np.rad2deg(lam0 + np.arctan2(sinh_eta, cos_xi))
    return lon, lat


def meters_per_degree(lon, lat, zone: int, north: bool = True):
    """Finite-difference local scale, exactly as the reference computes it
    (cmds.py:343-350): project (lon,lat), (lon+0.001,lat), (lon,lat+0.001)
    and take (delta_easting*1000, delta_northing*1000)."""
    e0, n0 = lonlat_to_utm(lon, lat, zone, north)
    e1, _n1 = lonlat_to_utm(np.asarray(lon) + 0.001, lat, zone, north)
    _e2, n2 = lonlat_to_utm(lon, np.asarray(lat) + 0.001, zone, north)
    return (e1 - e0) * 1000.0, (n2 - n0) * 1000.0
