"""Metric area + CRS transform kernels.

Reproduces the reference's ``.to_crs(3395).area`` idiom
(``/root/reference/src/geopull/blocker.py:100``, ``:180-182``, ``:216-219``,
``normalizer.py:88``): EPSG:3395 (WGS84 ellipsoidal Mercator) forward
projection followed by planar shoelace area. All math is closed-form numpy.
"""

from __future__ import annotations

import numpy as np

from . import wkb

# WGS84
_A = 6378137.0
_F = 1.0 / 298.257223563
_E = np.sqrt(_F * (2 - _F))


def mercator_3395(coords: np.ndarray) -> np.ndarray:
    """EPSG:4326 lon/lat (deg) → EPSG:3395 x/y (m). coords shape (n, 2)."""
    lon = np.radians(coords[:, 0])
    lat = np.radians(np.clip(coords[:, 1], -89.99999, 89.99999))
    x = _A * lon
    esin = _E * np.sin(lat)
    y = _A * np.log(np.tan(np.pi / 4 + lat / 2) * ((1 - esin) / (1 + esin)) ** (_E / 2))
    return np.column_stack([x, y])


def inverse_mercator_3395(coords: np.ndarray, iters: int = 8) -> np.ndarray:
    """EPSG:3395 x/y (m) → lon/lat (deg), iterative latitude recovery."""
    lon = np.degrees(coords[:, 0] / _A)
    t = np.exp(-coords[:, 1] / _A)
    phi = np.pi / 2 - 2 * np.arctan(t)
    for _ in range(iters):
        esin = _E * np.sin(phi)
        phi = np.pi / 2 - 2 * np.arctan(t * ((1 - esin) / (1 + esin)) ** (_E / 2))
    return np.column_stack([lon, np.degrees(phi)])


def ring_signed_area(ring: np.ndarray) -> float:
    """Planar shoelace signed area; CCW positive."""
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def polygon_area(rings: list[np.ndarray]) -> float:
    """|exterior| − Σ|holes| on the given coordinates (planar)."""
    if not rings:
        return 0.0
    total = abs(ring_signed_area(rings[0]))
    for hole in rings[1:]:
        total -= abs(ring_signed_area(hole))
    return total


def geom_area_m2(geom) -> float:
    """Metric (EPSG:3395) area of a Polygon/MultiPolygon tuple geometry."""
    if geom is None:
        return 0.0
    gtype, payload = geom
    if gtype == "Polygon":
        return polygon_area([mercator_3395(r) for r in payload])
    if gtype == "MultiPolygon":
        return sum(polygon_area([mercator_3395(r) for r in rings]) for rings in payload)
    if gtype == "GeometryCollection":
        return sum(geom_area_m2(child) for child in payload)
    return 0.0


def wkb_area_m2(buf: bytes) -> float:
    return geom_area_m2(wkb.loads(buf)) if buf is not None else 0.0
