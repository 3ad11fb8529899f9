"""Line ∩ polygon clipping (reference F14, ``_merge_land_lines``
``/root/reference/src/geopull/blocker.py:336-351``: streets are clipped to the
land multipolygon before polygonization, so street segments over water or
outside the country never create faces).

Algorithm: node the line segments together with the polygon boundary segments
on the shared snap grid, then keep noded segments that (a) do not lie on the
boundary (exact integer point-on-segment test of the doubled midpoint) and
(b) have their midpoint inside the polygon set (even-odd PIP).
"""

from __future__ import annotations

import numpy as np

from .pointops import point_in_geom
from .polygonize import _quant, geoms_to_segments, node_segments


def _midpoint_on_boundary(noded: np.ndarray, bnd_q: np.ndarray) -> np.ndarray:
    """For each noded segment, is its midpoint on any boundary segment?

    Works in 2× integer space (midpoint = endpoint sum) — exact. Boundary
    segments are bbox-binned on a coarse grid for pruning.
    """
    n = len(noded)
    out = np.zeros(n, dtype=bool)
    if len(bnd_q) == 0 or n == 0:
        return out
    m2x = noded[:, 0] + noded[:, 2]  # doubled midpoints (exact in int64)
    m2y = noded[:, 1] + noded[:, 3]
    # iterate over boundary segments (small set: ring edges), vectorized
    # bbox prune over midpoints, exact python-int collinearity on survivors
    for j in range(len(bnd_q)):
        x0, y0, x1, y1 = (int(v) * 2 for v in bnd_q[j])
        lo_x, hi_x = min(x0, x1), max(x0, x1)
        lo_y, hi_y = min(y0, y1), max(y0, y1)
        cand = np.flatnonzero(
            ~out
            & (m2x >= lo_x) & (m2x <= hi_x)
            & (m2y >= lo_y) & (m2y <= hi_y)
        )
        dx, dy = x1 - x0, y1 - y0
        for i in cand:
            if dx * (int(m2y[i]) - y0) == dy * (int(m2x[i]) - x0):
                out[i] = True
    return out


def clip_segments_to_polygons(line_segs: np.ndarray, polys: list) -> np.ndarray:
    """Float (n,4) line segments clipped to a list of Polygon tuple-geoms.

    Returns float (m,4) noded segments strictly inside the polygon set
    (boundary-coincident pieces are dropped — the caller adds the enclosure
    rings separately, mirroring the reference composition at blocker.py:250-252).
    """
    if len(line_segs) == 0:
        return line_segs
    bnd_segs = geoms_to_segments(polys)
    combined = np.vstack([line_segs, bnd_segs]) if len(bnd_segs) else line_segs
    noded = node_segments(combined)
    if len(noded) == 0:
        return np.zeros((0, 4))
    bnd_q = (
        _quant(bnd_segs.reshape(-1, 2)).reshape(-1, 4)
        if len(bnd_segs)
        else np.zeros((0, 4), dtype=np.int64)
    )
    on_bnd = _midpoint_on_boundary(noded, bnd_q)
    keep = ~on_bnd
    if not keep.any():
        return np.zeros((0, 4))
    cand = noded[keep]
    mx = (cand[:, 0] + cand[:, 2]) / 2.0 * 1e-9
    my = (cand[:, 1] + cand[:, 3]) / 2.0 * 1e-9
    inside = np.zeros(len(cand), dtype=bool)
    for poly in polys:
        inside |= point_in_geom(mx, my, poly)
    return (cand[inside].astype(np.float64)) * 1e-9


# ---------------------------------------------------------------------------
# polygon ∩ axis-aligned rectangle area (zonal coverage-fraction weighting)
# ---------------------------------------------------------------------------


def _clip_half(pts: np.ndarray, axis: int, bound: float, keep_le: bool) -> np.ndarray:
    """Sutherland–Hodgman clip of an OPEN ring against one half-plane,
    vectorized (no per-vertex Python loop)."""
    n = len(pts)
    if n == 0:
        return pts
    vals = pts[:, axis]
    inside = (vals <= bound) if keep_le else (vals >= bound)
    p1 = np.roll(pts, -1, axis=0)
    in1 = np.roll(inside, -1)
    v1 = np.roll(vals, -1)
    cross = inside != in1
    denom = np.where(v1 - vals == 0.0, 1.0, v1 - vals)
    t = np.where(cross, (bound - vals) / denom, 0.0)
    ipts = pts + (p1 - pts) * t[:, None]
    # per edge i: emit intersection (if crossing), then the next vertex (if inside)
    counts = cross.astype(np.int64) + in1.astype(np.int64)
    total = int(counts.sum())
    if total == 0:
        return np.zeros((0, 2))
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    out = np.empty((total, 2))
    out[starts[cross]] = ipts[cross]
    out[starts[in1] + cross[in1].astype(np.int64)] = p1[in1]
    return out


def _ring_rect_signed_area(ring: np.ndarray, rect: tuple) -> float:
    """Signed shoelace area of ring ∩ rect (ring closed, any orientation;
    Sutherland–Hodgman is exact for convex clip windows)."""
    pts = np.asarray(ring, dtype=np.float64)[:-1]  # drop closing vertex
    minx, miny, maxx, maxy = rect
    # fast paths: ring bbox fully inside / fully outside the rect
    bx0, by0 = pts[:, 0].min(), pts[:, 1].min()
    bx1, by1 = pts[:, 0].max(), pts[:, 1].max()
    if bx1 < minx or bx0 > maxx or by1 < miny or by0 > maxy:
        return 0.0
    if not (bx0 >= minx and bx1 <= maxx and by0 >= miny and by1 <= maxy):
        for axis, bound, keep_le in (
            (0, minx, False), (0, maxx, True), (1, miny, False), (1, maxy, True),
        ):
            pts = _clip_half(pts, axis, bound, keep_le)
            if len(pts) == 0:
                return 0.0
    x, y = pts[:, 0], pts[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def geom_rect_clip_area(geom, rect: tuple) -> float:
    """Degree-space area of (Polygon|MultiPolygon) ∩ rect.

    Shell contributes |clip area|, holes subtract — orientation-independent.
    Powers the J9 zonal coverage-fraction weights (VERDICT r1 item 4): a
    boundary raster cell contributes ``cell_value · area(cell ∩ block) /
    area(cell)`` instead of the all-or-nothing center rule."""
    gtype, data = geom
    polys = [data] if gtype == "Polygon" else data
    total = 0.0
    for rings in polys:
        if not rings:
            continue
        total += abs(_ring_rect_signed_area(rings[0], rect))
        for hole in rings[1:]:
            total -= abs(_ring_rect_signed_area(hole, rect))
    return max(total, 0.0)
