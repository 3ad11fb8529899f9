"""Overlay algebra: union / intersection / difference on polygon sets.

Replaces geopandas ``gpd.overlay`` / ``dissolve`` / ``unary_union``
(``/root/reference/src/geopull/blocker.py:121-127`` difference,
``:224-230`` intersection, ``:143`` dissolve-by-key,
``normalizer.py:96,148`` dissolve, ``blocker.py:189-191`` unary_union
difference) with one uniform algorithm that reuses the polygonize kernel:

1. node the edges of every input ring together (shared snap grid),
2. extract all planar faces,
3. classify each face by a representative-point PIP against the inputs,
4. keep faces passing the boolean predicate,
5. re-polygonize only the kept faces' non-internal edges → merged result.

This is the classical "overlay via arrangement + face classification"
construction; robustness comes from the shared snap grid.
"""

from __future__ import annotations

import numpy as np

from . import wkb
from .area import ring_signed_area
from .pointops import point_in_geom, representative_point
from .polygonize import (
    _dedupe_segments,
    _quant,
    _unique_rows4,
    extract_faces,
    geoms_to_segments,
    node_segments,
)


def _as_polygons(geoms) -> list:
    """Flatten to a list of Polygon tuple-geometries."""
    polys = []
    for g in geoms:
        if g is None:
            continue
        for part in wkb.get_parts(g):
            if part[0] == "Polygon":
                polys.append(part)
    return polys


def _face_membership(faces, polys) -> np.ndarray:
    """(n_faces, n_polys) bool: face rep-point inside polygon (even-odd),
    with bbox prefilter."""
    n_f, n_p = len(faces), len(polys)
    out = np.zeros((n_f, n_p), dtype=bool)
    if n_f == 0 or n_p == 0:
        return out
    reps = np.array([representative_point(f) for f in faces])
    pb = np.array([wkb.bounds(p) for p in polys])
    for j, poly in enumerate(polys):
        cand = (
            (reps[:, 0] >= pb[j, 0]) & (reps[:, 0] <= pb[j, 2])
            & (reps[:, 1] >= pb[j, 1]) & (reps[:, 1] <= pb[j, 3])
        )
        if cand.any():
            idx = np.flatnonzero(cand)
            out[idx, j] = point_in_geom(reps[idx, 0], reps[idx, 1], poly)
    return out


def _merge_faces(faces: list[list[np.ndarray]]) -> list:
    """Dissolve a set of faces into polygons by dropping edges shared by two
    kept faces, then re-polygonizing the boundary and keeping faces that
    cover the originals."""
    if not faces:
        return []
    if len(faces) == 1:
        return [("Polygon", faces[0])]
    seg_arrays = []
    for rings in faces:
        seg_arrays.append(geoms_to_segments([("Polygon", rings)]))
    all_segs = np.vstack(seg_arrays)
    q = _quant(all_segs.reshape(-1, 2)).reshape(-1, 4)
    # canonical undirected key; edges appearing 2+ times are internal
    flip = (q[:, 0] > q[:, 2]) | ((q[:, 0] == q[:, 2]) & (q[:, 1] > q[:, 3]))
    canon = q.copy()
    canon[flip] = q[flip][:, [2, 3, 0, 1]]
    uniq, counts = _unique_rows4(canon, return_counts=True)
    boundary = uniq[counts == 1]
    if len(boundary) == 0:
        return []
    out_faces = extract_faces(_dedupe_segments(boundary))
    # keep result faces whose rep point lies in any input face
    kept = []
    inputs = [("Polygon", f) for f in faces]
    member = _face_membership(out_faces, inputs)
    for i, f in enumerate(out_faces):
        if member[i].any():
            kept.append(("Polygon", f))
    return kept


def overlay(a_geoms, b_geoms, how: str) -> list:
    """Boolean overlay of two polygon sets → list of Polygon tuples.

    how: 'union' | 'intersection' | 'difference' (A minus B).
    """
    pa = _as_polygons(a_geoms)
    pb = _as_polygons(b_geoms)
    if how == "difference" and not pb:
        return pa
    if how == "intersection" and (not pa or not pb):
        return []
    if how == "union" and (not pa or not pb):
        return dissolve([wkb.dumps(p) for p in pa + pb])
    segs = geoms_to_segments(pa + pb)
    if len(segs) == 0:
        return []
    noded = node_segments(segs)
    faces = extract_faces(noded)
    in_a = _face_membership(faces, pa).any(axis=1)
    in_b = _face_membership(faces, pb).any(axis=1)
    if how == "union":
        keep = in_a | in_b
    elif how == "intersection":
        keep = in_a & in_b
    elif how == "difference":
        keep = in_a & ~in_b
    else:
        raise ValueError(f"unknown overlay how={how}")
    return _merge_faces([faces[i] for i in np.flatnonzero(keep)])


def dissolve(wkb_bufs) -> list:
    """Geometric union of many polygons (reference A2/A3/A5 dissolve /
    unary_union). Input WKB buffers; output Polygon tuples."""
    polys = _as_polygons([wkb.loads(b) for b in wkb_bufs if b is not None])
    if not polys:
        return []
    if len(polys) == 1:
        return polys
    segs = geoms_to_segments(polys)
    noded = node_segments(segs)
    faces = extract_faces(noded)
    keep = _face_membership(faces, polys).any(axis=1)
    return _merge_faces([faces[i] for i in np.flatnonzero(keep)])


def is_simple_polygon(rings) -> bool:
    """Fast validity check: closed rings, no zero-length edges, no
    self/cross intersections among ring segments. Valid ⇒ make_valid is
    the identity, skipping a full node+polygonize round.

    Round 5: candidate segment pairs come from a minx sweep over segment
    bboxes (only bbox-overlapping pairs can cross or collinear-overlap, so
    the restriction is exact) instead of a dense n² matrix capped at 400
    segments — the cap silently routed every LARGE valid polygon (real
    coastline parts) onto the snap-grid repair path, perturbing bytes that
    needed no repair and paying a full node+polygonize for nothing."""
    segs = []
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        if len(r) < 4 or not np.array_equal(r[0], r[-1]):
            return False
        if np.any(np.all(r[:-1] == r[1:], axis=1)):
            return False
        # a ring revisiting a vertex (pinched shell / figure-8 drawn as one
        # ring) has NO edge crossings, only shared endpoints — catch it via
        # duplicate vertices so make_valid takes the split path (round 3)
        body = r[:-1]
        if len(np.unique(body, axis=0)) != len(body):
            return False
        segs.append(np.column_stack([r[:-1], r[1:]]))
    s = np.vstack(segs)
    n = len(s)
    if n <= 400:
        # dense pair matrix: cheapest for the common small polygon (one
        # vectorized call, no sort) — 80k pairs max
        i, j = np.triu_indices(n, k=1)
    else:
        # vectorized minx sweep (no Python loop): for the idx-th segment in
        # minx order, candidates are the following segments whose minx is
        # within its x-extent; y-overlap filters the rest
        blo = np.minimum(s[:, 0:2], s[:, 2:4])
        bhi = np.maximum(s[:, 0:2], s[:, 2:4])
        order = np.argsort(blo[:, 0], kind="stable")
        olo, ohi = blo[order], bhi[order]
        his = np.searchsorted(olo[:, 0], ohi[:, 0], side="right")
        cnt = np.maximum(his - np.arange(n) - 1, 0)
        tot = int(cnt.sum())
        if tot == 0:
            return True
        I = np.repeat(np.arange(n), cnt)
        st = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        J = I + 1 + (np.arange(tot, dtype=np.int64) - np.repeat(st, cnt))
        yok = (olo[J, 1] <= ohi[I, 1]) & (ohi[J, 1] >= olo[I, 1])
        i, j = order[I[yok]], order[J[yok]]
        if len(i) == 0:
            return True
    p = s[i, 0:2]
    r = s[i, 2:4] - p
    q = s[j, 0:2]
    t_ = s[j, 2:4] - q
    denom = r[:, 0] * t_[:, 1] - r[:, 1] * t_[:, 0]
    qp = q - p
    eps = 1e-15
    with np.errstate(divide="ignore", invalid="ignore"):
        tt = (qp[:, 0] * t_[:, 1] - qp[:, 1] * t_[:, 0]) / denom
        uu = (qp[:, 0] * r[:, 1] - qp[:, 1] * r[:, 0]) / denom
    crossing = (
        (np.abs(denom) > eps)
        & (tt > eps) & (tt < 1 - eps)
        & (uu > eps) & (uu < 1 - eps)
    )
    if crossing.any():
        return False
    # shared-endpoint tangency is fine; collinear overlap is not — detect
    # collinear pairs whose bboxes overlap in their interior
    coll = np.abs(denom) <= eps
    cross2 = qp[:, 0] * r[:, 1] - qp[:, 1] * r[:, 0]
    coll &= np.abs(cross2) <= eps
    if coll.any():
        ii, jj = i[coll], j[coll]
        for a, b in zip(ii, jj):
            d = s[a, 2:4] - s[a, 0:2]
            ta0 = 0.0
            ta1 = float(d @ d)
            tb0 = float((s[b, 0:2] - s[a, 0:2]) @ d)
            tb1 = float((s[b, 2:4] - s[a, 0:2]) @ d)
            lo, hi = min(tb0, tb1), max(tb0, tb1)
            if min(ta1, hi) - max(ta0, lo) > eps:
                return False
    return True


def _segments_interact(sa: np.ndarray, sb: np.ndarray, window) -> bool:
    """True iff any segment of ``sa`` intersects any of ``sb`` at a point
    other than an endpoint shared by both (endpoint-endpoint corner touches
    between valid parts are allowed; crossings, T-touches, and collinear
    overlaps are interactions). Segments are prefiltered to the pair's bbox
    intersection ``window`` then tested chunk-wise (bounded temp memory)."""
    wx0, wy0, wx1, wy1 = window

    def clip(s: np.ndarray) -> np.ndarray:
        lo = np.minimum(s[:, 0:2], s[:, 2:4])
        hi = np.maximum(s[:, 0:2], s[:, 2:4])
        keep = (lo[:, 0] <= wx1) & (hi[:, 0] >= wx0) & (lo[:, 1] <= wy1) & (hi[:, 1] >= wy0)
        return s[keep]

    sa, sb = clip(sa), clip(sb)
    if len(sa) == 0 or len(sb) == 0:
        return False
    e = 1e-12
    q0 = sb[:, 0:2]
    s_ = sb[:, 2:4] - q0
    for c0 in range(0, len(sa), 512):
        a = sa[c0:c0 + 512]
        p0 = a[:, None, 0:2]
        r = a[:, None, 2:4] - p0
        qp = q0[None, :, :] - p0
        denom = r[..., 0] * s_[None, :, 1] - r[..., 1] * s_[None, :, 0]
        cross_qp_s = qp[..., 0] * s_[None, :, 1] - qp[..., 1] * s_[None, :, 0]
        cross_qp_r = qp[..., 0] * r[..., 1] - qp[..., 1] * r[..., 0]
        nz = np.abs(denom) > e
        with np.errstate(divide="ignore", invalid="ignore"):
            tt = np.where(nz, cross_qp_s / denom, np.nan)
            uu = np.where(nz, cross_qp_r / denom, np.nan)
        inter = nz & (tt >= -e) & (tt <= 1 + e) & (uu >= -e) & (uu <= 1 + e)
        end_t = (np.abs(tt) <= e) | (np.abs(tt - 1) <= e)
        end_u = (np.abs(uu) <= e) | (np.abs(uu - 1) <= e)
        if np.any(inter & ~(end_t & end_u)):
            return True
        # collinear pairs: interaction iff the 1-D projections overlap in
        # more than a point (a point touch is an endpoint of both)
        coll = ~nz & (np.abs(cross_qp_r) <= e)
        if coll.any():
            ai, bi = np.nonzero(coll)
            d = a[ai, 2:4] - a[ai, 0:2]
            dd = np.einsum("ij,ij->i", d, d)
            tb0 = np.einsum("ij,ij->i", sb[bi, 0:2] - a[ai, 0:2], d)
            tb1 = np.einsum("ij,ij->i", sb[bi, 2:4] - a[ai, 0:2], d)
            plo = np.minimum(tb0, tb1)
            phi = np.maximum(tb0, tb1)
            if np.any((dd > 0)
                      & (np.minimum(dd, phi) - np.maximum(0.0, plo) > e * dd)):
                return True
    return False


def _parts_interact(pa, pb, sa, sb, box_a, box_b) -> bool:
    """Do two polygon parts geometrically interact (boundary crossing /
    T-touch / collinear overlap / containment)? Pure corner touches between
    parts do NOT count — GEOS MakeValid is the identity on a valid
    MultiPolygon whose parts touch at finitely many points, so such parts
    must stay on the byte-stable pass-through path (ADVICE r4)."""
    window = (
        max(box_a[0], box_b[0]), max(box_a[1], box_b[1]),
        min(box_a[2], box_b[2]), min(box_a[3], box_b[3]),
    )
    if _segments_interact(sa, sb, window):
        return True
    # no boundary interaction ⇒ interiors are disjoint or nested: an
    # interior point of one inside the other (even-odd over ALL rings, so a
    # part sitting in another part's hole stays independent) ⇒ nested
    from .pointops import points_in_ring

    for rings_probe, rings_other in ((pa[1], pb[1]), (pb[1], pa[1])):
        rx, ry = representative_point(rings_probe)
        crossings = 0
        for ring in rings_other:
            crossings += int(points_in_ring(np.array([rx]), np.array([ry]),
                                            np.asarray(ring))[0])
        if crossings % 2 == 1:
            return True
    return False


def make_valid(geom) -> list:
    """GEOS MakeValid ("linework" method): self-node each polygon's rings,
    classify the arrangement faces by even-odd winding against the original
    linework, keep odd-winding faces and re-assemble them into polygons
    (shared internal edges dissolve, so holes survive as holes instead of
    splitting their surroundings into hole-less faces).

    Covered classes (goldens in tests/test_kernels): bow-ties, multi-crossing
    zigzags, nested same-orientation shells (even-odd → hole), collinear
    spikes, duplicate consecutive vertices, shell self-touch at a point
    (pinched ring → split polygons, round 3), fully-collapsed rings (→
    empty), holes touching the shell at a point (valid — preserved), and
    mixed-dimension collections (non-polygon parts pass through untouched).

    Round 4/5: MultiPolygon parts that GEOMETRICALLY interact (boundary
    crossing, T-touch, collinear overlap, or containment — detected via a
    bbox sweep + vectorized segment test, O(n log n + k) in parts) are
    repaired JOINTLY — their rings enter one arrangement and faces classify
    even-odd against the combined linework, so two mutually-overlapping
    shells resolve the GEOS-linework way (the doubly-covered region has
    even winding → becomes a hole). Parts that don't interact — including
    valid parts whose bboxes overlap or that touch only at corners — keep
    the byte-stable path: simple parts pass through untouched, non-simple
    parts repair individually.

    Remaining documented divergence vs full GEOS (enumerated, each with a
    golden test): exact snap-grid noding (1e-9°) can differ from GEOS's
    floating noder in the last ulp of an intersection coordinate —
    test_make_valid_snap_noding_golden pins OUR semantics. Reference F3
    (``blocker.py:119`` etc.)."""
    if geom is None:
        return []
    out = []
    poly_parts = []
    for part in wkb.get_parts(geom):
        if part[0] != "Polygon":
            out.append(part)
        else:
            poly_parts.append(part)
    if not poly_parts:
        return out

    # group polygon parts by GEOMETRIC interaction (transitive closure):
    # only parts that actually touch/cross/contain each other enter a joint
    # arrangement — valid mutually-disjoint parts whose bboxes merely
    # overlap (interlocking L-shapes, corner touches) stay byte-stable on
    # the pass-through path (ADVICE r4). Candidate pairs come from a
    # sort-by-minx bbox sweep (O(n log n + k), not the former O(n²) Python
    # loop — a 3e4-part archipelago multipolygon is fine), then each
    # candidate pays a vectorized segment-interaction + containment test.
    n = len(poly_parts)
    boxes = np.array([wkb.bounds(p) for p in poly_parts], dtype=np.float64)
    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    if n > 1:
        order = np.argsort(boxes[:, 0], kind="stable")
        ob = boxes[order]
        his = np.searchsorted(ob[:, 0], ob[:, 2], side="right")
        cnt = np.maximum(his - np.arange(n) - 1, 0)
        tot = int(cnt.sum())
        seg_cache: dict[int, np.ndarray] = {}

        def segs_of(i: int) -> np.ndarray:
            if i not in seg_cache:
                seg_cache[i] = geoms_to_segments([poly_parts[i]])
            return seg_cache[i]

        if tot:
            I = np.repeat(np.arange(n), cnt)
            st = np.concatenate([[0], np.cumsum(cnt)[:-1]])
            J = I + 1 + (np.arange(tot, dtype=np.int64) - np.repeat(st, cnt))
            yok = (ob[J, 1] <= ob[I, 3]) & (ob[J, 3] >= ob[I, 1])
            for i, j in zip(order[I[yok]], order[J[yok]]):
                i, j = int(i), int(j)
                if find(i) != find(j) and _parts_interact(
                    poly_parts[i], poly_parts[j],
                    segs_of(i), segs_of(j), boxes[i], boxes[j],
                ):
                    parent[find(i)] = find(j)
    groups: dict[int, list] = {}
    for i in range(n):
        groups.setdefault(find(i), []).append(poly_parts[i])

    from .pointops import points_in_ring

    for members in groups.values():
        if len(members) == 1 and is_simple_polygon(members[0][1]):
            out.append(members[0])
            continue
        all_rings = [np.asarray(r) for _, rings in members for r in rings]
        segs = geoms_to_segments(members)
        noded = node_segments(segs)
        faces = extract_faces(noded)
        if not faces:
            continue
        reps = np.array([representative_point(f) for f in faces])
        # even-odd against the group's combined ring set
        crossings = np.zeros(len(faces), dtype=np.int64)
        for r in all_rings:
            crossings += points_in_ring(reps[:, 0], reps[:, 1], r).astype(np.int64)
        inside = (crossings % 2) == 1
        kept = [faces[i] for i in np.flatnonzero(inside)]
        out.extend(_merge_faces(kept))
    return out


def normalize_geom(geom):
    """Canonical form (reference F11, ``shapely.normalize`` blocker.py:276):
    exterior CCW / holes CW, each ring rotated to start at its lexicographic
    minimum vertex — makes output bit-reproducible."""
    gtype, payload = geom
    if gtype == "Polygon":
        return ("Polygon", _normalize_rings(payload))
    if gtype == "MultiPolygon":
        parts = [_normalize_rings(rings) for rings in payload]
        parts.sort(key=lambda rings: (rings[0][0, 0], rings[0][0, 1]))
        return ("MultiPolygon", parts)
    return geom


def _normalize_rings(rings) -> list[np.ndarray]:
    out = []
    for k, ring in enumerate(rings):
        r = np.asarray(ring, dtype=np.float64)
        # drop closing vertex, dedupe consecutive duplicates
        body = r[:-1] if np.array_equal(r[0], r[-1]) else r
        keep = np.ones(len(body), dtype=bool)
        keep[1:] = np.any(np.diff(body, axis=0) != 0, axis=1)
        body = body[keep]
        a = ring_signed_area(np.vstack([body, body[0]]))
        want_ccw = k == 0
        if (a > 0) != want_ccw:
            body = body[::-1]
        start = np.lexsort((body[:, 1], body[:, 0]))[0]
        body = np.roll(body, -start, axis=0)
        out.append(np.vstack([body, body[0]]))
    return out
