"""Block delineation: land parts + street lines → street blocks with stable IDs.

Distributed translation of ``Blocker.build_blocks``
(``/root/reference/src/geopull/blocker.py:63-80``). The region is the group
key (the reference's per-country unit, orchestrator.py:87-91); land and lines
are cogrouped and the whole DAG runs as one Arrow-batched kernel per region:

  _make_blocks   (blocker.py:233-279): clip lines to land (F14), land
                 exterior-ring enclosure (F13), polygonize (F10)
  _validate      (blocker.py:281-294): make_valid + explode + Polygon-only
  _add_back_water(blocker.py:202-231): per-block ∩ land when Σblocks > Σland
  _remove_overlaps(blocker.py:82-164): area>1m² filter; polygonize faces are
                 disjoint by construction so the sjoin path is usually empty,
                 but the correction path (boundary → re-polygonize →
                 difference → dissolve-by-id) is implemented for parity
  _residual_area_check(blocker.py:166-200): add back land − ∪blocks
  _geohash_blocks(blocker.py:296-322): representative point → geohash12 →
                 georank (cumcount per geohash, W1) → block_id

Determinism fix vs the reference (documented, SURVEY.md W1): pandas
``cumcount`` after the geohash sort breaks ties by prior row order; we order
ties by canonical WKB bytes so ``georank`` is reproducible under any
partitioning.

Round-2 scale rework (VERDICT r1 item 2): the group key is **(region,
land_part)**, not region. Land parts are disjoint after the normalize
dissolve, so clipping/noding/polygonizing per part is semantically identical
to per-region (no segment crosses between disjoint parts; holes, overlap
correction and residual add-back are all part-local) while a
continental-scale region no longer serializes onto one Python worker. Lines
are routed to parts by a broadcast bbox join (a line crossing several parts
is clipped in each). The geohash→georank block-ID assignment
(blocker.py:296-322) moved OUT of the kernel into a Spark window function
(row_number over (region, geohash) ordered by canonical WKB), which is
exactly the reference's cumcount-after-sort semantics computed region-wide —
bit-identical block IDs regardless of the part split.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernels import wkb as _wkb
from ..kernels.area import geom_area_m2
from ..kernels.cells import geohash_encode
from ..kernels.clip import clip_segments_to_polygons
from ..kernels.overlay import dissolve as _dissolve
from ..kernels.overlay import make_valid as _make_valid
from ..kernels.overlay import normalize_geom, overlay as _overlay_op
from ..kernels.pointops import representative_point
from ..kernels.polygonize import extract_faces, geoms_to_segments, node_segments

_BBOX_FIELDS = [
    T.StructField("minx", T.DoubleType()),
    T.StructField("miny", T.DoubleType()),
    T.StructField("maxx", T.DoubleType()),
    T.StructField("maxy", T.DoubleType()),
]

# kernel output: block geometry + geohash, pre block-ID (georank is a window)
BLOCKS_PRE_SCHEMA = T.StructType(
    [
        T.StructField("region_code", T.StringType()),
        T.StructField("geohash", T.StringType()),
        T.StructField("geometry", T.BinaryType()),
        T.StructField("area_m2", T.DoubleType()),
        T.StructField("rep_lon", T.DoubleType()),
        T.StructField("rep_lat", T.DoubleType()),
    ]
    + _BBOX_FIELDS
)

# raw group-kernel output (r6): faces + areas only. The per-block
# post-processing (representative point, geohash, canonical normalize,
# bounds) is embarrassingly parallel, so it moved OUT of the per-(region,
# part) cogroup into a flat stage whose parallelism is bounded by cores,
# not by group count — the group-serial portion of the kernel shrinks to
# noding + face extraction + the area-gated corrections (which need the
# whole group's areas and cannot leave). Profiled at 1200 streets/region:
# the post chain was ~55% of kernel time, all of it previously serialized
# per region.
BLOCKS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("region_code", T.StringType()),
        T.StructField("geometry", T.BinaryType()),
        T.StructField("area_m2", T.DoubleType()),
    ]
)

BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("region_code", T.StringType()),
        T.StructField("block_id", T.StringType()),
        T.StructField("geometry", T.BinaryType()),
        T.StructField("area_m2", T.DoubleType()),
        T.StructField("rep_lon", T.DoubleType()),
        T.StructField("rep_lat", T.DoubleType()),
    ]
    + _BBOX_FIELDS
)


def _validate(polys: list) -> list:
    """blocker.py:281-294: make_valid, explode, keep Polygon parts."""
    out = []
    for p in polys:
        for v in _make_valid(p):
            if v[0] == "Polygon":
                out.append(v)
            elif v[0] == "MultiPolygon":
                out.extend(("Polygon", rings) for rings in v[1])
    return out


def _make_blocks(land_parts: list, line_geoms: list) -> list:
    """blocker.py:233-279."""
    line_segs = geoms_to_segments(line_geoms)
    clipped = clip_segments_to_polygons(line_segs, land_parts)
    # enclosure: exterior rings only (blocker.py:353-366)
    enclosure_segs = geoms_to_segments(
        [("LineString", rings[0]) for _, rings in land_parts]
    )
    all_segs = (
        np.vstack([clipped, enclosure_segs]) if len(clipped) else enclosure_segs
    )
    noded = node_segments(all_segs)
    faces = extract_faces(noded)
    return [("Polygon", rings) for rings in faces]


def _remove_overlaps(blocks: list, areas: list, region: str,
                     land_area: float | None = None) -> tuple[list, list]:
    """blocker.py:82-164. Polygonize faces are disjoint by construction, so
    when Σ block areas ≤ land area (+1 m², the reference's own sliver
    threshold at blocker.py:100) no overlap can exist and the O(n²) pair scan
    is skipped; the correction path stays exact for genuinely overlapping
    inputs (reference overlap fixture). Carries per-block areas to avoid
    recomputing the Mercator transform."""
    kept = [(b, a) for b, a in zip(blocks, areas) if a > 1.0]
    blocks = [b for b, _ in kept]
    areas = [a for _, a in kept]
    n = len(blocks)
    if n < 2:
        return blocks, areas
    if land_area is not None and sum(areas) <= land_area + 1.0:
        return blocks, areas
    boxes = np.array([_wkb.bounds(b) for b in blocks])
    pairs = []
    order = np.argsort(boxes[:, 0])
    for oi in range(n):
        i = order[oi]
        for oj in range(oi + 1, n):
            j = order[oj]
            if boxes[j, 0] > boxes[i, 2]:
                break
            if boxes[j, 1] <= boxes[i, 3] and boxes[j, 3] >= boxes[i, 1]:
                inter = _overlay_op([blocks[i]], [blocks[j]], "intersection")
                if inter and sum(geom_area_m2(p) for p in inter) > 0:
                    pairs.append((int(min(i, j)), int(max(i, j))))
    if not pairs:
        return blocks, areas
    overlap_ids = sorted({i for p in pairs for i in p})
    keep_ids = [i for i in range(n) if i not in set(overlap_ids)]
    # boundary → re-polygonize → difference vs non-overlapping → dissolve
    seg_src = [blocks[i] for i in overlap_ids]
    noded = node_segments(geoms_to_segments(seg_src))
    pieces = [("Polygon", rings) for rings in extract_faces(noded)]
    keep_blocks = [blocks[i] for i in keep_ids]
    corrected = _overlay_op(pieces, keep_blocks, "difference")
    merged = _validate(_dissolve([_wkb.dumps(p) for p in corrected]))
    out = keep_blocks + merged
    out_areas = [areas[i] for i in keep_ids] + [geom_area_m2(b) for b in merged]
    return out, out_areas


def _geohash_blocks(blocks: list, areas: list, region: str | None,
                    precision: int = 12, regions: list | None = None) -> pd.DataFrame:
    """blocker.py:296-322 geohash + rep point + bbox; georank/block_id are
    assigned downstream by a region-wide window (part-split invariant).
    ``region`` broadcasts one region code to every row; ``regions`` supplies
    per-row codes (the r6 flat post-stage, where one batch mixes regions)."""
    if not blocks:
        return pd.DataFrame(columns=BLOCKS_PRE_SCHEMA.fieldNames())
    reps = np.array([representative_point(b[1]) for b in blocks])
    ghs = geohash_encode(reps[:, 1], reps[:, 0], precision)
    norm = [normalize_geom(b) for b in blocks]
    wkbs = [_wkb.dumps(g) for g in norm]
    bounds = np.array([_wkb.bounds(g) for g in norm])
    return pd.DataFrame(
        {
            "region_code": regions if regions is not None else region,
            "geohash": ghs,
            "geometry": wkbs,
            "area_m2": areas,
            "rep_lon": reps[:, 0],
            "rep_lat": reps[:, 1],
            "minx": bounds[:, 0],
            "miny": bounds[:, 1],
            "maxx": bounds[:, 2],
            "maxy": bounds[:, 3],
        }
    )


def _post_blocks_batches(batches):
    """Flat per-block post-processing (r6): raw face WKB → rep point,
    geohash, canonical normalize, bounds. Same functions, same values as
    the former in-kernel _geohash_blocks tail — only the stage boundary
    moved (dumps→loads of float64 WKB is exact)."""
    for pdf in batches:
        if len(pdf) == 0:
            continue
        geoms = [_wkb.loads(bytes(b)) for b in pdf["geometry"]]
        yield _geohash_blocks_fast(
            geoms, list(pdf["area_m2"]), list(pdf["region_code"])
        )


# ---------------------------------------------------------------------------
# batched per-block post-processing (r6)
#
# The per-block chain (representative_point ~63 µs, _normalize_rings ~76 µs,
# bounds ~9 µs — numpy fixed call overhead, profiled on real pipeline
# blocks) dominates the flat post stage. The batched path below computes the
# SAME values over all simple blocks of a batch at once. Bit-identity
# argument, step by step:
#   * elementwise float ops (+,-,*,/ and comparisons) are IEEE-exact per
#     element regardless of array shape → identical batched or not;
#   * min/max reductions are order-insensitive bitwise → reduceat is safe;
#   * the ONE order-sensitive reduction (the shoelace SUM inside
#     _normalize_rings, used only for its SIGN) is computed via reduceat
#     with an error bound: rings where |sum| could change sign under a
#     different summation order (|a| <= n·eps·Σ|terms|) fall back to the
#     original per-block code path;
#   * any block that is not a simple single-ring Polygon (holes, multi
#     parts, degenerate scanlines, sub-3-vertex rings) falls back to the
#     original functions wholesale.
# Pinned by tests/test_pipeline.py::test_post_blocks_batched_bit_identical.
# ---------------------------------------------------------------------------


def _first_true_per_segment(mask: np.ndarray, seg_ids: np.ndarray, n_seg: int) -> np.ndarray:
    """Index (into the flat array) of the first True per segment; -1 if none.
    ``seg_ids`` must be sorted ascending."""
    out = np.full(n_seg, -1, dtype=np.int64)
    idx = np.flatnonzero(mask)
    if len(idx):
        sid = seg_ids[idx]
        # first occurrence per segment: reversed fill
        out[sid[::-1]] = idx[::-1]
    return out


def _batched_rep_points(V: np.ndarray, starts: np.ndarray, lens: np.ndarray):
    """Vectorized representative_point for n concatenated CLOSED single
    rings. Returns (x, y, ok) — ok=False rows must use the original
    per-block function (degenerate scanline)."""
    n = len(starts)
    ends = starts + lens
    vy = V[:, 1]
    ring_ids = np.repeat(np.arange(n), lens)
    ymin = np.minimum.reduceat(vy, starts)
    ymax = np.maximum.reduceat(vy, starts)
    y = 0.5 * (ymin + ymax)
    y_row = y[ring_ids]
    # nudge off vertex levels (replicates isclose(rtol=0, atol=1e-15))
    close_any = np.logical_or.reduceat(np.abs(vy - y_row) <= 1e-15, starts)
    if close_any.any():
        big = np.inf
        up_mask = vy > (y_row + 1e-15)
        lo_mask = vy < (y_row - 1e-15)
        upper = np.minimum.reduceat(np.where(up_mask, vy, big), starts)
        lower = np.maximum.reduceat(np.where(lo_mask, vy, -big), starts)
        use_up = close_any & np.isfinite(upper)
        use_lo = close_any & ~np.isfinite(upper) & np.isfinite(lower)
        y = np.where(use_up, 0.5 * (y + upper), y)
        y = np.where(use_lo, 0.5 * (y + lower), y)
        y_row = y[ring_ids]
    # scanline crossings: edges are consecutive vertex pairs within a ring
    edge_mask = np.ones(len(V), dtype=bool)
    edge_mask[ends - 1] = False  # last vertex of each ring starts no edge
    e_idx = np.flatnonzero(edge_mask)
    ex0, ey0 = V[e_idx, 0], V[e_idx, 1]
    ex1, ey1 = V[e_idx + 1, 0], V[e_idx + 1, 1]
    er = ring_ids[e_idx]
    ey = y[er]
    cond = (ey0 > ey) != (ey1 > ey)
    dy = ey1 - ey0
    with np.errstate(divide="ignore", invalid="ignore"):
        xin = ex0 + (ey - ey0) * (ex1 - ex0) / dy
    sel = np.flatnonzero(cond)
    xs = xin[sel]
    xr = er[sel]
    order = np.lexsort((xs, xr))
    xs, xr = xs[order], xr[order]
    cnt = np.bincount(xr, minlength=n)
    ok = cnt >= 2
    out_x = np.zeros(n)
    # widths over even-odd pairs within each ring's sorted crossing list
    seg_start = np.concatenate([[0], np.cumsum(cnt)[:-1]])
    pos = np.arange(len(xs)) - seg_start[xr]
    pair_mask = (pos % 2 == 0) & (pos + 1 < cnt[xr])
    p_idx = np.flatnonzero(pair_mask)
    if len(p_idx):
        widths = xs[p_idx + 1] - xs[p_idx]
        wr = xr[p_idx]
        # per-ring max width (exact) then FIRST pair achieving it (argmax)
        wseg_start = _segment_starts(wr, n)
        has = wseg_start >= 0
        wmax = np.full(n, -np.inf)
        if has.any():
            red_starts = wseg_start[has]
            wmax[has] = np.maximum.reduceat(widths, red_starts)
        first = _first_true_per_segment(widths == wmax[wr], wr, n)
        hit = first >= 0
        fi = first[hit]
        out_x[hit] = 0.5 * (xs[p_idx[fi]] + xs[p_idx[fi] + 1])
        ok &= hit
    else:
        ok[:] = False
    return out_x, y, ok


def _segment_starts(sorted_ids: np.ndarray, n_seg: int) -> np.ndarray:
    """Start offset of each segment id within a sorted id array; -1 if the
    segment is empty."""
    out = np.full(n_seg, -1, dtype=np.int64)
    if len(sorted_ids):
        firsts = np.flatnonzero(np.diff(sorted_ids, prepend=sorted_ids[0] - 1))
        out[sorted_ids[firsts]] = firsts
    return out


def _batched_normalize_rings(V: np.ndarray, starts: np.ndarray, lens: np.ndarray):
    """Vectorized _normalize_rings for n concatenated CLOSED single rings.
    Returns (rings, ok): per-ring canonical CLOSED (m,2) arrays; ok=False →
    use the original function (ambiguous shoelace sign / tiny ring)."""
    n = len(starts)
    ends = starts + lens
    # drop closing vertex where first == last (np.array_equal semantics)
    closed = (V[starts, 0] == V[ends - 1, 0]) & (V[starts, 1] == V[ends - 1, 1])
    body_lens = lens - closed.astype(np.int64)
    keep = np.ones(len(V), dtype=bool)
    keep[ends[closed] - 1] = False
    B = V[keep]
    b_starts = np.concatenate([[0], np.cumsum(body_lens)[:-1]])
    b_ids = np.repeat(np.arange(n), body_lens)
    # dedupe consecutive duplicates (within each body)
    is_start = np.zeros(len(B), dtype=bool)
    is_start[b_starts] = True
    diff_prev = np.empty(len(B), dtype=bool)
    diff_prev[0] = True
    diff_prev[1:] = (B[1:, 0] != B[:-1, 0]) | (B[1:, 1] != B[:-1, 1])
    keep2 = is_start | diff_prev
    B2 = B[keep2]
    d_ids = b_ids[keep2]
    d_lens = np.bincount(d_ids, minlength=n)
    d_starts = np.concatenate([[0], np.cumsum(d_lens)[:-1]])
    d_ends = d_starts + d_lens
    ok = d_lens >= 3
    # shoelace over the closed ring: term_i = x_i*y_{i+1} - x_{i+1}*y_i with
    # wraparound (the original appends body[0] and sums x[:-1]y[1:]-x[1:]y[:-1])
    nx = np.arange(len(B2)) + 1
    nx[d_ends - 1] = d_starts  # wrap: successor of the last vertex is the first
    t = B2[:, 0] * B2[nx, 1] - B2[nx, 0] * B2[:, 1]
    a2 = np.add.reduceat(t, d_starts)  # == 2*area up to summation order
    aabs = np.add.reduceat(np.abs(t), d_starts)
    # sign-safety guard: pairwise (np.sum) and sequential (reduceat)
    # summation agree in sign unless |sum| is within the rounding envelope
    guard = 4.0 * np.maximum(d_lens, 2) * 2.220446049250313e-16 * aabs
    ok &= np.abs(a2) > guard
    flip = ~(a2 > 0.0)  # want_ccw for an exterior ring
    out = []
    for i in range(n):
        if not ok[i]:
            out.append(None)
            continue
        body = B2[d_starts[i]:d_ends[i]]
        if flip[i]:
            body = body[::-1]
        # first lexicographic-min vertex (np.lexsort((y, x))[0] semantics)
        minx = body[:, 0].min()
        cand = body[:, 0] == minx
        miny = body[cand, 1].min()
        start = int(np.flatnonzero(cand & (body[:, 1] == miny))[0])
        body = np.roll(body, -start, axis=0)
        out.append(np.vstack([body, body[0]]))
    return out, ok


def _geohash_blocks_fast(blocks: list, areas: list, regions: list,
                         precision: int = 12) -> pd.DataFrame:
    """Batched equivalent of _geohash_blocks(..., regions=...) — identical
    values, vectorized over every simple single-ring Polygon; everything
    else (holes, multi parts, degenerate cases) routes through the original
    per-block functions."""
    n = len(blocks)
    if n == 0:
        return pd.DataFrame(columns=BLOCKS_PRE_SCHEMA.fieldNames())
    simple = np.array(
        [b[0] == "Polygon" and len(b[1]) == 1 and len(b[1][0]) >= 4 for b in blocks]
    )
    rep_x = np.empty(n)
    rep_y = np.empty(n)
    geo_out: list = [None] * n
    if simple.any():
        s_idx = np.flatnonzero(simple)
        rings = [np.asarray(blocks[i][1][0], dtype=np.float64) for i in s_idx]
        lens = np.array([len(r) for r in rings], dtype=np.int64)
        V = np.vstack(rings)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        bx, by, r_ok = _batched_rep_points(V, starts, lens)
        norm_rings, n_ok = _batched_normalize_rings(V, starts, lens)
        for j, i in enumerate(s_idx):
            if r_ok[j]:
                rep_x[i], rep_y[i] = bx[j], by[j]
            else:
                rep_x[i], rep_y[i] = representative_point(blocks[i][1])
            if n_ok[j]:
                geo_out[i] = ("Polygon", [norm_rings[j]])
            else:
                geo_out[i] = normalize_geom(blocks[i])
    for i in np.flatnonzero(~simple):
        rep_x[i], rep_y[i] = representative_point(blocks[i][1])
        geo_out[i] = normalize_geom(blocks[i])
    ghs = geohash_encode(rep_y, rep_x, precision)
    wkbs = [_wkb.dumps(g) for g in geo_out]
    # bounds: min/max per ring over all rings of the normalized geometry
    # (order-insensitive → batched reduceat is exact); the normalized
    # vertex SET equals the input's, so bounds match _wkb.bounds(norm)
    bounds = np.array([_wkb.bounds(g) for g in geo_out])
    return pd.DataFrame(
        {
            "region_code": regions,
            "geohash": ghs,
            "geometry": wkbs,
            "area_m2": areas,
            "rep_lon": rep_x,
            "rep_lat": rep_y,
            "minx": bounds[:, 0],
            "miny": bounds[:, 1],
            "maxx": bounds[:, 2],
            "maxy": bounds[:, 3],
        }
    )


def _block_cogroup(land_pdf: pd.DataFrame, lines_pdf: pd.DataFrame) -> pd.DataFrame:
    """One kernel invocation per (region, land_part) group."""
    if len(land_pdf) == 0:
        return pd.DataFrame(columns=BLOCKS_RAW_SCHEMA.fieldNames())
    region = land_pdf["region_code"].iloc[0]
    land_parts = []
    for buf in land_pdf["geometry"]:
        for p in _wkb.get_parts(_wkb.loads(bytes(buf))):
            if p[0] == "Polygon":
                land_parts.append(p)
    line_geoms = [_wkb.loads(bytes(b)) for b in lines_pdf["geometry"]] if len(lines_pdf) else []

    blocks = _make_blocks(land_parts, line_geoms)
    # no _validate here: extract_faces emits simple rings by construction
    # (pinch points split by the angular walk), and the reference's
    # make_valid (blocker.py:281-294) is the identity on valid polygons
    areas = [geom_area_m2(b) for b in blocks]

    # _add_back_water_features (blocker.py:202-231): polygonize filled the
    # water cutouts (holes in land parts); clip those faces back to land.
    # Only blocks whose bbox intersects a hole bbox can need clipping —
    # everything else is already inside land (hole-bbox prefilter).
    land_area = sum(geom_area_m2(p) for p in land_parts)
    if sum(areas) - land_area > 1.0:
        hole_boxes = []
        for _, rings in land_parts:
            for hole in rings[1:]:
                h = np.asarray(hole)
                hole_boxes.append(
                    (h[:, 0].min(), h[:, 1].min(), h[:, 0].max(), h[:, 1].max())
                )
        new_blocks, new_areas = [], []
        for b, a in zip(blocks, areas):
            bb = _wkb.bounds(b)
            touches_hole = any(
                bb[0] <= hx1 and bb[2] >= hx0 and bb[1] <= hy1 and bb[3] >= hy0
                for hx0, hy0, hx1, hy1 in hole_boxes
            )
            if touches_hole:
                for c in _validate(_overlay_op([b], land_parts, "intersection")):
                    new_blocks.append(c)
                    new_areas.append(geom_area_m2(c))
            else:
                new_blocks.append(b)
                new_areas.append(a)
        blocks, areas = new_blocks, new_areas

    blocks, areas = _remove_overlaps(blocks, areas, region, land_area=land_area)

    # _residual_area_check (blocker.py:166-200); >1 m² threshold — float
    # epsilon residues produce empty geometry in the reference too, this
    # just skips the no-op union
    if land_area - sum(areas) > 1.0:
        union_blocks = _dissolve([_wkb.dumps(b) for b in blocks])
        residue = _overlay_op(land_parts, union_blocks, "difference")
        residue = _validate([p for p in residue if geom_area_m2(p) > 0])
        blocks = blocks + residue
        areas = areas + [geom_area_m2(p) for p in residue]

    return pd.DataFrame(
        {
            "region_code": region,
            "geometry": [_wkb.dumps(b) for b in blocks],
            "area_m2": areas,
        },
        columns=BLOCKS_RAW_SCHEMA.fieldNames(),
    )


def build_blocks(land: DataFrame, lines: DataFrame, route: str = "auto") -> DataFrame:
    """land parts + extracted linestrings → blocks.

    One geometry kernel per (region, land_part): lines are routed to parts by
    a bbox join (literal-broadcast part boxes when parts are few; cell-key
    equi-join above ``PART_BROADCAST_MAX`` parts — see ``build_blocks_pre``),
    each part polygonizes independently, then the block IDs are assigned by a
    region-wide window (georank = cumcount within (region, geohash) ordered
    by canonical WKB — the reference's sort+cumcount at blocker.py:296-322,
    bit-identical to the r1 per-region kernel output)."""
    return assign_block_ids(build_blocks_pre(land, lines, route=route))


# Above this many land parts the literal-broadcast line→part routing (a
# driver collect + literal relation) stops being "tiny metadata": an
# archipelago world (Indonesia/Norway at 100×) has 10⁴-10⁵ parts and the
# collected rows bloat the plan. The cell-key equi-join route takes over
# (VERDICT r3 #3). 8192 rows × 6 scalars ≈ 400 KB literal — comfortably
# below Spark's plan-size pain threshold; both paths are block-identical
# (tested on a ≥10⁴-part region).
PART_BROADCAST_MAX = 8192
ROUTE_RES = 7  # ~2.8° routing tiles; with_cover_cells lowers per-row for giants


def _route_lines_to_parts_cells(land: DataFrame, lines: DataFrame) -> DataFrame:
    """Scale-safe line→part routing: cover both bboxes with equal-area cells
    and equi-join on (region, cell) — no driver-side part state. Same output
    rows as the broadcast-bbox path: (l_region, l_part, l_geometry), one row
    per (line, bbox-overlapping part)."""
    from ..functions import cellexpr

    part_cells = cellexpr.with_cover_cells(
        land.select(
            F.col("region_code").alias("p_region"), F.col("part_id").alias("p_part"),
            F.col("minx").alias("p_minx"), F.col("miny").alias("p_miny"),
            F.col("maxx").alias("p_maxx"), F.col("maxy").alias("p_maxy"),
        ),
        ROUTE_RES,
        minx="p_minx", miny="p_miny", maxx="p_maxx", maxy="p_maxy",
    )
    res_list = sorted(
        r["cell_res"] for r in part_cells.select("cell_res").distinct().collect()
    )
    if not res_list:  # no land parts → no routed lines
        return lines.select(
            F.col("region_code").alias("l_region"),
            F.lit(None).cast("int").alias("l_part"),
            F.col("geometry").alias("l_geometry"),
        ).limit(0)
    l = lines.select("region_code", "geometry", "minx", "miny", "maxx", "maxy").withColumn(
        "_lid", F.monotonically_increasing_id()
    )
    line_cells = None
    for r in res_list:
        lc = cellexpr.with_cover_cells(l, r, target=None).select(
            "region_code", "_lid", "geometry", "minx", "miny", "maxx", "maxy", "cell"
        )
        line_cells = lc if line_cells is None else line_cells.unionByName(lc)
    return (
        line_cells.join(
            part_cells.select("p_region", "p_part", "p_minx", "p_miny", "p_maxx", "p_maxy", "cell"),
            (F.col("region_code") == F.col("p_region")) & (line_cells["cell"] == part_cells["cell"]),
        )
        .filter(
            (F.col("minx") <= F.col("p_maxx")) & (F.col("maxx") >= F.col("p_minx"))
            & (F.col("miny") <= F.col("p_maxy")) & (F.col("maxy") >= F.col("p_miny"))
        )
        .select(
            F.col("region_code").alias("l_region"),
            F.col("p_part").alias("l_part"),
            F.col("_lid"),
            F.col("geometry").alias("l_geometry"),
        )
        .dropDuplicates(["l_region", "l_part", "_lid"])
        .drop("_lid")
    )


def build_blocks_pre(land: DataFrame, lines: DataFrame,
                     route: str = "auto") -> DataFrame:
    """The cogroup half of build_blocks: blocks WITHOUT ids (geohash + geometry
    + stats). Exposed so stage-level profiling/benchmarks can attribute time
    between the geometry kernels and the id window.

    ``route``: how lines reach their land parts — ``"broadcast"`` (driver
    literal of part bboxes; fastest when parts are few), ``"cells"``
    (distributed cell-key equi-join; no driver state, the 100 TB shape), or
    ``"auto"`` (broadcast up to ``PART_BROADCAST_MAX`` parts, cells above)."""
    if "minx" not in land.columns:
        # externally-sourced land without bbox columns: one Arrow pass. The
        # normalize stage emits them in-kernel, so the pipeline path never
        # pays this extra Python stage (round 3 — ~0.3 cpu-s/task runner
        # overhead per stage, a measured fixed floor at every core count).
        from ..functions.geometry import st_bbox

        land = (
            land.select("region_code", "part_id", "geometry")
            .withColumn("_bb", st_bbox(F.col("geometry")))
            .select(
                "region_code", "part_id", "geometry",
                F.col("_bb.minx").alias("minx"), F.col("_bb.miny").alias("miny"),
                F.col("_bb.maxx").alias("maxx"), F.col("_bb.maxy").alias("maxy"),
            )
        )
    # normalize the key dtype: externally-built land frames may carry int64
    # part ids while the literal part-box relation (and LAND_SCHEMA) use
    # int32 — a dtype mismatch between the cogroup sides would silently
    # route every line into an empty group
    land = land.select(
        "region_code", F.col("part_id").cast("int").alias("part_id"),
        "geometry", "minx", "miny", "maxx", "maxy",
    )
    pb_rows = None
    if route == "auto":
        # the auto probe IS the broadcast path's collect, just capped: pull
        # at most MAX+1 part-box rows (no geometry). ≤ MAX rows → we already
        # hold the full literal relation (zero extra jobs vs plain
        # broadcast); > MAX → archipelago, switch to the cell route.
        probe = land.select(
            "region_code", "part_id", "minx", "miny", "maxx", "maxy"
        ).limit(PART_BROADCAST_MAX + 1).collect()
        if len(probe) <= PART_BROADCAST_MAX:
            route, pb_rows = "broadcast", probe
        else:
            route = "cells"
    if route == "cells":
        lines_parts = _route_lines_to_parts_cells(land, lines)
    elif route == "broadcast":
        # materialize the part-bbox dim table driver-side before broadcasting:
        # it has one row per land part (tiny under PART_BROADCAST_MAX — the
        # same rows a BroadcastExchange would collect anyway), and
        # broadcasting a subtree that contains Python-eval stages makes Spark
        # re-execute that lineage on every query run (measured 7-13s per
        # execution at 32 cores vs 0.5s for the literal relation)
        spark = land.sparkSession
        if pb_rows is None:
            pb_rows = land.select(
                "region_code", "part_id", "minx", "miny", "maxx", "maxy"
            ).collect()
        part_boxes = F.broadcast(
            spark.createDataFrame(
                [tuple(r) for r in pb_rows],
                "p_region string, p_part int, p_minx double, p_miny double, p_maxx double, p_maxy double",
            )
        )
        lines_parts = (
            lines.select("region_code", "geometry", "minx", "miny", "maxx", "maxy")
            .join(part_boxes, F.col("region_code") == F.col("p_region"), "inner")
            .filter(
                (F.col("minx") <= F.col("p_maxx")) & (F.col("maxx") >= F.col("p_minx"))
                & (F.col("miny") <= F.col("p_maxy")) & (F.col("maxy") >= F.col("p_miny"))
            )
            .select(
                F.col("region_code").alias("l_region"),
                F.col("p_part").alias("l_part"),
                F.col("geometry").alias("l_geometry"),
            )
        )
    else:
        raise ValueError(f"unknown route {route!r} (auto|broadcast|cells)")
    # Wide EXPLICIT repartition on the group keys before the cogroup: the
    # kernel stage is tiny-bytes/huge-CPU, so it needs far more partitions
    # than a byte-sized shuffle would get — 16× parallelism cuts the
    # balls-in-bins straggler tail (256 groups into 128 tasks leaves ~4-group
    # stragglers; into 512, ~1). An explicit repartition also can't be
    # byte-coalesced by AQE, and the cogroup reuses its hash partitioning
    # (one exchange per side — verified in PLANS.md). Measured at the 4×
    # world: 8-core cogroup 36.4s → 28.2s, 32-core → 13.9s, and 8→32
    # efficiency 0.25 → 0.51 (round 3).
    #
    # Round 4: the overscan is sized to the KNOWN part count when the auto
    # probe already fetched it — every Python task pays a measured
    # ~0.2-0.25 s runner floor even when its partition is empty, so 512
    # tasks for 48 groups burned ~2 s of pure overhead at the driver config.
    # 2× groups keeps the straggler-tail benefit; the 16× ceiling returns
    # as soon as groups ≥ 8× parallelism (the scaling worlds).
    dp = land.sparkSession.sparkContext.defaultParallelism
    if pb_rows is not None:
        np_ = min(dp * 16, max(dp * 2, 2 * len(pb_rows)))
    else:
        np_ = dp * 16
    land_g = land.repartition(np_, "region_code", "part_id")
    lines_g = lines_parts.repartition(np_, "l_region", "l_part")
    raw = (
        land_g.groupBy("region_code", "part_id")
        .cogroup(lines_g.groupBy("l_region", "l_part"))
        .applyInPandas(_block_cogroup_adapter, BLOCKS_RAW_SCHEMA)
    )
    # flat per-block post-processing on dp partitions: the round-robin
    # repartition decouples its parallelism from the group count (the
    # blocks-side 8→32 scaling limiter — one fat region no longer owns its
    # blocks' rep-point/normalize work), and dp tasks keep the Python-stage
    # floor at one wave
    return raw.repartition(dp).mapInPandas(_post_blocks_batches, BLOCKS_PRE_SCHEMA)


def assign_block_ids(pre: DataFrame) -> DataFrame:
    """Region-wide georank window → stable block ids (reference cumcount
    semantics, blocker.py:296-322)."""
    from pyspark.sql import Window

    # dp-sized explicit repartition on the window keys (r6): the window's
    # own exchange would use spark.sql.shuffle.partitions (128 at the bench
    # config) and is not AQE-coalesced, leaving 128 tiny reduce tasks AND a
    # 128-partition cache for every downstream consumer (cell index, refine
    # geometry, assignment probes all re-scan blocks). The explicit
    # repartition satisfies the window's hash(region, geohash) requirement,
    # so no second exchange is added — same shuffle, dp tasks.
    dp = pre.sparkSession.sparkContext.defaultParallelism
    pre = pre.repartition(dp, "region_code", "geohash")
    w = Window.partitionBy("region_code", "geohash").orderBy(F.col("geometry").asc())
    return (
        pre.withColumn("georank", F.row_number().over(w) - 1)
        .withColumn(
            "block_id",
            F.concat_ws("_", "region_code", "geohash", F.col("georank").cast("string")),
        )
        .select(
            "region_code", "block_id", "geometry", "area_m2", "rep_lon", "rep_lat",
            "minx", "miny", "maxx", "maxy",
        )
    )


def _block_cogroup_adapter(land_pdf: pd.DataFrame, lines_pdf: pd.DataFrame) -> pd.DataFrame:
    if len(lines_pdf):
        lines_pdf = lines_pdf.rename(columns={"l_geometry": "geometry"})
    return _block_cogroup(land_pdf, lines_pdf)
