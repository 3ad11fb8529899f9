"""Catalyst column expressions for the equal-area cell grid.

Pure-JVM mirror of ``kernels/cells.py`` (same packing: ``(res << 58) |
morton(lon_bits, sinlat_bits)``). The doc→block assignment hot path uses ONLY
these expressions — point cell id, parent cell, and bbox cover all evaluate
inside whole-stage codegen, so no Arrow batch ever crosses to Python for key
derivation (round-2 rework of the ArrowEvalPython stages flagged in
BENCH_r01; reference join semantics unchanged:
``/root/reference/src/geopull/blocker.py:104``).

Parity note: the lon/lat→fraction arithmetic is the same IEEE-double sequence
as the numpy kernel; ``sin`` may differ in the last ulp between JVM and numpy
for a measure-zero set of inputs, which only matters where a JVM-derived key
must equal a numpy-derived key — the engine keeps each join's two sides on
the same implementation (assignment: both JVM; kNN/zonal: both numpy).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_RES = 28
_FRACMAX = 1.0 - 2.0**-53  # np.nextafter(1.0, 0.0)

_SPREAD_STEPS = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def spread_expr(c: Column) -> Column:
    """Morton bit-spread of a long in [0, 2^28): bit i → bit 2i."""
    for shift, mask in _SPREAD_STEPS:
        c = c.bitwiseOR(F.shiftleft(c, shift)).bitwiseAND(F.lit(mask))
    return c


def pack_expr(ix: Column, iy: Column, res: Column | int) -> Column:
    res_col = F.lit(res) if isinstance(res, int) else res
    return F.shiftleft(res_col.cast("long"), 58).bitwiseOR(
        F.shiftleft(spread_expr(ix), 1).bitwiseOR(spread_expr(iy))
    )


def lon_fraction_expr(lon: Column) -> Column:
    return F.least(F.greatest((lon + F.lit(180.0)) / F.lit(360.0), F.lit(0.0)), F.lit(_FRACMAX))


def lat_fraction_expr(lat: Column) -> Column:
    """Equal-area y fraction: (sin(lat)+1)/2 — Lambert cylindrical."""
    return F.least(
        F.greatest((F.sin(F.radians(lat)) + F.lit(1.0)) / F.lit(2.0), F.lit(0.0)),
        F.lit(_FRACMAX),
    )


def ixy_expr(lon: Column, lat: Column, res: int) -> tuple[Column, Column]:
    n = F.lit(float(1 << res))
    ix = F.floor(lon_fraction_expr(lon) * n).cast("long")
    iy = F.floor(lat_fraction_expr(lat) * n).cast("long")
    return ix, iy


def cell_expr(lon: Column, lat: Column, res: int) -> Column:
    """Cell id of a point — the join key, fully JVM-side."""
    ix, iy = ixy_expr(lon, lat, res)
    return pack_expr(ix, iy, res)


def cells_at_expr(lon: Column, lat: Column, res_list: list[int]) -> Column:
    """Array of the point's cell at each resolution (multi-res probe side of
    an adaptive-resolution cover join). Quantize once at the finest res, then
    derive coarser ids by shifting: floor(f·2^r) == floor(f·2^R) >> (R-r)."""
    rmax = max(res_list)
    ix, iy = ixy_expr(lon, lat, rmax)
    return F.array(
        *[
            pack_expr(
                F.shiftrightunsigned(ix, rmax - r), F.shiftrightunsigned(iy, rmax - r), r
            )
            for r in sorted(set(res_list))
        ]
    )


def parent_expr(cell: Column, cell_res: int, parent_res: int) -> Column:
    """Parent of a fixed-resolution cell: shift the morton code 2·Δres bits."""
    morton = cell.bitwiseAND(F.lit((1 << 58) - 1))
    return F.shiftleft(F.lit(parent_res).cast("long"), 58).bitwiseOR(
        F.shiftrightunsigned(morton, 2 * (cell_res - parent_res))
    )


def with_cover_cells(
    df: DataFrame,
    res: int,
    minx: str = "minx",
    miny: str = "miny",
    maxx: str = "maxx",
    maxy: str = "maxy",
    out: str = "cell",
    target: int | None = 48,
    res_out: str = "cell_res",
) -> DataFrame:
    """Explode each row onto the cells covering its bbox — the UDTF-style
    cover (SURVEY §2.10) as two JVM ``sequence``+``explode`` generates.

    ``target`` caps the per-axis tile count by LOWERING the resolution for
    oversized bboxes (per row): a geometry spanning the whole region no longer
    blows the old hard cap (``ADVICE.md`` r1, cover-cap ValueError) — it just
    indexes at a coarser res, and the probe side matches it via
    :func:`cells_at_expr` over the distinct ``res_out`` values. ``target=None``
    keeps the resolution fixed (required for the refine-group cover, where
    both cogroup sides must share one resolution).
    """
    fx0 = lon_fraction_expr(F.col(minx))
    fx1 = lon_fraction_expr(F.col(maxx))
    fy0 = lat_fraction_expr(F.col(miny))
    fy1 = lat_fraction_expr(F.col(maxy))
    # minx > maxx ⇒ the bbox crosses the antimeridian (wrapped lon range)
    wx = F.when(fx1 >= fx0, fx1 - fx0).otherwise(F.lit(1.0) - (fx0 - fx1))
    if target is None:
        res_eff = F.lit(res)
    else:
        # largest r with extent_fraction · 2^r ≤ target  (guard zero extents)
        rx = F.floor(F.log2(F.lit(float(target)) / F.greatest(wx, F.lit(1e-15))))
        ry = F.floor(F.log2(F.lit(float(target)) / F.greatest(fy1 - fy0, F.lit(1e-15))))
        res_eff = F.greatest(F.least(F.lit(res), rx, ry), F.lit(0)).cast("int")
    n = F.pow(F.lit(2.0), res_eff.cast("double"))
    df = (
        df.withColumn(res_out, res_eff)
        .withColumn("_ix0", F.floor(fx0 * n).cast("long"))
        .withColumn("_ix1", F.floor(fx1 * n).cast("long"))
        .withColumn("_iy0", F.floor(fy0 * n).cast("long"))
        .withColumn("_iy1", F.floor(fy1 * n).cast("long"))
        .withColumn("_nx", n.cast("long"))
    )
    # antimeridian wrap: [ix0, n) ∪ [0, ix1]  (mirrors kernels.cells.cover_bbox).
    # Wrap is decided on the raw fractions (fx0 <= fx1 ⇔ minx <= maxx), not the
    # quantized indices — a wrapped span wider than 360° minus one tile can land
    # ix0 <= ix1 and must still cover the full x ring (ADVICE r2).
    xseq = (
        F.when(fx0 <= fx1, F.sequence(F.col("_ix0"), F.col("_ix1")))
        .when(
            F.col("_ix0") > F.col("_ix1"),
            F.concat(
                F.sequence(F.col("_ix0"), F.col("_nx") - 1),
                F.sequence(F.lit(0).cast("long"), F.col("_ix1")),
            ),
        )
        .otherwise(F.sequence(F.lit(0).cast("long"), F.col("_nx") - 1))
    )
    df = df.withColumn("_cix", F.explode(xseq))
    df = df.withColumn("_ciy", F.explode(F.sequence(F.col("_iy0"), F.col("_iy1"))))
    df = df.withColumn(out, pack_expr(F.col("_cix"), F.col("_ciy"), F.col(res_out)))
    return df.drop("_ix0", "_ix1", "_iy0", "_iy1", "_nx", "_cix", "_ciy")
