"""Cell-key spatial joins: doc→block PIP assignment, kNN block adjacency.

The engine's replacement for the reference's R-tree ``gpd.sjoin``
(``/root/reference/src/geopull/blocker.py:104``, ``normalizer.py:110``):
geometries are exploded onto quadtree cells; the spatial theta-join becomes a
cell equi-join (shuffle-hash / broadcast-hash, Catalyst's choice, AQE skew
splitting on) followed by an exact vectorized refine kernel (J1/J2/J7/J8).

Skew: dense regions concentrate docs on few cells. The block-cell index is
salted (``salt = pmod(doc hash, SALT_K)`` replicated block side) when
requested — explicit backstop on top of AQE skew-join (BASELINE.json
north_star requirement).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..functions.geometry import st_cell, st_contains_point, st_cover_cells, st_k_ring
from ..kernels import cells as _cells

INDEX_RES = 14  # ~0.022° tiles: ~45×45 per 1° region


def build_block_cell_index(blocks: DataFrame, res: int = INDEX_RES) -> DataFrame:
    """blocks → one row per (covering cell, block). The explode is the
    UDTF-style cell-covering (SURVEY.md §2.10)."""
    return (
        blocks.withColumn("cell", F.explode(st_cover_cells(F.col("geometry"), res)))
        .select("cell", "region_code", "block_id", "geometry")
    )


def docs_with_cell(docs: DataFrame, res: int = INDEX_RES) -> DataFrame:
    return docs.withColumn("cell", st_cell(F.col("lon"), F.col("lat"), res))


def assign_docs_to_blocks(
    docs: DataFrame,
    block_cells: DataFrame,
    salt_k: int = 0,
    broadcast_index: bool = False,
) -> DataFrame:
    """J7 doc→block point-in-polygon assignment.

    Equi-join on cell (+ salt when requested), exact PIP refine in one
    Arrow-batched kernel, then a deterministic tie-break (min block_id) for
    points exactly on a shared boundary. Default is a shuffle join on cell —
    the cell index carries WKB geometry, so even modest block counts blow the
    broadcast budget (measured: broadcast 3.8× slower at 24k blocks / 338k
    index rows). Set broadcast_index=True only for small indexes; AQE picks
    shuffle-hash vs sort-merge otherwise.
    """
    d = docs_with_cell(docs)
    bc = block_cells
    if salt_k > 1:
        bc = bc.withColumn("salt", F.explode(F.array([F.lit(i) for i in range(salt_k)])))
        d = d.withColumn("salt", F.pmod(F.xxhash64("doc_id"), F.lit(salt_k)))
        join_keys = ["cell", "salt"]
    else:
        join_keys = ["cell"]
    right = F.broadcast(bc) if broadcast_index else bc
    joined = d.join(right, join_keys, "inner")
    # cluster candidate rows by block within each partition: the PIP kernel
    # decodes each distinct WKB once per Arrow batch, so long same-block runs
    # turn the refine into one decode + one vectorized test per block
    joined = joined.sortWithinPartitions("block_id")
    refined = joined.filter(st_contains_point(F.col("geometry"), F.col("lon"), F.col("lat")))
    # boundary points can hit 2 blocks → deterministic min block_id
    return (
        refined.groupBy("doc_id")
        .agg(
            F.min("block_id").alias("block_id"),
            F.first("lon").alias("lon"),
            F.first("lat").alias("lat"),
        )
    )


def assign_docs_full(docs: DataFrame, block_cells: DataFrame, **kw) -> DataFrame:
    """Assignment carrying the full interleaved payload: the spans array rides
    the shuffle opaquely (span-sequence invariant checked in tests)."""
    assigned = assign_docs_to_blocks(docs.select("doc_id", "lon", "lat"), block_cells, **kw)
    return docs.join(assigned.select("doc_id", "block_id"), "doc_id", "left")


def zonal_population(blocks: DataFrame, res: int = INDEX_RES) -> DataFrame:
    """J9 zonal raster→vector join: a synthetic population raster keyed by
    cell (value = deterministic f(cell)) aggregated per block.

    Plan: block→cover-cells explode (the raster tiling join key) → cell-center
    PIP refine (center-in-polygon zonal approximation) → hash-agg sum per
    block. With a real raster the f(cell) literal becomes a raster-tile table
    on the same cell key — same plan shape."""
    @pandas_udf(T.StructType([
        T.StructField("cx", T.DoubleType()), T.StructField("cy", T.DoubleType())
    ]))
    def cell_center(cell: pd.Series) -> pd.DataFrame:
        ix, iy, r = _cells.cell_xy(cell.to_numpy(np.int64))
        n = (1 << r).astype(np.float64)
        return pd.DataFrame({
            "cx": -180.0 + (ix + 0.5) * (360.0 / n),
            "cy": -90.0 + (iy + 0.5) * (180.0 / n),
        })

    bc = build_block_cell_index(blocks, res)
    bc = bc.withColumn("c", cell_center(F.col("cell")))
    inside = bc.filter(
        st_contains_point(F.col("geometry"), F.col("c.cx"), F.col("c.cy"))
    )
    # deterministic synthetic raster: population per cell
    pop = (F.pmod(F.xxhash64(F.col("cell")), F.lit(1000)) + 1).alias("cell_pop")
    return (
        inside.withColumn("cell_pop", pop)
        .groupBy("region_code", "block_id")
        .agg(
            F.sum("cell_pop").alias("population"),
            F.count("*").alias("n_cells"),
        )
    )


def knn_points(pts: DataFrame, k: int = 3, res: int = 7,
               id_col: str = "doc_id") -> DataFrame:
    """J8 on raw points: k nearest neighbors via k-ring cell-key join +
    row_number window. Exact whenever the true k-th neighbor lies within one
    cell width (guaranteed here: res 7 cells span ~2.8°, regions span 1°).

    ``pts`` carries (id_col, lon, lat). Deterministic ties: (dist2, id)."""
    from pyspark.sql import Window

    base = pts.select(id_col, "lon", "lat").withColumn(
        "cell", st_cell(F.col("lon"), F.col("lat"), res)
    )
    left = base.withColumn("nbr_cell", F.explode(st_k_ring(F.col("cell"), 1)))
    right = base.select(
        F.col(id_col).alias("nbr_id"),
        F.col("lon").alias("nbr_lon"),
        F.col("lat").alias("nbr_lat"),
        F.col("cell").alias("nbr_cell"),
    )
    cand = left.join(right, "nbr_cell").filter(F.col(id_col) != F.col("nbr_id"))
    cand = cand.withColumn(
        "dist2",
        (F.col("lon") - F.col("nbr_lon")) * (F.col("lon") - F.col("nbr_lon"))
        + (F.col("lat") - F.col("nbr_lat")) * (F.col("lat") - F.col("nbr_lat")),
    ).dropDuplicates([id_col, "nbr_id"])
    w = Window.partitionBy(id_col).orderBy(F.col("dist2").asc(), F.col("nbr_id").asc())
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(id_col, "nbr_id", "dist2", "rk")
    )


def knn_blocks(blocks: DataFrame, k: int = 4, res: int = 12) -> DataFrame:
    """J8: k nearest blocks per block via k-ring cell expansion + exact
    rep-point distance + row_number window."""
    from pyspark.sql import Window

    pts = blocks.select(
        "block_id", F.col("rep_lon").alias("lon"), F.col("rep_lat").alias("lat")
    ).withColumn("cell", st_cell(F.col("lon"), F.col("lat"), res))
    left = pts.withColumn("nbr_cell", F.explode(st_k_ring(F.col("cell"), 1)))
    right = pts.select(
        F.col("block_id").alias("nbr_id"),
        F.col("lon").alias("nbr_lon"),
        F.col("lat").alias("nbr_lat"),
        F.col("cell").alias("nbr_cell"),
    )
    cand = left.join(right, "nbr_cell").filter(F.col("block_id") != F.col("nbr_id"))
    cand = cand.withColumn(
        "dist2",
        (F.col("lon") - F.col("nbr_lon")) ** 2 + (F.col("lat") - F.col("nbr_lat")) ** 2,
    )
    w = Window.partitionBy("block_id").orderBy(F.col("dist2").asc(), F.col("nbr_id").asc())
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("block_id", "nbr_id", "dist2", "rk")
    )
