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


_REFINE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("block_id", T.StringType()),
    ]
)

PARENT_RES = 8  # refine group granularity: ~256 groups at 64 regions


def _pip_refine_cogroup(cand: pd.DataFrame, geom: pd.DataFrame) -> pd.DataFrame:
    """Exact PIP refine for one parent-cell group: decode each block once,
    test all its candidate points vectorized. Grouping at PARENT_RES keeps
    group counts in the hundreds (per-block groups would mean 10^5+ pandas
    invocations; per-candidate geometry shipping would dominate the shuffle)."""
    if len(cand) == 0 or len(geom) == 0:
        return pd.DataFrame(columns=_REFINE_SCHEMA.fieldNames())
    from ..kernels import wkb as _wkb
    from ..kernels.pointops import point_in_geom

    geoms = {
        bid: _wkb.loads(bytes(buf))
        for bid, buf in zip(geom["g_block_id"], geom["g_geometry"])
    }
    keep = np.zeros(len(cand), dtype=bool)
    px = cand["lon"].to_numpy(np.float64)
    py = cand["lat"].to_numpy(np.float64)
    for bid, idx in cand.groupby("block_id", sort=False).indices.items():
        g = geoms.get(bid)
        if g is None:
            continue
        keep[idx] = point_in_geom(px[idx], py[idx], g)
    return cand.loc[keep, ["doc_id", "lon", "lat", "block_id"]]


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
    # narrow index for the candidate join — shipping WKB per candidate row
    # would dominate the shuffle (geometry is ~500B vs ~40B of keys)
    bc_narrow = block_cells.select("cell", "block_id")
    # geometry side keyed by coarse parent cell; renamed columns (both
    # cogroup sides derive from block_cells → ambiguous-self-join check)
    @pandas_udf(T.LongType())
    def _parent(cell: pd.Series) -> pd.Series:
        return pd.Series(_cells.cell_parent(cell.to_numpy(np.int64), PARENT_RES))

    geom = (
        block_cells.withColumn("g_pcell", _parent(F.col("cell")))
        .select(
            "g_pcell",
            F.col("block_id").alias("g_block_id"),
            F.col("geometry").alias("g_geometry"),
        )
        .dropDuplicates(["g_pcell", "g_block_id"])
    )
    if salt_k > 1:
        # salt both phases: the join key AND the refine group key — a
        # cell-concentrated hot spot otherwise serializes the refine group
        bc_narrow = bc_narrow.withColumn(
            "salt", F.explode(F.array([F.lit(i) for i in range(salt_k)]))
        )
        geom = geom.withColumn(
            "g_salt", F.explode(F.array([F.lit(i) for i in range(salt_k)]))
        )
        d = d.withColumn(
            "salt", F.pmod(F.xxhash64("doc_id"), F.lit(salt_k)).cast("int")
        )
        join_keys = ["cell", "salt"]
    else:
        join_keys = ["cell"]
    right = F.broadcast(bc_narrow) if broadcast_index else bc_narrow
    cand = d.join(right, join_keys, "inner").withColumn("pcell", _parent(F.col("cell")))
    if salt_k > 1:
        cand = cand.select("pcell", "salt", "doc_id", "lon", "lat", "block_id")
        refined = (
            cand.groupBy("pcell", "salt")
            .cogroup(geom.groupBy("g_pcell", "g_salt"))
            .applyInPandas(_pip_refine_cogroup, _REFINE_SCHEMA)
        )
    else:
        cand = cand.select("pcell", "doc_id", "lon", "lat", "block_id")
        # cogrouped PIP refine per parent cell: each block's geometry crosses
        # the shuffle once per parent group (not once per candidate row)
        refined = (
            cand.groupBy("pcell")
            .cogroup(geom.groupBy("g_pcell"))
            .applyInPandas(_pip_refine_cogroup, _REFINE_SCHEMA)
        )
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
