"""Distributed GeoTIFF → cell-keyed raster table (the J9 raster source).

``kernels/tiff.py`` is the from-spec codec; this module is the Spark half:
the driver parses ONLY the few-KB header/IFD (via mmap — no pixel byte is
read driver-side), builds a descriptor row per strip/tile, and each executor
task reads its own byte ranges from the file, decodes, maps pixel centers to
the equal-area cell grid, and PARTIALLY aggregates inside the kernel. The
final per-cell sums are one hash aggregation. At 100 TB of raster the plan
is: descriptor scan (KBs) → embarrassingly-parallel chunk decode with
in-kernel combine → one shuffle keyed by cell — the same shape Spark's own
binary-file sources use, but with byte-range reads instead of whole-file
rows (a 100 GB GeoTIFF never materializes in one task).

Output feeds ``operators/spatial_join.zonal_aggregate`` directly:
(cell, value, n_px) with ``value`` = Σ pixel values per cell (population
semantics; mean = value/n_px when needed). Nodata pixels (GDAL_NODATA tag,
plus NaN for float rasters) are dropped in-kernel.
"""

from __future__ import annotations

import mmap
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..kernels.cells import cell_id
from ..kernels.tiff import tiff_decode_chunk, tiff_parse_meta, tiff_parse_overviews

_DESC_SCHEMA = T.StructType([
    T.StructField("file_id", T.IntegerType(), False),
    T.StructField("chunk_idx", T.IntegerType(), False),
    T.StructField("offset", T.LongType(), False),
    T.StructField("count", T.LongType(), False),
])

_CELLS_SCHEMA = T.StructType([
    T.StructField("cell", T.LongType(), False),
    T.StructField("value", T.DoubleType(), False),
    T.StructField("n_px", T.LongType(), False),
])


def read_geotiff_meta(path: str) -> dict:
    """Parse header + IFD without reading pixel data (mmap pages in only the
    touched ranges — a multi-GB raster costs a few KB of I/O here)."""
    with open(path, "rb") as f:
        with mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ) as mm:
            return tiff_parse_meta(mm)


def read_geotiff_overviews(path: str) -> list[dict]:
    """Parse the full IFD chain (cloud-optimized-GeoTIFF overviews): one
    meta per level, finest first. Same few-KB mmap I/O as
    :func:`read_geotiff_meta`."""
    with open(path, "rb") as f:
        with mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ) as mm:
            return tiff_parse_overviews(mm)


def _meta_at_level(path: str, level: int) -> dict:
    if level == 0:
        return read_geotiff_meta(path)
    metas = read_geotiff_overviews(path)
    if level >= len(metas):
        raise ValueError(
            f"raster {path}: overview level {level} requested but only "
            f"{len(metas) - 1} overview level(s) present")
    return metas[level]


def _chunk_cells(meta: dict, idx: int, raw: bytes, res: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode one chunk and partially aggregate to (cells, sums, counts)."""
    arr = tiff_decode_chunk(meta, idx, raw)
    cw, ch = meta["chunk_width"], meta["chunk_height"]
    ty, tx = divmod(idx, meta["chunks_across"])
    y0 = ty * ch if meta["layout"] == "tile" else idx * ch
    x0 = tx * cw
    ys = min(arr.shape[0], meta["height"] - y0)
    xs = min(arr.shape[1], meta["width"] - x0)
    a = arr[:ys, :xs].astype(np.float64)
    # pixel centers (GeoTIFF PixelIsArea: tiepoint anchors the outer corner)
    lon = meta["lon0"] + (x0 + np.arange(xs) + 0.5) * meta["px_lon"]
    lat = meta["lat0"] - (y0 + np.arange(ys) + 0.5) * meta["px_lat"]
    keep = ~np.isnan(a)
    if meta["nodata"] is not None:
        keep &= a != meta["nodata"]
    if not keep.any():
        e = np.zeros(0)
        return e.astype(np.int64), e, e.astype(np.int64)
    lon_g = np.broadcast_to(lon[None, :], a.shape)[keep]
    lat_g = np.broadcast_to(lat[:, None], a.shape)[keep]
    cells = cell_id(lon_g, lat_g, res).astype(np.int64)
    vals = a[keep]
    uniq, inv = np.unique(cells, return_inverse=True)
    sums = np.bincount(inv, weights=vals, minlength=len(uniq))
    counts = np.bincount(inv, minlength=len(uniq))
    return uniq, sums, counts.astype(np.int64)


def read_geotiff_cells(spark: SparkSession, path: str | list[str], res: int,
                       n_partitions: int | None = None,
                       level: int = 0) -> DataFrame:
    """GeoTIFF file(s) → (cell, value, n_px) at resolution ``res``.

    One descriptor row per (file, strip/tile); tasks read their own byte
    ranges. ``path`` may be a list — a mosaic of tiles covering a large
    extent (the usual shape of a global population raster) fans out as one
    descriptor table, each file's few-KB IFD parsed once driver-side; tiles
    covering the same cells combine in the final agg exactly like chunks
    straddling a boundary. Cells straddling chunk boundaries combine in the
    final hash agg (the in-kernel combine already collapsed everything
    within a chunk, so the shuffle carries at most one row per
    (chunk, cell)).

    ``level`` selects a cloud-optimized-GeoTIFF overview (0 = full
    resolution): a coarse zonal query at overview k reads ~4^-k of the
    bytes — the cheap path when the analysis cell size dwarfs the native
    pixel. Each overview pixel carries the VALUE of its decimated source
    pixel, so sums scale by ~4^k (means are unbiased); callers wanting
    totals at coarse levels should rescale or stay at level 0."""
    paths = [path] if isinstance(path, str) else list(path)
    metas = [_meta_at_level(p, level) for p in paths]
    rows = [(fi, i, o, c)
            for fi, meta in enumerate(metas)
            for i, (o, c) in enumerate(zip(meta["offsets"], meta["counts"]))]
    n_parts = n_partitions or min(len(rows), spark.sparkContext.defaultParallelism)
    desc = spark.createDataFrame(rows, _DESC_SCHEMA).repartition(max(n_parts, 1))
    # metas ride the closure (KBs per file); file handles open lazily per task
    bc = spark.sparkContext.broadcast((paths, metas))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b_paths, b_metas = bc.value
        handles: dict[int, object] = {}
        try:
            for pdf in batches:
                out_c, out_s, out_n = [], [], []
                for fi, idx, off, cnt in zip(pdf["file_id"], pdf["chunk_idx"],
                                             pdf["offset"], pdf["count"]):
                    fi = int(fi)
                    f = handles.get(fi)
                    if f is None:
                        f = handles[fi] = open(b_paths[fi], "rb")
                    f.seek(int(off))
                    raw = f.read(int(cnt))
                    if len(raw) < int(cnt):
                        raise ValueError(
                            f"tiff: chunk {int(idx)} of {b_paths[fi]} byte "
                            f"range beyond EOF")
                    cells, sums, counts = _chunk_cells(b_metas[fi], int(idx), raw, res)
                    out_c.append(cells)
                    out_s.append(sums)
                    out_n.append(counts)
                yield pd.DataFrame({
                    "cell": np.concatenate(out_c) if out_c else np.zeros(0, np.int64),
                    "value": np.concatenate(out_s) if out_s else np.zeros(0),
                    "n_px": np.concatenate(out_n) if out_n else np.zeros(0, np.int64),
                })
        finally:
            for f in handles.values():
                f.close()

    from pyspark.sql import functions as F

    partial = desc.mapInPandas(decode, _CELLS_SCHEMA)
    return partial.groupBy("cell").agg(
        F.sum("value").alias("value"), F.sum("n_px").alias("n_px")
    )
