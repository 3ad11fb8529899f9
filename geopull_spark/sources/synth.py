"""Deterministic synthetic OSM-like world + interleaved documents.

Replaces the reference's external inputs (Geofabrik PBF download
``/root/reference/src/geopull/geofile.py:350-351`` and Daylight coastline
``geofile.py:505-521``) with seeded generators — no external data (task rule).

World model: 3 regions (AAA/BBB/CCC), each a 1°×1° square on the equator.
Each region's ``osm_ways`` rows carry WKB geometry + a ``tags`` map drawn from
the reference's osmium filter sets (``extractor.py:54-130``) so the extract
predicates are exercised exactly: grid streets + diagonals (kept), footpaths
(excluded by ``highway!=footway,...``), a railway (kept), coastline/reef
natural lines (excluded), admin polygons at levels 2/4 (+ a non-numeric
``yes`` level exercising ``normalizer.py:83``), lakes + a river (water).

Region CCC has **no admin_level=4 polygons**, exercising the keep-level-2
path (``normalizer.py:94-95``).

Geometry is generated distributed (one task per way-id range) and every way
is a pure function of its ``way_id`` — deterministic under any partitioning.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernels import wkb

REGIONS = ["AAA", "BBB", "CCC"]
REGION_X0 = {"AAA": 0.0, "BBB": 2.0, "CCC": 4.0}
REGION_BOX = {r: (x0, 0.0, x0 + 1.0, 1.0) for r, x0 in REGION_X0.items()}

# regions beyond the default 3 lay out on a 2°-pitch grid, 80 per latitude row
_GRID_COLS = 80


def region_specs(n_regions: int = 3) -> dict[str, tuple[float, float, float, float]]:
    """Region code → 1°×1° box. n=3 keeps the canonical AAA/BBB/CCC world
    (driver-contract / oracle compatibility); larger n scales the parallel
    unit count for cluster-size benchmarks (one polygonize group per region)."""
    if n_regions <= 3:
        return {r: REGION_BOX[r] for r in REGIONS[:n_regions]}
    out: dict[str, tuple[float, float, float, float]] = {}
    for i in range(n_regions):
        code = REGIONS[i] if i < 3 else f"R{i:03d}"
        x0 = 2.0 * (i % _GRID_COLS)
        y0 = 2.0 * (i // _GRID_COLS)
        out[code] = (x0, y0, x0 + 1.0, y0 + 1.0)
    return out

OSM_WAYS_SCHEMA = T.StructType(
    [
        T.StructField("way_id", T.LongType(), False),
        T.StructField("region_code", T.StringType(), False),
        T.StructField("geom_type", T.StringType(), False),
        T.StructField("geometry", T.BinaryType(), False),
        T.StructField("minx", T.DoubleType(), False),
        T.StructField("miny", T.DoubleType(), False),
        T.StructField("maxx", T.DoubleType(), False),
        T.StructField("maxy", T.DoubleType(), False),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), False),
    ]
)


def _way_row(way_id: int, region: str, gtype: str, buf: bytes, tags: dict) -> tuple:
    b = wkb.bounds(wkb.loads(buf))
    return (way_id, region, gtype, buf, b[0], b[1], b[2], b[3], tags)


def _region_fixed_ways(region: str, base_id: int, box, keep_level4: bool) -> list[tuple]:
    """Per-region fixed features: admin, water, coast noise, railway."""
    x0, y0, x1, y1 = box
    rows = []
    wid = base_id

    def add(gtype, buf, tags):
        nonlocal wid
        rows.append(_way_row(wid, region, gtype, buf, tags))
        wid += 1

    sq = [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]
    # admin level 2: full square; level-2-only regions get a maritime
    # overhang strip on the east so the coastline-difference path has effect
    overhang = [(x0, y0), (x1 + 0.2, y0), (x1 + 0.2, y1), (x0, y1)]
    add("polygon", wkb.polygon(sq if keep_level4 else overhang), {"admin_level": "2"})
    # admin level 4: quadrants (absent in level-2 regions, normalizer.py:94-95)
    if keep_level4:
        mx, my = (x0 + x1) / 2, (y0 + y1) / 2
        for qx0, qy0, qx1, qy1 in [
            (x0, y0, mx, my),
            (mx, y0, x1, my),
            (x0, my, mx, y1),
            (mx, my, x1, y1),
        ]:
            add(
                "polygon",
                wkb.polygon([(qx0, qy0), (qx1, qy0), (qx1, qy1), (qx0, qy1)]),
                {"admin_level": "4"},
            )
    # non-numeric admin level (dropped by P3 filter, normalizer.py:83)
    add("polygon", wkb.polygon([(x0, y0), (x0 + 0.1, y0), (x0 + 0.1, y0 + 0.1), (x0, y0 + 0.1)]),
        {"admin_level": "yes"})
    # water: lake (SW), second lake (NE), river strip across the region
    add("polygon", wkb.polygon([(x0 + 0.1, y0 + 0.1), (x0 + 0.2, y0 + 0.1), (x0 + 0.2, y0 + 0.2), (x0 + 0.1, y0 + 0.2)]),
        {"natural": "water", "water": "lake"})
    add("polygon", wkb.polygon([(x0 + 0.7, y0 + 0.75), (x0 + 0.85, y0 + 0.75), (x0 + 0.85, y0 + 0.9), (x0 + 0.7, y0 + 0.9)]),
        {"natural": "water"})
    add("polygon", wkb.polygon([(x0, y0 + 0.52), (x1, y0 + 0.52), (x1, y0 + 0.55), (x0, y0 + 0.55)]),
        {"waterway": "riverbank"})
    # water polygon carrying an excluded 'natural' (reef) — NOT water-extracted
    add("polygon", wkb.polygon([(x0 + 0.4, y0 + 0.02), (x0 + 0.45, y0 + 0.02), (x0 + 0.45, y0 + 0.06), (x0 + 0.4, y0 + 0.06)]),
        {"natural": "reef"})
    # coastline linestring (excluded from linestring extract: natural!=coastline)
    add("linestring", wkb.linestring([(x0, y0), (x1, y1)]), {"natural": "coastline"})
    # railway crossing (kept by linestring extract)
    add("linestring", wkb.linestring([(x0, y0 + 0.305), (x1, y0 + 0.305)]), {"railway": "rail"})
    # boundary=administrative linestring (excluded)
    add("linestring", wkb.linestring([(x0, y0 + 0.91), (x1, y0 + 0.91)]), {"boundary": "administrative"})
    return rows


_FIXED_PER_REGION = 64  # id budget for fixed ways per region


def _street_way(way_id: int, region: str, n_grid: int, box=None) -> tuple:
    """Street ``way_id`` → deterministic geometry+tags (pure function)."""
    x0, y0, x1, y1 = box if box is not None else REGION_BOX[region]
    k = way_id % 1_000_000  # local street index within region
    rng_u = ((k * 48271 + 11) % 65536) / 65536.0  # LCG jitter, deterministic
    kind = k % 10
    gi = k // 10  # grid slot
    t = (gi % n_grid + 1) / (n_grid + 1)
    if kind < 4:  # vertical street
        x = x0 + t
        buf = wkb.linestring([(x, y0), (x, y1)])
        tags = {"highway": ["residential", "primary", "secondary", "tertiary"][kind]}
    elif kind < 8:  # horizontal street
        y = y0 + t
        buf = wkb.linestring([(x0, y), (x1, y)])
        tags = {"highway": ["residential", "unclassified", "primary", "service"][kind - 4]}
    elif kind == 8:  # diagonal avenue segment (crosses the grid → noding work)
        c = 0.2 + 0.6 * rng_u
        buf = wkb.linestring([(x0 + max(c - 0.2, 0.0), y0), (x0 + min(c + 0.2, 1.0), y1)])
        tags = {"highway": "trunk"}
    else:  # excluded footpath (must be filtered by P7)
        y = y0 + t
        buf = wkb.linestring([(x0 + 0.1, y + 0.003), (x0 + 0.9, y + 0.003)])
        tags = {"highway": ["footway", "path", "steps", "cycleway"][gi % 4]}
    return _way_row(way_id, region, "linestring", buf, tags)


def gen_osm_ways(spark: SparkSession, streets_per_region: int = 60,
                 n_regions: int = 3) -> DataFrame:
    """Distributed deterministic osm_ways table.

    ``streets_per_region`` scales per-region polygonize load (grid grows
    ~sqrt); ``n_regions`` scales the number of parallel polygonize groups
    (the cluster-size axis: each region is one group task)."""
    n_grid = max(int((streets_per_region / 2.2) ** 0.5) * 1, 3)
    specs = region_specs(n_regions)
    codes = list(specs)
    fixed = []
    for i, r in enumerate(codes):
        fixed.extend(
            _region_fixed_ways(r, 1_000_000_000 + i * _FIXED_PER_REGION, specs[r],
                               keep_level4=(i % 3 != 2))
        )
    # one partition for the tiny fixed-ways relation: the default dp-slice
    # parallelize doubles the cached table's partition count, and every
    # downstream extract scan pays a fixed per-task floor per partition (r6)
    fixed_df = spark.createDataFrame(fixed, OSM_WAYS_SCHEMA).coalesce(1)

    total = streets_per_region * n_regions
    base = spark.range(0, total, 1, numPartitions=max(spark.sparkContext.defaultParallelism, 4))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"].to_numpy():
                idx = int(i) % n_regions
                region = codes[idx]
                local = int(i) // n_regions
                way_id = idx * 1_000_000 + local
                rows.append(_street_way(way_id, region, n_grid, specs[region]))
            yield pd.DataFrame(rows, columns=OSM_WAYS_SCHEMA.fieldNames())

    streets_df = base.mapInPandas(gen, OSM_WAYS_SCHEMA)
    return streets_df.unionByName(fixed_df)


def gen_coastline(spark: SparkSession, n_regions: int = 3) -> DataFrame:
    """Synthetic Daylight-style sea polygons (stand-in for
    ``geofile.py:505-535``): one sea strip east of each region overlapping
    the level-2 regions' maritime overhang, so the coastline-difference path
    (normalizer.py:99-129) has a real effect."""
    rows = []
    specs = region_specs(n_regions)
    for i, (r, box) in enumerate(specs.items()):
        x0, y0, x1, y1 = box
        buf = wkb.polygon([(x1, y0 - 0.3), (x1 + 0.5, y0 - 0.3), (x1 + 0.5, y1 + 0.3), (x1, y1 + 0.3)])
        b = wkb.bounds(wkb.loads(buf))
        rows.append((2_000_000_000 + i, r, "polygon", buf, b[0], b[1], b[2], b[3], {}))
    return spark.createDataFrame(rows, OSM_WAYS_SCHEMA).select(
        "way_id", "region_code", "geometry", "minx", "miny", "maxx", "maxy"
    )


# ---------------------------------------------------------------------------
# interleaved documents (BASELINE.json input_hint schema)
# ---------------------------------------------------------------------------

SPAN_EXPR = """
transform(
  sequence(0, cast(doc_id % 4 as int)),
  i -> struct(
    element_at(array('text','image','audio'), cast((doc_id + i) % 3 as int) + 1) as kind,
    CASE WHEN (doc_id + i) % 3 = 0
         THEN substr(text, cast(i * ceil(n_chars / (doc_id % 4 + 1)) as int) + 1,
                     cast(ceil(n_chars / (doc_id % 4 + 1)) as int))
         ELSE NULL END as text,
    CASE WHEN (doc_id + i) % 3 != 0
         THEN concat('m', cast(doc_id as string), '_', cast(i as string))
         ELSE NULL END as media_ref,
    cast(i * ceil(n_chars / (doc_id % 4 + 1)) as int) as offset
  )
)
"""

# exact-integer point derivation (cross-engine reproducible, no float hash);
# CAST to double — a bare 100000.0 literal is DECIMAL in Spark SQL
LON_EXPR = "((doc_id * 48271) % 100000) / CAST(100000 AS DOUBLE)"
LAT_EXPR = "((doc_id * 69621) % 100000) / CAST(100000 AS DOUBLE)"


def interleaved_documents(spark: SparkSession, sf_dir: str, n_regions: int = 3) -> DataFrame:
    """Expand the driver's flat ``documents`` table into the interleaved-span
    schema (doc_id:string, spans:array<struct<kind,text,media_ref,offset>>)
    plus a deterministic point location per doc (region + lon/lat) for the
    doc→block spatial join. Pure Catalyst expressions — no UDFs; exact
    integer arithmetic (cross-engine oracle-reproducible at n_regions=3)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    specs = region_specs(n_regions)
    codes = list(specs)
    code_arr = ",".join(f"'{c}'" for c in codes)
    x0_arr = ",".join(f"{specs[c][0]}D" for c in codes)
    y0_arr = ",".join(f"{specs[c][1]}D" for c in codes)
    ridx = f"cast(doc_id % {n_regions} as int)"
    return (
        docs.withColumn("spans", F.expr(SPAN_EXPR))
        .withColumn("region_code", F.expr(f"element_at(array({code_arr}), {ridx} + 1)"))
        .withColumn("region_x0", F.expr(f"element_at(array({x0_arr}), {ridx} + 1)"))
        .withColumn("region_y0", F.expr(f"element_at(array({y0_arr}), {ridx} + 1)"))
        .withColumn("lon", F.expr(f"region_x0 + {LON_EXPR}"))
        .withColumn("lat", F.expr(f"region_y0 + {LAT_EXPR}"))
        .select(
            F.col("doc_id").cast("string").alias("doc_id"),
            "spans",
            "region_code",
            "lon",
            "lat",
        )
    )


def rect_zones(
    spark: SparkSession,
    lon_edges: list[float] | None = None,
    lat_edges: list[float] | None = None,
) -> DataFrame:
    """Deterministic axis-aligned rectangle zones tiling each canonical
    region box, WKB built by the engine's own writer. Exists so the J7 PIP
    and J9 zonal machinery can be VALUE-oracled: rectangle containment /
    overlap is exact interval arithmetic an independent SQL engine
    reproduces (``__spark_entry__.q_pip_rect_assign`` / ``q_zonal_rect``).

    ``lon_edges`` / ``lat_edges`` are fractions of the unit region box
    (default: a uniform 8×8 grid — edges at k/8, exactly representable).
    zone id = ``{region}_{col}_{row}``. Tiny dim table (≤ hundreds of rows)
    built driver-side like the engine registry (`sources/registry.py`).
    """
    if lon_edges is None:
        lon_edges = [i / 8.0 for i in range(9)]
    if lat_edges is None:
        lat_edges = [i / 8.0 for i in range(9)]
    rows = []
    for code in REGIONS:
        x0, y0, _, _ = REGION_BOX[code]
        for ci in range(len(lon_edges) - 1):
            for rj in range(len(lat_edges) - 1):
                x1, x2 = x0 + lon_edges[ci], x0 + lon_edges[ci + 1]
                y1, y2 = y0 + lat_edges[rj], y0 + lat_edges[rj + 1]
                geom = wkb.polygon(
                    [(x1, y1), (x2, y1), (x2, y2), (x1, y2), (x1, y1)]
                )
                rows.append((code, f"{code}_{ci}_{rj}", geom, x1, y1, x2, y2))
    schema = (
        "region_code string, block_id string, geometry binary, "
        "minx double, miny double, maxx double, maxy double"
    )
    return spark.createDataFrame(rows, schema)
