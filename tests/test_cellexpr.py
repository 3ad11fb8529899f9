"""JVM (Catalyst) ↔ numpy parity for the cell grid — load-bearing: the doc
side of every spatial join derives keys via functions/cellexpr.py while
kernels (kNN, zonal, interior index) use kernels/cells.py; a single
disagreeing bit would silently drop candidates at cell boundaries."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geopull_spark.functions import cellexpr
from geopull_spark.kernels import cells as kc
from geopull_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark(app_name="cellexpr_tests", master="local[4]", shuffle_partitions=4)


def test_cell_expr_matches_numpy(spark):
    rng = np.random.default_rng(42)
    lon = rng.uniform(-179.99, 179.99, 3000)
    lat = rng.uniform(-89.99, 89.99, 3000)
    df = spark.createDataFrame(pd.DataFrame({"lon": lon, "lat": lat}))
    for res in (0, 7, 10, 14, 28):
        got = np.array([r[0] for r in df.select(cellexpr.cell_expr(F.col("lon"), F.col("lat"), res)).collect()])
        assert (got == kc.cell_id(lon, lat, res)).all(), res


def test_cells_at_and_parent_expr_match_numpy(spark):
    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-90, 90, 500)
    df = spark.createDataFrame(pd.DataFrame({"lon": lon, "lat": lat}))
    rows = df.select(cellexpr.cells_at_expr(F.col("lon"), F.col("lat"), [8, 11, 14]).alias("a")).collect()
    for i, r in enumerate(rows):
        for j, res in enumerate([8, 11, 14]):
            assert r["a"][j] == kc.cell_id(lon[i:i + 1], lat[i:i + 1], res)[0]
    c = kc.cell_id(lon, lat, 14)
    dfc = spark.createDataFrame(pd.DataFrame({"cell": c}))
    gp = np.array([r[0] for r in dfc.select(cellexpr.parent_expr(F.col("cell"), 14, 10)).collect()])
    assert (gp == kc.cell_parent(c, 10)).all()


def test_cover_expr_matches_numpy_incl_adaptive_and_wrap(spark):
    rng = np.random.default_rng(11)
    bb = pd.DataFrame({
        "minx": rng.uniform(-179, 170, 100),
        "miny": rng.uniform(-85, 80, 100),
    })
    bb["maxx"] = bb.minx + rng.uniform(0, 5.0, 100)   # some force adaptive res
    bb["maxy"] = bb.miny + rng.uniform(0, 5.0, 100)
    bb["rid"] = range(100)
    # antimeridian-wrapping bbox
    bb.loc[0, ["minx", "miny", "maxx", "maxy"]] = [175.0, -2.0, -176.0, 3.0]
    # wide wrap whose endpoints share an x tile at the adaptively-lowered res
    # (ADVICE r2: must cover the full x ring, not one column)
    bb.loc[1, ["minx", "miny", "maxx", "maxy"]] = [2.0, -5.0, 1.5, 5.0]
    cov = cellexpr.with_cover_cells(spark.createDataFrame(bb), 14)
    got: dict = {}
    resmap: dict = {}
    for r in cov.select("rid", "cell", "cell_res").collect():
        got.setdefault(r["rid"], set()).add(r["cell"])
        resmap[r["rid"]] = r["cell_res"]
    for i in range(100):
        want = set(kc.cover_bbox(bb.minx[i], bb.miny[i], bb.maxx[i], bb.maxy[i],
                                 resmap[i], cap=10**7).tolist())
        assert got[i] == want, i
