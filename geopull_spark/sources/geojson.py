"""GeoJSON scan + sink (SURVEY S4; reference reads exported GeoJSON via
``gpd.read_file`` at ``/root/reference/src/geopull/geofile.py:271-274`` and
produces it with ``osmium export``).

Layout: newline-delimited features (GeoJSONSeq / ndjson) — the splittable
layout; a single FeatureCollection document cannot be partitioned, so the
writer emits one feature per line and the reader accepts both bare features
and FeatureCollection lines. Parsing happens in an Arrow-batched kernel
(GeoJSON coordinates nest to a type-dependent depth, which Spark's
``from_json`` cannot express with one static schema), emitting the engine's
WKB + bbox columns so every downstream operator (extract filters, cell cover,
blocker) works unchanged.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernels import wkb as _wkb

GEOJSON_SCHEMA = T.StructType(
    [
        T.StructField("properties", T.MapType(T.StringType(), T.StringType())),
        T.StructField("geom_type", T.StringType()),
        T.StructField("geometry", T.BinaryType()),
        T.StructField("minx", T.DoubleType()),
        T.StructField("miny", T.DoubleType()),
        T.StructField("maxx", T.DoubleType()),
        T.StructField("maxy", T.DoubleType()),
    ]
)


def _geojson_to_geom(g: dict):
    """GeoJSON geometry dict → engine tuple model (2-D; extra ordinates are
    truncated, matching the engine's WKB reader policy)."""
    t = g["type"]
    c = g["coordinates"] if t != "GeometryCollection" else None
    if t == "Point":
        return ("Point", [float(c[0]), float(c[1])])
    if t == "LineString":
        return ("LineString", [[float(x), float(y)] for x, y, *_ in c])
    if t == "Polygon":
        return ("Polygon", [[[float(x), float(y)] for x, y, *_ in ring] for ring in c])
    if t == "MultiPolygon":
        return (
            "MultiPolygon",
            [[[[float(x), float(y)] for x, y, *_ in ring] for ring in poly] for poly in c],
        )
    if t == "MultiLineString":
        return ("MultiLineString", [[[float(x), float(y)] for x, y, *_ in ls] for ls in c])
    if t == "MultiPoint":
        return ("MultiPoint", [[float(x), float(y)] for x, y, *_ in c])
    raise ValueError(f"unsupported GeoJSON geometry type {t!r}")


def _geom_to_geojson(geom) -> dict:
    gtype, payload = geom
    if gtype == "Point":
        return {"type": "Point", "coordinates": [float(payload[0]), float(payload[1])]}
    if gtype == "LineString":
        return {"type": "LineString", "coordinates": [[float(x), float(y)] for x, y in payload]}
    if gtype == "Polygon":
        return {
            "type": "Polygon",
            "coordinates": [[[float(x), float(y)] for x, y in ring] for ring in payload],
        }
    if gtype == "MultiPolygon":
        return {
            "type": "MultiPolygon",
            "coordinates": [
                [[[float(x), float(y)] for x, y in ring] for ring in rings]
                for rings in payload
            ],
        }
    raise ValueError(f"unsupported geometry type {gtype!r}")


def read_geojson(spark: SparkSession, path: str) -> DataFrame:
    """Newline-delimited GeoJSON → (properties, geom_type, geometry WKB,
    bbox). Distributed text scan; JSON+geometry parsing per Arrow batch."""
    lines = spark.read.text(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for line in pdf["value"]:
                line = line.strip().rstrip(",")
                if not line or line in ("[", "]", "{", "}"):
                    continue
                obj = json.loads(line)
                feats = obj["features"] if obj.get("type") == "FeatureCollection" else [obj]
                for f in feats:
                    if f.get("type") != "Feature" or f.get("geometry") is None:
                        continue
                    g = _as_arrays(_geojson_to_geom(f["geometry"]))
                    buf = _wkb.dumps(g)
                    b = _wkb.bounds(g)
                    props = {
                        str(k): (None if v is None else str(v))
                        for k, v in (f.get("properties") or {}).items()
                    }
                    rows.append((props, g[0], buf, b[0], b[1], b[2], b[3]))
            yield pd.DataFrame(rows, columns=GEOJSON_SCHEMA.fieldNames())

    return lines.mapInPandas(parse, GEOJSON_SCHEMA)


def _as_arrays(geom):
    import numpy as np

    gtype, payload = geom
    if gtype == "Point":
        return (gtype, np.asarray(payload, dtype=np.float64))
    if gtype in ("LineString", "MultiPoint"):
        return (gtype, np.asarray(payload, dtype=np.float64))
    if gtype in ("Polygon", "MultiLineString"):
        return (gtype, [np.asarray(r, dtype=np.float64) for r in payload])
    return (gtype, [[np.asarray(r, dtype=np.float64) for r in rings] for rings in payload])


def write_geojson(df: DataFrame, path: str, properties: list[str] | None = None,
                  wkb_col: str = "geometry") -> None:
    """WKB rows → newline-delimited GeoJSON features under ``path``.

    ``properties`` selects scalar columns to embed per feature (default: all
    non-geometry, non-bbox columns)."""
    skip = {wkb_col, "minx", "miny", "maxx", "maxy"}
    props = properties if properties is not None else [
        c for c in df.columns if c not in skip
    ]

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                geom = _wkb.loads(bytes(row[wkb_col]))
                def plain(v):
                    if isinstance(v, dict):
                        return v
                    if v is None or (isinstance(v, float) and pd.isna(v)):
                        return None
                    return v.item() if hasattr(v, "item") else v

                feat = {
                    "type": "Feature",
                    "properties": {p: plain(row[p]) for p in props},
                    "geometry": _geom_to_geojson(geom),
                }
                out.append(json.dumps(feat, separators=(",", ":"), sort_keys=True))
            yield pd.DataFrame({"value": out})

    df.select(*props, wkb_col).mapInPandas(encode, "value string").write.mode(
        "overwrite"
    ).text(path)
