"""Extract stage: osm_ways → admin / water / linestring tables.

Pure Catalyst translation of the reference's osmium tag filters
(``/root/reference/src/geopull/extractor.py:54-130``): boolean predicates over
a ``tags MapType`` column + geometry-type filter. Catalyst pushes the
geometry-type predicate and column pruning to the parquet scan; the map
lookups run in whole-stage codegen — no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HIGHWAY_EXCLUDE = ["footway", "bridleway", "steps", "corridor", "path", "cycleway"]
_NATURAL_EXCLUDE = ["coastline", "reef"]
_BOUNDARY_EXCLUDE = [
    "administrative", "place", "political", "postal_code",
    "special_economic_zone", "user_defined", "maritime",
]
_BARRIER_INCLUDE = ["city_wall", "ditch"]
_WATER_KEYS = ["coastline", "strait", "bay", "hot_spring", "shoal", "spring", "waterway", "water"]


def _has(key: str):
    return F.map_contains_key(F.col("tags"), key)


def _tag(key: str):
    return F.col("tags")[key]


def extract_admin(osm_ways: DataFrame) -> DataFrame:
    """Polygons with an admin_level tag (extractor.py:54-72)."""
    return (
        osm_ways.filter((F.col("geom_type") == "polygon") & _has("admin_level"))
        .select(
            "way_id", "region_code",
            _tag("admin_level").alias("admin_level"),
            "geometry", "minx", "miny", "maxx", "maxy",
        )
    )


def extract_linestrings(osm_ways: DataFrame) -> DataFrame:
    """Linestrings matching any include filter (extractor.py:74-101)."""
    pred = (
        (_has("natural") & ~_tag("natural").isin(_NATURAL_EXCLUDE))
        | (_has("barrier") & _tag("barrier").isin(_BARRIER_INCLUDE))
        | _has("route")
        | _has("railway")
        | (_has("highway") & ~_tag("highway").isin(_HIGHWAY_EXCLUDE))
        | _has("waterway")
        | (_has("boundary") & ~_tag("boundary").isin(_BOUNDARY_EXCLUDE))
    )
    return (
        osm_ways.filter((F.col("geom_type") == "linestring") & pred)
        .select(
            "way_id", "region_code",
            _tag("highway").alias("highway"),
            "geometry", "minx", "miny", "maxx", "maxy",
        )
    )


def export_ways(
    osm_ways: DataFrame,
    attributes: list[str] | None = None,
    include_tags: list[str] | None = None,
    geometry_type: str | None = None,
) -> DataFrame:
    """Parameterized export — the generic ``osmium export`` analog
    (reference CLI ``export`` subcommand, ``__main__.py:48-52``, args at
    ``:178-200``): user-chosen tag filters, attribute lifting and geometry-
    type selection, all pushed into the Catalyst plan.

    ``include_tags`` uses the osmium tags-filter shapes ``key`` (present) and
    ``key=value`` (equals); multiple entries OR together. ``attributes``
    lifts tag values into top-level columns. ``geometry_type`` keeps one of
    point/linestring/polygon."""
    df = osm_ways
    if geometry_type:
        df = df.filter(F.col("geom_type") == geometry_type.lower())
    if include_tags:
        pred = F.lit(False)
        for spec in include_tags:
            if "=" in spec:
                key, val = spec.split("=", 1)
                pred = pred | (_has(key) & (_tag(key) == val))
            else:
                pred = pred | _has(spec)
        df = df.filter(pred)
    cols = ["way_id", "region_code", "geom_type", "geometry",
            "minx", "miny", "maxx", "maxy"]
    lifted = [_tag(a).alias(a) for a in (attributes or [])]
    return df.select(*cols, *lifted)


def extract_water(osm_ways: DataFrame) -> DataFrame:
    """Water polygons (extractor.py:103-130): natural=water or any
    water-ish key present."""
    pred = (_has("natural") & (_tag("natural") == "water"))
    for key in _WATER_KEYS:
        pred = pred | _has(key)
    return (
        osm_ways.filter((F.col("geom_type") == "polygon") & pred)
        .select("way_id", "region_code", "geometry", "minx", "miny", "maxx", "maxy")
    )
