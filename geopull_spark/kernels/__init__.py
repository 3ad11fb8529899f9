"""Pure-numpy geometry kernels (no shapely/geopandas/GEOS).

Each kernel operates on geometries decoded from WKB into numpy coordinate
arrays; no per-row Python objects cross the Spark boundary — callers wrap
these in Arrow-batched pandas UDFs (see geopull_spark.functions).
"""
