"""geopull_spark — a PySpark-native spatial-join + tiling engine.

Rebuilds the query semantics of mansueto-institute/geopull (street-block
delineation: extract → normalize → polygonize → stable block IDs) as
DataFrame/Catalyst-native operators with vectorized pandas/Arrow UDF geometry
kernels, plus doc→block point-in-polygon assignment, kNN block adjacency, and
zonal raster→vector joins over cell-key hash joins — designed for
multi-executor clusters over Iceberg-style tables of interleaved text+media
documents.

No geospatial libraries are used: every kernel (WKB codec, geohash, cell
index, area, point-in-polygon, polygonize, overlay algebra) is implemented
from scratch in numpy inside Arrow-batched pandas UDFs.
"""

__version__ = "0.4.0"
