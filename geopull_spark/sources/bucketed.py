"""Bucketed table layout for co-located joins.

Big recurring equi-joins (docs ⋈ block-cell index on ``cell``; band-bucket
dedup joins) shuffle both sides on every run. Writing both sides bucketed by
the join key (`bucketBy` + `saveAsTable`) pre-partitions the data on disk so
Spark plans the join WITHOUT any Exchange — the 100 TB recipe for a stable
doc-assignment pipeline where the block index changes rarely and doc batches
arrive continuously (each batch is written bucketed once, then every
downstream join on ``cell`` is shuffle-free; verified by
tests/test_pipeline.py::test_bucketed_cell_join_no_shuffle, which asserts no
Exchange in the physical plan).

The reference has no analog (single-node eager geopandas); this is the
engine-native layout layer on top of the snapshot warehouse.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 64,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed table.

    Joins between two tables bucketed by the same columns with the same
    bucket count execute without a shuffle; sorting within buckets
    additionally enables exchange-AND-sort-free sort-merge joins."""
    if mode == "overwrite":
        spark = df.sparkSession
        # a previous session (in-memory catalog) may have left the managed
        # location on disk without a catalog entry — saveAsTable then fails
        # with LOCATION_ALREADY_EXISTS; clear both
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        if not spark.catalog.tableExists(table):
            import shutil

            wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
            loc = os.path.join(wh.removeprefix("file:"), table.lower())
            shutil.rmtree(loc, ignore_errors=True)
    w = df.write.bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.mode(mode).format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
