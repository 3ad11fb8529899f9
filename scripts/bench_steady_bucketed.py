"""VERDICT r3 #8 measurement: steady-state doc assignment against BUCKETED
blocks-side tables vs rebuilding/persisting the index per batch.

Simulates continuous ingestion: a blocks snapshot is prepared once
(cell index + refine geometry written as bucketed tables), then successive
doc batches are assigned. Reports per-batch wall time for
  cold      — assign_docs_to_blocks building both indexes inline
  persisted — indexes persisted as in-memory DataFrames (BENCH_STEADY path)
  bucketed  — assign_docs_steady reading the bucketed tables
and asserts all three produce identical rows.

Usage: SPARK_GRAFT_CPUS=32 python scripts/bench_steady_bucketed.py [doc_factor]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    doc_factor = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    streets = int(os.environ.get("BENCH_STREETS_PER_REGION", "1200"))
    n_regions = int(os.environ.get("BENCH_REGIONS", "8"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from geopull_spark.operators import blocker, extract, normalize, spatial_join
    from geopull_spark.session import get_spark
    from geopull_spark.sources import synth

    spark = get_spark(app_name="steady_bucketed", master=f"local[{cpus}]",
                      shuffle_partitions=cpus * 4)
    # warm python workers
    spark.range(0, cpus * 10, 1, numPartitions=cpus).mapInPandas(
        lambda it: it, "id long").write.format("noop").mode("overwrite").save()

    ways = synth.gen_osm_ways(spark, streets_per_region=streets, n_regions=n_regions)
    land = normalize.normalize_land(
        extract.extract_admin(ways), extract.extract_water(ways),
        synth.gen_coastline(spark, n_regions=n_regions))
    blocks = blocker.build_blocks(land, extract.extract_linestrings(ways)).persist()
    n_blocks = blocks.count()

    docs = synth.interleaved_documents(spark, sf_dir, n_regions=n_regions)
    docs = docs.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(doc_factor - 1))))
    docs = (
        docs.withColumn("doc_id", F.concat_ws("_", "doc_id", "rep"))
        .withColumn("lon", (F.col("lon") - F.col("lon") % 2)
                    + ((F.xxhash64("doc_id") % 100000 + 100000) % 100000) / 100000.0)
        .withColumn("lat", (F.col("lat") - F.col("lat") % 2)
                    + ((F.xxhash64("doc_id", F.lit(1)) % 100000 + 100000) % 100000) / 100000.0)
        .drop("rep")
    ).select("doc_id", "lon", "lat").repartition(cpus * 4).persist()
    n_docs = docs.count()

    out = {"cpus": cpus, "n_blocks": n_blocks, "n_docs": n_docs}

    # one-time snapshot preparation (amortized across every later batch)
    t0 = time.time()
    spatial_join.prepare_bucketed_assignment(blocks, prefix="sb_bench", n_buckets=cpus * 4)
    out["prepare_sec"] = round(time.time() - t0, 3)

    def timed(name, fn, warm=1, reps=2):
        counts = []
        for _ in range(warm):
            counts.append(fn().count())
        best = float("inf")
        for _ in range(reps):
            t = time.time()
            counts.append(fn().count())
            best = min(best, time.time() - t)
        out[name + "_sec"] = round(best, 3)
        return counts[-1]

    try:
        n1 = timed("cold", lambda: spatial_join.assign_docs_to_blocks(docs, blocks), warm=1)
        bc = spatial_join.build_block_cell_index(blocks).persist()
        gc = spatial_join.build_refine_geometry(blocks).persist()
        bc.count(); gc.count()
        n2 = timed("persisted", lambda: spatial_join.assign_docs_to_blocks(
            docs, blocks, bc, geom_cells=gc))
        n3 = timed("bucketed", lambda: spatial_join.assign_docs_steady(docs, prefix="sb_bench"))
        assert n1 == n2 == n3, (n1, n2, n3)
        out["n_assigned"] = n1
        # row-identity spot check on a sample partition
        a = set(map(tuple, spatial_join.assign_docs_to_blocks(docs, blocks, bc, geom_cells=gc)
                    .filter(F.crc32(F.col("doc_id")) % 50 == 0).select("doc_id", "block_id").collect()))
        b = set(map(tuple, spatial_join.assign_docs_steady(docs, prefix="sb_bench")
                    .filter(F.crc32(F.col("doc_id")) % 50 == 0).select("doc_id", "block_id").collect()))
        out["rows_identical_sample"] = a == b
    finally:
        spark.sql("DROP TABLE IF EXISTS sb_bench_block_cells")
        spark.sql("DROP TABLE IF EXISTS sb_bench_refine_geom")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
