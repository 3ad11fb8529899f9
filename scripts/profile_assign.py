"""Stage-level profile of the doc→block assignment join at one parallelism
level (the BENCH/BASELINE.md scaling config: sf0.1 docs ×BENCH_DOC_FACTOR).

Usage: SPARK_GRAFT_CPUS=32 python scripts/profile_assign.py [doc_factor]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    doc_factor = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    streets = int(os.environ.get("BENCH_STREETS_PER_REGION", "1200"))
    n_regions = int(os.environ.get("BENCH_REGIONS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from geopull_spark.operators import blocker, extract, normalize, spatial_join
    from geopull_spark.session import get_spark
    from geopull_spark.sources import synth

    spark = get_spark(app_name="profile_assign", master=f"local[{cpus}]",
                      shuffle_partitions=cpus * 4,
                      extra_conf={"spark.ui.enabled": "true"})
    spark.range(0, cpus * 10, 1, numPartitions=cpus).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    ways = synth.gen_osm_ways(spark, streets_per_region=streets, n_regions=n_regions).persist()
    ways.count()
    land = normalize.normalize_land(
        extract.extract_admin(ways), extract.extract_water(ways),
        synth.gen_coastline(spark, n_regions=n_regions),
    ).persist()
    blocks = blocker.build_blocks(land, extract.extract_linestrings(ways)).persist()
    blocks.count()
    bc = spatial_join.build_block_cell_index(blocks).persist()
    bc.count()
    gc = spatial_join.build_refine_geometry(blocks).persist()
    gc.count()

    docs = synth.interleaved_documents(spark, sf_dir, n_regions=n_regions)
    docs = docs.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(doc_factor - 1))))
    docs = (
        docs.withColumn("doc_id", F.concat_ws("_", "doc_id", "rep"))
        .withColumn("lon", (F.col("lon") - F.col("lon") % 2)
                    + ((F.xxhash64("doc_id") % 100000 + 100000) % 100000) / 100000.0)
        .withColumn("lat", (F.col("lat") - F.col("lat") % 2)
                    + ((F.xxhash64("doc_id", F.lit(1)) % 100000 + 100000) % 100000) / 100000.0)
        .drop("rep")
    )
    docs = docs.select("doc_id", "lon", "lat").repartition(cpus * 4).persist()
    n_docs = docs.count()

    mark = json.load(urllib.request.urlopen(
        "http://localhost:4040/api/v1/applications/"
        + spark.sparkContext.applicationId + "/stages"))
    seen = {s["stageId"] for s in mark}

    t0 = time.time()
    assigned = spatial_join.assign_docs_to_blocks(docs, blocks, bc, geom_cells=gc)
    n_assigned = assigned.count()
    wall = time.time() - t0

    data = json.load(urllib.request.urlopen(
        "http://localhost:4040/api/v1/applications/"
        + spark.sparkContext.applicationId + "/stages?status=complete"))
    print(json.dumps({"cpus": cpus, "n_docs": n_docs, "n_assigned": n_assigned,
                      "wall": round(wall, 2),
                      "docs_per_sec": round(n_docs / wall)}))
    for s in sorted((s for s in data if s["stageId"] not in seen),
                    key=lambda s: s["stageId"]):
        dur = (s.get("completionTime") is not None)
        print(s["stageId"], s["numCompleteTasks"], "tasks",
              round(s["executorRunTime"] / 1000, 1), "cpu-s",
              "in", round(s["executorCpuTime"] / 1e9, 1), "cpuT",
              "| shufR", round(s.get("shuffleReadBytes", 0) / 1e6, 1), "MB",
              "shufW", round(s.get("shuffleWriteBytes", 0) / 1e6, 1), "MB",
              "|", s["name"].split("\n")[0][:50])


if __name__ == "__main__":
    main()
