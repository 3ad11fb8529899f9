"""Stage-level profile of the blocks_build chain at one parallelism level.

Usage: SPARK_GRAFT_CPUS=8 python scripts/profile_blocks.py [streets] [regions]

Times each sub-stage separately (normalize, part-bbox collect, blocker
cogroup+window, cell index, refine geometry) so the fixed-floor analysis in
BENCH/BASELINE.md can point at a stage, not the whole chain.
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
    streets = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    n_regions = int(sys.argv[2]) if len(sys.argv) > 2 else 24

    from geopull_spark.operators import blocker, extract, normalize, spatial_join
    from geopull_spark.session import get_spark
    from geopull_spark.sources import synth

    spark = get_spark(app_name="profile_blocks", master=f"local[{cpus}]",
                      shuffle_partitions=cpus * 4)
    spark.range(0, cpus * 10, 1, numPartitions=cpus).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    ways = synth.gen_osm_ways(spark, streets_per_region=streets, n_regions=n_regions).persist()
    ways.count()

    t: dict[str, float] = {}
    t0 = time.time()
    admin = extract.extract_admin(ways)
    water = extract.extract_water(ways)
    lines = extract.extract_linestrings(ways)
    land = normalize.normalize_land(
        admin, water, synth.gen_coastline(spark, n_regions=n_regions)
    ).persist()
    n_land = land.count()
    t["normalize"] = time.time() - t0

    t0 = time.time()
    pre = blocker.build_blocks_pre(land, lines).persist()
    pre.count()
    t["blocker_cogroup"] = time.time() - t0

    t0 = time.time()
    blocks = blocker.assign_block_ids(pre).persist()
    n_blocks = blocks.count()
    t["id_window"] = time.time() - t0

    from concurrent.futures import ThreadPoolExecutor

    t0 = time.time()
    bc = spatial_join.build_block_cell_index(blocks).persist()
    gc = spatial_join.build_refine_geometry(blocks).persist()
    with ThreadPoolExecutor(max_workers=2) as ex:
        for f in [ex.submit(bc.count), ex.submit(gc.count)]:
            f.result()
    t["indexes"] = time.time() - t0

    total = sum(t.values())
    print(json.dumps({
        "cpus": cpus, "streets": streets, "regions": n_regions,
        "n_land_parts": n_land, "n_blocks": n_blocks,
        "stages": {k: round(v, 2) for k, v in t.items()},
        "total": round(total, 2),
        "blocks_per_sec": round(n_blocks / total, 1),
    }))


if __name__ == "__main__":
    main()
