"""Stage-level timing of the blocks_build window at scaling-study params."""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from geopull_spark.session import get_spark
from geopull_spark.operators import blocker, extract, normalize, spatial_join
from geopull_spark.sources import synth

cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
streets = int(os.environ.get("BENCH_STREETS_PER_REGION", "1200"))
n_regions = int(os.environ.get("BENCH_REGIONS", "32"))
spark = get_spark(app_name="pb", master=f"local[{cpus}]", shuffle_partitions=cpus * 4)
spark.range(0, cpus * 10, 1, numPartitions=cpus).mapInPandas(lambda it: it, "id long").write.format("noop").mode("overwrite").save()

ways = synth.gen_osm_ways(spark, streets_per_region=streets, n_regions=n_regions).persist()
ways.count()
t0 = time.time()
admin = extract.extract_admin(ways)
water = extract.extract_water(ways)
lines = extract.extract_linestrings(ways)
land = normalize.normalize_land(admin, water, synth.gen_coastline(spark, n_regions=n_regions)).persist()
nl = land.count()
t1 = time.time(); print(f"[{cpus}] normalize: {t1-t0:.2f}s  parts={nl}", flush=True)
blocks = blocker.build_blocks(land, lines).persist()
nb = blocks.count()
t2 = time.time(); print(f"[{cpus}] build_blocks: {t2-t1:.2f}s  blocks={nb}", flush=True)
bc = spatial_join.build_block_cell_index(blocks).persist()
nbc = bc.count()
t3 = time.time(); print(f"[{cpus}] index: {t3-t2:.2f}s  rows={nbc}", flush=True)
print(f"[{cpus}] total: {t3-t0:.2f}s", flush=True)
