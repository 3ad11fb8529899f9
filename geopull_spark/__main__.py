"""CLI mirroring the reference's entry points
(``/root/reference/src/geopull/__main__.py:33-76``: download / extract /
normalize / block) plus this engine's additions (assign / pipeline / bench).

    python -m geopull_spark generate  --warehouse /tmp/wh --regions 3 --streets 60
    python -m geopull_spark extract   --warehouse /tmp/wh
    python -m geopull_spark normalize --warehouse /tmp/wh
    python -m geopull_spark block     --warehouse /tmp/wh
    python -m geopull_spark assign    --warehouse /tmp/wh --sf-dir /root/testdata/sf0.001
    python -m geopull_spark pipeline  --warehouse /tmp/wh   # all stages, resumable

``download`` is aliased to ``generate`` (no external data in this sandbox —
the synthetic world replaces the Geofabrik fetch, SURVEY.md S1/S2).
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="geopull_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--warehouse", required=True)
        sp.add_argument("--regions", type=int, default=3)
        sp.add_argument("--streets", type=int, default=60)
        sp.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))

    for name in ["download", "generate", "extract", "normalize", "block", "pipeline"]:
        sp = sub.add_parser(name)
        common(sp)
    sp = sub.add_parser("assign")
    common(sp)
    sp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from .operators import blocker, extract, normalize, spatial_join
    from .session import get_spark
    from .sources import synth
    from .sources.manifest import SnapshotTable

    spark = get_spark(app_name=f"geopull_spark_{args.cmd}", master=f"local[{args.cpus}]")
    wh = args.warehouse
    # engine version in the fingerprint (matches plans/pipeline.py): kernel
    # changes must invalidate cached snapshots, not serve stale results
    from geopull_spark import __version__

    fp = f"synth:v1:streets={args.streets}:regions={args.regions}:engine={__version__}"

    def t(name: str) -> SnapshotTable:
        return SnapshotTable(os.path.join(wh, name))

    if args.cmd in ("download", "generate", "pipeline"):
        ways = synth.gen_osm_ways(spark, args.streets, n_regions=args.regions)
        m = t("osm_ways").commit(ways, fp, partition_count_col="region_code")
        print(f"osm_ways snapshot {m['snapshot_id']}: {m['row_count']} rows")
        if args.cmd != "pipeline":
            return 0
    if args.cmd in ("extract", "normalize", "block", "pipeline"):
        ways = t("osm_ways").read(spark)
    if args.cmd == "extract":
        for name, df in [
            ("admin", extract.extract_admin(ways)),
            ("water", extract.extract_water(ways)),
            ("linestring", extract.extract_linestrings(ways)),
        ]:
            m = t(name).commit(df, fp, partition_count_col="region_code", lineage=[fp])
            print(f"{name} snapshot {m['snapshot_id']}: {m['row_count']} rows")
        return 0
    if args.cmd in ("normalize", "block", "pipeline"):
        land = normalize.normalize_land(
            extract.extract_admin(ways),
            extract.extract_water(ways),
            synth.gen_coastline(spark, n_regions=args.regions),
        )
        m = t("land").commit(land, fp, partition_count_col="region_code", lineage=[fp])
        print(f"land snapshot {m['snapshot_id']}: {m['row_count']} parts")
        if args.cmd == "normalize":
            return 0
    if args.cmd in ("block", "pipeline"):
        land = t("land").read(spark)
        blocks = blocker.build_blocks(land, extract.extract_linestrings(ways))
        m = t("blocks").commit(blocks, fp, partition_count_col="region_code", lineage=[fp])
        print(f"blocks snapshot {m['snapshot_id']}: {m['row_count']} blocks")
        if args.cmd == "block":
            return 0
    if args.cmd in ("assign", "pipeline"):
        sf_dir = getattr(args, "sf_dir", "/root/testdata/sf0.001")
        blocks = t("blocks").read(spark)
        docs = synth.interleaved_documents(spark, sf_dir, n_regions=args.regions)
        bc = spatial_join.build_block_cell_index(blocks)
        assigned = spatial_join.assign_docs_full(docs, blocks, bc)
        m = t("doc_blocks").commit(
            assigned, f"{fp}|docs:{sf_dir}",
            partition_count_col="region_code", lineage=[fp, f"docs:{sf_dir}"],
        )
        n_hit = t("doc_blocks").read(spark).filter(F.col("block_id").isNotNull()).count()
        print(f"doc_blocks snapshot {m['snapshot_id']}: {m['row_count']} docs, {n_hit} assigned")
    return 0


if __name__ == "__main__":
    sys.exit(main())
