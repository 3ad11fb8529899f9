"""Iceberg-style snapshot manifest layer (emulated).

No Iceberg runtime ships in this sandbox, so table semantics are emulated
with parquet data dirs + JSON snapshot manifests and an atomic current-pointer
swap. The interface is kept Iceberg-shaped (snapshot id, parent id, schema,
per-partition row counts, lineage of input fingerprints) so a real catalog
can be swapped in.

This is also the engine's resume mechanism — the distributed analog of the
reference's skip-if-exists caching (``/root/reference/src/geopull/geofile.py:
106-110``, ``:404-406``): a stage whose output snapshot carries the same
input fingerprint is skipped on rerun (north_rule: "resumable from checkpoint
with per-partition lineage + metrics").
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotTable:
    def __init__(self, root: str):
        self.root = root
        self.manifest_dir = os.path.join(root, "_manifest")

    # -- manifest bookkeeping -------------------------------------------------
    def _current_path(self) -> str:
        return os.path.join(self.manifest_dir, "current")

    def current_snapshot(self) -> dict | None:
        try:
            with open(self._current_path()) as f:
                sid = f.read().strip()
            with open(os.path.join(self.manifest_dir, f"v{sid}.json")) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return None

    def is_current(self, fingerprint: str) -> bool:
        snap = self.current_snapshot()
        return snap is not None and snap.get("fingerprint") == fingerprint

    # -- commit / read ---------------------------------------------------------
    def commit(
        self,
        df: DataFrame,
        fingerprint: str,
        partition_count_col: str | None = None,
        lineage: list[str] | None = None,
    ) -> dict:
        """Write df as a new snapshot unless the current one already carries
        ``fingerprint`` (idempotent resume). Returns the snapshot manifest."""
        if self.is_current(fingerprint):
            return self.current_snapshot()
        prev = self.current_snapshot()
        sid = uuid.uuid4().hex[:12]
        data_dir = os.path.join(self.root, f"snap-{sid}")
        df.write.mode("overwrite").parquet(data_dir)
        spark = df.sparkSession
        written = spark.read.parquet(data_dir)
        if partition_count_col and partition_count_col in written.columns:
            counts = {
                str(r[0]): r[1]
                for r in written.groupBy(partition_count_col).agg(F.count("*")).collect()
            }
            row_count = sum(counts.values())
        else:
            counts = {}
            row_count = written.count()
        manifest = {
            "snapshot_id": sid,
            "parent_id": prev["snapshot_id"] if prev else None,
            "fingerprint": fingerprint,
            "created_unix": int(time.time()),
            "data_dir": data_dir,
            "row_count": row_count,
            "partition_counts": counts,
            "schema": written.schema.jsonValue(),
            "lineage": lineage or [],
            "operation": "append",
        }
        self._write_manifest(manifest)
        return manifest

    def _write_manifest(self, manifest: dict) -> None:
        sid = manifest["snapshot_id"]
        os.makedirs(self.manifest_dir, exist_ok=True)
        with open(os.path.join(self.manifest_dir, f"v{sid}.json"), "w") as f:
            json.dump(manifest, f, indent=1)
        tmp = self._current_path() + f".tmp-{sid}"
        with open(tmp, "w") as f:
            f.write(sid)
        os.replace(tmp, self._current_path())  # atomic pointer swap

    def read(self, spark: SparkSession) -> DataFrame:
        snap = self.current_snapshot()
        if snap is None:
            raise FileNotFoundError(f"no committed snapshot under {self.root}")
        return spark.read.parquet(snap["data_dir"])

    # -- time travel / history (Iceberg-shaped) --------------------------------
    def snapshot(self, snapshot_id: str) -> dict:
        with open(os.path.join(self.manifest_dir, f"v{snapshot_id}.json")) as f:
            return json.load(f)

    def read_at(
        self, spark: SparkSession, snapshot_id: str, with_current_schema: bool = False
    ) -> DataFrame:
        """Time travel: read a historical snapshot by id (data dirs are
        immutable — commits never rewrite prior snapshots).

        ``with_current_schema=True`` is add-column schema evolution (Iceberg
        semantics): the historical data is projected onto the CURRENT table
        schema — columns added by later commits come back as typed nulls, and
        column order follows the current schema — so old and new snapshots
        union cleanly."""
        df = spark.read.parquet(self.snapshot(snapshot_id)["data_dir"])
        if with_current_schema:
            cur = self.current_snapshot()
            if cur is not None:
                df = _conform_to_schema(df, cur["schema"])
        return df

    def history(self) -> list[dict]:
        """Snapshot lineage chain, newest first."""
        out = []
        snap = self.current_snapshot()
        while snap is not None:
            out.append(snap)
            pid = snap.get("parent_id")
            snap = self.snapshot(pid) if pid else None
        return out

    # -- maintenance ------------------------------------------------------------
    def data_files(self, snapshot_id: str | None = None) -> list[str]:
        snap = self.snapshot(snapshot_id) if snapshot_id else self.current_snapshot()
        d = snap["data_dir"]
        return sorted(
            os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
        )

    def compact(self, spark: SparkSession, target_files: int = 1) -> dict:
        """Small-file compaction: rewrite the current snapshot's data into
        ``target_files`` files as a NEW snapshot (Iceberg ``rewrite_data_files``
        shape). The fingerprint is preserved — compaction changes layout, not
        content — so stage resume still skips; prior snapshots stay readable
        (time travel over immutable dirs); row counts are carried over and
        re-verified from the rewritten files."""
        snap = self.current_snapshot()
        if snap is None:
            raise FileNotFoundError(f"no committed snapshot under {self.root}")
        sid = uuid.uuid4().hex[:12]
        data_dir = os.path.join(self.root, f"snap-{sid}")
        spark.read.parquet(snap["data_dir"]).coalesce(target_files).write.mode(
            "overwrite"
        ).parquet(data_dir)
        rewritten = spark.read.parquet(data_dir)
        n = rewritten.count()
        if n != snap["row_count"]:  # conservation gate before the pointer swap
            raise RuntimeError(
                f"compaction row-count mismatch: {n} != {snap['row_count']}"
            )
        manifest = {
            **snap,
            "snapshot_id": sid,
            "parent_id": snap["snapshot_id"],
            "created_unix": int(time.time()),
            "data_dir": data_dir,
            "schema": rewritten.schema.jsonValue(),
            "operation": "compact",
        }
        self._write_manifest(manifest)
        return manifest


def _conform_to_schema(df: DataFrame, schema_json: dict) -> DataFrame:
    """Project df onto a target schema: shared columns cast to the target
    type, missing columns filled with typed nulls, target column order."""
    from pyspark.sql import types as T

    target = T.StructType.fromJson(schema_json)
    cols = []
    for f in target.fields:
        if f.name in df.columns:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
