"""Checkpoint / lineage / metrics — idempotent resume (north rule).

Every stage commits its output table atomically (write to a temp dir, then
rename into place) and records a lineage row (stage, run config fingerprint,
row count, per-sink partition counts, wall seconds, status). A re-run with
the same fingerprint skips stages whose lineage row is `committed` and whose
output exists — so a killed run resumes from the last committed stage and a
finished run is a no-op.

Storage is plain Parquet + directory layout (an Iceberg-catalog variant
plugs in behind `SinkStore` unchanged — snapshot commits replace the
tmp+rename; the sandbox has no Iceberg runtime jar, SURVEY.md §7.0).
The lineage table itself is append-only JSONL (driver-side metadata, tiny),
mirroring what Iceberg snapshot metadata would give us.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class SinkStore:
    """A warehouse directory holding the pipeline's derived tables."""

    root: str

    def table_path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        p = self.table_path(name)
        return os.path.exists(os.path.join(p, "_SUCCESS")) or (
            os.path.isdir(p) and any(f.endswith(".parquet") for _, _, fs in os.walk(p) for f in fs)
        )

    # --- lineage -------------------------------------------------------------
    @property
    def lineage_path(self) -> str:
        return os.path.join(self.root, "_lineage.jsonl")

    def lineage_rows(self) -> list[dict]:
        if not os.path.exists(self.lineage_path):
            return []
        with open(self.lineage_path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def committed(self, stage: str, fingerprint: str) -> bool:
        return any(
            r["stage"] == stage
            and r["fingerprint"] == fingerprint
            and r["status"] == "committed"
            for r in self.lineage_rows()
        ) and self.exists(stage)

    def record(self, row: dict) -> None:
        os.makedirs(self.root, exist_ok=True)
        with open(self.lineage_path, "a") as f:
            f.write(json.dumps(row, default=str) + "\n")

    # --- atomic writes ---------------------------------------------------------
    def write_table(
        self,
        df: DataFrame,
        name: str,
        fingerprint: str,
        partition_by: list[str] | None = None,
        run_id: str | None = None,
    ) -> dict:
        """Atomically materialize *df* as table *name*; returns the lineage row.

        One partitioned write for fanout sinks (NOT a per-sink filter loop —
        at cluster scale a loop would rescan the input once per sink)."""
        final = self.table_path(name)
        tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
        t0 = time.time()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(tmp)
        spark = df.sparkSession
        written = spark.read.parquet(tmp)
        n = written.count()
        part_counts: dict[str, int] = {}
        if partition_by:
            for r in written.groupBy(*partition_by).count().collect():
                key = "/".join(f"{c}={r[c]}" for c in partition_by)
                part_counts[key] = r["count"]
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        row = {
            "stage": name,
            "fingerprint": fingerprint,
            "run_id": run_id or "-",
            "rows": n,
            "partitions": part_counts,
            "wall_s": round(time.time() - t0, 3),
            "status": "committed",
            "ts": time.time(),
        }
        self.record(row)
        return row

    def read_table(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(self.table_path(name))
