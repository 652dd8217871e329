"""Bucketed-table helpers: shuffle-free co-located joins at ingest cost.

The biggest repeated cost in a 100 TB warehouse is re-shuffling the same
fact table on the same key for every join/aggregate. Spark bucketing pays
that shuffle ONCE at write time: `bucketBy(n, key)` hash-partitions rows
into a fixed bucket layout recorded in the catalog, and every later
equi-join or aggregation on the key between same-bucketed tables runs
with ZERO exchanges (plan-pinned in tests — SortMergeJoin directly over
the bucketed scans). This is the static sibling of the engine's runtime
techniques (broadcast for small dims, salting for skew): use it for the
large×large joins that recur on a stable key (turns ⋈ conversations,
events ⋈ users).

Caveats encoded here rather than discovered in production:
- bucketing requires `saveAsTable` (the layout lives in the catalog, not
  the parquet footers) — plain `.parquet(path)` writes lose it.
- both sides must agree on bucket COUNT and key, or Spark re-shuffles
  the mismatched side anyway.
- write `sortBy` the same key so the merge join needs no per-task sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key_cols, n_buckets: int = 64, mode: str = "overwrite"
) -> None:
    """Persist `df` as a bucketed+sorted catalog table on `key_cols`."""
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    (
        df.write.bucketBy(n_buckets, *key_cols)
        .sortBy(*key_cols)
        .mode(mode)
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key — zero
    exchanges when the layouts agree (the point of bucketing)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
