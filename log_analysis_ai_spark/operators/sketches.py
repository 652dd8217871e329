"""Mergeable-sketch operators for incremental corpus accounting.

The 100 TB problem: "how many distinct documents/users/templates so far?"
re-asked after every ingest increment. An exact countDistinct rescans
everything ever ingested; `approx_count_distinct` gives one number but no
way to COMBINE yesterday's answer with today's increment. Datasketches
HLL (built into Spark 4 as `hll_sketch_agg` / `hll_union_agg` /
`hll_sketch_estimate`) fixes that: each increment produces a tiny binary
sketch, sketches union in O(sketch size), and the union's estimate sits within
HLL error (~1-2% at default lgk=12) of the true distinct count over the
full data — so the daily job touches only the new increment. (Union is
not bit-identical to a one-shot sketch — the merged sketch can land in a
different internal mode — but both carry the same error bound; tested.)

Sketch columns are plain BINARY — they persist in parquet next to the
lineage rows, so the accounting state lives in the warehouse, not in a
driver process.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_sketch(df: DataFrame, col: str, by: list[str] | None = None) -> DataFrame:
    """One HLL sketch of `col` per `by`-group (or a single global row).
    Partial-aggregated map-side like any agg; output rows are
    group keys + a `sketch` binary column."""
    agg = F.expr(f"hll_sketch_agg({col})").alias("sketch")
    return df.groupBy(*(by or [])).agg(agg)


def merge_sketches(sketches: DataFrame, by: list[str] | None = None) -> DataFrame:
    """Union previously materialized sketches (e.g. one per ingest
    increment, read back from parquet) into one per group."""
    agg = F.expr("hll_union_agg(sketch)").alias("sketch")
    return sketches.groupBy(*(by or [])).agg(agg)


def estimate(sketches: DataFrame) -> DataFrame:
    """Attach the distinct-count estimate to each sketch row."""
    return sketches.withColumn("n_distinct_est", F.expr("hll_sketch_estimate(sketch)"))
