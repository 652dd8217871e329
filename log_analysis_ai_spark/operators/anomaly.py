"""Anomaly scoring operators.

- z-score flagging (reference: python/data_analysis_agent.py:170-174 does
  this in driver-side pandas; here it's a global agg broadcast back over the
  data, or a window per group — both fully distributed).
- frequency rarity over event-time windows lives in pipeline.route().
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zscore_global(df: DataFrame, col: str, k: float = 3.0) -> DataFrame:
    """Flag rows where |x - mean| > k*std. One tiny agg, crossjoin-broadcast
    of the 1-row stats (no second scan shuffle)."""
    stats = df.agg(F.mean(col).alias("_mu"), F.stddev(col).alias("_sigma"))
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn("zscore", (F.col(col) - F.col("_mu")) / F.col("_sigma"))
        .withColumn("is_anomaly", F.abs(F.col("zscore")) > F.lit(k))
        .drop("_mu", "_sigma")
    )


def zscore_by_group(
    df: DataFrame, col: str, group: list[str], k: float = 3.0, broadcast_stats: bool = True
) -> DataFrame:
    """Per-group z-score via partial-aggregated groupBy + broadcast join back
    — NOT `Window.partitionBy(group)`: a window over a low-cardinality key
    (e.g. 5 event types) funnels the whole fact table through 5 tasks at
    scale. The stats table is group-cardinality-sized, so the broadcast keeps
    the fact table unshuffled (same pattern as pipeline.route()). Pass
    broadcast_stats=False for a genuinely high-cardinality group key (plain
    shuffle join is then the right plan — both sides partition on the key)."""
    import functools
    import operator

    stats = df.groupBy(*group).agg(F.mean(col).alias("_mu"), F.stddev(col).alias("_sigma"))
    if broadcast_stats:
        stats = F.broadcast(stats)
    a, s = df.alias("_zs_l"), stats.alias("_zs_r")
    # null-safe equality: a window treats NULL group keys as a group; a plain
    # equi-join would silently drop those rows
    cond = functools.reduce(
        operator.and_,
        [F.col(f"_zs_l.{g}").eqNullSafe(F.col(f"_zs_r.{g}")) for g in group],
    )
    return (
        a.join(s, cond)
        .select("_zs_l.*", "_zs_r._mu", "_zs_r._sigma")
        .withColumn("zscore", (F.col(col) - F.col("_mu")) / F.col("_sigma"))
        .withColumn("is_anomaly", F.abs(F.col("zscore")) > F.lit(k))
        .drop("_mu", "_sigma")
    )


def rate_anomalies(
    df: DataFrame, ts_col: str = "ts", key: str = "event_type", window: str = "1 hour", k: float = 3.0
) -> DataFrame:
    """Volume-spike detection: count per (key, window), then z-score the
    counts within each key across windows."""
    counts = df.groupBy(key, F.window(ts_col, window).alias("w")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return zscore_by_group(counts, "n", [key], k).select(
        key, F.col("w.start").alias("window_start"), "n", "zscore", "is_anomaly"
    )
