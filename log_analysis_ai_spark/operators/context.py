"""Event-context operators: rows near an anchor event in event time.

Reference analogs (SURVEY.md §2.3):
- ±window context around anchor events via correlated scalar subqueries
  (reference: python/specialized_agents.py:259-265) → a range self-join
  here, bucketed so it scales: joining raw `ts BETWEEN a.ts-w AND a.ts+w`
  would be O(n·m) without an equi key, so both sides get a coarse time
  bucket (width = window) and join on adjacent buckets first — Catalyst
  gets an equi-join to hash on, the range predicate refines.
- causal window [max_ts - w, max_ts] of rows matching a predicate
  (reference: python/specialized_agents.py:207-219) → tiny agg + filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def event_context(
    df: DataFrame,
    anchor_pred,
    window_s: int = 300,
    ts_col: str = "ts",
    anchor_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """All rows within ±window_s seconds of any anchor row (rows matching
    *anchor_pred*). Output: anchor identity columns (prefixed `anchor_`) +
    the context row, deduped per (anchor, row).

    Scale path: equi-join on coarse time buckets (bucket width = window) —
    each anchor probes its own bucket and both neighbors — then exact range
    refine. Shuffle is hash on bucket, never a broadcast nested loop over
    the full fact table."""
    w = F.expr(f"INTERVAL {window_s} SECONDS")
    # bucket from full-precision epoch: with truncated seconds a pair at
    # exactly window distance can straddle TWO bucket boundaries and miss
    # the ±1 probe
    bucket = F.floor(
        F.unix_micros(F.col(ts_col).cast("timestamp")) / (window_s * 1_000_000)
    ).cast("long")  # NTZ->LTZ cast: session tz is UTC, value-preserving
    bucket_a = F.floor(
        F.unix_micros(F.col("anchor_ts").cast("timestamp")) / (window_s * 1_000_000)
    ).cast("long")
    anchors = (
        df.filter(anchor_pred)
        .select(
            *[F.col(c).alias(f"anchor_{c}") for c in anchor_cols],
            F.col(ts_col).alias("anchor_ts"),
        )
        .withColumn("_b", F.explode(F.array(bucket_a, bucket_a - 1, bucket_a + 1)))
    )
    fact = df.withColumn("_b", bucket)
    # refine on full-precision timestamps (unix_timestamp truncates to
    # seconds and admits rows just outside the window)
    joined = fact.join(anchors, "_b").filter(
        (F.col(ts_col) >= F.col("anchor_ts") - w) & (F.col(ts_col) <= F.col("anchor_ts") + w)
    )
    return joined.drop("_b").dropDuplicates(
        [f"anchor_{c}" for c in anchor_cols] + list(df.columns)
    )


def causal_window(
    df: DataFrame, event_pred, window_s: int = 300, ts_col: str = "ts"
) -> DataFrame:
    """Rows in [event_ts - w, event_ts] where event_ts = max ts of rows
    matching *event_pred* (the reference's anti-chronological slice)."""
    anchor = df.filter(event_pred).agg(F.max(ts_col).alias("_m"))
    return (
        df.crossJoin(F.broadcast(anchor))
        .filter(
            (F.col(ts_col) >= F.col("_m") - F.expr(f"INTERVAL {window_s} SECONDS"))
            & (F.col(ts_col) <= F.col("_m"))
        )
        .drop("_m")
    )
