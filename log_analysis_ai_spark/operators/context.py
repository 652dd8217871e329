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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols,
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """AS-OF join: attach to each left row the LATEST right row with
    right.ts <= left.ts within the same key — the time-series enrichment
    staple (market ticks, config snapshots, slowly-changing dims). DuckDB
    ships it as `ASOF JOIN`; Spark has no native operator, so this is the
    scalable composition: UNION both sides with a side marker, ONE shuffle
    on the key, and a running `last(value, ignorenulls)` window over
    (ts, side) order — right rows sort BEFORE left rows at equal ts, so a
    same-instant right row IS visible (<= semantics). No per-left-row
    probe, no broadcast requirement; cost is one sort-shuffle of
    |left|+|right| on the key (the same price a co-partitioned merge join
    would pay), and skew is bounded by the hottest key's time-series
    length. Left rows with no preceding right row keep NULLs (left-outer
    semantics).

    `value_cols` (default: right's non-key, non-ts columns) are attached
    as `{prefix}{col}`, plus `{prefix}{ts_col}` — the matched right
    timestamp."""
    from pyspark.sql.window import Window

    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in set(key_cols) | {ts_col}]
    carried = [ts_col] + value_cols
    rv = right.select(
        *key_cols,
        F.col(ts_col),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c).alias(c) for c in carried]).alias("_rv"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in left.columns if c not in set(key_cols) | {ts_col}],
    )
    lv = left.select(
        *key_cols,
        F.col(ts_col),
        F.lit(1).alias("_side"),
        F.lit(None).cast(rv.schema["_rv"].dataType).alias("_rv"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns if c not in set(key_cols) | {ts_col}],
    )
    u = rv.unionByName(lv)
    # final order key: the carried struct itself — if the right side has
    # duplicate (key, ts) rows, the winner is the max value tuple,
    # deterministically (not whichever partition happened to arrive last)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc(), F.col("_rv").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_m", F.last("_rv", ignorenulls=True).over(w)).filter(
        F.col("_side") == 1
    )
    out = matched.select(
        *key_cols,
        F.col(ts_col),
        *[F.col(f"_l_{c}").alias(c) for c in left.columns if c not in set(key_cols) | {ts_col}],
        *[F.col("_m")[c].alias(f"{prefix}{c}") for c in carried],
    )
    return out
