"""The reference's query/tool surface as thin DataFrame functions.

Each function mirrors one DuckDB-backed tool of the reference agent/server
(cited file:line), re-expressed as a lazy DataFrame op — `orderBy().limit()`
compiles to TakeOrderedAndProject (distributed top-k, no full sort), counts
are partial-aggregated map-side. The reference builds these as
string-concatenated SQL (injectable, e.g. python/logai_agent.py:411-417);
parameterized DataFrame expressions close that hole for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def search(df: DataFrame, query: str, text_col: str = "text", limit: int = 10) -> DataFrame:
    """Substring search, newest first (reference: python/logai_agent.py:409-423)."""
    return (
        df.filter(F.col(text_col).contains(query))
        .orderBy(F.desc("conv_id"), F.desc("turn_idx"))
        .limit(limit)
    )


def filter_by_time(df: DataFrame, since: str, until: str, ts_col: str = "ts") -> DataFrame:
    """Time-range filter (reference: python/logai_agent.py:475-491)."""
    return df.filter(F.col(ts_col).between(F.lit(since).cast("timestamp"), F.lit(until).cast("timestamp")))


def filter_by_level(
    df: DataFrame, levels: list[str], exclude: bool = False, col: str = "role"
) -> DataFrame:
    """level IN / NOT IN (reference: python/logai_agent.py:493-511)."""
    pred = F.col(col).isin(levels)
    return df.filter(~pred if exclude else pred)


def filter_relative_time(df: DataFrame, interval: str, anchor, ts_col: str = "ts") -> DataFrame:
    """ts >= anchor - INTERVAL (reference: python/specialized_agents.py:244-248).
    The anchor is explicit — never wall-clock — to keep queries deterministic."""
    return df.filter(F.col(ts_col) >= F.lit(anchor).cast("timestamp") - F.expr(f"INTERVAL {interval}"))


def count_occurrences(df: DataFrame, query: str, text_col: str = "text") -> int:
    """COUNT with LIKE filter (reference: python/logai_agent.py:459-461)."""
    return df.filter(F.col(text_col).contains(query)).count()


def count_by(df: DataFrame, col: str = "role") -> DataFrame:
    """GROUP BY <col> ORDER BY count DESC (reference: python/logai_agent.py:447-457)."""
    return df.groupBy(col).agg(F.count(F.lit(1)).alias("count")).orderBy(F.desc("count"))


def template_frequency(df: DataFrame) -> DataFrame:
    """Template -> count (reference: python/logai_agent.py:283-304 — done
    there in a driver-side Python dict; here a distributed groupBy)."""
    return (
        df.groupBy("template_id", "template_str")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), "template_id")
    )


def time_range(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """MIN/MAX timestamp (reference: python/logai_agent.py:433-441)."""
    return df.agg(F.min(ts_col).alias("min_ts"), F.max(ts_col).alias("max_ts"))


def summarize(df: DataFrame) -> DataFrame:
    """Breakdown by role + total via rollup (reference:
    python/logai_agent.py:447-457 computes the total client-side)."""
    return (
        df.rollup("role")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.col("role").asc_nulls_first())
    )


def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
    max_offset: int = 8,
) -> DataFrame:
    """Cohort retention: users grouped by first-activity period, counted
    by how many distinct periods later they return. Returns
    (cohort_start, period_offset, n_users).

    Scale shape: first-activity table is one groupBy(user) min; the fact
    joins it on the user key (the only fact-scale shuffle — at 10^12 rows
    broadcast the cohort table when users fit, else it's a co-partitioned
    join), then (cohort, offset) distinct-user counts are
    partial-aggregated. No window over the fact table."""
    first = df.groupBy(user_col).agg(
        F.date_trunc(period, F.min(ts_col)).alias("cohort_start")
    )
    periods = {"week": 7 * 86400, "day": 86400}[period]
    return (
        df.select(user_col, F.date_trunc(period, F.col(ts_col)).alias("_p"))
        .join(first, user_col)
        .withColumn(
            "period_offset",
            ((F.unix_timestamp("_p") - F.unix_timestamp("cohort_start")) / periods)
            .cast("long"),
        )
        .filter(F.col("period_offset") <= max_offset)
        .groupBy("cohort_start", "period_offset")
        .agg(F.countDistinct(user_col).alias("n_users"))
        .orderBy("cohort_start", "period_offset")
    )


def value_histogram(
    df: DataFrame, col: str, lo: float, hi: float, nbuckets: int = 10
) -> DataFrame:
    """Fixed-width histogram of a numeric column: bucket index, inclusive
    lower edge, count. Bucket -1 catches underflow (< lo) and `nbuckets`
    catches overflow (>= hi) — no silent drops. Plain floor arithmetic
    (portable to any SQL engine — DuckDB 1.0 has no width_bucket), one
    partial-aggregated groupBy over ≤ nbuckets+2 groups."""
    w = (hi - lo) / nbuckets
    b = F.least(
        F.greatest(F.floor((F.col(col) - F.lit(lo)) / F.lit(w)).cast("long"), F.lit(-1)),
        F.lit(nbuckets),
    )
    return (
        df.select(b.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("edge_lo", F.lit(lo) + F.col("bucket") * F.lit(w))
        .select("bucket", F.round("edge_lo", 6).alias("edge_lo"), "n")
        .orderBy("bucket")
    )


def funnel_counts(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    within_s: int | None = None,
) -> DataFrame:
    """Ordered funnel: a user reaches step k when an event of that type
    occurs STRICTLY AFTER their step-(k-1) completion (the user's earliest
    qualifying time — min, so completion times are deterministic), and
    within `within_s` seconds of it when given. Returns (step_idx, step,
    n_users).

    Scale shape: each step is one equi-join on the user key between that
    step's filtered events and the (user, t) reach table — reach tables
    are ≤ |users| rows and shrink monotonically down the funnel; no
    window over the full fact table, no per-user collect. The driver loop
    only BUILDS the plan (len(steps) joins); it runs as one job."""
    from functools import reduce

    reach = (
        df.filter(F.col(event_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t"))
    )
    outs = []
    for i, step in enumerate(steps):
        if i > 0:
            nxt = df.filter(F.col(event_col) == step).select(user_col, F.col(ts_col).alias("_ts"))
            cond = F.col("_ts") > F.col("_t")
            if within_s is not None:
                cond = cond & (F.col("_ts") <= F.col("_t") + F.expr(f"INTERVAL {within_s} SECONDS"))
            reach = (
                nxt.join(reach, user_col)
                .filter(cond)
                .groupBy(user_col)
                .agg(F.min("_ts").alias("_t"))
            )
        outs.append(
            reach.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(i + 1).alias("step_idx"), F.lit(step).alias("step"), "n_users"
            )
        )
    return reduce(lambda a, b: a.unionByName(b), outs).orderBy("step_idx")


def bm25_search(
    docs: DataFrame,
    query_terms: list[str],
    top_n: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 ranked retrieval (Robertson/Okapi, the public formula) — the
    ranked upgrade of the reference's substring search, all native ops.

    Scale shape: the ONLY fact-scale work is one tokenize+explode that is
    filtered to the query's terms BEFORE aggregation (a ~|terms|-selective
    filter under the explode), so the (doc, term) aggregation and
    everything after it is term-hit-sized, not corpus-sized. Document
    length comes from a narrow `size(split(...))` projection (no explode),
    corpus stats are a 1-row broadcast, per-term document frequencies a
    ≤|terms|-row broadcast. idf = ln(1 + (N - df + .5)/(df + .5));
    tf-normalized score summed per doc → TakeOrderedAndProject."""
    terms = sorted({t.lower() for t in query_terms})
    toks = F.filter(F.split(F.lower(F.col(col)), "[^a-z0-9]+"), lambda x: x != "")
    base = docs.select(F.col(id_col), toks.alias("_toks")).withColumn("_dl", F.size("_toks"))
    stats = base.agg(
        F.count(F.lit(1)).alias("_n"), F.avg("_dl").alias("_avgdl")
    )
    hits = (
        base.select(id_col, "_dl", F.explode("_toks").alias("_t"))
        .filter(F.col("_t").isin(terms))
        .groupBy(id_col, "_dl", "_t")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    dfreq = hits.groupBy("_t").agg(F.count(F.lit(1)).alias("_df"))
    scored = (
        hits.join(F.broadcast(dfreq), "_t")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "_idf", F.log(F.lit(1.0) + (F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5))
        )
        .withColumn(
            "_s",
            F.col("_idf")
            * (F.col("_tf") * (k1 + 1))
            / (F.col("_tf") + k1 * (1 - b + b * F.col("_dl") / F.col("_avgdl"))),
        )
        .groupBy(id_col)
        .agg(F.sum("_s").alias("score"))
    )
    return scored.orderBy(F.desc("score"), id_col).limit(top_n)


def conversation_stats(
    df: DataFrame,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    role_col: str = "role",
    tool_col: str = "tool",
) -> DataFrame:
    """Per-conversation rollup — the transcripts-domain profile the
    reference computes per-session driver-side (python/logai_agent.py's
    summary dicts), here one partial-aggregated groupBy: turn count,
    time span, distinct tools, per-role turn counts. Map-side combine
    keeps the shuffle at one row per conversation."""
    return (
        df.groupBy(conv_col)
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
            (F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))).alias("span_s"),
            F.countDistinct(tool_col).alias("n_tools"),
            F.sum(F.when(F.col(role_col) == "user", 1).otherwise(0)).alias("n_user"),
            F.sum(F.when(F.col(role_col) == "assistant", 1).otherwise(0)).alias("n_assistant"),
            F.sum(F.when(F.col(role_col) == "tool", 1).otherwise(0)).alias("n_tool_turns"),
        )
        .orderBy(conv_col)
    )


def group_percentiles(
    df: DataFrame,
    group_cols,
    col: str,
    ps: tuple[float, ...] = (0.5, 0.9, 0.99),
    exact: bool = True,
) -> DataFrame:
    """Per-group percentiles of a numeric column. `exact=True` uses Spark's
    `percentile` (linear interpolation — bit-identical to DuckDB's
    quantile_cont, which is what makes this hash-oracled); it buffers each
    group's values, so at 10^12-row groups switch to `exact=False`
    (approx_percentile / KLL sketch: bounded memory, mergeable map-side —
    the 100 TB path, at the cost of oracle exactness)."""
    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    fn = "percentile" if exact else "approx_percentile"
    aggs = [
        F.expr(f"{fn}({col}, {p})").alias(f"p{str(p).replace('0.', '')}") for p in ps
    ]
    return df.groupBy(*group_cols).agg(*aggs).orderBy(*group_cols)


def statistics(df: DataFrame, col: str) -> DataFrame:
    """Descriptive stats of a numeric column (reference:
    python/data_analysis_agent.py:161-169): mean/median/std/min/max/count/
    nunique — median as percentile_approx, nunique exact + approx."""
    c = F.col(col)
    return df.agg(
        F.mean(c).alias("mean"),
        F.expr(f"percentile_approx({col}, 0.5)").alias("median"),
        F.stddev(c).alias("std"),
        F.min(c).alias("min"),
        F.max(c).alias("max"),
        F.count(c).alias("count"),
        F.countDistinct(c).alias("nunique"),
        F.approx_count_distinct(col).alias("approx_nunique"),
    )


def trending_templates(df: DataFrame, k: int = 5) -> DataFrame:
    """Top-k templates by count (reference: python/logai_agent.py:530-535).
    For the real window-over-window trend the reference stubs, see
    `trending_windowed`."""
    return template_frequency(df).limit(k)


def trending_windowed(
    df: DataFrame, key_col: str = "template_id", ts_col: str = "ts", window: str = "hour"
) -> DataFrame:
    """The REAL trend the reference stubs: per-window counts per key with
    growth vs the key's previous window (lag). The window function runs
    over the AGGREGATED (windows × keys) count table — catalog-scale, never
    the fact table — so partitionBy(key) here is safe at 10^12 rows.
    Returns (window_start, key, n, growth); a key's first window has no
    predecessor, so its baseline is 0 — a newly-appearing key trends by
    its full count (also keeps growth non-null for downstream sorts)."""
    wc = df.groupBy(
        F.date_trunc(window, F.col(ts_col)).alias("window_start"),
        F.col(key_col).alias("key"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("key").orderBy("window_start")
    return wc.withColumn(
        "growth", F.col("n") - F.coalesce(F.lag("n").over(w), F.lit(0))
    )


def trending_decayed(
    df: DataFrame,
    key_col: str = "template_id",
    ts_col: str = "ts",
    half_life_hours: float = 24.0,
    window: str = "hour",
) -> DataFrame:
    """Exponentially time-decayed activity score per key:
    score = Σ_windows n_w · 0.5^(age_hours / half_life) — recent activity
    dominates, old spikes fade, which is what 'trending now' actually
    means (the lag-growth variant compares only adjacent windows). Age is
    measured from the dataset's max window so the score is deterministic
    (no wall clock — same lesson as syslog assume_year). The decay math
    runs over the AGGREGATED (windows × keys) table — catalog-scale, one
    fact shuffle for the count."""
    wc = df.groupBy(
        F.date_trunc(window, F.col(ts_col)).alias("window_start"),
        F.col(key_col).alias("key"),
    ).agg(F.count(F.lit(1)).alias("n"))
    mx = wc.agg(F.max("window_start").alias("_mx"))
    age_h = (F.unix_timestamp("_mx") - F.unix_timestamp("window_start")) / 3600.0
    return (
        wc.crossJoin(F.broadcast(mx))
        .withColumn("_w", F.pow(F.lit(0.5), age_h / F.lit(half_life_hours)))
        .groupBy("key")
        .agg(F.sum(F.col("n") * F.col("_w")).alias("score"))
        .orderBy(F.desc("score"), "key")
    )


def pivot_counts(df: DataFrame, y: str, x: str, x_values: list[str] | None = None) -> DataFrame:
    """Heatmap pivot (reference: python/data_analysis_agent.py:176,275-281).
    Pass x_values at scale — without them Spark must scan once to discover
    the pivot columns."""
    g = df.groupBy(y)
    p = g.pivot(x, x_values) if x_values else g.pivot(x)
    return p.count().na.fill(0)


def logs_page(df: DataFrame, limit: int = 100, offset: int = 0) -> DataFrame:
    """Paged listing (reference: python/logai_server.py:349-378). OFFSET
    requires a total order; at scale prefer keyset pagination (filter on the
    last-seen key) — implemented here as the reference-compatible version."""
    w = F.row_number().over(Window.orderBy("conv_id", "turn_idx"))
    # page = rows offset+1 .. offset+limit of the TOTAL order. A
    # filter-then-limit would let limit pick an arbitrary `limit`-subset of
    # the qualifying rows (no order contract after a filter); the two-sided
    # row_number predicate is deterministic at any parallelism.
    return (
        df.withColumn("_rn", w)
        .filter((F.col("_rn") > offset) & (F.col("_rn") <= offset + limit))
        .drop("_rn")
    )


def logs_page_keyset(
    df: DataFrame, limit: int = 100, after: tuple[str, int] | None = None
) -> DataFrame:
    """Keyset pagination — the scale path `logs_page` points at. Instead of
    numbering every row to skip `offset` (a full sort + scan of everything
    before the page), filter on the last-seen key and take the next page:
    the predicate pushes down to the scan and each page costs O(page).
    `after` = (conv_id, turn_idx) of the previous page's last row."""
    out = df
    if after is not None:
        c, t = after
        out = out.filter(
            (F.col("conv_id") > F.lit(c))
            | ((F.col("conv_id") == F.lit(c)) & (F.col("turn_idx") > F.lit(t)))
        )
    return out.orderBy("conv_id", "turn_idx").limit(limit)


def execute_sql(spark, sql: str, views: dict[str, DataFrame] | None = None) -> DataFrame:
    """Arbitrary SQL passthrough (reference: python/logai_agent.py:385-405)."""
    for name, df in (views or {}).items():
        df.createOrReplaceTempView(name)
    return spark.sql(sql)
