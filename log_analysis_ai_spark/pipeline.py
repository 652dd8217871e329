"""The end-to-end Spark pipeline: parse → mine → enrich → route → aggregate.

Each stage is a plain function DataFrame→DataFrame (the Spark-native analog
of the reference's pybind surface `parse_log_file` / `extract_attributes`,
reference: src/python_bindings.cpp:193-212). All scalar work is native
`pyspark.sql.functions` (JVM-side, whole-stage codegen); Python appears only
in the Arrow-vectorized Drain UDFs (operators/drain.py).

Plan-shape invariants (checked via .explain during development):
- parse/enrich are narrow + one broadcast hash join each — no shuffle.
- mining shuffles once on (shard_key, salt); rarity shuffles once on
  (window_start, template_id); both keys are high-cardinality and salted.
- the routed fanout is ONE partitioned write (partitionBy sink key), not a
  per-sink loop — at 1000 executors a loop of filtered writes would rescan
  the input once per sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .config import DETECTED_TS_RE, LEVEL_RE, PipelineConfig
from .operators.drain import mine_and_assign


def parse(df: DataFrame) -> DataFrame:
    """Vectorized field extraction over the text column (the grok stage).

    Analog of the reference's regex attribute extraction
    (src/file_data_loader.cpp:713-748) — expressed as native JVM-side
    `regexp_extract`, not a UDF."""
    return df.withColumn(
        "level", F.nullif(F.regexp_extract(F.col("text"), LEVEL_RE, 1), F.lit(""))
    ).withColumn(
        "detected_ts", F.nullif(F.regexp_extract(F.col("text"), DETECTED_TS_RE, 1), F.lit(""))
    )


def mine(df: DataFrame, cfg: PipelineConfig) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Two-pass Drain (operators/drain.py):
    (turns+template cols, templates, cached keyed handle)."""
    return mine_and_assign(df, cfg)


def enrich(df: DataFrame, tool_lookup: DataFrame, role_lookup: DataFrame) -> DataFrame:
    """Broadcast hash joins against the small lookup dims — no shuffle."""
    return df.join(F.broadcast(tool_lookup), "tool", "left").join(
        F.broadcast(role_lookup), "role", "left"
    )


def route(df: DataFrame, cfg: PipelineConfig, caches: list | None = None) -> DataFrame:
    """Frequency-based rarity scoring over event-time windows + sink keys.

    Counts are computed as partial-aggregated groupBys and broadcast-joined
    back — NOT window functions: `Window.partitionBy(template_id)` would
    funnel every row of a hot template through one task at 10^12 rows, and
    a shuffle join would move the wide fact twice. The count tables are
    bounded by (#windows × #templates) ≪ rows — catalog-sized, so the
    explicit broadcast hint keeps the fact table unshuffled end-to-end.
    anomaly_flag = window count below threshold; template_class from
    param-count + global frequency (FIXTURES.md §4 sink key space).

    EAGER: this function runs one Spark action at plan-build time (the
    count that materializes the persisted count table and sizes the
    broadcast guard). The cache is persist(MEMORY_AND_DISK), NOT
    localCheckpoint — persisted blocks keep their lineage, so an executor
    loss/decommission mid-job recomputes instead of failing (the property
    that matters at 1000-executor scale). If `caches` is given, the persisted
    handle is appended to it for the caller to unpersist after
    materializing downstream tables (run_pipeline/job.py do)."""
    df = df.withColumn("window_start", F.date_trunc("hour", F.col("ts")))
    # ONE scan of the fact table builds the window counts; materializing the
    # (windows × templates)-sized result lets both broadcast joins AND the
    # global rollup read it without re-scanning 10^12 fact rows per branch
    # (Spark has no cross-branch subplan reuse below the exchange level)
    window_counts = (
        df.groupBy("window_start", "template_id")
        .agg(F.count(F.lit(1)).alias("window_count"))
        .persist()
    )
    if caches is not None:
        caches.append(window_counts)
    global_counts = window_counts.groupBy("template_id").agg(
        F.sum("window_count").alias("global_count")
    )
    # size guard: the count tables are usually catalog-sized and broadcast
    # (fact table never shuffles), but #windows × #templates grows with the
    # queried time range — past the limit a broadcast would OOM executors,
    # so fall back to a shuffle join (this count also materializes the
    # persisted cache). global_counts ≤ window_counts, so one check covers
    # both.
    small = window_counts.count() <= cfg.broadcast_count_limit
    wjoin = F.broadcast(window_counts) if small else window_counts
    gjoin = F.broadcast(global_counts) if small else global_counts
    n_params = F.size(F.split(F.col("template_str"), r"<\*>")) - F.lit(1)
    return (
        df.join(wjoin, ["window_start", "template_id"])
        .join(gjoin, ["template_id"])
        .withColumn("rarity_score", F.lit(1.0) / F.col("window_count"))
        .withColumn("anomaly_flag", F.col("window_count") < F.lit(cfg.anomaly_min_count))
        .withColumn(
            "template_class",
            F.when(F.col("global_count") < F.lit(cfg.rare_min_count), F.lit("rare"))
            .when(n_params == 0, F.lit("fixed"))
            .otherwise(F.lit("parameterized")),
        )
        .drop("window_count", "global_count")
    )


def aggregate(routed: DataFrame) -> DataFrame:
    """Per-template/per-tool windowed counts (partial agg map-side, one
    shuffle on the group keys)."""
    return routed.groupBy("window_start", "template_id", "tool").agg(
        F.count(F.lit(1)).alias("n_turns")
    )


def sink_counts(routed: DataFrame) -> DataFrame:
    """Per-sink row counts — the correctness gate vs the oracle."""
    return routed.groupBy("template_class", "anomaly_flag").agg(F.count(F.lit(1)).alias("n"))


def run_pipeline(
    transcripts: DataFrame,
    tool_lookup: DataFrame,
    role_lookup: DataFrame,
    cfg: PipelineConfig | None = None,
    persist_keyed: bool = True,
) -> dict[str, DataFrame]:
    """Build the pipeline plan; returns all derived tables.

    Actions at build time: pass-1 mining's catalog collect, plus route()'s
    count-table materialization (persist + count for the broadcast guard —
    see route's docstring). Everything else stays lazy.

    `routed` (and its aggregates) drop `cfg.routed_drop_cols` — by default
    the per-row `params` map and `detected_ts`, both recomputable from
    (text, template_str) — so the route joins and the routed fanout write
    ship materially fewer bytes per turn; `turns_parsed` keeps the full
    schema.

    When `persist_keyed` is True the dict includes `_keyed_cache`: the
    persisted shard-keyed DataFrame shared by both mining passes. Callers
    MUST `out["_keyed_cache"].unpersist()` once the derived tables are
    materialized (job.py's checkpointed path does) — otherwise each call
    leaks one cached DataFrame in a long-lived session. Pass
    persist_keyed=False for one-shot small inputs to skip the cache
    entirely (pass 2 then recomputes shard keys once). The dict always
    includes `_route_caches`: route()'s persisted count table(s), to
    unpersist under the same contract (small — (#windows × #templates)
    rows — so the leak is mild, but still a leak)."""
    cfg = cfg or PipelineConfig()
    parsed = parse(transcripts)
    assigned, templates, keyed = mine_and_assign(parsed, cfg, persist=persist_keyed)
    enriched = enrich(assigned.drop(*cfg.routed_drop_cols), tool_lookup, role_lookup)
    route_caches: list = []
    routed = route(enriched, cfg, caches=route_caches)
    out = {
        "turns_parsed": assigned,
        "templates": templates,
        "routed": routed,
        "agg_template_tool": aggregate(routed),
        "sink_counts": sink_counts(routed),
        "_route_caches": route_caches,
    }
    if persist_keyed:
        out["_keyed_cache"] = keyed
    return out
