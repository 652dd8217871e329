"""Driver-contract smoke + physical-plan shape assertions.

The plan tests pin the performance-critical properties the engine relies on
at 100 TB: filters reach the parquet scan, small dims broadcast, top-k
compiles to TakeOrderedAndProject (no full sort), and no row-at-a-time
Python (BatchEvalPython) appears anywhere — Python is Arrow-vectorized only.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_entry_contract(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"template_id", "template_str", "count"} <= set(df.columns)


def test_queries_oracle_key_consistency():
    qs, os_ = entry.queries(), entry.oracle_sql()
    assert set(os_) <= set(qs)  # every oracle has a query
    assert len(os_) >= 20  # broad oracled coverage


def test_q1_filter_pushed_to_scan(spark):
    plan = _plan(entry.queries()["q1_pricing_summary"](spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_joins_are_broadcast(spark):
    plan = _plan(entry.queries()["q5_region_supplier_revenue"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 3  # supplier, nation, region
    plan3 = _plan(entry.queries()["q3_top_revenue"](spark, SF))
    assert "BroadcastHashJoin" in plan3


def test_topk_compiles_to_take_ordered(spark):
    plan = _plan(entry.queries()["top_orders"](spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_no_row_at_a_time_python_udf_anywhere(spark):
    """BatchEvalPython = per-row Python serde; the engine must only ever use
    Arrow evals (ArrowEvalPython / mapInPandas / FlatMapGroupsInPandas)."""
    from log_analysis_ai_spark.config import PipelineConfig
    from log_analysis_ai_spark.fixtures import gen_role_lookup, gen_tool_lookup, gen_transcripts
    from log_analysis_ai_spark.pipeline import run_pipeline

    out = run_pipeline(
        spark.createDataFrame(gen_transcripts(30)),
        spark.createDataFrame(gen_tool_lookup()),
        spark.createDataFrame(gen_role_lookup()),
        PipelineConfig(),
    )
    for name in ("routed", "agg_template_tool"):
        assert "BatchEvalPython" not in _plan(out[name])


def test_zscore_group_stats_broadcast_no_window(spark):
    """zscore_by_group must be agg + broadcast-join back, never a window over
    the (low-cardinality) group key — a window funnels the whole fact table
    through #groups tasks at scale (VERDICT r1, item 3)."""
    plan = _plan(entry.queries()["events_zscore"](spark, SF))
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan


def test_media_features_rows_are_scalar(spark):
    """The driver canonicalizer hashes cell values — no array cells allowed."""
    df = entry.queries()["media_features"](spark, SF)
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "bigint", "string", "int", "double",
    ]
    assert df.count() == 48 * 16  # one row per (media, dim)


def test_scan_prunes_columns(spark):
    """A 2-column projection must not read the full lineitem schema."""
    df = entry.queries()["top_orders"](spark, SF)
    plan = _plan(df)
    read_schema = plan.split("ReadSchema:")[-1].splitlines()[0]
    assert "o_orderpriority" not in read_schema  # unused column pruned


def _formatted(spark, df) -> str:
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(jmode)


def test_mine_pass1_single_fact_exchange(spark):
    """Pass 1 (VERDICT r3 next-round #7): the only FACT-scale exchange is
    the explicit repartition on (shard_key, salt); the second exchange is
    the catalog-scale cross-salt template dedup AFTER MapInPandas."""
    from log_analysis_ai_spark.config import PipelineConfig
    from log_analysis_ai_spark.fixtures import materialize_transcripts
    from log_analysis_ai_spark.operators.drain import mined_templates_df, with_shard_key

    t = spark.read.parquet(materialize_transcripts(60))
    keyed = with_shard_key(t, PipelineConfig(salt_buckets=2))
    plan = _plan(mined_templates_df(keyed, PipelineConfig(salt_buckets=2)))
    assert plan.count("Exchange hashpartitioning") == 2
    fact = [
        l for l in plan.splitlines()
        if "Exchange hashpartitioning(shard_key" in l and "salt" in l
    ]
    assert len(fact) == 1 and "REPARTITION_BY_NUM" in fact[0]


def test_assign_pass2_no_exchange(spark):
    """Pass 2 must run over the input partitioning: mapInPandas + JVM param
    map assembly, ZERO exchanges (the broadcast catalog is the only data
    movement, and it is driver->executor, not a shuffle)."""
    from log_analysis_ai_spark.config import PipelineConfig
    from log_analysis_ai_spark.fixtures import materialize_transcripts
    from log_analysis_ai_spark.operators.drain import (
        assign_templates,
        mine_catalog,
        with_shard_key,
    )

    cfg = PipelineConfig(salt_buckets=2)
    t = spark.read.parquet(materialize_transcripts(60))
    keyed = with_shard_key(t, cfg)
    assigned = assign_templates(keyed, mine_catalog(keyed, cfg), cfg)
    assert "Exchange" not in _plan(assigned)


def test_route_broadcast_fallback_shape_and_equality(spark):
    """broadcast_count_limit=0 must flip the count-table joins to shuffle
    joins (no oversized broadcast at very long time ranges) AND produce
    bit-equal sink counts (VERDICT r3 next-round #5). Auto-broadcast is
    disabled so the planner cannot silently re-broadcast the small test
    tables and void the shape assertion."""
    from log_analysis_ai_spark.config import PipelineConfig
    from log_analysis_ai_spark.fixtures import gen_role_lookup, gen_tool_lookup, gen_transcripts
    from log_analysis_ai_spark.pipeline import run_pipeline

    t = spark.createDataFrame(gen_transcripts(60))
    tool_l = spark.createDataFrame(gen_tool_lookup())
    role_l = spark.createDataFrame(gen_role_lookup())
    base = run_pipeline(t, tool_l, role_l, PipelineConfig(), persist_keyed=False)
    expect = sorted(map(tuple, base["sink_counts"].collect()))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = run_pipeline(
            t, tool_l, role_l,
            PipelineConfig(broadcast_count_limit=0),
            persist_keyed=False,
        )
        plan = _plan(out["routed"])
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        got = sorted(map(tuple, out["sink_counts"].collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert got == expect


def test_emb_neardup_bucket_exchange_ships_no_vectors(spark):
    """The skew-exposed bucket self-join must shuffle only (_id, _bucket);
    vectors re-attach via the id joins afterwards (VERDICT r3 next-round
    #3). Checked on the formatted plan: every exchange partitioned on
    _bucket has a vector-free input."""
    from log_analysis_ai_spark.operators.similarity import near_dup_embeddings

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select("vec_id", "embedding")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        nd = near_dup_embeddings(emb, threshold=0.92, dim=64)
        fmt = _formatted(spark, nd)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    lines = fmt.splitlines()
    bucket_exchanges = 0
    for i, l in enumerate(lines):
        if "Arguments: hashpartitioning(_bucket" in l.strip():
            bucket_exchanges += 1
            # the matching Input [...] line precedes the Arguments line
            inputs = [x for x in lines[max(0, i - 3): i] if x.strip().startswith("Input")]
            assert inputs and "_v#" not in inputs[-1] and "embedding" not in inputs[-1]
    assert bucket_exchanges >= 2  # both self-join sides shuffled narrow


def test_pivot_kinds_cover_fixture(spark):
    """events_pivot_user hardcodes EVENT_KINDS on both engine and oracle
    side; an unexpected kind in a future fixture must fail HERE instead of
    silently getting no column in either (ADVICE r3)."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{SF}/events.parquet")
    distinct = {r[0] for r in ev.select(F.col("event_type")).distinct().collect()}
    assert distinct <= set(entry.EVENT_KINDS)


def test_cogrouped_assign_equals_broadcast_assign(spark):
    """The no-broadcast pass 2 (assign_templates_cogrouped — the
    catalog-too-large-to-broadcast swap the drain module docstring
    promises) must be bit-identical to the broadcast path, its plan must
    contain no broadcast of the catalog, and the distributed templates
    table must equal the collected one."""
    from pyspark.sql import functions as F

    from log_analysis_ai_spark.config import PipelineConfig
    from log_analysis_ai_spark.fixtures import materialize_transcripts
    from log_analysis_ai_spark.operators.drain import (
        mine_and_assign,
        mine_and_assign_distributed,
        templates_table,
        mine_catalog,
        with_shard_key,
    )

    cfg = PipelineConfig(salt_buckets=3)
    t = spark.read.parquet(materialize_transcripts(80))
    a_bc, tpl_bc, keyed_bc = mine_and_assign(t, cfg, persist=False)
    a_cg, tpl_cg, keyed_cg = mine_and_assign_distributed(t, cfg, persist=False)
    cols = ["conv_id", "turn_idx", "template_id", "template_str", "params"]
    rows_bc = sorted(
        (r.conv_id, r.turn_idx, r.template_id, r.template_str, tuple(sorted(r.params.items())))
        for r in a_bc.select(cols).collect()
    )
    rows_cg = sorted(
        (r.conv_id, r.turn_idx, r.template_id, r.template_str, tuple(sorted(r.params.items())))
        for r in a_cg.select(cols).collect()
    )
    assert rows_bc == rows_cg
    assert "Broadcast" not in _plan(a_cg.select("template_id"))
    assert "FlatMapCoGroupsInPandas" in _plan(a_cg.select("template_id"))
    assert sorted(map(tuple, tpl_bc.collect())) == sorted(map(tuple, tpl_cg.collect()))


def test_lsh_signature_computed_once(spark):
    """minhash/simhash/embedding near-dup plans must read the signature
    stage from ONE materialization (compute_once): both self-join sides
    scan the checkpointed RDD instead of re-running the signature
    expressions (HOF lambdas never fold into ReusedExchange — NOTES_r3)."""
    from log_analysis_ai_spark.operators.dedup import minhash_candidates, simhash_near_dups

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    cand_plan = _plan(minhash_candidates(docs))
    # signature lives behind the checkpoint: no per-scan recompute nodes
    assert "ExistingRDD" in cand_plan
    assert "xxhash64" not in cand_plan  # the 64-hash signature is upstream
    sim_plan = _plan(simhash_near_dups(docs))
    assert "ExistingRDD" in sim_plan
    assert "ArrowEvalPython" not in sim_plan  # bit-fold UDF is upstream


def test_bucketed_join_has_zero_exchanges(spark, tmp_path):
    """Bucketing contract: same-bucketed tables join with ZERO exchanges
    (the ingest-time shuffle amortizes across every later join); results
    equal the plain join."""
    from pyspark.sql import functions as F

    from log_analysis_ai_spark.bucketing import bucketed_join, write_bucketed

    a = spark.range(2000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    b = spark.range(900).select(F.col("id").alias("k"), (F.col("id") * 3).alias("w"))
    write_bucketed(a, "bk_a", "k", n_buckets=8)
    write_bucketed(b, "bk_b", "k", n_buckets=8)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "bk_a", "bk_b", "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 0
        assert j.count() == 900
        want = {(r.k, r.v, r.w) for r in a.join(b, "k").collect()}
        assert {(r.k, r.v, r.w) for r in j.collect()} == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bk_a")
        spark.sql("DROP TABLE IF EXISTS bk_b")


def test_ngram_jaccard_prefix_computed_once(spark):
    """ngram_jaccard_near_dups: the prefix table (df-count join + per-doc
    window — two shuffles) must be materialized ONCE and read from the
    checkpoint by both candidate self-join sides; the final plan carries
    no Window/Aggregate recompute nodes."""
    from log_analysis_ai_spark.operators.dedup import ngram_jaccard_near_dups

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(ngram_jaccard_near_dups(docs, threshold=0.7))
    assert "ExistingRDD" in plan
    assert "Window" not in plan
    assert "row_number" not in plan
