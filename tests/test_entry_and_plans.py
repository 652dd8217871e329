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
