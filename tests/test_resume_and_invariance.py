"""Checkpoint/resume idempotency (SURVEY.md §5.5) and partition/order
invariance (§5.4 — the in-process proxy for the N→4N cluster criterion;
the true local[8]-vs-local[32] run is bench.py's scaling report)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from log_analysis_ai_spark.config import PipelineConfig
from log_analysis_ai_spark.job import run_checkpointed
from log_analysis_ai_spark.lineage import SinkStore
from log_analysis_ai_spark.pipeline import run_pipeline

CFG = PipelineConfig()


def _sink_counts(out) -> dict:
    return {(r.template_class, r.anomaly_flag): r.n for r in out["sink_counts"].collect()}


@pytest.fixture()
def frames(spark, tiny_pdf, lookups_pdf):
    tool_l, role_l = lookups_pdf
    return (
        spark.createDataFrame(tiny_pdf),
        spark.createDataFrame(tool_l),
        spark.createDataFrame(role_l),
    )


def test_partition_and_order_invariance(spark, frames):
    """Identical results when the input arrives in a different partitioning
    and a scrambled row order — the property that makes counts stable
    between N and 4N executors."""
    t, tool_l, role_l = frames
    a = run_pipeline(t.repartition(2), tool_l, role_l, CFG)
    b = run_pipeline(t.orderBy(F.desc("ts")).repartition(17), tool_l, role_l, CFG)
    assert _sink_counts(a) == _sink_counts(b)
    ta = {(r.template_id, r.template_str) for r in a["templates"].collect()}
    tb = {(r.template_id, r.template_str) for r in b["templates"].collect()}
    assert ta == tb
    ra = a["routed"].select("conv_id", "turn_idx", "template_id", "template_class", "anomaly_flag")
    rb = b["routed"].select("conv_id", "turn_idx", "template_id", "template_class", "anomaly_flag")
    assert ra.exceptAll(rb).count() == 0 and rb.exceptAll(ra).count() == 0


def test_resume_is_idempotent(spark, frames, tmp_path):
    t, tool_l, role_l = frames
    wh = str(tmp_path / "wh")
    store = SinkStore(wh)
    out1 = run_checkpointed(spark, t, tool_l, role_l, store, CFG, input_desc="tiny")
    clean = _sink_counts(out1)
    n_lineage = len(store.lineage_rows())

    # full re-run with resume: a no-op (no new lineage rows)
    out2 = run_checkpointed(spark, t, tool_l, role_l, store, CFG, resume=True, input_desc="tiny")
    assert len(store.lineage_rows()) == n_lineage
    assert _sink_counts(out2) == clean

    # simulate a kill after stage 1: drop stage-2+ outputs, resume
    shutil.rmtree(store.table_path("routed"))
    shutil.rmtree(store.table_path("agg_template_tool"))
    shutil.rmtree(store.table_path("sink_counts"))
    out3 = run_checkpointed(spark, t, tool_l, role_l, store, CFG, resume=True, input_desc="tiny")
    assert _sink_counts(out3) == clean
    rows = store.lineage_rows()
    # stage 1 was NOT recomputed (still exactly one committed row each)
    assert sum(r["stage"] == "turns_parsed" for r in rows) == 1
    assert sum(r["stage"] == "routed" for r in rows) == 2
    # per-partition lineage: the routed fanout recorded per-sink counts
    routed_rows = [r for r in rows if r["stage"] == "routed"]
    assert all(r["partitions"] for r in routed_rows)
    assert sum(routed_rows[-1]["partitions"].values()) == sum(clean.values())


def test_snapshot_isolation_on_overwrite(spark, tmp_path):
    """Iceberg-semantic commits: a reader that resolved the table before an
    overwrite still sees its snapshot (the round-1 rmtree+rename had a window
    where the table vanished); retention keeps exactly the last 2 snapshots."""
    import os

    store = SinkStore(str(tmp_path / "wh_snap"))
    store.write_table(spark.range(10).withColumn("v", F.lit("a")), "t", "fp1")
    old_reader = store.read_table(spark, "t")  # resolves snap-000001
    store.write_table(spark.range(5).withColumn("v", F.lit("b")), "t", "fp2")
    # previous snapshot still readable by the in-flight reader
    assert old_reader.count() == 10
    assert store.read_table(spark, "t").count() == 5
    # third commit prunes snap-1; exactly 2 snapshots + manifests retained
    store.write_table(spark.range(7).withColumn("v", F.lit("c")), "t", "fp3")
    snaps = sorted(d for d in os.listdir(store.table_path("t")) if d.startswith("snap-"))
    assert len(snaps) == 2 and snaps[0].startswith("snap-000002")
    manifests = os.listdir(store._manifest_dir("t"))
    assert len(manifests) == 2
    # manifest metrics come from footers and match the data
    m = store.current_manifest("t")
    assert m["rows"] == 7 and m["fingerprint"] == "fp3" and len(m["files"]) >= 1


def test_resume_rejects_stale_fingerprint_after_interleaved_run(spark, frames, tmp_path):
    """Warehouse reused across configs: run A, run B (overwrites tables), then
    resume A — A must RECOMPUTE, not silently serve B's tables (the old
    committed() accepted any historical lineage row for the fingerprint)."""
    t, tool_l, role_l = frames
    store = SinkStore(str(tmp_path / "wh_aba"))
    cfg_a, cfg_b = CFG, PipelineConfig(anomaly_min_count=3)
    out_a = run_checkpointed(spark, t, tool_l, role_l, store, cfg_a, input_desc="tiny")
    counts_a = _sink_counts(out_a)
    out_b = run_checkpointed(spark, t, tool_l, role_l, store, cfg_b, resume=True, input_desc="tiny")
    counts_b = _sink_counts(out_b)
    assert counts_a != counts_b  # configs genuinely diverge
    out_a2 = run_checkpointed(spark, t, tool_l, role_l, store, cfg_a, resume=True, input_desc="tiny")
    assert _sink_counts(out_a2) == counts_a
    # A was recomputed (3 committed turns_parsed rows: A, B, A-again)
    assert sum(r["stage"] == "turns_parsed" for r in store.lineage_rows()) == 3


def test_config_change_invalidates_checkpoint(spark, frames, tmp_path):
    t, tool_l, role_l = frames
    store = SinkStore(str(tmp_path / "wh2"))
    run_checkpointed(spark, t, tool_l, role_l, store, CFG, input_desc="tiny")
    cfg2 = PipelineConfig(anomaly_min_count=3)
    out = run_checkpointed(spark, t, tool_l, role_l, store, cfg2, resume=True, input_desc="tiny")
    # different fingerprint -> stages recomputed (2 committed rows per stage)
    assert sum(r["stage"] == "turns_parsed" for r in store.lineage_rows()) == 2
    assert out["sink_counts"].count() > 0


def test_collapse_duplicate_lines_identical_results(spark, frames):
    """cfg.collapse_duplicate_lines must not change ANY output: the miner's
    unique-line shortcut already ignores repeats, and first-occurrence order
    is preserved by the min-struct, so catalogs, assignments and sink counts
    are bit-identical with the collapse on or off."""
    t, tool_l, role_l = frames
    # duplicate-heavy variant: triple every row under fresh conv ids
    dup = t.unionByName(t.withColumn("conv_id", F.concat(F.lit("zz-"), "conv_id"))).unionByName(
        t.withColumn("conv_id", F.concat(F.lit("zzz-"), "conv_id"))
    )
    a = run_pipeline(dup, tool_l, role_l, PipelineConfig(collapse_duplicate_lines=False), persist_keyed=False)
    b = run_pipeline(dup, tool_l, role_l, PipelineConfig(collapse_duplicate_lines=True), persist_keyed=False)
    assert _sink_counts(a) == _sink_counts(b)
    ta = {(r.template_id, r.template_str) for r in a["templates"].collect()}
    tb = {(r.template_id, r.template_str) for r in b["templates"].collect()}
    assert ta == tb
    ra = a["turns_parsed"].select("conv_id", "turn_idx", "template_id")
    rb = b["turns_parsed"].select("conv_id", "turn_idx", "template_id")
    assert ra.exceptAll(rb).count() == 0 and rb.exceptAll(ra).count() == 0


def test_dead_letter_routes_malformed_rows(spark, frames, tmp_path):
    """Structurally invalid rows (null conv_id/text/ts, ≥1MB text, parser
    `_valid` flags) land in the committed dead_letter table with a reason;
    valid rows flow through untouched; a clean input commits an EMPTY
    dead_letter table (distinguishable from never-validated)."""
    t, tool_l, role_l = frames

    bad = spark.createDataFrame(
        [
            ("dl-1", 0, "user", None, "none"),                  # null text
            (None, 0, "user", "hello world", "none"),           # null conv_id
            ("dl-3", 0, "user", "x" * (1 << 20), "none"),       # 1MB text
        ],
        "conv_id string, turn_idx int, role string, text string, tool string",
    ).withColumn("ts", F.lit("2024-01-01 00:00:00").cast("timestamp"))
    bad = bad.unionByName(
        spark.createDataFrame(
            [("dl-4", 0, "user", "null ts row", "none")],
            "conv_id string, turn_idx int, role string, text string, tool string",
        ).withColumn("ts", F.lit(None).cast("timestamp"))
    )
    mixed = t.unionByName(bad.select(*t.columns))

    store = SinkStore(str(tmp_path / "wh_dl"))
    out = run_checkpointed(spark, mixed, tool_l, role_l, store, CFG, input_desc="dl")
    reasons = {r.reject_reason: r.n for r in
               out["dead_letter"].groupBy("reject_reason").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert reasons == {"null_text": 1, "null_conv_id": 1, "oversize_text": 1, "null_ts": 1}
    # dead rows never reached the miner; valid rows all did
    assert out["turns_parsed"].filter(F.col("conv_id").startswith("dl-")).count() == 0
    assert out["turns_parsed"].count() == t.count()
    # lineage committed the stage
    assert sum(r["stage"] == "dead_letter" for r in store.lineage_rows()) == 1

    # clean input → empty but COMMITTED dead_letter
    store2 = SinkStore(str(tmp_path / "wh_clean"))
    out2 = run_checkpointed(spark, t, tool_l, role_l, store2, CFG, input_desc="clean")
    assert out2["dead_letter"].count() == 0
    assert sum(r["stage"] == "dead_letter" for r in store2.lineage_rows()) == 1

    # parser-invalid rows (from parse_format's _valid) get their own reason
    flagged = t.withColumn("_valid", ~F.col("conv_id").startswith("conv-000000"))
    store3 = SinkStore(str(tmp_path / "wh_pv"))
    out3 = run_checkpointed(spark, flagged, tool_l, role_l, store3, CFG, input_desc="pv")
    dl = out3["dead_letter"]
    assert dl.filter(F.col("reject_reason") == "parser_invalid").count() == dl.count() > 0
    assert "_valid" not in dl.columns and "_valid" not in out3["turns_parsed"].columns
