"""Structured Streaming: file-source micro-batch parse+assign, resumable
via checkpoint; streamed assignment equals the batch run."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from log_analysis_ai_spark.config import PipelineConfig
from log_analysis_ai_spark.fixtures import gen_transcripts
from log_analysis_ai_spark.operators.drain import mine_catalog, with_shard_key
from log_analysis_ai_spark.streaming import stream_lines, stream_pipeline

CFG = PipelineConfig()
SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


def test_stream_pipeline_matches_batch(spark, tmp_path):
    pdf = gen_transcripts(60)
    in_dir, out_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    os.makedirs(in_dir)
    # two input files, as a tailed directory would see them
    for i, part in enumerate((pdf.iloc[:300], pdf.iloc[300:])):
        with open(f"{in_dir}/f{i}.jsonl", "w") as f:
            for _, r in part.iterrows():
                f.write(
                    json.dumps(
                        {
                            "conv_id": r.conv_id, "turn_idx": int(r.turn_idx), "role": r.role,
                            "text": r.text, "tool": r.tool, "ts": r.ts.isoformat(),
                        }
                    )
                    + "\n"
                )

    batch_df = spark.createDataFrame(pdf)
    catalogs = mine_catalog(with_shard_key(batch_df, CFG), CFG)

    q = stream_pipeline(stream_lines(spark, in_dir, SCHEMA), catalogs, out_dir, ckpt, CFG)
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir)
    assert got.count() == len(pdf)
    # streamed assignment == batch assignment (same catalog, pure pass 2)
    from log_analysis_ai_spark.operators.drain import assign_templates

    want = assign_templates(with_shard_key(batch_df, CFG), catalogs, CFG)
    g = got.select("conv_id", "turn_idx", "template_id").orderBy("conv_id", "turn_idx").collect()
    w = want.select("conv_id", "turn_idx", "template_id").orderBy("conv_id", "turn_idx").collect()
    assert g == w
    # restart with the same checkpoint: no new rows (exactly-once resume)
    q2 = stream_pipeline(stream_lines(spark, in_dir, SCHEMA), catalogs, out_dir, ckpt, CFG)
    q2.awaitTermination(60)
    assert spark.read.parquet(out_dir).count() == len(pdf)
    # simulate a batch RETRY: a fresh checkpoint replays the same input with
    # the same batch ids into the same sink — the dynamic-partition-overwrite
    # write must REPLACE each _batch_id partition, not duplicate it
    q3 = stream_pipeline(
        stream_lines(spark, in_dir, SCHEMA), catalogs, out_dir, str(tmp_path / "ck_retry"), CFG
    )
    q3.awaitTermination(60)
    assert spark.read.parquet(out_dir).count() == len(pdf)


def test_windowed_template_counts_stream(spark, tmp_path):
    from log_analysis_ai_spark.streaming import windowed_template_counts

    pdf = gen_transcripts(40)
    in_dir, ckpt = str(tmp_path / "in2"), str(tmp_path / "ck2")
    os.makedirs(in_dir)
    with open(f"{in_dir}/all.jsonl", "w") as f:
        for _, r in pdf.iterrows():
            f.write(
                json.dumps(
                    {
                        "conv_id": r.conv_id, "turn_idx": int(r.turn_idx), "role": r.role,
                        "text": r.text, "tool": r.tool, "ts": r.ts.isoformat(),
                    }
                )
                + "\n"
            )
    stream = stream_lines(spark, in_dir, SCHEMA).withColumn(
        "template_id", F.xxhash64("text")  # stand-in assignment for the agg test
    )
    counts = windowed_template_counts(stream)
    q = (
        counts.writeStream.format("memory")
        .queryName("wtc")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    total = spark.sql("select sum(n) as s from wtc").collect()[0].s
    assert total == len(pdf)
