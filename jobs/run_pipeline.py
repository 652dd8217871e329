"""spark-submit entry point for the checkpointed pipeline.

Usage (cluster):
  spark-submit --py-files dist/log_analysis_ai_spark.zip jobs/run_pipeline.py \
      --transcripts <parquet_or_table> --warehouse <dir> [--resume] \
      [--salt-buckets 4] [--fixture-convs N]

With --fixture-convs the job generates the deterministic synthetic
transcripts instead of reading a path (sandbox/bench mode)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# direct `python jobs/run_pipeline.py` runs get the repo root on sys.path;
# spark-submit deployments ship the package via --py-files instead
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--transcripts", default=None)
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--resume", action="store_true")
    # default None: only override PipelineConfig.salt_buckets when the flag
    # is explicitly passed (a hardcoded CLI default of 4 silently reinstated
    # the mine-stage parallelism starvation the config default 16 fixes)
    ap.add_argument("--salt-buckets", type=int, default=None)
    ap.add_argument("--fixture-convs", type=int, default=None)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from log_analysis_ai_spark.config import PipelineConfig
    from log_analysis_ai_spark.fixtures import gen_role_lookup, gen_tool_lookup, gen_transcripts
    from log_analysis_ai_spark.job import run_checkpointed
    from log_analysis_ai_spark.lineage import SinkStore
    from log_analysis_ai_spark.session import get_spark

    spark = get_spark(app_name="run_pipeline", master=args.master)
    cfg = (
        PipelineConfig(salt_buckets=args.salt_buckets)
        if args.salt_buckets is not None
        else PipelineConfig()
    )
    if args.fixture_convs:
        transcripts = spark.createDataFrame(gen_transcripts(args.fixture_convs))
        desc = f"fixtures:{args.fixture_convs}"
    elif args.transcripts:
        transcripts = spark.read.parquet(args.transcripts)
        desc = args.transcripts
    else:
        ap.error("one of --transcripts / --fixture-convs is required")

    t0 = time.time()
    out = run_checkpointed(
        spark,
        transcripts,
        spark.createDataFrame(gen_tool_lookup()),
        spark.createDataFrame(gen_role_lookup()),
        SinkStore(args.warehouse),
        cfg,
        resume=args.resume,
        input_desc=desc,
    )
    n = out["turns_parsed"].count()
    wall = time.time() - t0
    print(json.dumps({"turns": n, "wall_s": round(wall, 2), "turns_per_sec": round(n / wall, 1)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
