"""Scaling-efficiency evidence (BASELINE.md): run the IDENTICAL end-to-end
pipeline job at two parallelism levels (default local[8] vs local[32] — the
sandbox stand-in for N vs 4N executors), report throughput at both plus
efficiency = (T_hi / T_lo) / (hi/lo), and verify the two runs produce
IDENTICAL sink counts (the count-equality-across-parallelism criterion).

Each level runs in its own subprocess (fresh JVM — no warm-cache bleed).

Usage: python tools/scaling_bench.py [--convs 55000] [--lo 8] [--hi 32]
Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

CHILD = r"""
import json, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from log_analysis_ai_spark.session import get_spark
from log_analysis_ai_spark.config import PipelineConfig
from log_analysis_ai_spark.fixtures import (
    materialize_transcripts, materialize_skewed_transcripts,
    gen_tool_lookup, gen_role_lookup,
)
from log_analysis_ai_spark.job import run_checkpointed
from log_analysis_ai_spark.lineage import SinkStore

cpus = {cpus}
skewed = {skewed}
salt_buckets = {salt_buckets}
# tmpfs for shuffle + warehouse: the sandbox has ONE shared disk, which a
# 2-point core scaling comparison would mis-read as serial work; a real
# N->4N cluster scales disk with nodes, tmpfs models node-local storage.
import os as _os
_scratch = tempfile.mkdtemp(prefix=f"scal_local{{cpus}}_", dir="/dev/shm")
spark = get_spark(app_name=f"scaling-{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=2*cpus,
                  extra_conf={{"spark.local.dir": _scratch}})
mat = materialize_skewed_transcripts if skewed else materialize_transcripts
t = spark.read.parquet(mat({convs}))
n = t.count()
wh = tempfile.mkdtemp(prefix=f"scal{{cpus}}_", dir="/dev/shm")
cfg = PipelineConfig(salt_buckets=salt_buckets) if salt_buckets else PipelineConfig()
t0 = time.time()
out = run_checkpointed(spark, t, spark.createDataFrame(gen_tool_lookup()),
                       spark.createDataFrame(gen_role_lookup()), SinkStore(wh),
                       cfg, resume=False, input_desc="scaling")
wall = time.time() - t0
sinks = sorted((str(r.template_class), str(r.anomaly_flag), int(r.n)) for r in out["sink_counts"].collect())
stages = {{r["stage"]: r["wall_s"] for r in SinkStore(wh).lineage_rows()}}
spark.stop()
shutil.rmtree(wh, ignore_errors=True)
shutil.rmtree(_scratch, ignore_errors=True)
print("RESULT " + json.dumps({{"cpus": cpus, "turns": n, "wall_s": round(wall, 2),
                               "turns_per_sec": round(n / wall, 1), "sinks": sinks,
                               "stages": stages}}))
"""


def run_level(repo: str, cpus: int, convs: int, skewed: bool = False,
              salt_buckets: int | None = None) -> dict:
    code = CHILD.format(repo=repo, cpus=cpus, convs=convs, skewed=skewed,
                        salt_buckets=salt_buckets or 0)
    # taskset: confine the whole process tree (JVM + python UDF workers +
    # GC/shuffle threads) to `cpus` physical cores — local[N] alone only
    # caps JVM task slots, so python workers would leak onto all cores and
    # fake the low-parallelism measurement.
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c", code]
    p = subprocess.run(cmd, capture_output=True, text=True, timeout=3600, cwd=repo)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"child (local[{cpus}]) failed:\n{p.stdout[-2000:]}\n{p.stderr[-4000:]}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=55000)
    ap.add_argument("--lo", type=int, default=8)
    ap.add_argument("--hi", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=2,
                    help="alternate lo/hi this many times; per-level best "
                         "wall wins (the sandbox host's throughput drifts "
                         "±20%% over minutes — measured via the triad health "
                         "probe recorded with every child run)")
    ap.add_argument("--skewed", action="store_true",
                    help="adversarial corpus: ~92%% of turns ONE template "
                         "shape (one Drain shard) — worst case for mining "
                         "parallelism; salting is the defusal under test")
    ap.add_argument("--salt-buckets", type=int, default=None,
                    help="override cfg.salt_buckets (1 disables salting)")
    ap.add_argument("--tag", default=None,
                    help="write BENCH/BASELINE_<tag>.md instead of "
                         "BENCH/BASELINE.md (so special runs don't clobber "
                         "the headline report)")
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    from ceiling_probe import triad_aggregate  # noqa: E402 (same dir)

    runs: dict[int, list[dict]] = {args.lo: [], args.hi: []}
    for _ in range(max(args.repeats, 1)):
        for cpus in (args.lo, args.hi):  # interleave: adjacent host states
            health = round(triad_aggregate(8), 1)  # fixed-width hw yardstick
            r = run_level(repo, cpus, args.convs, args.skewed, args.salt_buckets)
            r["triad8_gbs_before"] = health
            runs[cpus].append(r)
    # per-level best wall: both levels sampled at (close to) the host's best
    # state — pairing two drift-affected single runs misestimates by ±20%
    lo = max(runs[args.lo], key=lambda r: r["turns_per_sec"])
    hi = max(runs[args.hi], key=lambda r: r["turns_per_sec"])
    all_walls = {
        str(c): [(r["wall_s"], r["triad8_gbs_before"]) for r in rs]
        for c, rs in runs.items()
    }
    ratio = args.hi / args.lo
    eff = (hi["turns_per_sec"] / lo["turns_per_sec"]) / ratio
    counts_equal = lo["sinks"] == hi["sinks"]
    stage_rows = ""
    for stage in lo.get("stages", {}):
        tl, th = lo["stages"].get(stage), hi["stages"].get(stage)
        if tl and th:
            se = (tl / th) / ratio
            stage_rows += f"| {stage} | {tl:.1f} | {th:.1f} | {se:.2f} |\n"
    result = {
        "metric": "e2e pipeline scaling efficiency",
        "skewed": args.skewed, "salt_buckets": args.salt_buckets,
        "lo": lo, "hi": hi,
        "efficiency": round(eff, 3),
        "sink_counts_equal": counts_equal,
        "all_runs_wall_s_with_triad8_health": all_walls,
    }
    # fold in the workload-independent hardware ceiling (tools/ceiling_probe.py)
    ceiling_md = ""
    try:
        with open(f"{repo}/BENCH/ceiling.json") as f:
            ceil = json.load(f)
        pair = f"{args.lo}->{args.hi}"
        triad_eff = ceil.get("triad_n_vs_4n_efficiency", {}).get(pair)
        sh_eff = ceil.get("shuffle_n_vs_4n_efficiency", {}).get(pair)
        if triad_eff:
            result["hw_bandwidth_efficiency_at_pair"] = triad_eff
            result["bandwidth_normalized_efficiency"] = round(eff / triad_eff, 3)
        shuffle_rows = "".join(
            f"| {c} | {v['turns_per_sec']} |\n"
            for c, v in sorted(
                ((int(k), v) for k, v in ceil.get("shuffle", {}).items())
            )
        )
        ceiling_md = f"""
## Measured hardware ceiling (workload-independent probes)

From `BENCH/ceiling.json` (`tools/ceiling_probe.py`) — the r2 verdict asked
for the single-box ceiling to be a MEASUREMENT, not an inference from the
workload under test:

- **STREAM-triad aggregate memory bandwidth** (one pinned numpy process per
  core, buffers >> LLC, zero Spark): {json.dumps(ceil.get('triad_gbs', {}))} GB/s.
  N->4N efficiencies: {json.dumps(ceil.get('triad_n_vs_4n_efficiency', {}))}.
  The box's memory system itself stops scaling past ~8-16 cores — no
  memory-bound job can beat these numbers on this hardware.
- **Pure scan+shuffle Spark job** (read the same transcripts parquet, one
  repartition, noop sink — no Python, no mining, no joins), turns/s:

| cores | turns/s (scan+shuffle only) |
|---|---|
{shuffle_rows}
  N->4N efficiencies: {json.dumps(ceil.get('shuffle_n_vs_4n_efficiency', {}))}.

**Bandwidth-normalized pipeline efficiency at {args.lo}->{args.hi}:
{result.get('bandwidth_normalized_efficiency', 'n/a')}** (= pipeline efficiency
{eff:.3f} / measured hardware bandwidth efficiency {triad_eff if triad_eff else 'n/a'}
at the same pair — the fraction of the HARDWARE-POSSIBLE scaling the
pipeline achieves; a real N->4N cluster multiplies bandwidth with nodes,
so the normalized number is the cluster-relevant one).
"""
    except FileNotFoundError:
        pass
    os.makedirs(f"{repo}/BENCH", exist_ok=True)
    out_md = (
        f"{repo}/BENCH/BASELINE_{args.tag}.md" if args.tag else f"{repo}/BENCH/BASELINE.md"
    )
    corpus_note = (
        "ADVERSARIAL SKEW corpus: ~92% of turns share ONE template shape "
        "(one Drain shard)" if args.skewed else "deterministic synthetic transcript table"
    ) + (f"; salt_buckets={args.salt_buckets}" if args.salt_buckets else "")
    with open(out_md, "w") as f:
        f.write(
            f"""# BENCH/BASELINE{f' ({args.tag})' if args.tag else ''} — scaling evidence ({corpus_note})

End-to-end pipeline (parse → two-pass Drain mine → enrich → route-fanout →
aggregate, all stages checkpointed) on the deterministic synthetic
transcript table, identical job at two parallelism levels — the sandbox
stand-in for N vs 4N executors. Fresh JVM per level; the whole process tree
is `taskset`-confined to the stated core count (local[N] alone leaves
python UDF workers and GC threads on all cores); shuffle + warehouse on
tmpfs (models node-local storage — the sandbox's single shared disk is a
resource a real 4N cluster multiplies with nodes).

| parallelism | turns | wall (s) | turns/sec |
|---|---|---|---|
| {args.lo} cores | {lo['turns']} | {lo['wall_s']} | {lo['turns_per_sec']} |
| {args.hi} cores | {hi['turns']} | {hi['wall_s']} | {hi['turns_per_sec']} |

**End-to-end scaling efficiency ( (T_{args.lo}/T_{args.hi}) / {ratio:.0f} ): {eff:.3f}**

Per-stage walls (from the job's lineage metrics rows):

| stage | {args.lo}-core (s) | {args.hi}-core (s) | stage efficiency |
|---|---|---|---|
{stage_rows}
**Per-sink count equality across parallelism levels: {counts_equal}**
(the harder half of the criterion: identical routed counts at N and 4N,
guaranteed by the two-pass shard-deterministic miner)

Sink counts (template_class, anomaly_flag, n): `{lo['sinks']}`
{ceiling_md}
Caveats: single-box measurement — all levels share one memory-bandwidth
domain and one OS page cache; Spark job-scheduling fixed costs (~15 jobs
for the 5-stage checkpointed graph) are a constant ~10-20 s that a larger
input amortizes. The sandbox HOST's own throughput drifts ±20% over
minutes (visible in the per-run triad health numbers below), so levels are
interleaved {args.repeats}× and the per-level best wall is reported —
pairing two single runs taken at different host states misestimates
efficiency by up to the drift. All (wall_s, 8-core-triad-GB/s-before) runs:
`{json.dumps(all_walls)}`.
"""
        )
    with open(f"{repo}/BENCH/history.jsonl", "a") as f:
        f.write(json.dumps({"convs": args.convs, **result}) + "\n")
    print(json.dumps(result))
    return 0 if counts_equal else 1


if __name__ == "__main__":
    sys.exit(main())
