"""Workload-INDEPENDENT ceiling probes for the single-box scaling number.

The pipeline's N-vs-4N efficiency on one box is bounded by shared hardware
(memory bandwidth, LLC, one OS page cache) — resources a real 4N-node
cluster multiplies with nodes. VERDICT r2 asked for the ceiling to be a
MEASUREMENT, not an inference from the workload under test. Two probes:

1. `triad`: STREAM-style numpy triad (a = b + s*c over buffers >> LLC),
   one pinned process per core. Aggregate GB/s at `lo` and `hi` cores —
   pure hardware, zero Spark. If aggregate bandwidth does not scale
   core-proportionally, NO memory-bound job can.
2. `shuffle`: a trivial Spark job (scan the same transcripts parquet the
   pipeline reads, one full repartition on conv_id, noop sink) — no
   Python UDFs, no mining, no joins. Its turns/s at `hi` cores is the
   box's scan+shuffle throughput ceiling expressed in the pipeline's own
   unit. If the e2e pipeline's hi-side turns/s sits at this probe's cap,
   the gap to 1.0 efficiency is the box, not the plan.

Usage: python tools/ceiling_probe.py [--lo 8] [--hi 32] [--convs 550000]
Writes BENCH/ceiling.json and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

TRIAD_WORKER = r"""
import sys, time
import numpy as np
n = 16_000_000  # 3 x 128 MB float64 buffers >> any LLC
a = np.zeros(n); b = np.ones(n); c = np.full(n, 2.0)
# warm (page-fault) the buffers before timing
a[:] = b + 0.5 * c
t0 = time.perf_counter(); iters = 0
while time.perf_counter() - t0 < 3.0:
    a[:] = b + 0.5 * c   # 2 reads + 1 write (+RFO) per element
    iters += 1
wall = time.perf_counter() - t0
print((iters * 3 * 8 * n) / wall)  # bytes/s, RFO not counted (conservative)
"""

SHUFFLE_CHILD = r"""
import json, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from log_analysis_ai_spark.session import get_spark
from log_analysis_ai_spark.fixtures import materialize_transcripts

cpus = {cpus}
_scratch = tempfile.mkdtemp(prefix=f"probe_local{{cpus}}_", dir="/dev/shm")
spark = get_spark(app_name=f"ceiling-probe-{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=2*cpus,
                  extra_conf={{"spark.local.dir": _scratch}})
t = spark.read.parquet(materialize_transcripts({convs}))
n = t.count()
t.limit(1000).write.format("noop").mode("overwrite").save()  # warm codegen
t0 = time.time()
t.repartition(2*cpus, "conv_id").write.format("noop").mode("overwrite").save()
wall = time.time() - t0
spark.stop()
shutil.rmtree(_scratch, ignore_errors=True)
print("RESULT " + json.dumps({{"cpus": cpus, "turns": n, "wall_s": round(wall, 2),
                               "turns_per_sec": round(n / wall, 1)}}))
"""


def triad_aggregate(cores: int) -> float:
    """Aggregate triad bandwidth (GB/s) with one pinned process per core."""
    procs = []
    for c in range(cores):
        procs.append(
            subprocess.Popen(
                ["taskset", "-c", str(c), sys.executable, "-c", TRIAD_WORKER],
                stdout=subprocess.PIPE, text=True,
            )
        )
    total = 0.0
    for p in procs:
        out, _ = p.communicate(timeout=120)
        total += float(out.strip())
    return total / 1e9


def shuffle_level(repo: str, cpus: int, convs: int) -> dict:
    code = SHUFFLE_CHILD.format(repo=repo, cpus=cpus, convs=convs)
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c", code]
    p = subprocess.run(cmd, capture_output=True, text=True, timeout=3600, cwd=repo)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"probe child local[{cpus}] failed:\n{p.stdout[-1500:]}\n{p.stderr[-3000:]}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="1,2,4,8,16,32",
                    help="comma-separated core counts to probe")
    ap.add_argument("--convs", type=int, default=550_000)
    ap.add_argument("--skip-triad", action="store_true")
    ap.add_argument("--skip-shuffle", action="store_true")
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    levels = [int(x) for x in args.levels.split(",")]

    result: dict = {"metric": "workload-independent ceiling probes", "levels": levels}
    # merge-update: a partial re-run (e.g. --skip-triad with a bigger input)
    # keeps the other probe's existing numbers
    try:
        with open(f"{repo}/BENCH/ceiling.json") as f:
            result = {**json.load(f), **result}
    except FileNotFoundError:
        pass
    if not args.skip_triad:
        bw = {c: round(triad_aggregate(c), 1) for c in levels}
        result["triad_gbs"] = bw
        result["triad_n_vs_4n_efficiency"] = {
            f"{a}->{b}": round((bw[b] / bw[a]) / (b / a), 3)
            for a in levels for b in levels if b == 4 * a
        }
    if not args.skip_shuffle:
        sh = {c: shuffle_level(repo, c, args.convs) for c in levels}
        result["shuffle_convs"] = args.convs
        result["shuffle"] = sh
        result["shuffle_n_vs_4n_efficiency"] = {
            f"{a}->{b}": round(
                (sh[b]["turns_per_sec"] / sh[a]["turns_per_sec"]) / (b / a), 3
            )
            for a in levels for b in levels if b == 4 * a
        }
    os.makedirs(f"{repo}/BENCH", exist_ok=True)
    with open(f"{repo}/BENCH/ceiling.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
