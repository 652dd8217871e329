"""Per-query timing harness for optimization work — bench.py is FROZEN for
the driver's measurement, so ad-hoc isolation runs live here (guide §1.4:
noop sink so the full result is computed and discarded; §1.5: labelled
jobs). Prints one JSON line: {"queries": {name: [s, ...]}, "triad": ...}.

Usage: python bench_extra.py <repeats> <query> [<query> ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, here)
    repeats = int(sys.argv[1])
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as entry
    from log_analysis_ai_spark.session import get_spark

    triad = None
    try:
        sys.path.insert(0, os.path.join(here, "tools"))
        from ceiling_probe import triad_aggregate

        triad = round(triad_aggregate(8), 1)
    except Exception:
        pass

    spark = get_spark(
        app_name="bench_extra", master=f"local[{cpus}]", shuffle_partitions=2 * cpus
    )
    qs = entry.queries()
    # session warmup outside the timers (same rationale as bench.py)
    qs["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    out: dict[str, list[float]] = {}
    for name in names:
        times = []
        for i in range(repeats):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}#{i}")
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = times
    print(json.dumps({"queries": out, "triad8_gbs": triad, "sf_dir": sf_dir}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
