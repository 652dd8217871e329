"""Mergeable-sketch operators for incremental corpus accounting.

The 100 TB problem: "how many distinct documents/users/templates so far?"
re-asked after every ingest increment. An exact countDistinct rescans
everything ever ingested; `approx_count_distinct` gives one number but no
way to COMBINE yesterday's answer with today's increment. Datasketches
HLL (built into Spark 4 as `hll_sketch_agg` / `hll_union_agg` /
`hll_sketch_estimate`) fixes that: each increment produces a tiny binary
sketch, sketches union in O(sketch size), and the union's estimate sits within
HLL error (~1-2% at default lgk=12) of the true distinct count over the
full data — so the daily job touches only the new increment. (Union is
not bit-identical to a one-shot sketch — the merged sketch can land in a
different internal mode — but both carry the same error bound; tested.)

Sketch columns are plain BINARY — they persist in parquet next to the
lineage rows, so the accounting state lives in the warehouse, not in a
driver process.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_sketch(df: DataFrame, col: str, by: list[str] | None = None) -> DataFrame:
    """One HLL sketch of `col` per `by`-group (or a single global row).
    Partial-aggregated map-side like any agg; output rows are
    group keys + a `sketch` binary column."""
    agg = F.expr(f"hll_sketch_agg({col})").alias("sketch")
    return df.groupBy(*(by or [])).agg(agg)


def merge_sketches(sketches: DataFrame, by: list[str] | None = None) -> DataFrame:
    """Union previously materialized sketches (e.g. one per ingest
    increment, read back from parquet) into one per group."""
    agg = F.expr("hll_union_agg(sketch)").alias("sketch")
    return sketches.groupBy(*(by or [])).agg(agg)


def estimate(sketches: DataFrame) -> DataFrame:
    """Attach the distinct-count estimate to each sketch row."""
    return sketches.withColumn("n_distinct_est", F.expr("hll_sketch_estimate(sketch)"))


def heavy_hitters(
    df: DataFrame,
    key_cols: list[str],
    k: int = 10,
    width: int = 4096,
    return_local: bool = True,
) -> DataFrame:
    """EXACT top-k keys by count over ultra-high-cardinality key spaces,
    without shuffling the full distinct-key set.

    The 100 TB problem: a plain groupBy+orderBy+limit shuffles one row per
    DISTINCT key — at 10^11 distinct session/doc ids that is terabytes of
    shuffle for a 10-row answer. Two passes fix it:

    - Pass 1: a Misra-Gries summary per partition (mergeable-summaries
      form: fold each Arrow batch's value_counts into the running summary;
      on overflow subtract the (width+1)-th largest count from all and
      drop <=0 — Agarwal et al., "Mergeable Summaries", PODS'12). Emits at
      most `width` candidate keys per partition. Guarantee: a key absent
      from EVERY partition summary has global count < N/(width+1).
    - Pass 2: recount ONLY the candidate keys exactly (broadcast semi-join
      pushes the key filter to the scan; partial agg makes the shuffle
      candidate-sized), order by (count desc, keys asc), take k.

    Exactness guard, checked before returning: the answer is provably
    exact when EITHER no partition ever evicted (candidates = every
    distinct key) OR the k-th recounted count exceeds N/(width+1) (no
    missed key can outrank it). Otherwise raises ValueError with the
    width that would have sufficed — no silently-approximate results.

    The guard must materialize the k answer rows either way; by default
    they come back as a k-row local DataFrame. Callers that chain further
    Spark operations pass `return_local=False` to get the verified pass-2
    PLAN instead, skipping the collect→createDataFrame round-trip — note a
    downstream action then re-executes pass 2 (one filtered fact scan +
    candidate-sized agg; pass 1's summaries stay pinned by compute_once),
    so prefer the default when the k rows are the final answer."""
    import pandas as pd  # noqa: PLC0415 — worker-side import

    from .dedup import compute_once

    out_schema = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in key_cols]
        + ["`_evicted` boolean", "`_pid` int", "`_part_rows` long"]
    )

    def mg_partition(batches):
        from pyspark import TaskContext  # noqa: PLC0415 — worker-side

        pid = TaskContext.get().partitionId()
        summary = None
        evicted = False
        n_rows = 0
        for pdf in batches:
            n_rows += len(pdf)
            counts = pdf.groupby(key_cols, dropna=False, sort=False).size()
            summary = counts if summary is None else summary.add(counts, fill_value=0)
            if len(summary) > width:
                evicted = True
                cut = summary.nlargest(width + 1).iloc[-1]
                summary = summary - cut
                summary = summary[summary > 0]
        if summary is not None and len(summary):
            frame = summary.index.to_frame(index=False)
            frame.columns = key_cols
            frame["_evicted"] = evicted
            frame["_pid"], frame["_part_rows"] = pid, n_rows
            yield frame
        elif evicted:
            # everything was evicted (flat partition): the candidate set is
            # legitimately empty but the EVICTION SIGNAL must still reach
            # the guard — emit one all-null marker row (harmless as a
            # candidate: the null-safe join matches only genuine null keys)
            yield pd.DataFrame(
                [[None] * len(key_cols) + [True, pid, n_rows]],
                columns=key_cols + ["_evicted", "_pid", "_part_rows"],
            )

    cand_all = compute_once(df.select(*key_cols).mapInPandas(mg_partition, out_schema))
    cand = cand_all.select(*key_cols).distinct()
    # null-safe semi-join: plain key equality would silently drop genuine
    # null-keyed groups (and the eviction marker) from the recount
    join_cond = None
    for c in key_cols:
        clause = df[c].eqNullSafe(cand[c])
        join_cond = clause if join_cond is None else join_cond & clause
    top = (
        df.join(F.broadcast(cand), join_cond, "left_semi")
        .groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), *key_cols)
        .limit(k)
    )
    rows = top.collect()
    # N from pass 1's per-partition row counts (every nonempty partition
    # emits >=1 row) — no third scan of the fact table just to count it
    acct = cand_all.select("_pid", "_part_rows", "_evicted").groupBy("_pid").agg(
        F.first("_part_rows").alias("pr"), F.max("_evicted").alias("ev")
    ).agg(F.sum("pr").alias("n_total"), F.max("ev").alias("evicted")).first()
    n_total = acct["n_total"] or 0
    exact = len(rows) == k and rows[-1]["n"] > n_total / (width + 1)
    if not exact:
        exact = not (acct["evicted"] or False)
    if not exact:
        kth = rows[-1]["n"] if rows else 0
        raise ValueError(
            f"heavy_hitters exactness guard: k-th count {kth} <= N/(width+1) "
            f"= {n_total / (width + 1):.1f} and evictions occurred; a missed "
            f"key could outrank it. Re-run with width > "
            f"{int(n_total / kth) if kth else width * 2} or use a full groupBy."
        )
    if not return_local:
        return top
    return df.sparkSession.createDataFrame(rows, top.schema)
