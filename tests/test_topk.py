"""grouped_topk: brute-force parity (ties included), hot-group safety by
construction (local winners bound the shuffle), parallelism invariance,
ascending mode, and validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from log_analysis_ai_spark.operators.topk import grouped_topk


def _corpus(spark, n=2000, groups=7):
    return spark.range(n).select(
        F.col("id").alias("row_id"),
        F.concat(F.lit("g"), (F.col("id") % groups).cast("string")).alias("grp"),
        # collisions on purpose: value has only 50 distinct levels
        (F.xxhash64("id") % 50).alias("val"),
    )


def _brute(rows, k, ascending=False):
    by_g: dict = {}
    for r in rows:
        by_g.setdefault(r.grp, []).append(r)
    exp = set()
    for g, rs in by_g.items():
        rs.sort(key=lambda r: (r.val if ascending else -r.val, r.row_id))
        for i, r in enumerate(rs[:k]):
            exp.add((g, r.row_id, r.val, i + 1))
    return exp


def test_matches_bruteforce_with_ties_and_ranks(spark):
    d = _corpus(spark)
    rows = d.collect()
    got = {
        (r.grp, r.row_id, r.val, r.rk)
        for r in grouped_topk(d, "grp", "val", 10, "row_id").collect()
    }
    assert got == _brute(rows, 10)
    got_asc = {
        (r.grp, r.row_id, r.val, r.rk)
        for r in grouped_topk(d, "grp", "val", 3, "row_id", ascending=True).collect()
    }
    assert got_asc == _brute(rows, 3, ascending=True)


def test_parallelism_invariance_and_hot_group(spark):
    # one group holds 95% of rows (the shape that serializes a naive
    # window); result must be identical at any partitioning
    d = spark.range(5000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 20 == 0, F.concat(F.lit("cold"), (F.col("id") % 5).cast("string")))
        .otherwise(F.lit("hot")).alias("grp"),
        (F.xxhash64("id") % 1000).alias("val"),
    )
    r1 = {(r.grp, r.row_id, r.rk) for r in grouped_topk(d, "grp", "val", 7, "row_id").collect()}
    r2 = {(r.grp, r.row_id, r.rk)
          for r in grouped_topk(d.repartition(23), "grp", "val", 7, "row_id").collect()}
    assert r1 == r2
    assert r1 == _brute_ids(d.collect(), 7)
    # every group yields exactly min(k, |group|) rows
    from collections import Counter
    c = Counter(g for g, _, _ in r1)
    assert c["hot"] == 7 and all(v <= 7 for v in c.values())


def _brute_ids(rows, k):
    by_g: dict = {}
    for r in rows:
        by_g.setdefault(r.grp, []).append(r)
    exp = set()
    for g, rs in by_g.items():
        rs.sort(key=lambda r: (-r.val, r.row_id))
        for i, r in enumerate(rs[:k]):
            exp.add((g, r.row_id, i + 1))
    return exp


def test_small_groups_k_exceeds_size_and_validation(spark):
    d = spark.createDataFrame(
        [(0, "a", 5), (1, "a", 3), (2, "b", 9)], "row_id long, grp string, val long"
    )
    got = {(r.grp, r.row_id, r.rk) for r in grouped_topk(d, "grp", "val", 10, "row_id").collect()}
    assert got == {("a", 0, 1), ("a", 1, 2), ("b", 2, 1)}
    with pytest.raises(ValueError, match="k must be"):
        grouped_topk(d, "grp", "val", 0, "row_id")
    with pytest.raises(ValueError, match="tie_cols"):
        grouped_topk(d, "grp", "val", 1, [])
