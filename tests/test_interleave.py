"""Weighted interleave: rate proportionality over the mixed stream,
determinism/parallelism invariance, fail-fast weight contract, and the
no-global-sort plan shape of the materialization path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from log_analysis_ai_spark.operators.sampling import (
    KNUTH_M,
    interleave_by_weight,
    interleave_partitions,
    knuth_hash,
)


def _corpus(spark, n=3000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("source"),
    )


def test_rate_proportional_to_weight(spark):
    # equal-size sources, weight 2:1 -> the prefix of the mixed stream
    # (up to key 1/2, where 'a' exhausts) contains ~2x as many 'a' rows
    d = interleave_by_weight(_corpus(spark), {"a": 2.0, "b": 1.0})
    rows = sorted(d.collect(), key=lambda r: (r.mix_key, r.doc_id))
    # every 'a' key < 0.5; 'b' keys spread over [0, 1)
    a_keys = [r.mix_key for r in rows if r.source == "a"]
    b_keys = [r.mix_key for r in rows if r.source == "b"]
    assert max(a_keys) < 0.5 and max(b_keys) > 0.9
    prefix = [r.source for r in rows if r.mix_key < 0.4]
    na, nb = prefix.count("a"), prefix.count("b")
    # expected: a-rate 2x b-rate -> na ~ 0.8*1500, nb ~ 0.4*1500
    assert na == pytest.approx(1200, rel=0.12)
    assert nb == pytest.approx(600, rel=0.15)
    assert na / nb == pytest.approx(2.0, rel=0.2)
    # well-mixed, not bursty: within the prefix, both sources appear in
    # every 10% slice of it
    for lo in range(0, 10):
        sl = [s for k, s in ((r.mix_key, r.source) for r in rows) if 0.04 * lo <= k < 0.04 * (lo + 1)]
        assert {"a", "b"} <= set(sl)


def test_deterministic_and_parallelism_invariant(spark):
    d = _corpus(spark, 500)
    k1 = {(r.doc_id, r.mix_key) for r in interleave_by_weight(d, {"a": 1.5, "b": 1.0}).collect()}
    k2 = {
        (r.doc_id, r.mix_key)
        for r in interleave_by_weight(d.repartition(11), {"a": 1.5, "b": 1.0}).collect()
    }
    assert k1 == k2 and len(k1) == 500
    # portable-hash variant reproduces in plain arithmetic
    d2 = interleave_by_weight(
        d, {"a": 2.0, "b": 1.0}, hash_expr=knuth_hash("doc_id"), hash_range=KNUTH_M
    )
    for r in d2.collect():
        w = 2.0 if r.source == "a" else 1.0
        h = (r.doc_id % (1 << 31)) * 2654435761 % (1 << 32)
        assert r.mix_key == (h / KNUTH_M) / w


def test_weight_contract_fails_fast(spark):
    d = _corpus(spark, 10)
    with pytest.raises(Exception, match="weight > 0"):
        interleave_by_weight(d, {"a": 1.0}).collect()  # 'b' missing
    with pytest.raises(Exception, match="weight > 0"):
        interleave_by_weight(d, {"a": 1.0, "b": 0.0}).collect()


def test_interleave_partitions_plan_and_order(spark):
    d = interleave_by_weight(_corpus(spark, 1000), {"a": 3.0, "b": 1.0})
    out = interleave_partitions(d, 8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    # in-partition sorts only (Sort [...], false, 0) — no global sort
    import re
    assert re.search(r"Sort \[mix_key[^\]]*\], false", plan)
    assert not re.search(r"Sort \[mix_key[^\]]*\], true", plan)
    # partition boundaries respect the global order: max(part i) <= min(part i+1)
    parts = out.select("mix_key").rdd.glom().collect()
    last = float("-inf")
    for p in parts:
        vals = [r.mix_key for r in p]
        if not vals:
            continue
        assert vals == sorted(vals)
        assert vals[0] >= last
        last = vals[-1]
