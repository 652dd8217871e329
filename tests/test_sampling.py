"""Deterministic sampling/capping (training-data curation): selection must
be a pure function of the row key — identical at any parallelism or row
order, splits disjoint, caps exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from log_analysis_ai_spark.operators.sampling import (
    KNUTH_M,
    deterministic_sample,
    knuth_hash,
    stratified_cap,
)


def _docs(spark, n=500):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("g"), F.pmod("id", F.lit(7))).alias("grp"),
    )


def test_sample_invariant_to_partitioning_and_order(spark):
    d = _docs(spark)
    a = {r.doc_id for r in deterministic_sample(d.repartition(2), 0.3, "doc_id").collect()}
    b = {
        r.doc_id
        for r in deterministic_sample(
            d.orderBy(F.desc("doc_id")).repartition(17), 0.3, "doc_id"
        ).collect()
    }
    assert a == b and 0 < len(a) < 500
    # fraction is approximately honored (hash uniformity, not exactness)
    assert 0.2 < len(a) / 500 < 0.4


def test_sample_splits_are_disjoint_and_exhaustive(spark):
    """fraction f and its complement (same salt) partition the corpus —
    the train/holdout contract."""
    d = _docs(spark)
    from log_analysis_ai_spark.operators.sampling import xxhash

    train = {r.doc_id for r in deterministic_sample(d, 0.7, "doc_id").collect()}
    hold = {
        r.doc_id
        for r in d.filter(~(xxhash("doc_id", 0) < F.lit(int(0.7 * (1 << 62))))).collect()
    }
    assert train.isdisjoint(hold)
    assert len(train) + len(hold) == 500
    # a different salt draws a genuinely different sample
    other = {r.doc_id for r in deterministic_sample(d, 0.7, "doc_id", salt=99).collect()}
    assert other != train


def test_stratified_cap_exact_and_invariant(spark):
    d = _docs(spark)
    capped = stratified_cap(d.repartition(13), "grp", cap=20, key_cols="doc_id")
    rows = capped.collect()
    per = {}
    for r in rows:
        per[r.grp] = per.get(r.grp, 0) + 1
    assert all(v == 20 for v in per.values()) and len(per) == 7
    again = stratified_cap(
        d.orderBy(F.desc("doc_id")).repartition(3), "grp", cap=20, key_cols="doc_id"
    )
    assert {(r.grp, r.doc_id) for r in again.collect()} == {(r.grp, r.doc_id) for r in rows}
    # small groups survive whole
    tiny = stratified_cap(d.filter(F.col("doc_id") < 5), "grp", cap=20, key_cols="doc_id")
    assert tiny.count() == 5


def test_knuth_hash_matches_reference_formula(spark):
    """The portable hash must equal the plain-SQL formula the DuckDB
    oracles use — pin it against a Python evaluation."""
    got = {
        r.doc_id: r.h
        for r in _docs(spark, 50)
        .select("doc_id", knuth_hash("doc_id", salt=7).alias("h"))
        .collect()
    }
    assert got == {i: ((i + 7) * 2654435761) % KNUTH_M for i in range(50)}


def test_knuth_hash_no_overflow_for_large_keys(spark):
    """Keys ≥ 2^31 must NOT silently wrap in 64-bit arithmetic: the inner
    pre-reduction mod 2^31 keeps the product < 2^63 so the formula evaluates
    identically in any engine. Pin the boundary and some huge keys against
    the exact-arithmetic Python evaluation of the SAME formula, and check
    the small-key identity (pre-reduction is a no-op below 2^31)."""
    keys = [0, 1, (1 << 31) - 1, 1 << 31, (1 << 31) + 1, (1 << 40) + 123,
            (1 << 62) + 7, (1 << 63) - 1]
    d = spark.createDataFrame([(k,) for k in keys], "doc_id: long")
    got = {r.doc_id: r.h for r in d.select("doc_id", knuth_hash("doc_id", salt=7).alias("h")).collect()}
    expect = {k: ((k % (1 << 31) + 7) % (1 << 31) * 2654435761) % KNUTH_M for k in keys}
    assert got == expect
    # small keys: identical to the un-reduced formula (back-compat with the
    # oracle SQL's documented behavior for 32-bit key spaces)
    for k in keys:
        if k + 7 < (1 << 31):
            assert expect[k] == ((k + 7) * 2654435761) % KNUTH_M
    # every intermediate fits 63 bits (the portability invariant)
    assert all((k % (1 << 31) + 7) % (1 << 31) * 2654435761 < (1 << 63) for k in keys)
    import pytest

    with pytest.raises(ValueError):
        knuth_hash("doc_id", salt=1 << 31)


def test_sample_fraction_monotone_nesting(spark):
    """With one salt, samples NEST: sample(f1) ⊆ sample(f2) for f1 < f2 —
    the property that lets a pipeline grow a corpus subset without
    reshuffling membership (hash < threshold is monotone in threshold)."""
    d = _docs(spark)
    s10 = {r.doc_id for r in deterministic_sample(d, 0.1, "doc_id").collect()}
    s30 = {r.doc_id for r in deterministic_sample(d, 0.3, "doc_id").collect()}
    s60 = {r.doc_id for r in deterministic_sample(d, 0.6, "doc_id").collect()}
    assert s10 <= s30 <= s60
    assert len(s10) < len(s30) < len(s60)


def test_hll_incremental_distinct_matches_full(spark, tmp_path):
    """Incremental accounting contract: per-increment sketches persisted to
    parquet, read back, UNIONED — the estimate must sit within HLL error
    (~2% at default lgk) of the true distinct count AND of the one-shot
    sketch over all data (union may land in a different sketch mode, so
    bit-equality is NOT guaranteed); overlapping increments must not
    double-count."""
    from pyspark.sql import functions as F

    from log_analysis_ai_spark.operators.sketches import (
        distinct_sketch,
        estimate,
        merge_sketches,
    )

    # three overlapping ingest increments over 3000 distinct ids
    incs = [spark.range(0, 1500), spark.range(1000, 2400), spark.range(2000, 3000)]
    p = str(tmp_path / "sketches")
    for i, inc in enumerate(incs):
        distinct_sketch(inc.withColumn("grp", F.pmod("id", F.lit(2))), "id", by=["grp"]) \
            .withColumn("_inc", F.lit(i)).write.mode("append").parquet(p)
    merged = estimate(merge_sketches(spark.read.parquet(p).drop("_inc"), by=["grp"]))
    got = {r.grp: r.n_distinct_est for r in merged.collect()}

    full = spark.range(0, 3000).withColumn("grp", F.pmod("id", F.lit(2)))
    oneshot = {r.grp: r.n_distinct_est for r in estimate(distinct_sketch(full, "id", by=["grp"])).collect()}
    for g in got:
        assert abs(got[g] - 1500) / 1500 < 0.02      # vs truth
        assert abs(oneshot[g] - 1500) / 1500 < 0.02  # one-shot vs truth
        assert abs(got[g] - oneshot[g]) / 1500 < 0.03  # union vs one-shot


def test_heavy_hitters_exact_vs_groupby_with_evictions(spark):
    """Zipf-ish corpus with cardinality >> width so every partition evicts:
    the two-pass Misra-Gries answer must equal the exact full groupBy,
    deterministically tie-broken."""
    import random

    from log_analysis_ai_spark.operators.sketches import heavy_hitters

    rng = random.Random(11)
    # 60 hot keys (geometric-ish weights) over a 5000-key cold tail
    rows = []
    for i in range(20000):
        if rng.random() < 0.6:
            rows.append((f"hot{rng.randint(0, 59):02d}",))
        else:
            rows.append((f"cold{rng.randint(0, 4999)}",))
    df = spark.createDataFrame(rows, "key string").repartition(8)

    got = [(r.key, r.n) for r in heavy_hitters(df, ["key"], k=10, width=200).collect()]
    want = [
        (r.key, r.n)
        for r in df.groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "key")
        .limit(10)
        .collect()
    ]
    assert got == want


def test_heavy_hitters_guard_raises_on_flat_corpus(spark):
    """Uniform corpus + tiny width: no key clears the N/(width+1)
    admission floor, so the operator must refuse rather than return a
    silently-approximate top-k."""
    import pytest as _pytest

    from log_analysis_ai_spark.operators.sketches import heavy_hitters

    rows = [(f"k{i}",) for i in range(5000)] * 2  # every key has count 2
    df = spark.createDataFrame(rows, "key string").repartition(8)
    with _pytest.raises(ValueError, match="exactness guard"):
        heavy_hitters(df, ["key"], k=10, width=16)


def test_heavy_hitters_no_eviction_short_result_is_exact(spark):
    """Fewer distinct keys than k and no evictions: returns all keys,
    exactly counted (the no-eviction branch of the guard)."""
    from log_analysis_ai_spark.operators.sketches import heavy_hitters

    df = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)], "key string"
    )
    got = [(r.key, r.n) for r in heavy_hitters(df, ["key"], k=10, width=64).collect()]
    assert got == [("a", 5), ("b", 3), ("c", 1)]


def test_heavy_hitters_return_local_false_same_answer_chainable(spark):
    """`return_local=False` hands back the verified distributed pass-2 plan:
    identical rows to the default path, chainable with further Spark ops
    (no collect→createDataFrame round-trip), guard still enforced."""
    from log_analysis_ai_spark.operators.sketches import heavy_hitters

    df = spark.createDataFrame(
        [("a",)] * 7 + [("b",)] * 5 + [("c",)] * 2 + [("d",)], "key string"
    ).repartition(4)
    local = heavy_hitters(df, ["key"], k=3, width=64)
    plan = heavy_hitters(df, ["key"], k=3, width=64, return_local=False)
    assert [tuple(r) for r in plan.collect()] == [tuple(r) for r in local.collect()]
    # chainable: a further Spark op on the returned plan works
    assert plan.filter(F.col("n") >= 5).count() == 2


def test_heavy_hitters_counts_null_keys(spark):
    """Genuine null keys are a real group (Spark groupBy semantics) and
    must survive the candidate semi-join (null-safe equality, not plain
    `=` which never matches null)."""
    from log_analysis_ai_spark.operators.sketches import heavy_hitters

    df = spark.createDataFrame(
        [(None,)] * 6 + [("a",)] * 4 + [("b",)], "key string"
    )
    got = [(r.key, r.n) for r in heavy_hitters(df, ["key"], k=2, width=64).collect()]
    assert got == [(None, 6), ("a", 4)]


def test_hash_split_partitions_disjoint_and_deterministic(spark):
    """Splits must partition the corpus (every row exactly one label),
    stay identical across parallelism, and respect band proportions."""
    from log_analysis_ai_spark.operators.sampling import hash_split

    df = spark.createDataFrame([(i,) for i in range(5000)], "id long")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r.id: r.split for r in hash_split(df, w, ["id"]).collect()}
    b = {
        r.id: r.split
        for r in hash_split(df.repartition(13), w, ["id"]).collect()
    }
    assert a == b and len(a) == 5000
    from collections import Counter

    c = Counter(a.values())
    assert set(c) == {"train", "val", "test"}
    assert 0.75 < c["train"] / 5000 < 0.85
    assert 0.07 < c["val"] / 5000 < 0.13


def test_hash_split_bad_weights_raise(spark):
    import pytest as _pytest

    from log_analysis_ai_spark.operators.sampling import hash_split

    df = spark.createDataFrame([(1,)], "id long")
    with _pytest.raises(ValueError):
        hash_split(df, {"only": 1.0}, ["id"])
    with _pytest.raises(ValueError):
        hash_split(df, {"a": -0.5, "b": 1.5}, ["id"])


def test_pack_documents_matches_bruteforce(spark):
    """Packing is a pure function: brute-force the same (hash, id) order
    and exclusive-prefix-sum rule in python and compare every assignment."""
    import random

    from log_analysis_ai_spark.operators.packing import pack_documents
    from log_analysis_ai_spark.operators.sampling import knuth_hash

    rng = random.Random(3)
    rows = [(i, rng.randint(10, 900)) for i in range(800)]
    df = spark.createDataFrame(rows, "doc_id long, tokens int")
    got = {
        r.doc_id: (r.pack_bucket, r.pack_seq, r.pack_pos)
        for r in pack_documents(
            df, "tokens", budget=2048, buckets=8,
            hash_expr=knuth_hash("doc_id"),
        ).collect()
    }
    assert len(got) == 800

    def kh(key):
        return ((key % (1 << 31)) * 2654435761) % (1 << 32)

    want = {}
    byb = {}
    for i, t in rows:
        byb.setdefault(kh(i) % 8, []).append((kh(i), i, t))
    for b, docs in byb.items():
        docs.sort()
        acc = 0
        pos = {}
        for h, i, t in docs:
            seq = acc // 2048
            want[i] = (b, seq, pos.get(seq, 0))
            pos[seq] = pos.get(seq, 0) + 1
            acc += t
    assert got == want


def test_pack_documents_invariant_to_parallelism(spark):
    from log_analysis_ai_spark.operators.packing import pack_documents

    df = spark.createDataFrame([(i, 100 + i % 50) for i in range(500)], "doc_id long, tokens int")
    a = {r.doc_id: (r.pack_bucket, r.pack_seq, r.pack_pos)
         for r in pack_documents(df, "tokens", 1024, buckets=4).collect()}
    b = {r.doc_id: (r.pack_bucket, r.pack_seq, r.pack_pos)
         for r in pack_documents(df.repartition(17), "tokens", 1024, buckets=4).collect()}
    assert a == b


def test_stratified_cap_presalt_equals_plain_on_hot_group(spark):
    """`presalt_buckets` is a LOSSLESS skew defusal: on a corpus where one
    hot group holds ~90% of rows, the two-stage (per-(group, hash mod S)
    pre-prune -> exact window) result must be row-identical to the
    single-stage window for several S, at several partition counts, and
    for both the default xxhash and the portable knuth_hash."""
    n = 4000
    d = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 != 7, F.lit("hot")).otherwise(
            F.concat(F.lit("cold_"), (F.col("id") % 3).cast("string"))
        ).alias("grp"),
    )
    for hexpr in (None, knuth_hash("doc_id")):
        plain = {
            (r.grp, r.doc_id)
            for r in stratified_cap(
                d, "grp", cap=25, key_cols="doc_id", hash_expr=hexpr
            ).collect()
        }
        for buckets in (2, 8, 64):
            for parts in (1, 13):
                salted = {
                    (r.grp, r.doc_id)
                    for r in stratified_cap(
                        d.repartition(parts),
                        "grp",
                        cap=25,
                        key_cols="doc_id",
                        hash_expr=hexpr,
                        presalt_buckets=buckets,
                    ).collect()
                }
                assert salted == plain, (buckets, parts, hexpr is None)
    # per-group counts: hot group capped, small groups survive whole
    per: dict = {}
    for g, _ in plain:
        per[g] = per.get(g, 0) + 1
    assert per["hot"] == 25
    # buckets >= group size: every row is its bucket's top-cap, stage 1
    # passes everything through and stage 2 still caps exactly
    wide = stratified_cap(
        d, "grp", cap=25, key_cols="doc_id", presalt_buckets=100000
    )
    assert wide.filter(F.col("grp") == "hot").count() == 25


def test_weighted_sample_matches_bruteforce_and_is_invariant(spark):
    """A-Res selection must equal the brute-force top-k by ln(u)/w computed
    in plain Python over the identical portable hash, and must be the same
    set at any partitioning."""
    import math

    from log_analysis_ai_spark.operators.sampling import weighted_sample

    n, k, salt = 400, 60, 11
    rows = [(i, float(1 + (i * 37) % 97)) for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, w double")

    def pri(i, w):
        h = ((i % (1 << 31) + salt) % (1 << 31)) * 2654435761 % (1 << 32)
        return math.log((h + 1) / float(1 << 32)) / w

    expect = {
        i for i, _ in sorted(rows, key=lambda r: (-pri(*r), r[0]))[:k]
    }
    for parts in (1, 13):
        got = {
            r.doc_id
            for r in weighted_sample(
                df.repartition(parts),
                k=k,
                weight_col="w",
                key_cols="doc_id",
                hash_expr=knuth_hash("doc_id", salt=salt),
                hash_range=1 << 32,
            ).collect()
        }
        assert got == expect


def test_weighted_sample_bias_drops_nonpositive_and_plans_topk(spark):
    """Heavier rows must be selected proportionally more often (averaged
    over independent salts), weight<=0 rows never selected, and the plan
    must be TakeOrderedAndProject (per-partition k-heap), not a global
    Sort."""
    from log_analysis_ai_spark.operators.sampling import weighted_sample

    df = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, 9.0).otherwise(1.0).alias("w"),
    )
    heavy = light = 0
    for salt in range(8):
        sel = weighted_sample(df, k=80, weight_col="w", key_cols="doc_id", salt=salt)
        got = [r.doc_id for r in sel.collect()]
        assert len(got) == 80
        heavy += sum(1 for i in got if i % 2 == 0)
        light += sum(1 for i in got if i % 2 == 1)
    # E[heavy share] >> 1/2; with w-ratio 9 the A-Res expectation is ~0.8+
    assert heavy > 2.5 * light, (heavy, light)
    # weight <= 0 dropped even when k exceeds the positive population
    withzero = df.withColumn(
        "w", F.when(F.col("doc_id") < 390, F.col("w")).otherwise(F.lit(0.0))
    )
    got = weighted_sample(withzero, k=400, weight_col="w", key_cols="doc_id").collect()
    assert len(got) == 390 and all(r.doc_id < 390 for r in got)
    plan = weighted_sample(
        df, k=10, weight_col="w", key_cols="doc_id"
    )._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_chunk_documents_exact_cases_and_coverage(spark):
    """Handcrafted boundary cases: <=window one chunk, exact-window one
    chunk, window+1 two chunks, double spaces preserved (empty tokens are
    real tokens), empty/NULL text one empty chunk; and on a longer doc the
    stride-aligned chunks cover every token with the documented count."""
    from log_analysis_ai_spark.operators.packing import chunk_documents

    docs = [
        (0, "a b c"),                      # 3 toks <= window
        (1, "t0 t1 t2 t3"),                # exactly window
        (2, "t0 t1 t2 t3 t4"),             # window+1 -> 2 chunks
        (3, "a  b"),                       # double space: 3 tokens a,'',b
        (4, ""),
        (5, None),
        (6, " ".join(f"w{i}" for i in range(11))),  # 11 toks
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        (r.doc_id, r.chunk_idx): (r.chunk_text, r.n_tokens)
        for r in chunk_documents(df, "text", window=4, stride=3).collect()
    }
    assert out[(0, 0)] == ("a b c", 3)
    assert out[(1, 0)] == ("t0 t1 t2 t3", 4)
    assert sum(1 for k in out if k[0] == 1) == 1
    assert out[(2, 0)] == ("t0 t1 t2 t3", 4)
    assert out[(2, 1)] == ("t3 t4", 2)
    assert out[(3, 0)] == ("a  b", 3)
    assert out[(4, 0)] == ("", 1)
    assert out[(5, 0)] == ("", 1)
    # 11 tokens, window 4, stride 3: ceil((11-4)/3)+1 = 4 chunks at 0,3,6,9
    elevens = sorted(k[1] for k in out if k[0] == 6)
    assert elevens == [0, 1, 2, 3]
    assert out[(6, 3)] == ("w9 w10", 2)
    covered = set()
    for (d, j), (_, nt) in out.items():
        if d == 6:
            covered.update(range(j * 3, j * 3 + nt))
    assert covered == set(range(11))


def test_chunk_documents_narrow_plan_and_validation(spark):
    """Chunking must stay shuffle-free (no Exchange in the executed plan)
    and reject nonsensical window/stride."""
    import pytest

    from log_analysis_ai_spark.operators.packing import chunk_documents

    df = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok "), F.col("id").cast("string")).alias("text"),
    )
    plan = (
        chunk_documents(df, "text", window=8, stride=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    with pytest.raises(ValueError):
        chunk_documents(df, "text", window=0)
    with pytest.raises(ValueError):
        chunk_documents(df, "text", window=8, stride=9)
    with pytest.raises(ValueError):
        chunk_documents(df, "text", window=8, stride=0)


def test_token_budget_sample_matches_bruteforce(spark):
    """Single-stage result must equal the brute-force prefix rule computed
    in plain Python over the portable knuth hash: per group, order rows by
    (hash, key) and keep while the inclusive running weight <= budget."""
    from log_analysis_ai_spark.operators.sampling import token_budget_sample

    rows = [(i, f"g{i % 3}", (i * 7) % 13 + 1) for i in range(300)]
    d = spark.createDataFrame(rows, "doc_id long, grp string, w long")

    def kh(k):
        return ((k % (1 << 31)) % (1 << 31)) * 2654435761 % (1 << 32)

    budget = 120
    expected = set()
    for g in {"g0", "g1", "g2"}:
        cum = 0
        for i, grp, w in sorted(
            (r for r in rows if r[1] == g), key=lambda r: (kh(r[0]), r[0])
        ):
            cum += w
            if cum <= budget:
                expected.add((g, i))
            else:
                break
    got = {
        (r.grp, r.doc_id)
        for r in token_budget_sample(
            d, "grp", budget, "w", "doc_id", hash_expr=knuth_hash("doc_id")
        ).collect()
    }
    assert got == expected and 0 < len(got) < 300


def test_token_budget_bucketed_equals_plain_on_hot_group(spark):
    """cutoff_buckets is a LOSSLESS skew defusal: on a 90%-one-group corpus
    the two-pass (bucket totals -> driver cutoff -> per-(group, bucket)
    window) result must be row-identical to the single-window result for
    several S, partition counts, and both hash families."""
    from log_analysis_ai_spark.operators.sampling import KNUTH_M, token_budget_sample

    n = 4000
    d = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 != 7, F.lit("hot"))
        .otherwise(F.concat(F.lit("cold_"), (F.col("id") % 3).cast("string")))
        .alias("grp"),
        ((F.col("id") * 11) % 17 + 1).alias("w"),
    )
    for hexpr, hrange in ((None, 1 << 62), (knuth_hash("doc_id"), KNUTH_M)):
        plain = {
            (r.grp, r.doc_id)
            for r in token_budget_sample(
                d, "grp", 900, "w", "doc_id", hash_expr=hexpr, hash_range=hrange
            ).collect()
        }
        assert 0 < len(plain) < n
        for buckets in (2, 8, 64, 100000):
            for parts in (1, 13):
                got = {
                    (r.grp, r.doc_id)
                    for r in token_budget_sample(
                        d.repartition(parts),
                        "grp",
                        900,
                        "w",
                        "doc_id",
                        hash_expr=hexpr,
                        hash_range=hrange,
                        cutoff_buckets=buckets,
                    ).collect()
                }
                assert got == plain, (buckets, parts, hexpr is None)


def test_token_budget_edges_and_weight_contract(spark):
    """budget=0 -> empty; a group whose total fits -> kept whole; a first
    row alone exceeding the budget empties its group (strict prefix rule:
    the running total is over ALL rows in hash order, never 'skip the big
    one'); NULL or negative weight fails fast."""
    import pytest
    from pyspark.sql.utils import CapturedException

    from log_analysis_ai_spark.operators.sampling import token_budget_sample

    d = spark.createDataFrame(
        [(1, "a", 5), (2, "a", 5), (3, "b", 1000)], "doc_id long, grp string, w long"
    )
    assert token_budget_sample(d, "grp", 0, "w", "doc_id").count() == 0
    kept = {
        (r.grp, r.doc_id)
        for r in token_budget_sample(
            d, "grp", 10, "w", "doc_id", hash_expr=knuth_hash("doc_id")
        ).collect()
    }
    # group a fits entirely (5+5 <= 10); group b's only row exceeds -> empty
    assert kept == {("a", 1), ("a", 2)}
    bad = spark.createDataFrame(
        [(1, "a", None)], "doc_id long, grp string, w long"
    )
    with pytest.raises((CapturedException, Exception), match="non-null"):
        token_budget_sample(bad, "grp", 10, "w", "doc_id").collect()
    neg = spark.createDataFrame([(1, "a", -1)], "doc_id long, grp string, w long")
    with pytest.raises((CapturedException, Exception), match="non-null"):
        token_budget_sample(neg, "grp", 10, "w", "doc_id").collect()


def test_token_budget_bucketed_plan_shape(spark):
    """The defused plan must show (a) the pass-2 window partitioned by
    (group, bucket) — S-way parallel per group, never group-only — and
    (b) the driver cutoff table joined by BROADCAST (it is G×S rows);
    no CartesianProduct anywhere."""
    from log_analysis_ai_spark.operators.sampling import token_budget_sample

    d = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("g"), (F.col("id") % 3).cast("string")).alias("grp"),
        ((F.col("id") * 3) % 11 + 1).alias("w"),
    )
    out = token_budget_sample(d, "grp", 200, "w", "doc_id", cutoff_buckets=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    # the window's partition spec carries the bucket column _b
    win_lines = [ln for ln in plan.splitlines() if "Window" in ln]
    assert any("_b" in ln for ln in win_lines), win_lines
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_upsample_by_weight_matches_bruteforce(spark):
    """Copy counts must equal the brute-force rule floor(w) + [hash <
    frac(w)·range] computed in Python over the portable knuth hash;
    integer weights give exactly w copies independent of hash; w <= 0
    rows vanish; copy indices are dense 0..n-1."""
    from log_analysis_ai_spark.operators.sampling import (
        KNUTH_M,
        knuth_hash,
        upsample_by_weight,
    )

    rows = [(i, [0.0, 0.4, 1.0, 1.5, 2.0, 3.7, -1.0][i % 7]) for i in range(140)]
    d = spark.createDataFrame(rows, "doc_id long, w double")
    got: dict = {}
    out = upsample_by_weight(
        d, F.col("w"), "doc_id", hash_expr=knuth_hash("doc_id", salt=3),
        hash_range=KNUTH_M,
    ).collect()
    for r in out:
        got.setdefault(r.doc_id, []).append(r.copy_idx)

    def kh(k, salt):
        return ((k % (1 << 31) + salt) % (1 << 31)) * 2654435761 % (1 << 32)

    import math

    for i, w in rows:
        n = int(math.floor(w)) + (1 if kh(i, 3) < (w - math.floor(w)) * KNUTH_M else 0) if w > 0 else (
            int(math.floor(w)) + (1 if kh(i, 3) < (w - math.floor(w)) * KNUTH_M else 0)
        )
        n = max(n, 0)
        if n == 0:
            assert i not in got, i
        else:
            assert sorted(got[i]) == list(range(n)), (i, w)
    # integer weights: exactly w copies for every row with that weight
    assert all(sorted(got[i]) == [0] for i, w in rows if w == 1.0)
    assert all(sorted(got[i]) == [0, 1] for i, w in rows if w == 2.0)


def test_upsample_plan_narrow_invariant_and_guards(spark):
    import pytest as _pytest

    from log_analysis_ai_spark.operators.sampling import upsample_by_weight

    d = spark.range(100).select(
        F.col("id").alias("doc_id"), (1.0 + (F.col("id") % 3) / 2.0).alias("w")
    )
    out = upsample_by_weight(d, F.col("w"), "doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Generate" in plan
    a = {(r.doc_id, r.copy_idx) for r in out.collect()}
    b = {
        (r.doc_id, r.copy_idx)
        for r in upsample_by_weight(d.repartition(9), F.col("w"), "doc_id").collect()
    }
    assert a == b and len(a) > 100
    with _pytest.raises(Exception, match="non-null"):
        upsample_by_weight(
            spark.createDataFrame([(1, None)], "doc_id long, w double"),
            F.col("w"), "doc_id",
        ).collect()
    with _pytest.raises(Exception, match="<="):
        upsample_by_weight(d, F.lit(1e9), "doc_id").collect()
