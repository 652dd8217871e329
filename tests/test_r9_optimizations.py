"""Focused pins for the r9 optimization round: every test here guards an
internals-only rewrite whose OUTPUT must be identical to the r8 behavior
(the driver's oracle gate re-proves the entry queries; these pin the
operator-level equivalences directly)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _docs(spark, n=60):
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
    rows = [
        (i, " ".join(words[(i + j) % len(words)] for j in range(10 + i % 5)))
        for i in range(n)
    ]
    # plant exact near-dup structure: clones of the first 10 docs
    rows += [(1000 + i, rows[i][1]) for i in range(10)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_banded_from_shingle_arrays_is_identical(spark):
    """The r9 shared shingle-array path must produce the BIT-IDENTICAL
    banded signature table: the signature folds over the same raw array
    values the inline expression produced, so (band, bucket) rows match
    row-for-row — which is what guarantees the candidate set (and hence
    the verified near-dup output) is unchanged by the rewrite. (The RAW
    array — not the distinct set — is load-bearing: the signature fold is
    position-sensitive, see minhash_signature's defect note.)"""
    from log_analysis_ai_spark.operators.dedup import minhash_banded, shingle_arrays

    d = _docs(spark)
    direct = {tuple(r) for r in minhash_banded(d).collect()}
    shared = {
        tuple(r)
        for r in minhash_banded(d, sets=shingle_arrays(d)).collect()
    }
    assert direct == shared and len(direct) > 0


def test_minhash_near_dups_finds_planted_clones_via_shared_sets(spark):
    """End-to-end through the single-scan path: planted exact clones must
    verify at jaccard == 1.0 (threshold 1 ⇒ LSH recall provably 1)."""
    from log_analysis_ai_spark.operators.dedup import minhash_near_dups

    d = _docs(spark)
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_near_dups(d, threshold=1.0).collect()
    }
    for i in range(10):
        assert pairs.get((i, 1000 + i)) == 1.0


def test_substring_dedup_rolling_hash_plan_and_whitespace_windows(spark):
    """The r9 window stream is ONE Arrow pass (MapInPandas in the plan —
    the per-position concat_ws+xxhash64 HOF chain is gone), and the
    rolling hash must still group windows by TOKEN-SEQUENCE equality:
    occurrences differing only in whitespace runs dedup as one window."""
    from log_analysis_ai_spark.operators.dedup import substring_dedup

    run = "one two three four five"
    df = spark.createDataFrame(
        [
            (0, f"doc zero opens {run} tail a"),
            (1, f"doc one starts  {run.replace(' ', '  ')}  tail b"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in substring_dedup(df, window_tokens=5).collect()}
    assert out[0].n_removed_tokens == 0
    # the duplicated windows slide into the shared trailing "tail" token
    # ("two three four five tail" also repeats), so 6 tokens go, exactly
    # as the token-sequence rule dictates
    assert out[1].n_removed_tokens == 6
    assert out[1].clean_text == "doc one starts b"
    plan = (
        substring_dedup(df, window_tokens=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in plan


def test_grouped_topk_folds_batches_incrementally(spark):
    """Phase 1 now folds Arrow batch by batch; with a tiny batch size the
    fold runs many times per partition and must still equal the one-shot
    window answer (top-k selection is associative over unions)."""
    from log_analysis_ai_spark.operators.topk import grouped_topk

    rows = [(f"g{i % 3}", (i * 37) % 101, i) for i in range(400)]
    df = spark.createDataFrame(rows, "g string, v int, id long").repartition(2)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        got = {
            (r.g, r.rk): (r.v, r.id)
            for r in grouped_topk(df, "g", "v", 5, tie_cols="id").collect()
        }
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    pdf = pd.DataFrame(rows, columns=["g", "v", "id"])
    want = (
        pdf.sort_values(["v", "id"], ascending=[False, True], kind="mergesort")
        .groupby("g", sort=False)
        .head(5)
    )
    for g, grp in want.groupby("g"):
        for rk, (_, row) in enumerate(grp.iterrows(), start=1):
            assert got[(g, rk)] == (row.v, row.id)


def test_simhash_batch_fold_bit_equal_to_rowwise(spark):
    """The r9 batch-vectorized SimHash fold must be BIT-EQUAL to the r8
    per-row fold (replicated here verbatim) on mixed-length docs including
    empty and None token lists."""
    import numpy as np

    from log_analysis_ai_spark.operators.dedup import simhash_docs

    texts = [
        (0, "alpha beta gamma"),
        (1, "alpha beta gamma"),
        (2, "one"),
        (3, ""),
        (4, "a much longer text with many more tokens in it than the others"),
        (5, None),
        # > 255 occurrences of a bit — guards the reduction's accumulator
        # dtype (a uint8 reduceat would wrap at 256 set bits per doc)
        (6, " ".join(f"tok{i % 7}" for i in range(600))),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r.doc_id: r.simhash for r in simhash_docs(df).collect()}

    from log_analysis_ai_spark.hashing import xxh64

    def rowwise(text):
        if text is None:
            toks = [None]
        else:
            import re

            toks = re.split(" +", text.lower())
        hs = [xxh64(t) for t in toks if t is not None]
        if not hs:
            return 0
        arr = np.asarray(hs, dtype=np.int64).astype(np.uint64)
        bits = ((arr[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
        acc = (2 * bits - 1).sum(axis=0)
        return int(np.packbits(acc > 0, bitorder="little").view(np.uint64)[0].astype(np.int64))

    for doc_id, text in texts:
        if text is None:
            continue  # split(NULL) yields no hash array either way
        assert got[doc_id] == rowwise(text), doc_id
    assert got[0] == got[1]


def test_nb_score_survives_caller_prior_and_evidence_columns(spark):
    """ADVICE r8: internal join columns are now collision-safe — a caller
    whose frame already has `prior` / `_evidence` columns must score
    without an ambiguous-reference analysis error and keep its columns."""
    from log_analysis_ai_spark.operators.classify import nb_score, train_nb

    labeled = spark.createDataFrame(
        [(0, "good clean prose", True), (1, "spam spam spam", False)],
        "doc_id long, text string, label boolean",
    )
    weights, stats = train_nb(labeled)
    df = labeled.withColumn("prior", F.lit(9.9)).withColumn("_evidence", F.lit(7.7))
    out = nb_score(df, weights, stats).collect()
    assert {r.prior for r in out} == {9.9}
    assert {r._evidence for r in out} == {7.7}
    assert all(r.nb_score is not None for r in out)


def test_corpus_datacard_null_texts_excluded_from_distinct(spark):
    """ADVICE r8: distinct_texts now follows count(DISTINCT text) SQL
    semantics — NULL texts are not a distinct 'text'; a group of only
    NULLs still appears with distinct_texts = 0."""
    from log_analysis_ai_spark.functions.text import corpus_datacard

    df = spark.createDataFrame(
        [
            ("a", "x y", "en"),
            ("a", "x y", "en"),
            ("a", None, "en"),
            ("b", None, "en"),
        ],
        "source string, text string, lang string",
    )
    out = {r.source: r.distinct_texts for r in corpus_datacard(df).collect()}
    assert out == {"a": 1, "b": 0}


def test_queries_registry_has_no_dead_duplicate_keys():
    """ADVICE r8: the registry source must define each query name exactly
    once (a duplicate dict literal key silently keeps first-position/
    last-value)."""
    import ast
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")
    tree = ast.parse(open(path).read())
    fn = next(
        n for n in tree.body if isinstance(n, ast.FunctionDef) and n.name == "queries"
    )
    dicts = [n for n in ast.walk(fn) if isinstance(n, ast.Dict)]
    keys = [k.value for d in dicts for k in d.keys if isinstance(k, ast.Constant)]
    assert len(keys) == len(set(keys)), sorted(
        k for k in set(keys) if keys.count(k) > 1
    )


def test_token_budget_bucketed_path_still_matches_unsalted(spark):
    """The r9 compute_once materialization in the bucketed path must not
    change selection: bucketed == unsalted window on the same input."""
    from log_analysis_ai_spark.operators.sampling import (
        KNUTH_M,
        knuth_hash,
        token_budget_sample,
    )

    rows = [(i, f"s{i % 3}", 5 + i % 7) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    kw = dict(hash_expr=knuth_hash("doc_id"), hash_range=KNUTH_M)
    plain = {
        r.doc_id
        for r in token_budget_sample(df, "source", 200, "n_tokens", "doc_id", **kw).collect()
    }
    bucketed = {
        r.doc_id
        for r in token_budget_sample(
            df, "source", 200, "n_tokens", "doc_id", cutoff_buckets=8, **kw
        ).collect()
    }
    assert plain == bucketed and len(plain) > 0
