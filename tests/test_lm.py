"""Bigram LM quality scoring (CCNet-style): estimates must equal the
brute-force Lidstone arithmetic, NULLs survive, frozen-model scoring backs
off as documented, and the plan stays JVM-side."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from log_analysis_ai_spark.operators.lm import (
    BOS,
    bigram_lm_score,
    lm_perplexity,
    train_bigram_lm,
    vocab_size,
)

ALPHA = 0.5


def _brute(corpus: dict[int, str], score_docs: dict[int, str] | None = None):
    """Plain-Python Lidstone bigram scores; `score_docs` defaults to the
    training corpus (self-trained); unseen bigrams take the flat cb=cu=0
    backoff exactly as documented."""
    cb: dict = {}
    cu: dict = {}
    for text in corpus.values():
        toks = [BOS] + text.split(" ")
        for a, b in zip(toks, toks[1:]):
            cb[(a, b)] = cb.get((a, b), 0) + 1
            cu[a] = cu.get(a, 0) + 1
    V = len({b for (_, b) in cb})
    out = {}
    for doc_id, text in (score_docs or corpus).items():
        toks = [BOS] + text.split(" ")
        nll = [
            -math.log(
                (cb.get((a, b), 0) + ALPHA)
                / ((cu.get(a, 0) if (a, b) in cb else 0) + ALPHA * V)
            )
            for a, b in zip(toks, toks[1:])
        ]
        ce = sum(nll) / len(nll)
        out[doc_id] = (ce, math.exp(ce))
    return out


def test_lm_perplexity_matches_bruteforce_and_orders_quality(spark):
    corpus = {
        1: "the cat sat on the mat",
        2: "the dog sat on the mat",
        3: "the cat sat on the mat",  # exact repeat: most predictable
        4: "zx qq vv kk pp ww",  # gibberish: least predictable
    }
    d = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    got = {
        r.doc_id: (r.lm_cross_entropy, r.lm_perplexity)
        for r in lm_perplexity(d).collect()
    }
    exp = _brute(corpus)
    for k in corpus:
        assert got[k][0] == pytest.approx(exp[k][0], abs=1e-9), k
        assert got[k][1] == pytest.approx(exp[k][1], rel=1e-9), k
    # the quality signal: gibberish ranks strictly worse than the repeats
    assert got[4][1] > got[1][1] and got[1][1] == pytest.approx(got[3][1])


def test_lm_frozen_model_backoff_and_nulls(spark):
    """Score a NEW batch against a persisted model: seen bigrams use the
    frozen counts, unseen ones take the flat 1/V backoff; NULL-text rows
    keep NULL scores; model vocab matches brute force."""
    corpus = {1: "a b a b", 2: "a b c"}
    train = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    model = train_bigram_lm(train)
    assert vocab_size(model).collect()[0].V == 3  # {a, b, c}
    batch = {10: "a b", 11: "q z"}
    new = spark.createDataFrame(
        list(batch.items()) + [(12, None)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.lm_cross_entropy, r.lm_perplexity)
        for r in bigram_lm_score(new, model).collect()
    }
    exp = _brute(corpus, batch)
    for k in batch:
        assert got[k][0] == pytest.approx(exp[k][0], abs=1e-9), k
    # every bigram of doc 11 is unseen -> exact flat backoff mean(-ln(α/(αV)))
    assert got[11][0] == pytest.approx(-math.log(ALPHA / (ALPHA * 3)))
    assert got[12] == (None, None)
    with pytest.raises(ValueError, match="alpha"):
        bigram_lm_score(new, model, alpha=0.0)


def test_lm_plan_stays_jvm_and_invariant_to_parallelism(spark):
    d = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("tok"), (F.col("id") % 7).cast("string"), F.lit(" mid "),
            F.lit("tok"), (F.col("id") % 3).cast("string"),
        ).alias("text"),
    )
    out = lm_perplexity(d)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan
    base = {(r.doc_id, round(r.lm_cross_entropy, 9)) for r in out.collect()}
    again = {
        (r.doc_id, round(r.lm_cross_entropy, 9))
        for r in lm_perplexity(d.repartition(13)).collect()
    }
    assert base == again and len(base) == 200
