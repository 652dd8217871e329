"""NB classifier: closed-form weights must equal a from-scratch reference,
scoring must handle unseen/empty/NULL text, the self-trained bootstrap must
actually separate the classes it was weak-labeled with, and everything must
be invariant to parallelism."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from log_analysis_ai_spark.operators.classify import nb_classify, nb_score, train_nb

DOCS = [
    (0, "spark shuffle join agg", True),
    (1, "spark scan filter spark", True),
    (2, "le chat noir dort", False),
    (3, "le chien mange le chat", False),
    (4, "spark join le", True),
]


def _reference_nb(docs, alpha=1.0):
    """Independent dict-based reimplementation of the closed form."""
    cp: dict[str, int] = {}
    cn: dict[str, int] = {}
    dp = dn = 0
    for _, text, pos in docs:
        if pos:
            dp += 1
        else:
            dn += 1
        for w in text.split():
            if not w:
                continue
            (cp if pos else cn)[w] = (cp if pos else cn).get(w, 0) + 1
    vocab = set(cp) | set(cn)
    V, Np, Nn = len(vocab), sum(cp.values()), sum(cn.values())
    weights = {
        w: math.log((cp.get(w, 0) + alpha) / (Np + alpha * V))
        - math.log((cn.get(w, 0) + alpha) / (Nn + alpha * V))
        for w in vocab
    }
    w_unseen = math.log(alpha / (Np + alpha * V)) - math.log(alpha / (Nn + alpha * V))
    prior = math.log(dp) - math.log(dn)
    return weights, w_unseen, prior


def _df(spark, docs=DOCS):
    return spark.createDataFrame(docs, "doc_id long, text string, label boolean")


def test_weights_match_reference(spark):
    weights, stats = train_nb(_df(spark))
    ref_w, ref_unseen, ref_prior = _reference_nb(DOCS)
    got = {r.word: r.w for r in weights.collect()}
    assert set(got) == set(ref_w)
    for w in ref_w:
        assert got[w] == pytest.approx(ref_w[w], rel=1e-12), w
    s = stats.collect()[0]
    assert s.prior == pytest.approx(ref_prior, rel=1e-12)
    assert s.w_unseen == pytest.approx(ref_unseen, rel=1e-12)
    assert (s.n_pos_docs, s.n_neg_docs) == (3, 2)


def test_scores_match_reference_and_edge_rows(spark):
    weights, stats = train_nb(_df(spark))
    ref_w, ref_unseen, ref_prior = _reference_nb(DOCS)
    score_df = spark.createDataFrame(
        [
            (10, "spark spark join"),       # all in-vocab, positive-ish
            (11, "le chat"),                # negative-ish
            (12, "quantum entanglement"),   # all unseen -> 2 * w_unseen
            (13, ""),                       # no tokens -> prior only
            (14, None),                     # NULL text -> prior only
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.nb_score, r.nb_score_pred)
           for r in nb_score(score_df, weights, stats).collect()}

    def ref_score(text):
        if not text:
            return ref_prior
        return ref_prior + sum(ref_w.get(w, ref_unseen) for w in text.split())

    assert got[10][0] == pytest.approx(ref_score("spark spark join"), rel=1e-12)
    assert got[11][0] == pytest.approx(ref_score("le chat"), rel=1e-12)
    assert got[12][0] == pytest.approx(ref_prior + 2 * ref_unseen, rel=1e-12)
    assert got[13][0] == pytest.approx(ref_prior, rel=1e-12)
    assert got[14][0] == pytest.approx(ref_prior, rel=1e-12)
    assert got[10][1] is True and got[11][1] is False


def test_self_trained_bootstrap_separates_and_scores_unlabeled(spark):
    rows = DOCS + [(5, "spark agg shuffle", None)]  # unlabeled row still scored
    d = spark.createDataFrame(rows, "doc_id long, text string, label boolean")
    out = {r.doc_id: r.nb_score_pred for r in nb_classify(d).collect()}
    assert out[0] and out[1] and out[4] and out[5]
    assert not out[2] and not out[3]


def test_one_class_corpus_raises(spark):
    d = spark.createDataFrame(
        [(0, "a b", True), (1, "c d", True)], "doc_id long, text string, label boolean"
    )
    with pytest.raises(ValueError, match="both classes"):
        train_nb(d)
    with pytest.raises(ValueError, match="alpha"):
        train_nb(_df(spark), alpha=0.0)


def test_invariant_to_parallelism(spark):
    d = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, F.concat(F.lit("alpha beta tok"), (F.col("id") % 7).cast("string")))
        .otherwise(F.concat(F.lit("gamma delta tok"), (F.col("id") % 5).cast("string")))
        .alias("text"),
        (F.col("id") % 3 == 0).alias("label"),
    )
    r1 = {(r.doc_id, round(r.nb_score, 9), r.nb_score_pred)
          for r in nb_classify(d).collect()}
    r2 = {(r.doc_id, round(r.nb_score, 9), r.nb_score_pred)
          for r in nb_classify(d.repartition(13)).collect()}
    assert r1 == r2 and len(r1) == 400


def test_plan_shape_jvm_only_partial_aggs(spark):
    out = nb_classify(_df(spark))
    plan = out._jdf.queryExecution().executedPlan().toString()
    # JVM end to end: no Python eval, no window over any hot key; the
    # vocab and evidence aggregations must partial-aggregate (map-side
    # combine absorbs stopwords / long docs)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" not in plan
    assert "partial" in plan.lower()
