"""BPE trainer/encoder: merge learning must equal a from-scratch reference
on the Sennrich example, the distributed word count must feed it exactly,
and greedy rank-order encoding must reproduce training segmentations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from log_analysis_ai_spark.operators.bpe import (
    END_OF_WORD,
    _encode_word,
    bpe_encode,
    learn_merges,
    train_bpe,
    word_frequencies,
)


def _reference_bpe(word_freq, num_merges):
    """Independent reimplementation (dict-of-tuples, recount from scratch
    each round) for parity — deliberately written differently from
    learn_merges."""
    vocab = {tuple(w) + (END_OF_WORD,): f for w, f in word_freq}
    out = []
    for _ in range(num_merges):
        pc = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] = pc.get((syms[i], syms[i + 1]), 0) + f
        if not pc or max(pc.values()) < 2:
            break
        top = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        out.append(top)
        nv = {}
        for syms, f in vocab.items():
            s = list(syms)
            j = 0
            r = []
            while j < len(s):
                if j < len(s) - 1 and (s[j], s[j + 1]) == top:
                    r.append(s[j] + s[j + 1])
                    j += 2
                else:
                    r.append(s[j])
                    j += 1
            nv[tuple(r)] = nv.get(tuple(r), 0) + f
        vocab = nv
    return out


SENNRICH = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_learn_merges_matches_reference_on_sennrich_example():
    got = learn_merges(SENNRICH, 10)
    ref = _reference_bpe(SENNRICH, 10)
    assert got == ref
    # the famous first merges: ('e','s') then ('es','t') then ('est','</w>')
    assert got[0] == ("e", "s") and got[1] == ("es", "t")
    assert ("est", END_OF_WORD) in got[:3]


def test_train_bpe_spark_count_equals_local_and_stops_early(spark):
    corpus = ["low low low low low lower lower", "newest newest newest newest",
              "newest newest widest widest widest"]
    d = spark.createDataFrame([(i, t) for i, t in enumerate(corpus)],
                              "doc_id long, text string")
    wf = {(r.word, r.freq) for r in word_frequencies(d).collect()}
    assert wf == {("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)}
    merges = train_bpe(d, num_merges=500)
    assert merges == _reference_bpe(SENNRICH, 500)
    # early stop: asking for 500 merges must terminate (no pair twice)
    assert len(merges) < 60


def test_encode_reproduces_training_segmentation_and_handles_edges(spark):
    merges = learn_merges(SENNRICH, 8)
    ranks = {p: i for i, p in enumerate(merges)}
    # applying merges IN LEARNED ORDER == greedy lowest-rank encode
    for w, _ in SENNRICH:
        syms = list(w) + [END_OF_WORD]
        for a, b in merges:
            j = 0
            while j < len(syms) - 1:
                if syms[j] == a and syms[j + 1] == b:
                    syms[j : j + 2] = [a + b]
                else:
                    j += 1
        assert _encode_word(w, ranks) == syms, w
    d = spark.createDataFrame(
        [(1, "low lower newest"), (2, "unseen zzz"), (3, None), (4, "")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.bpe_tokens for r in bpe_encode(d, merges).collect()}
    assert got[1] == (_encode_word("low", ranks) + _encode_word("lower", ranks)
                      + _encode_word("newest", ranks))
    # unseen words fall back to chars+sentinel (merges don't apply)
    assert got[2][-1] == END_OF_WORD and "z" in got[2]
    assert got[3] is None
    assert got[4] == []


def test_bpe_invariant_to_parallelism(spark):
    d = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok"), (F.col("id") % 11).cast("string"),
                 F.lit(" shared words here")).alias("text"),
    )
    m1 = train_bpe(d, num_merges=30)
    m2 = train_bpe(d.repartition(13), num_merges=30)
    assert m1 == m2 and len(m1) > 0
    e1 = {(r.doc_id, tuple(r.bpe_tokens)) for r in bpe_encode(d, m1).collect()}
    e2 = {(r.doc_id, tuple(r.bpe_tokens))
          for r in bpe_encode(d.repartition(7), m1).collect()}
    assert e1 == e2
