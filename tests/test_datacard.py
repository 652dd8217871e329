"""corpus_datacard: brute-force metric parity on a hand corpus with
duplicate texts, empty strings, and a mixed-language group; plan shape
(no window, partial aggregation, UDF-free)."""

from __future__ import annotations

import pytest

from log_analysis_ai_spark.functions.text import corpus_datacard

ROWS = [
    (0, "a b c", "en", "s1"),
    (1, "a b c", "en", "s1"),      # exact duplicate text
    (2, "d e", "de", "s1"),
    (3, "", "en", "s1"),           # empty text -> 1 ws token (split convention)
    (4, "x y z w", "fr", "s2"),
    (5, "x", "en", "s2"),
]


def test_datacard_matches_bruteforce(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string, lang string, source string")
    got = {r.source: r.asDict() for r in corpus_datacard(df).collect()}
    # s1: texts 'a b c','a b c','d e','' -> tokens 3,3,2,1
    s1 = got["s1"]
    assert s1["n_docs"] == 4 and s1["total_tokens"] == 9
    assert s1["avg_tokens"] == pytest.approx(9 / 4)
    assert s1["avg_chars"] == pytest.approx((5 + 5 + 3 + 0) / 4)
    assert s1["n_langs"] == 2 and s1["pct_en"] == pytest.approx(0.75)
    assert s1["distinct_texts"] == 3
    s2 = got["s2"]
    assert s2["n_docs"] == 2 and s2["total_tokens"] == 5
    assert s2["distinct_texts"] == 2 and s2["pct_en"] == pytest.approx(0.5)
    plan = corpus_datacard(df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial" in plan.lower()  # map-side combine present
