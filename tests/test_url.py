"""URL canonicalization/blocklist/dedup: rule-by-rule unit cases, a
per-row DuckDB replay of the canonicalizer (the oracle convention),
subdomain blocking, keep-min dedup, narrow-plan pin, and parallelism
invariance."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from log_analysis_ai_spark.functions.url import (
    TRACKING_PARAM_PATTERN,
    canonicalize_url,
    url_blocklist_filter,
    url_dedup,
    url_domain,
)

CASES = [
    # (input, canonical)
    ("HTTPS://WWW.Example.COM:443/Path/Pg?id=1&utm_source=x#frag",
     "https://example.com/Path/Pg?id=1"),
    ("http://Example.com:80/a", "http://example.com/a"),
    ("https://example.com:8443/a", "https://example.com:8443/a"),  # non-default port kept
    ("https://example.com/a?utm_a=1&utm_b=2", "https://example.com/a"),
    ("https://example.com/a?gclid=9&id=2", "https://example.com/a?id=2"),
    ("https://example.com/a?id=2&fbclid=9", "https://example.com/a?id=2"),
    ("https://example.com/a?id=1&msclkid=x&ref=keep", "https://example.com/a?id=1&ref=keep"),
    ("https://sub.www.example.com/a", "https://sub.www.example.com/a"),  # only LEADING www.
    ("https://www.example.com", "https://example.com"),
    ("https://example.com/CaseKept/Q?X=Y", "https://example.com/CaseKept/Q?X=Y"),
]


def test_canonicalize_cases_and_duckdb_replay(spark):
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(CASES)], "i long, url string")
    got = {r.i: r.c for r in df.select("i", canonicalize_url("url").alias("c")).collect()}
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, CASES[i]
    # DuckDB replay of the identical step chain (the oracle's arithmetic)
    for u, want in CASES:
        (dd,) = duckdb.sql(
            f"""
            WITH s1 AS (SELECT regexp_replace(?, '#.*', '', 'g') AS u),
            s2 AS (SELECT lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) AS scheme,
                          regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.\\-]*://', '') AS rest FROM s1),
            s3 AS (SELECT scheme, regexp_extract(rest, '^([^/?]*)', 1) AS hostport,
                          regexp_replace(rest, '^[^/?]*', '') AS pathq FROM s2),
            s4 AS (SELECT scheme,
                          regexp_replace(regexp_replace(lower(hostport), ':(443|80)$', ''), '^www\\.', '') AS host,
                          regexp_extract(pathq, '^([^?]*)', 1) AS path,
                          regexp_replace(regexp_replace(
                            regexp_extract(pathq, '^[^?]*\\?(.*)', 1),
                            '&{TRACKING_PARAM_PATTERN}=[^&]*', '', 'g'),
                            '^{TRACKING_PARAM_PATTERN}=[^&]*&?', '') AS q
                   FROM s3)
            SELECT scheme || '://' || host || path ||
                   CASE WHEN q <> '' THEN '?' || q ELSE '' END FROM s4
            """,
            params=[u],
        ).fetchone()
        assert dd == want, u


def test_domain_blocklist_and_subdomain_block(spark):
    rows = [
        (0, "https://ads.spam-tracker.com/click?id=7"),
        (1, "https://www.good-site.com/a"),
        (2, "http://Spam-Tracker.com:80/x"),
        (3, "https://spam-tracker.com.evil-but-not-blocked.org/y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = url_blocklist_filter(df)
    got = {r.doc_id: (r.url_canon, r.domain) for r in out.collect()}
    assert set(got) == {1, 3}
    assert got[1] == ("https://good-site.com/a", "good-site.com")
    assert got[3][1] == "evil-but-not-blocked.org"
    # blocklist join must be a broadcast anti join, canonicalizer UDF-free
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_url_dedup_keep_min_and_parallelism_invariance(spark):
    df = spark.createDataFrame(
        [(i, f"https://WWW.site{i % 5}.com:443/p?id={i % 10}&utm_x={i}") for i in range(200)],
        "doc_id long, url string",
    ).withColumn("url_canon", canonicalize_url("url"))
    kept = url_dedup(df)
    got = {(r.doc_id, r.url_canon) for r in kept.collect()}
    # brute force: min doc_id per canonical
    import collections
    best: dict[str, int] = {}
    for r in df.collect():
        best[r.url_canon] = min(best.get(r.url_canon, 1 << 60), r.doc_id)
    assert got == {(i, c) for c, i in best.items()}
    # canonical space: 5 hosts x 10 ids but only i%10==i%5-compatible combos exist
    assert len(got) == len(best)
    got2 = {(r.doc_id, r.url_canon) for r in url_dedup(df.repartition(13)).collect()}
    assert got2 == got
    # keep-min is a partial aggregate, not a window over the URL key
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
