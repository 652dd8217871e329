"""Format-parser tests (SURVEY.md §2.1) — round-trip style: synthesize
lines with known fields, parse, assert recovery. JSONL shape mirrors the
reference's sample data (FIXTURES.md §5 — vendored shape, not read from the
reference tree)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from log_analysis_ai_spark.sources import (
    extract_attributes,
    parse_cef,
    parse_format,
    parse_jsonl,
    parse_log4j,
    parse_logfmt,
    parse_syslog,
    split_valid,
    to_timestamp_multi,
)

JSONL_SAMPLES = [
    {"timestamp": "2025-03-01T10:00:00", "level": "INFO", "message": "Server started", "server_id": "srv-42", "version": "2.1.0"},
    {"timestamp": "2025-03-01T10:00:05", "level": "ERROR", "msg": "Connection dropped", "user_id": 1042, "seconds": 37},
    {"time": "2025-03-01 10:00:10", "severity": "WARN", "message": "High CPU", "cpu_usage": 93.5},
]


def _lines_df(spark, lines):
    return spark.createDataFrame([(l,) for l in lines], "value string")


def test_parse_jsonl(spark):
    df = parse_jsonl(_lines_df(spark, [json.dumps(s) for s in JSONL_SAMPLES] + ["{not json"]))
    rows = df.collect()
    assert rows[0].message == "Server started" and rows[0].level == "INFO"
    assert rows[1].message == "Connection dropped"  # msg fallback
    assert rows[2].level == "WARN"  # severity fallback
    assert rows[2].ts is not None and rows[0].ts is not None  # time|timestamp
    assert rows[1].fields["user_id"] == "1042"  # scalars stringified into map
    valid, dead = split_valid(df)
    assert valid.count() == 3 and dead.count() == 1


def test_parse_syslog(spark):
    lines = [
        "<34>Oct 11 22:14:15 myhost su[1234]: 'su root' failed for u on /dev/pts/8",
        "<13>2025-03-01T10:00:00Z host2 prog: hello world",
        "Oct  1 00:00:01 h3 cron[7]: job done",
        "totally not syslog",
    ]
    df = parse_syslog(_lines_df(spark, lines))
    rows = df.collect()
    # pri 34 -> facility 4 (auth), severity 2 (crit)  [RFC3164 math]
    assert rows[0].facility == 4 and rows[0].severity_num == 2
    assert rows[0].severity == "crit" and rows[0].facility_name == "auth"
    assert rows[0].host == "myhost" and rows[0].program == "su" and rows[0].pid == 1234
    assert rows[0].message.startswith("'su root' failed")
    assert rows[1].pri == 13 and rows[1].host == "host2" and rows[1].ts is not None
    assert rows[2].pri is None and rows[2].program == "cron"
    valid, dead = split_valid(df)
    assert valid.count() == 3 and dead.count() == 1


def test_regex_groups_matches_regexp_extract(spark):
    """One-pass group extraction (regex_groups_col) must equal per-group
    regexp_extract on every edge: unanchored patterns with multiple
    matches, no match, match at position 0, separator-byte rows (slow
    path), empty string, empty trailing group — and the optimized parser
    plan must contain exactly ONE regexp_replace (the whole point)."""
    from log_analysis_ai_spark.sources.readers import _SEP, parse_syslog, regex_groups_col

    cases = [
        "abc 123 def 456",
        "no digits here",
        "123 at start",
        f"sep{_SEP}byte 99 here",
        "",
        "trailing 77 ",
    ]
    df = spark.createDataFrame([(s,) for s in cases], "value string")
    pat = r"(\d+) (\w*)"
    c = F.col("value")
    out = df.withColumn("_gp", regex_groups_col(c, pat, 2)).select(
        F.element_at("_gp", 1).alias("fast1"),
        F.element_at("_gp", 2).alias("fast2"),
        F.when(c.rlike(pat), F.regexp_extract(c, pat, 1)).alias("ref1"),
        F.when(c.rlike(pat), F.regexp_extract(c, pat, 2)).alias("ref2"),
    )
    for r in out.collect():
        assert r.fast1 == r.ref1 and r.fast2 == r.ref2
    plan = parse_syslog(df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("regexp_replace") == 1


def test_parse_syslog_classic_assume_year(spark):
    """Classic (year-less) timestamps: NULL ts without assume_year (never a
    silent 1970 via the generic chain, never a wall-clock year like the
    reference); the exact instant with one."""
    import datetime as dt

    lines = [
        "<34>Oct 11 22:14:15 myhost su[1234]: auth failure",
        "<34>Jan  5 03:04:05 myhost su[1]: pad check",  # space-padded day
        "<13>2025-03-01T10:00:00Z host2 prog: iso unaffected",
    ]
    no_year = parse_syslog(_lines_df(spark, lines)).collect()
    assert no_year[0].ts is None and no_year[1].ts is None  # loud, not 1970
    assert no_year[2].ts == dt.datetime(2025, 3, 1, 10, 0)  # ISO still parses
    yr = parse_syslog(_lines_df(spark, lines), assume_year=2024).collect()
    assert yr[0].ts == dt.datetime(2024, 10, 11, 22, 14, 15)
    assert yr[1].ts == dt.datetime(2024, 1, 5, 3, 4, 5)
    assert yr[2].ts == dt.datetime(2025, 3, 1, 10, 0)  # ISO wins over assume_year
    # factory threads the kwarg
    via_factory = parse_format(_lines_df(spark, lines[:1]), "syslog", assume_year=1999).collect()
    assert via_factory[0].ts == dt.datetime(1999, 10, 11, 22, 14, 15)


def test_parse_logfmt(spark):
    lines = ['ts=2025-03-01T10:00:00 level=info msg="user login ok" user=42 ip=1.2.3.4']
    rows = parse_logfmt(_lines_df(spark, lines)).collect()
    f = rows[0].fields
    assert f["level"] == "info" and f["user"] == "42" and f["ip"] == "1.2.3.4"
    assert f["msg"] == "user login ok"  # quoted value with spaces
    assert rows[0].ts is not None and rows[0].level == "info"


def test_parse_log4j(spark):
    lines = ["2025-03-01 10:00:00,123 ERROR [main] com.app.Service: boom happened"]
    rows = parse_log4j(_lines_df(spark, lines)).collect()
    r = rows[0]
    assert r.level == "ERROR" and r.thread == "main" and r.logger == "com.app.Service"
    assert r.message == "boom happened" and r.ts is not None


def test_parse_cef(spark):
    lines = ["CEF:0|Vendor|Product|1.0|100|Port scan|5|src=10.0.0.1 dst=10.0.0.2 spt=1234"]
    r = parse_cef(_lines_df(spark, lines)).collect()[0]
    assert r.vendor == "Vendor" and r.signature_id == "100" and r.severity == "5"
    assert r.extension["src"] == "10.0.0.1" and r.extension["spt"] == "1234"


def test_parse_regex_and_factory(spark):
    df = parse_format(
        _lines_df(spark, ["GET /api/x 200 12ms", "POST /y 500 3ms"]),
        "regex",
        pattern=r"^(\w+) (\S+) (\d+) (\d+)ms$",
        group_names=["method", "path", "status", "ms"],
    )
    rows = df.collect()
    assert rows[0].method == "GET" and rows[1].status == "500"
    with pytest.raises(ValueError, match="unknown format"):
        parse_format(df, "nope")


def test_extract_attributes(spark):
    df = extract_attributes(
        _lines_df(spark, ["user=42 action=login", "no match"]),
        {"user": r"user=(\d+)", "action": r"action=(\w+)"},
        col="value",
    )
    rows = df.collect()
    assert rows[0].user == "42" and rows[0].action == "login"
    assert rows[1].user == ""  # unmatched -> empty string (reference semantics)


def test_timestamp_fallback_chain(spark):
    vals = [
        "2025-03-01T10:00:00.123456+00:00", "2025-03-01T10:00:00", "2025-03-01 10:00:00",
        "2025/03/01 10:00:00", "01/Mar/2025:10:00:00", "not a ts",
    ]
    df = spark.createDataFrame([(v,) for v in vals], "s string").select(
        to_timestamp_multi("s").alias("ts")
    )
    got = [r.ts for r in df.collect()]
    assert all(t is not None for t in got[:5])
    assert got[5] is None


def test_csv_dimensions_positional_mapping(spark, tmp_path):
    """Config-driven positional dimension mapping (reference:
    src/csv_parser.cpp:83-97): CSV column i maps to dimensions[i]; 'body'/
    'timestamp'/'severity' are the reserved roles (timestamp parsed with the
    configured format, strptime or Spark patterns), other names become
    attribute columns; extra CSV columns beyond the list are dropped."""
    from log_analysis_ai_spark.sources import read_csv_dimensions

    p = str(tmp_path / "d.csv")
    with open(p, "w") as f:
        f.write("2025-03-01 10:00:00,ERROR,disk full,node7,ignored\n")
        f.write("2025-03-01 10:00:01,INFO,ok,node2,ignored\n")
    df = read_csv_dimensions(
        spark, p,
        dimensions=["timestamp", "severity", "body", "node"],
        datetime_format="%Y-%m-%d %H:%M:%S",
    )
    assert df.columns == ["timestamp", "severity", "body", "node"]
    rows = df.orderBy("timestamp").collect()
    assert rows[0].severity == "ERROR" and rows[0].body == "disk full"
    assert rows[0].node == "node7"
    assert rows[0].timestamp.isoformat().startswith("2025-03-01T10:00:00")


def test_grok_compile_expansion():
    """Pure compiler contract: named instances become ordered capture
    groups, bare splices are non-capturing, library/custom bodies are
    de-captured so they can never shift group indexes, and the error
    paths (unknown name, cyclic definition, duplicate field) raise."""
    import re

    import pytest

    from log_analysis_ai_spark.functions.grok import grok_compile

    flat, fields = grok_compile("%{INT:a:int} %{WORD} %{NUMBER:b:float}")
    assert fields == [("a", "long"), ("b", "double")]
    m = re.fullmatch(flat, "42 hello 3.14")
    assert m and m.groups() == ("42", "3.14")  # bare %{WORD} captured nothing

    # a custom pattern with plain capture groups cannot break indexing
    flat2, f2 = grok_compile("%{KV:pair} %{INT:n:int}", custom={"KV": r"(\w+)=(\w+)"})
    assert [f for f, _ in f2] == ["pair", "n"]
    assert re.fullmatch(flat2, "a=b 7").groups() == ("a=b", "7")

    with pytest.raises(KeyError):
        grok_compile("%{NOPE:x}")
    with pytest.raises(ValueError, match="recursion"):
        grok_compile("%{A:x}", custom={"A": "%{B}", "B": "%{A}"})
    with pytest.raises(ValueError, match="duplicate"):
        grok_compile("%{INT:x} %{INT:x}")


def test_grok_library_patterns_match_and_compile_in_both_dialects():
    """Every library pattern must compile in Python re AND DuckDB RE2 (the
    oracle dialect; Spark's Java dialect is exercised by the parse tests),
    and the composite COMMONAPACHELOG must dissect a real access-log line."""
    import re

    import duckdb

    from log_analysis_ai_spark.functions.grok import _BASE, grok_compile

    con = duckdb.connect()
    for name in _BASE:
        flat, _ = grok_compile("%{" + name + ":x}")
        re.compile(flat)
        con.execute("SELECT regexp_matches('probe', ?)", [flat])

    flat, fields = grok_compile("%{COMMONAPACHELOG}")
    line = '203.0.113.9 - frank [10/Oct/2000:13:55:36 -0700] "GET /a_b.gif HTTP/1.0" 200 2326'
    got = dict(zip([f for f, _ in fields], re.search(flat, line).groups()))
    assert got["clientip"] == "203.0.113.9" and got["auth"] == "frank"
    assert got["verb"] == "GET" and got["request"] == "/a_b.gif"
    assert got["response"] == "200" and got["bytes"] == "2326"


def test_grok_named_composite_field_order_and_malformed_refs():
    """Naming a composite instance (`%{COMMONAPACHELOG:line}`) is the
    standard grok idiom: the OUTER field must take the group slot of its own
    `(` — which precedes every nested named group — so fields order matches
    capture-paren order. Also: a malformed reference (bad cast name, illegal
    field char) must raise instead of landing in the regex as literal text."""
    import re

    import pytest

    from log_analysis_ai_spark.functions.grok import grok_compile

    flat, fields = grok_compile("%{COMMONAPACHELOG:line}")
    names = [f for f, _ in fields]
    assert names[0] == "line" and "clientip" in names and "response" in names
    line = '203.0.113.9 - frank [10/Oct/2000:13:55:36 -0700] "GET /a_b.gif HTTP/1.0" 200 2326'
    got = dict(zip(names, re.search(flat, line).groups()))
    assert got["line"] == line
    assert got["clientip"] == "203.0.113.9" and got["ident"] == "-"
    assert got["auth"] == "frank" and got["verb"] == "GET"
    assert got["request"] == "/a_b.gif" and got["httpversion"] == "1.0"
    assert got["response"] == "200" and got["bytes"] == "2326"

    # nested-inside-nested: custom composite wrapping a library composite
    flat2, f2 = grok_compile(
        "%{REQ:req} -> %{INT:rc:int}",
        custom={"REQ": r"%{WORD:verb} %{URIPATH:path}"},
    )
    assert [f for f, _ in f2] == [("req"), ("verb"), ("path"), ("rc")]
    m = re.fullmatch(flat2, "GET /api/users -> 200")
    assert m.groups() == ("GET /api/users", "GET", "/api/users", "200")

    with pytest.raises(ValueError, match="unparsable grok reference"):
        grok_compile("%{INT:x:integer}")  # bad cast name
    with pytest.raises(ValueError, match="unparsable grok reference"):
        grok_compile("%{INT:ba!d}")  # illegal field character


def test_grok_parse_typed_fields_and_valid_contract(spark):
    """grok_parse end-to-end on Spark: typed casts applied, unmatched rows
    get _valid=false and NULL fields, and the Spark (Java-regex) extraction
    equals the Python-re reference groups on every matching line."""
    import re

    from log_analysis_ai_spark.functions.grok import grok_compile, grok_parse

    pat = r"^%{IPV4:src} %{WORD:verb} %{URIPATH:path} rc=%{INT:rc:int} took %{NUMBER:ms:float} ms$"
    lines = [
        "10.0.0.1 GET /api/users rc=200 took 12.05 ms",
        "192.168.7.254 POST /v2/jobs/run rc=503 took 0.9 ms",
        "completely unparseable",
        "999.999.1.1 GET /x rc=1 took 1.0 ms",  # bad IPv4 octets
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(lines)], "id long, text string")
    out = grok_parse(df, pat).orderBy("id").collect()

    assert [r._valid for r in out] == [True, True, False, False]
    d0 = out[0].asDict()
    assert (d0["src"], d0["verb"], d0["path"]) == ("10.0.0.1", "GET", "/api/users")
    assert out[0].rc == 200 and abs(out[0].ms - 12.05) < 1e-12
    assert isinstance(out[1].rc, int) and isinstance(out[1].ms, float)
    assert out[2].src is None and out[2].rc is None and out[2].ms is None

    flat, fields = grok_compile(pat)
    rx = re.compile(flat)
    for r, line in zip(out, lines):
        m = rx.search(line)
        if m:
            got = tuple("" if r[f] is None else str(r[f]) for f, _ in fields)
            want = tuple(
                g if typ is None else str(int(g) if typ == "long" else float(g))
                for g, (_, typ) in zip(m.groups(), fields)
            )
            assert got == want
