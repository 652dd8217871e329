"""Grok pattern front-end for the regex parse stage.

The reference's parser surface is raw indexed-group regex
(src/regex_parser.cpp:43-74); production log pipelines almost always write
the pattern in grok syntax instead — `%{IPV4:client} .. %{INT:bytes:int}` —
a pattern-library macro language over regex (popularized by Logstash; the
semantics implemented here from the public description: `%{NAME}` splices a
library pattern, `%{NAME:field}` additionally captures it as `field`,
`%{NAME:field:int|float}` requests a typed cast).

Design for the engine:
- `grok_compile` expands a grok expression to ONE flat Java∩RE2-compatible
  regex with ordered capture groups — named instances become capture
  groups in order of appearance, bare `%{NAME}` splices become
  non-capturing. The SAME compiled string drives the Spark parse and the
  DuckDB oracle (both dialects accept it: no backrefs, no lookaround in
  the library).
- `grok_parse` feeds the compiled regex through `parse_regex`, so
  extraction inherits the one-pass multi-group plan (regex_groups_col: 2
  regex passes per row total, not one per field — at 100 TB the grok
  stage is a pure scan bottleneck) and the `_valid` / unmatched→NULL
  contract, then applies the requested casts.

Library patterns are written from scratch and kept CAPTURE-FREE (verified
at registration: `_decapture` rewrites any plain `(` to `(?:` so a library
or custom pattern can never shift the caller's group indexes — the classic
grok foot-gun).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# pattern library (from-scratch definitions of the standard grok names;
# Java∩RE2 dialect: no backrefs — QUOTEDSTRING is redefined accordingly)
# ---------------------------------------------------------------------------

_BASE: dict[str, str] = {
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "POSINT": r"\b[1-9]\d*\b",
    "NONNEGINT": r"\b\d+\b",
    "BASE10NUM": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "NUMBER": r"%{BASE10NUM}",
    "BASE16NUM": r"\b(?:0[xX])?[0-9A-Fa-f]+\b",
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "IPV4": r"(?:(?:25[0-5]|2[0-4]\d|[01]?\d?\d)\.){3}(?:25[0-5]|2[0-4]\d|[01]?\d?\d)",
    # pragmatic IPv6: full/compressed hex groups, optional v4 tail
    "IPV6": r"(?:[0-9A-Fa-f]{1,4}:){2,7}(?::|[0-9A-Fa-f]{1,4}|%{IPV4})|::(?:[0-9A-Fa-f]{1,4}|%{IPV4})?",
    "IP": r"%{IPV6}|%{IPV4}",
    "HOSTNAME": r"\b[0-9A-Za-z][0-9A-Za-z-]{0,62}(?:\.[0-9A-Za-z][0-9A-Za-z-]{0,62})*\.?\b",
    "IPORHOST": r"%{IP}|%{HOSTNAME}",
    "HOSTPORT": r"%{IPORHOST}:%{POSINT}",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"%{USERNAME}",
    "EMAILADDRESS": r"[a-zA-Z0-9_.+-]+@%{HOSTNAME}",
    "LOGLEVEL": (
        r"[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|[Ii]nfo(?:rmation)?|"
        r"INFO(?:RMATION)?|[Ww]arn(?:ing)?|WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR)?|"
        r"[Cc]rit(?:ical)?|CRIT(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|"
        r"EMERG(?:ENCY)?|[Ee]merg(?:ency)?"
    ),
    # no-backref quoted string (grok's original uses \1; RE2 has no backrefs)
    "QUOTEDSTRING": r"\"(?:[^\"\\]|\\.)*\"|'(?:[^'\\]|\\.)*'",
    "QS": r"%{QUOTEDSTRING}",
    "MONTH": (
        r"\b(?:Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May|Jun(?:e)?|Jul(?:y)?|"
        r"Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?|Nov(?:ember)?|Dec(?:ember)?)\b"
    ),
    "MONTHNUM": r"0?[1-9]|1[0-2]",
    "MONTHDAY": r"(?:0[1-9])|(?:[12]\d)|(?:3[01])|[1-9]",
    "YEAR": r"(?:\d\d){1,2}",
    "HOUR": r"2[0123]|[01]?\d",
    "MINUTE": r"[0-5]\d",
    "SECOND": r"(?:[0-5]?\d)(?:[:.,]\d+)?",
    "TIME": r"%{HOUR}:%{MINUTE}(?::%{SECOND})?",
    "ISO8601_TIMEZONE": r"Z|[+-]%{HOUR}(?::?%{MINUTE})",
    "TIMESTAMP_ISO8601": r"%{YEAR}-%{MONTHNUM}-%{MONTHDAY}[T ]%{HOUR}:?%{MINUTE}(?::?%{SECOND})?%{ISO8601_TIMEZONE}?",
    "SYSLOGTIMESTAMP": r"%{MONTH} +%{MONTHDAY} %{TIME}",
    "URIPATH": r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%_\-]*)+",
    "URIPARAM": r"\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\-\[\]<>]*",
    "URIPATHPARAM": r"%{URIPATH}(?:%{URIPARAM})?",
    "HTTPDATE": r"%{MONTHDAY}/%{MONTH}/%{YEAR}:%{TIME} %{INT}",
    # composite demo: Apache/nginx common log format
    "COMMONAPACHELOG": (
        r"%{IPORHOST:clientip} %{USER:ident} %{USER:auth} \[%{HTTPDATE:timestamp}\] "
        r'"(?:%{WORD:verb} %{NOTSPACE:request}(?: HTTP/%{NUMBER:httpversion})?|%{DATA:rawrequest})" '
        r"%{NONNEGINT:response:int} (?:%{NONNEGINT:bytes:int}|-)"
    ),
}

_REF = re.compile(r"%\{(\w+)(?::([\w.\-\[\]]+))?(?::(int|float))?\}")
_TYPES = {"int": "long", "float": "double", None: None}


def _decapture(pattern: str) -> str:
    """Rewrite every plain capturing `(` to non-capturing `(?:` so library /
    custom pattern bodies can never shift the caller's group indexes.
    Escapes (`\\(`) and character classes (`[(]`) are respected."""
    out, i, in_class = [], 0, False
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\" and i + 1 < len(pattern):
            out.append(pattern[i : i + 2])
            i += 2
            continue
        if in_class:
            if ch == "]":
                in_class = False
            out.append(ch)
        elif ch == "[":
            in_class = True
            out.append(ch)
        elif ch == "(" and not pattern.startswith("(?", i):
            out.append("(?:")
        else:
            out.append(ch)
        i += 1
    return "".join(out)


def grok_compile(
    pattern: str, custom: dict[str, str] | None = None
) -> tuple[str, list[tuple[str, str | None]]]:
    """Expand a grok expression to (flat_regex, [(field, cast_type), ...]).

    `%{NAME:field}` → a capture group (groups ordered by appearance);
    `%{NAME}` → non-capturing splice; `%{NAME:field:int|float}` records a
    cast for `grok_parse`. Unknown names raise KeyError with the available
    names; self-/mutually-recursive definitions raise ValueError (depth
    guard) instead of hanging."""
    lib = dict(_BASE)
    if custom:
        lib.update(custom)
    fields: list[tuple[str, str | None]] = []

    def expand(pat: str, depth: int) -> str:
        if depth > 32:
            raise ValueError("grok pattern recursion deeper than 32 — cyclic definition?")

        def sub(m: re.Match) -> str:
            name, field, typ = m.group(1), m.group(2), m.group(3)
            if name not in lib:
                raise KeyError(
                    f"unknown grok pattern %{{{name}}}; known: {sorted(lib)[:20]}..."
                )
            if field is None:
                return f"(?:{expand(_decapture(lib[name]), depth + 1)})"
            # Append the OUTER field before expanding the body: the outer
            # capture's `(` precedes any nested named groups in the regex, so
            # fields order must match paren order (`%{COMMONAPACHELOG:line}`
            # captures `line` at group 1, `clientip` at group 2, ...).
            fields.append((field, _TYPES[typ]))
            return f"({expand(_decapture(lib[name]), depth + 1)})"

        return _REF.sub(sub, pat)

    flat = expand(_decapture(pattern), 0)
    leftover = re.search(r"%\{[^}]*\}?", flat)
    if leftover:
        raise ValueError(
            f"unparsable grok reference {leftover.group(0)!r} — a malformed "
            "%{NAME:field[:int|float]} token (bad cast name or illegal field "
            "character) would otherwise land in the regex as literal text"
        )
    seen: set[str] = set()
    for f, _ in fields:
        if f in seen:
            raise ValueError(f"duplicate grok field name {f!r}")
        seen.add(f)
    return flat, fields


def grok_parse(
    df: DataFrame, pattern: str, col: str = "text", custom: dict[str, str] | None = None
) -> DataFrame:
    """Parse `col` with a grok expression: one column per named capture
    (typed per the `:int`/`:float` suffix), plus the parser-standard
    `_valid` flag (unmatched rows → NULL fields). Extraction is the
    one-pass multi-group plan (parse_regex → regex_groups_col): 2 regex
    passes per row regardless of field count."""
    from ..sources.readers import parse_regex

    flat, fields = grok_compile(pattern, custom)
    out = parse_regex(df, col, flat, [f for f, _ in fields])
    for f, typ in fields:
        if typ is not None:
            out = out.withColumn(f, F.col(f).cast(typ))
    return out
