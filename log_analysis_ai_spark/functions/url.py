"""URL canonicalization, domain blocklist filtering, and canonical-URL
deduplication — the pre-crawl-dedup step every published web-corpus
pipeline runs before content dedup (C4 §2.2 keeps one page per URL;
CCNet dedups by URL hash; RefinedWeb §3.1 filters by URL blocklist and
dedups exact URLs).

Canonicalization convention (each step a narrow JVM expression, Java∩RE2
dialect; the DuckDB oracle replays the identical steps):
1. strip the fragment (`#...`);
2. lowercase the scheme and host (path and query stay case-sensitive —
   they are case-significant per RFC 3986 §6.2.2.1);
3. strip an explicit `:443`/`:80` default port (either, regardless of
   scheme — a deliberate simplification, documented, matching how crawl
   canonicalizers treat the overwhelmingly-https reality);
4. strip one leading `www.`;
5. remove tracking query parameters (`utm_*`, `gclid`, `fbclid`,
   `msclkid`) wherever they sit in the query, dropping the `?` when the
   query empties.

OUT OF SCOPE (documented, not silent): Public-Suffix-List registered
domains (`url_domain` returns the last two dot-labels — `co.uk`-style
suffixes need the PSL, an external dataset), percent-encoding
normalization, path `.`/`..` resolution, IDN/punycode.

Scale shape: canonicalization and domain extraction are pure row
expressions (whole-stage codegen, no shuffle, no UDF); the blocklist
filter is a broadcast LEFT ANTI join (blocklists are KB–MB sized);
canonical-URL dedup is keep-min-id via a PARTIAL-AGGREGATING
groupBy(url) — map-side combine absorbs hot URLs (the family convention
of c4_span_dedup/substring_dedup; an URL shared by millions of rows
never serializes into one window task).

Reference parallel: the reference engine has no URL tooling; rule source
is the published recipes cited above.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tracking-parameter name pattern (Java∩RE2, no backrefs — the oracle
# uses the same string verbatim)
TRACKING_PARAM_PATTERN = r"(?:utm_[^=&]*|gclid|fbclid|msclkid)"

DEFAULT_BLOCKED_DOMAINS = (
    "spam-tracker.com",
    "ad-network.example",
    "clickbait.example",
)


def canonicalize_url(col: Column | str) -> Column:
    """Canonical form of an absolute http(s) URL per the module
    convention — a single narrow expression tree (codegen, no UDF)."""
    u = F.regexp_replace(F.col(col) if isinstance(col, str) else col, "#.*", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    hostport = F.regexp_extract(rest, r"^([^/?]*)", 1)
    pathq = F.regexp_replace(rest, r"^[^/?]*", "")
    host = F.regexp_replace(
        F.regexp_replace(F.lower(hostport), ":(443|80)$", ""), r"^www\.", ""
    )
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    q = F.regexp_extract(pathq, r"^[^?]*\?(.*)", 1)
    q = F.regexp_replace(q, f"&{TRACKING_PARAM_PATTERN}=[^&]*", "")
    q = F.regexp_replace(q, f"^{TRACKING_PARAM_PATTERN}=[^&]*&?", "")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )


def url_domain(col: Column | str) -> Column:
    """Naive registered domain: the last two dot-labels of the CANONICAL
    host (PSL-aware suffixes documented out of scope). Input is a
    canonical URL (or anything whose authority ends at the first /?)."""
    u = F.col(col) if isinstance(col, str) else col
    host = F.regexp_extract(
        F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", ""), r"^([^/?]*)", 1
    )
    return F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)


def url_blocklist_filter(
    df: DataFrame,
    url_col: str = "url",
    blocked_domains: tuple[str, ...] = DEFAULT_BLOCKED_DOMAINS,
    canon_col: str = "url_canon",
    domain_col: str = "domain",
) -> DataFrame:
    """Adds `canon_col` + `domain_col` and drops rows whose domain is on
    the blocklist — a broadcast LEFT ANTI join (never a shuffle of the
    corpus side; blocklists are small by nature). Blocked domains match
    the REGISTERED domain, so subdomains of a blocked domain are blocked
    too (ads.spam-tracker.com -> spam-tracker.com)."""
    spark = df.sparkSession
    block = spark.createDataFrame(
        [(d,) for d in blocked_domains], f"{domain_col} string"
    )
    out = df.withColumn(canon_col, canonicalize_url(url_col)).withColumn(
        domain_col, url_domain(F.col(canon_col))
    )
    return out.join(F.broadcast(block), domain_col, "left_anti")


def url_dedup(
    df: DataFrame, canon_col: str = "url_canon", id_col: str = "doc_id"
) -> DataFrame:
    """One row per canonical URL — the kept row is the one with the
    MINIMUM id (deterministic, parallelism-invariant). Keep-min via a
    partial-aggregating groupBy + semi join back (map-side combine
    absorbs hot URLs; no window over the URL key)."""
    keep = df.groupBy(canon_col).agg(F.min(id_col).alias(id_col))
    return df.join(keep, [canon_col, id_col], "left_semi")
