"""Text-analysis functions for training-data pipelines — all JVM-native
expressions (regexp_count / split / array ops), no UDFs, so they stay inside
whole-stage codegen at 100 TB.

Formulas are deliberately simple arithmetic over countable features so the
DuckDB oracle can state them identically (driver correctness gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# word-ish / punctuation tokenization shared with the oracle SQL
BPE_ISH_RE = "[A-Za-z0-9]+|[^A-Za-z0-9 ]"

# tiny per-language stopword lists (public common words) for the n-gram/
# stopword language-ID heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "you", "that"],
    "fr": ["le", "la", "et", "de", "un", "une", "est", "que", "pour", "dans"],
    "es": ["el", "la", "y", "de", "un", "una", "es", "que", "por", "para"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"],
}


def token_count_ws(col: str = "text"):
    """Whitespace token count (single-space split — matches DuckDB
    len(string_split(text, ' ')) exactly)."""
    return F.size(F.split(F.col(col), " "))


def token_count_bpe_ish(col: str = "text"):
    """BPE-ish token estimate: alnum runs + individual punctuation marks."""
    return F.regexp_count(F.col(col), F.lit(BPE_ISH_RE))


def quality_score(col: str = "text"):
    """Document quality heuristic in [0,1]: penalize very short/very long
    docs, high punctuation density, and low alphabetic ratio.

    score = 0.4*len_ok + 0.3*alpha_ratio + 0.3*(1 - punct_ratio)"""
    c = F.col(col)
    n = F.length(c)
    alpha = F.length(F.regexp_replace(c, "[^A-Za-z ]", ""))
    punct = F.length(F.regexp_replace(c, "[A-Za-z0-9 ]", ""))
    len_ok = F.when((n >= 20) & (n <= 10000), F.lit(1.0)).otherwise(F.lit(0.0))
    safe_n = F.greatest(n, F.lit(1))
    return (
        F.lit(0.4) * len_ok
        + F.lit(0.3) * (alpha / safe_n)
        + F.lit(0.3) * (F.lit(1.0) - punct / safe_n)
    )


def lang_id(col: str = "text"):
    """Stopword-overlap language ID: argmax over per-language hit counts of
    lowercased space tokens; ties and zero hits -> 'und'. Deterministic:
    languages compared in sorted order, strict > to win."""
    toks = F.split(F.lower(F.col(col)), " +")
    hits = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in STOPWORDS.items()
    }
    best = F.lit("und")
    best_n = F.lit(0)
    for lang in sorted(STOPWORDS):
        cond = hits[lang] > best_n
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_n = F.when(cond, hits[lang]).otherwise(best_n)
    return best


def doc_fingerprint(col: str = "text"):
    """Normalized content fingerprint: md5 of lowercased,
    whitespace-collapsed, trimmed text (DuckDB-parity: md5 exists there)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(col)), " +", " "))
    return F.md5(norm)


# PII scrub patterns: (regex, replacement), applied IN ORDER (email before
# phone so an address's digits can't be half-eaten; hex secrets before the
# card-number rule). Restricted to the Java-regex ∩ RE2 dialect (character
# classes, bounded repeats, \b — no backrefs/lookaround) so the DuckDB
# oracle evaluates the IDENTICAL strings; parity pinned by the
# events_scrub_pii hash gate.
DEFAULT_SCRUB_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\b[A-Fa-f0-9]{32,}\b", "<SECRET>"),
    (r"\b\d{13,19}\b", "<NUM>"),
    (r"\+?\d[\d() -]{7,}\d", "<PHONE>"),
)


def scrub_pii(col: str = "text", patterns: tuple[tuple[str, str], ...] = DEFAULT_SCRUB_PATTERNS):
    """Mask common PII shapes (emails, IPv4, hex secrets ≥32, 13-19-digit
    card-like runs, phone-like runs) with typed placeholder tokens — the
    standard redaction pass before a corpus ships to training. A chain of
    JVM `regexp_replace` calls: pure codegen, no UDF, order-deterministic.
    Pattern-shaped redaction only — it cannot catch free-text PII (names,
    addresses); that genuinely needs an NER model this container doesn't
    ship, and SHOULD run as a Pandas-UDF stage after this cheap pass has
    handled the high-volume mechanical shapes."""
    c = F.col(col)
    for pat, repl in patterns:
        c = F.regexp_replace(c, pat, repl)
    return c


def with_text_stats(df: DataFrame, col: str = "text") -> DataFrame:
    """Attach the full text-analysis column set in one narrow projection."""
    return (
        df.withColumn("n_tokens_ws", token_count_ws(col))
        .withColumn("n_tokens_bpe", token_count_bpe_ish(col))
        .withColumn("quality", quality_score(col))
        .withColumn("lang_pred", lang_id(col))
        .withColumn("fingerprint", doc_fingerprint(col))
    )
