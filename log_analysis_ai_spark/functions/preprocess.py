"""Preprocessor scalar utilities (reference: src/preprocessor.cpp).

All native expressions: the reference built SIMD kernels for these
(src/simd_string_ops.cpp); Tungsten codegen is our SIMD.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the reference's 13-char delimiter set (src/preprocessor.cpp:95-97)
DELIMITERS = ",;:|\t[]{}()<>"


def delimiters_to_space(col):
    """Multi-char delimiter replace (reference: src/simd_string_ops.cpp:73-163
    via src/preprocessor.cpp:122-123): each delimiter char -> space."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(c, DELIMITERS, " " * len(DELIMITERS))


def collapse_whitespace(col):
    """Whitespace collapse + trim (reference: src/preprocessor.cpp:126-143)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(c, " +", " "))


def clean_text(col):
    """delimiters -> space, collapse, trim — the full preprocessor chain."""
    return collapse_whitespace(delimiters_to_space(col))


def custom_replace(df: DataFrame, col: str, rules: list[tuple[str, str]], capture_as: str | None = None) -> DataFrame:
    """Ordered regex replace list with optional captured-term collection
    (reference: src/preprocessor.cpp:52-86,147-163 captures matched terms
    before replacing). With capture_as, matched substrings of every rule are
    collected into an array column BEFORE replacement."""
    out = df
    if capture_as:
        captures = F.flatten(
            F.array(*[F.regexp_extract_all(F.col(col), F.lit(pat), 0) for pat, _ in rules])
        )
        out = out.withColumn(capture_as, captures)
    c = F.col(col)
    for pat, repl in rules:
        c = F.regexp_replace(c, pat, repl)
    return out.withColumn(col, c)
