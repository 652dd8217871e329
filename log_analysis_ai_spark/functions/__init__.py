"""Scalar function library: text analysis, timestamps, syslog decode."""

from .text import (  # noqa: F401
    doc_fingerprint,
    lang_id,
    quality_score,
    scrub_pii,
    scrub_pii_arrow,
    token_count_bpe_ish,
    token_count_ws,
    with_text_stats,
)
