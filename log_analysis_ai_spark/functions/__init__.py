"""Scalar function library: text analysis, timestamps, syslog decode,
URL canonicalization."""

from .text import (  # noqa: F401
    corpus_datacard,
    doc_fingerprint,
    lang_id,
    quality_score,
    scrub_pii,
    scrub_pii_arrow,
    token_count_bpe_ish,
    token_count_ws,
    with_text_stats,
)
from .url import (  # noqa: F401
    canonicalize_url,
    url_blocklist_filter,
    url_dedup,
    url_domain,
)
