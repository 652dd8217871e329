"""Sources: line readers and per-format parsers as DataFrame transforms."""

from .readers import (  # noqa: F401
    extract_attributes,
    multi_file_merge,
    parse_cef,
    parse_format,
    parse_jsonl,
    parse_line,
    parse_log4j,
    parse_logfmt,
    parse_regex,
    parse_syslog,
    read_csv,
    read_csv_dimensions,
    read_lines,
    read_tsv,
    split_valid,
    to_timestamp_multi,
)
