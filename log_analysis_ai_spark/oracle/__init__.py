"""Pure-pandas oracle: the golden sequential implementation of the pipeline.

Single-process, no Spark — defines the expected outputs the distributed
engine must reproduce exactly (per-sink counts, routed row sets, per-turn
text equality)."""

from .pipeline import OracleResult, run_oracle  # noqa: F401
