"""Deterministic sequence packing for pretraining-batch construction.

The LLM-pipeline op: concatenate documents into fixed token-budget packs
(sequences) so training batches waste no padding. At 100 TB the naive
formulation — one global running token total — is a single-task sort; the
scalable shape packs WITHIN deterministic hash buckets:

- every doc is assigned a bucket by a pure hash of its id (portable
  `knuth_hash` or `xxhash64`) — packing becomes embarrassingly parallel
  across buckets, one window per bucket, and doc order inside a pack is a
  pure function of the data (reproducible corpus, any parallelism/retry);
- within a bucket, docs are ordered by (hash, id) and packed contiguously:
  a doc belongs to the pack in which its FIRST token falls
  (pack_seq = floor(exclusive-prefix-sum / budget)) — the classic
  boundary-crossing packing (the trainer resets attention masks at doc
  boundaries, so a pack is a storage unit, not a semantic one).

Bucket count scales with the cluster (buckets ≈ 2-4× executors keeps every
core packing); budget is in tokens of whatever `token_col` counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .sampling import xxhash


def pack_documents(
    df: DataFrame,
    token_col: str,
    budget: int,
    id_col: str = "doc_id",
    buckets: int = 64,
    salt: int = 0,
    hash_expr: Column | None = None,
) -> DataFrame:
    """Assign every doc a (pack_bucket, pack_seq, pack_pos): which pack it
    belongs to and its position inside the pack. Deterministic — a pure
    function of (id, token count); see module docstring for the scale
    shape. One shuffle (the per-bucket window sort)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    h = hash_expr if hash_expr is not None else xxhash([id_col], salt)
    d = df.withColumn("_h", h).withColumn(
        "pack_bucket", F.pmod("_h", F.lit(buckets)).cast("int")
    )
    w = Window.partitionBy("pack_bucket").orderBy("_h", id_col)
    prev = (
        F.sum(F.col(token_col)).over(w.rowsBetween(Window.unboundedPreceding, -1))
    )
    d = d.withColumn("_prev_tokens", F.coalesce(prev, F.lit(0)))
    d = d.withColumn(
        "pack_seq", F.floor(F.col("_prev_tokens") / F.lit(budget)).cast("long")
    )
    wp = Window.partitionBy("pack_bucket", "pack_seq").orderBy("_h", id_col)
    return (
        d.withColumn("pack_pos", (F.row_number().over(wp) - 1).cast("int"))
        .drop("_h", "_prev_tokens")
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    window: int = 256,
    stride: int | None = None,
    idx_col: str = "chunk_idx",
    out_col: str = "chunk_text",
) -> DataFrame:
    """Split each document into overlapping token windows — the standard
    RAG / embedding-ingest chunking op (packing's inverse: packing joins
    docs up to a budget, chunking cuts docs down to one). Tokens are the
    literal single-space split (empty tokens from runs of spaces are KEPT,
    so `array_join(slice(...), ' ')` reconstructs exact substrings and
    concatenating stride-aligned chunks reproduces the document); chunk j
    covers tokens [j*stride, j*stride + window). The last chunk starts at
    the smallest j*stride with j*stride + window >= n_tokens, so every
    token is covered and no chunk is a suffix-subset of its predecessor;
    a doc with <= window tokens (or empty/NULL text) yields exactly one
    chunk.

    Scale shape: fully narrow — split, a per-row `sequence(0, n_chunks-1)`
    explode, and slice/join projections; no shuffle, no UDF, output rows
    bounded by ceil(n_tokens/stride)+1 per doc. Deterministic: chunk ids
    and boundaries are a pure function of the text."""
    if window <= 0:
        raise ValueError(f"window must be positive, got {window}")
    stride = window if stride is None else stride
    if not 0 < stride <= window:
        raise ValueError(f"stride must be in (0, window]={window}, got {stride}")
    toks = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    n = F.size(toks)
    n_chunks = (
        F.when(n <= window, F.lit(1))
        .otherwise(F.floor((n - window + stride - 1) / F.lit(stride)) + 1)
        .cast("int")
    )
    piece = F.slice("_toks", F.col(idx_col) * stride + 1, window)
    return (
        df.withColumn("_toks", toks)
        .withColumn(idx_col, F.explode(F.sequence(F.lit(0), n_chunks - 1)))
        .withColumn(out_col, F.array_join(piece, " "))
        .withColumn("n_tokens", F.size(piece))
        .drop("_toks")
    )


def pack_stats(packed: DataFrame, token_col: str) -> DataFrame:
    """Per-pack accounting (docs, tokens, budget overflow of the crossing
    doc) for packing-efficiency audits."""
    return packed.groupBy("pack_bucket", "pack_seq").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_col).cast("long").alias("n_tokens"),
    )
