"""Byte-pair-encoding tokenizer training and encoding (Sennrich, Haddow &
Birch 2016, "Neural Machine Translation of Rare Words with Subword Units",
ACL — the classic word-frequency BPE; GPT-2 applies the same algorithm at
byte level).

Division of labor (the 100 TB reading):
- WORD-FREQUENCY COUNTING is the corpus-scale stage and runs distributed:
  one explode + one partial-aggregating groupBy (map-side combine absorbs
  stopwords), then `TakeOrderedAndProject` caps the table to the top
  `max_word_shapes` shapes — only that bounded table ever reaches the
  driver, exactly the SentencePiece/subword-nmt practice of training on a
  capped word-shape table rather than the raw corpus.
- MERGE LEARNING runs driver-side on that bounded table (the published
  algorithm is inherently sequential: merge k+1's counts depend on merge
  k). Deterministic: ties on pair frequency break lexicographically, so
  the merge list is a pure function of the word-frequency table.
- ENCODING is corpus-scale again and runs as ONE Arrow mapInPandas pass
  with the merge ranks broadcast in the closure (greedy lowest-rank-first
  merging, the standard BPE encode loop).

No SQL oracle is possible — training is iterative (each merge re-writes
the symbol table the next count runs on) and encoding replays the learned
merges — so the entry is rows-only by design; correctness is pinned by
brute-force parity tests against a from-scratch reference implementation
and by the train/encode consistency property (encoding the training
corpus uses exactly the learned merges).

Reference parallel: the reference engine has no tokenizer trainer; its
token counting surface is the whitespace/BPE-ish regex counters
(functions/text.py). This module adds the trainer those counters stand in
for.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "</w>"


def word_frequencies(
    df: DataFrame, col: str = "text", max_word_shapes: int = 100_000
) -> DataFrame:
    """(word, freq) for the `max_word_shapes` most frequent whitespace
    words — the distributed stage of BPE training. Top-k plans as
    TakeOrderedAndProject (per-task k-heap, no global sort); ties at the
    cutoff break lexicographically so the table is deterministic."""
    return (
        df.select(F.explode(F.split(F.col(col), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(max_word_shapes)
    )


def learn_merges(word_freq: list[tuple[str, int]], num_merges: int) -> list[tuple[str, str]]:
    """Driver-side Sennrich BPE on a (word, freq) list: repeatedly merge
    the most frequent adjacent symbol pair (ties lexicographic). Words are
    char sequences with an END_OF_WORD sentinel so 'low' and 'lower' share
    'low' prefixes but differ at the boundary. Returns merges in learned
    order; stops early when no pair occurs twice."""
    vocab = {tuple(word) + (END_OF_WORD,): freq for word, freq in word_freq}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, freq in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + freq
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        pair = best[0]
        merges.append(pair)
        merged = pair[0] + pair[1]
        new_vocab: dict[tuple, int] = {}
        for syms, freq in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == pair[0] and syms[i + 1] == pair[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + freq
        vocab = new_vocab
    return merges


def train_bpe(
    df: DataFrame,
    col: str = "text",
    num_merges: int = 200,
    max_word_shapes: int = 100_000,
) -> list[tuple[str, str]]:
    """Distributed word counting + driver-side merge learning (see module
    docstring for why the split lands there). Deterministic end to end."""
    wf = [(r.word, r.freq) for r in word_frequencies(df, col, max_word_shapes).collect()]
    return learn_merges(wf, num_merges)


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word) + [END_OF_WORD]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Encode `col` with a learned merge list: greedy lowest-rank-first
    merging per word (the standard BPE encode loop), whitespace
    pre-tokenization matching `word_frequencies`. ONE Arrow mapInPandas
    pass; the merge ranks ride the task closure (merge lists are
    vocabulary-sized — broadcast-small by construction). NULL text yields
    NULL tokens; a word-level LRU-less memo per batch avoids re-encoding
    repeated words (Zipf makes this the common case)."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    fields = [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
    if out_col not in df.columns:
        fields.append(f"`{out_col}` array<string>")
    schema = ", ".join(fields)

    def encode(batches):
        for pdf in batches:
            memo: dict[str, list[str]] = {}
            out = []
            for t in pdf[col]:
                if not isinstance(t, str):
                    out.append(None)
                    continue
                toks: list[str] = []
                for w in t.split():
                    got = memo.get(w)
                    if got is None:
                        got = memo[w] = _encode_word(w, ranks)
                    toks.extend(got)
                out.append(toks)
            pdf[out_col] = pd.Series(out, index=pdf.index, dtype="object")
            yield pdf

    return df.mapInPandas(encode, schema)
