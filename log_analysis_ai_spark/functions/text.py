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


def scrub_pii_arrow(
    df: DataFrame,
    col: str = "text",
    patterns: tuple[tuple[str, str], ...] = DEFAULT_SCRUB_PATTERNS,
    out_col: str | None = None,
) -> DataFrame:
    """`scrub_pii` as ONE Arrow-batched pass: pyarrow.compute
    `replace_substring_regex` (RE2, C++-vectorized) applies the SAME
    ordered pattern chain batch-at-a-time — the dual-engine pattern
    repetition_stats set (the JVM expression chain stays the default and
    the two are pinned bit-equal in tests).

    When to prefer which (measured r8, 100k PII-dense lines, sf0.1): on
    ONE core this engine is ~7× faster — 0.51 s vs 3.7 s — because RE2's
    DFA beats java.util.regex backtracking on these patterns; at 32-way
    parallelism both bottom out on per-stage overhead (~0.3-0.5 s). Per
    CPU-hour at corpus scale the Arrow pass wins; the JVM chain
    (`scrub_pii`) stays the default API because it rides an existing
    projection with zero Python workers and composes with other column
    expressions. Walls recorded in BENCH/BASELINE.md.

    Dialect note: the shipped patterns are Java-regex ∩ RE2 by contract
    (see DEFAULT_SCRUB_PATTERNS); the one residual divergence is `\\b` —
    ASCII word boundary in RE2, Unicode-aware in Java — which only
    matters for custom patterns anchoring `\\b` against non-ASCII word
    characters (the defaults anchor against ASCII digits/hex only).
    NULL rows stay NULL in both engines."""
    out = out_col or col
    fields = [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
    if out not in df.columns:
        fields.append(f"`{out}` string")
    schema = ", ".join(fields)

    def scrub(batches):
        import pyarrow as pa  # noqa: PLC0415 — worker-side import
        import pyarrow.compute as pc  # noqa: PLC0415

        for pdf in batches:
            arr = pa.Array.from_pandas(pdf[col])
            for pat, repl in patterns:
                arr = pc.replace_substring_regex(arr, pattern=pat, replacement=repl)
            pdf[out] = arr.to_pandas()
            yield pdf

    return df.mapInPandas(scrub, schema)


def with_text_stats(df: DataFrame, col: str = "text") -> DataFrame:
    """Attach the full text-analysis column set in one narrow projection."""
    return (
        df.withColumn("n_tokens_ws", token_count_ws(col))
        .withColumn("n_tokens_bpe", token_count_bpe_ish(col))
        .withColumn("quality", quality_score(col))
        .withColumn("lang_pred", lang_id(col))
        .withColumn("fingerprint", doc_fingerprint(col))
    )


def _rep_fold(sorted_arr):
    """One-pass fold over a SORTED string array computing repetition
    metrics without a shuffle or an explode: (dup_count, dup_chars,
    top_run, top_gram). Sorting groups equal elements into runs, so a
    single F.aggregate with a struct accumulator counts, per element:
    membership in a run of length >=2 (when a run reaches 2, the previous
    element is retro-counted), the longest run, and — ties broken toward
    the lexicographically LARGEST element, which the ascending sort makes
    a simple >= replacement — the element achieving it. Shuffle-free like
    the Arrow engine (the explode + groupBy(doc, gram) formulation
    shuffles one row per gram occurrence) — but NOT codegen: Spark
    higher-order functions are CodegenFallback, so these folds evaluate
    interpreted (measured r7: 13 composed folds = 131 s for 5k docs at
    sf0.1 vs ~1 s for the Arrow pass), which is why repetition_stats
    defaults to engine="arrow" and keeps this as the cross-check path."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
        F.lit("").alias("bestg"),
        F.lit(0).alias("dupc"),
        F.lit(0).cast("long").alias("dupch"),
    )

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        add = F.when(run == 2, F.lit(2)).when(run > 2, F.lit(1)).otherwise(F.lit(0))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
            F.when(run >= acc["best"], x).otherwise(acc["bestg"]).alias("bestg"),
            (acc["dupc"] + add).alias("dupc"),
            (acc["dupch"] + add.cast("long") * F.length(x)).alias("dupch"),
        )

    return F.aggregate(
        sorted_arr,
        init,
        step,
        lambda acc: F.struct(
            acc["dupc"].alias("dup_count"),
            acc["dupch"].alias("dup_chars"),
            acc["best"].alias("top_run"),
            acc["bestg"].alias("top_gram"),
        ),
    )


# the paper's full metric parameterization: which n-grams get the
# "most frequent gram" treatment vs the "all duplicated grams" treatment
GOPHER_TOP_NGRAMS = (2, 3, 4)
GOPHER_DUP_NGRAMS = (5, 6, 7, 8, 9, 10)


REPETITION_METRICS = (
    ["dup_line_frac", "dup_line_char_frac", "dup_para_frac", "dup_para_char_frac"]
    + [f"top_{n}gram_char_frac" for n in GOPHER_TOP_NGRAMS]
    + [f"dup_{n}gram_char_frac" for n in GOPHER_DUP_NGRAMS]
)


def repetition_stats(
    df: DataFrame, col: str = "text", engine: str = "arrow"
) -> DataFrame:
    """The COMPLETE Gopher/MassiveText repetition metric set per document
    (Rae et al. 2021, "Scaling Language Models", Table A1 — the published
    pretraining repetition-removal rules):

    - dup_line_frac / dup_para_frac: lines (split on '\\n') / paragraphs
      (split on runs of >=2 newlines) whose exact text occurs more than
      once (counted with multiplicity) / total lines (paragraphs);
    - dup_line_char_frac / dup_para_char_frac: characters in those lines
      (paragraphs) / length(text);
    - top_{2,3,4}gram_char_frac: occurrences x length of the most frequent
      word n-gram (lowercased; ties -> lexicographically largest) /
      length(text); NOTE Rae et al. do not specify a tie-break when
      several n-grams share the max count, so cross-implementation numbers
      can differ on tied corpora when the tied grams have different
      lengths — this engine's convention (lexicographically LARGEST
      winner, shared by the oracle SQL and pinned by a tied-corpus test)
      is one valid reading;
    - dup_{5..10}gram_char_frac: characters across all duplicated word
      n-grams (counted with multiplicity) / length(text).

    Two engines, bit-equal (cross-checked in tests):
    - `engine="arrow"` (default): ONE Arrow-batched pass computing all 13
      metrics per document (mapInPandas) — no shuffle, no explode, scales
      as a pure scan. This is the honest fast path: Spark higher-order
      functions are CodegenFallback (they never enter whole-stage
      codegen), and 13 interpreted sorted-array folds composed in one
      projection measured 131 s for 5k docs at sf0.1 vs ~1 s here.
    - `engine="sql"`: the pure-expression sorted-array folds (_rep_fold),
      kept as the no-Python path and as an independent implementation the
      tests compare against.

    Empty/degenerate texts score 0 (never div-by-zero)."""
    if engine == "arrow":
        return _repetition_stats_arrow(df, col)
    from ..operators.dedup import word_shingles

    c = F.col(col)
    tlen = F.nullif(F.length(c), F.lit(0)).cast("double")
    zero = F.lit(0.0)
    lines = F.split(c, "\n")
    paras = F.split(c, "\n{2,}")
    out = df.withColumn("_lf", _rep_fold(F.array_sort(lines))).withColumn(
        "_pf", _rep_fold(F.array_sort(paras))
    )
    for n in GOPHER_TOP_NGRAMS + GOPHER_DUP_NGRAMS:
        out = out.withColumn(f"_g{n}", _rep_fold(F.array_sort(word_shingles(col, n))))
    for name, arr in (("line", lines), ("para", paras)):
        pre = "_lf" if name == "line" else "_pf"
        out = out.withColumn(
            f"dup_{name}_frac",
            F.coalesce(F.col(f"{pre}.dup_count") / F.size(arr), zero),
        ).withColumn(
            f"dup_{name}_char_frac",
            F.coalesce(F.col(f"{pre}.dup_chars") / tlen, zero),
        )
    for n in GOPHER_TOP_NGRAMS:
        out = out.withColumn(
            f"top_{n}gram_char_frac",
            F.coalesce(
                F.col(f"_g{n}.top_run") * F.length(f"_g{n}.top_gram") / tlen, zero
            ),
        )
    for n in GOPHER_DUP_NGRAMS:
        out = out.withColumn(
            f"dup_{n}gram_char_frac",
            F.coalesce(F.col(f"_g{n}.dup_chars") / tlen, zero),
        )
    return out.drop("_lf", "_pf", *[f"_g{n}" for n in GOPHER_TOP_NGRAMS + GOPHER_DUP_NGRAMS])


def _repetition_stats_arrow(df: DataFrame, col: str) -> DataFrame:
    """One Arrow-batched pass for all 13 Table A1 metrics (see
    repetition_stats). Same conventions as the SQL engine and the DuckDB
    oracle: tokens split on space runs only (newlines stay inside tokens),
    short texts yield ONE truncated n-gram, duplicates counted with
    multiplicity, top-gram ties to the lexicographically largest. NULL
    text scores all-zero, exactly like the SQL engine's coalesce.

    r8: the n-gram work is BATCH-vectorized across the whole Arrow batch,
    not per document (per-doc numpy measured SLOWER than the r7 Counter
    loops on ~50-token docs — array-creation overhead dominates at that
    size). All docs' tokens concatenate into one id array (np.unique lex
    ranks — deterministic, no process-seeded hashing); for each n, ONE
    vectorized 64-bit rolling polynomial hash covers every doc's grams
    (doc-boundary-crossing positions masked out), one stable lexsort by
    (doc, hash) yields group counts, and char lengths come from a global
    cumulative-offset array. Gram STRINGS are materialized only for the
    top-gram tie-break candidates (slices of each doc's single-space
    join — never per-position str joins, never for the dup metrics). Gram
    identity is the rolling hash of the id sequence (wraparound collision
    odds ~K²/2⁶⁴ per batch — the accepted dedup_exact regime); the
    cross-engine equality test pins this engine bit-equal to the
    hash-free SQL folds."""
    schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"`{m}` double" for m in REPETITION_METRICS]
    )
    n_top, n_dup = len(GOPHER_TOP_NGRAMS), len(GOPHER_DUP_NGRAMS)

    def compute(batches):
        import re  # noqa: PLC0415 — worker-side import
        from collections import Counter  # noqa: PLC0415

        import numpy as np  # noqa: PLC0415

        B = np.uint64(1099511628211)  # FNV-1a prime as the rolling base

        for pdf in batches:
            texts = [t if isinstance(t, str) else "" for t in pdf[col]]
            D = len(texts)
            res = np.zeros((D, 4 + n_top + n_dup))
            if D == 0:
                for j, m in enumerate(REPETITION_METRICS):
                    pdf[m] = res[:, j]
                yield pdf
                continue
            Ls = np.fromiter((len(t) for t in texts), dtype=np.int64, count=D)
            for d, t in enumerate(texts):
                L = Ls[d]
                for u, (units) in enumerate((t.split("\n"), re.split("\n{2,}", t))):
                    uc = Counter(units)
                    dupn = dupch = 0
                    for x, c in uc.items():
                        if c > 1:
                            dupn += c
                            dupch += c * len(x)
                    res[d, 2 * u] = dupn / len(units)
                    res[d, 2 * u + 1] = dupch / L if L else 0.0
            toks_l = [re.split(" +", t.lower()) for t in texts]
            joined_l = [" ".join(tk) for tk in toks_l]
            ms = np.fromiter((len(tk) for tk in toks_l), dtype=np.int64, count=D)
            all_toks = [x for tk in toks_l for x in tk]
            M = len(all_toks)
            S = np.zeros(D + 1, dtype=np.int64)
            np.cumsum(ms, out=S[1:])
            docidx = np.repeat(np.arange(D), ms)
            # cumulative (token_len + 1): token i starts at char
            # ctl[i] - ctl[S[doc]] of its doc's join; gram [i, i+n) has
            # char length ctl[i+n] - ctl[i] - 1
            ctl = np.zeros(M + 1, dtype=np.int64)
            np.cumsum(
                np.fromiter((len(x) + 1 for x in all_toks), dtype=np.int64, count=M),
                out=ctl[1:],
            )
            doc_ctl0 = ctl[S[:-1]]
            # deterministic lex-rank ids; <U fixed-width fast path unless a
            # pathological token would blow the width out
            if max(map(len, all_toks), default=0) <= 512:
                ids = np.unique(np.asarray(all_toks), return_inverse=True)[1]
            else:
                ids = np.unique(np.asarray(all_toks, dtype=object), return_inverse=True)[1]
            ids = ids.astype(np.uint64)

            for cj, n in enumerate(GOPHER_TOP_NGRAMS + GOPHER_DUP_NGRAMS):
                top = cj < n_top
                oc = 4 + cj
                # short docs: ONE truncated gram (the whole token list) —
                # top scores its single count, dup can't duplicate
                if top:
                    for d in np.nonzero((ms < n) & (Ls > 0))[0]:
                        res[d, oc] = len(joined_l[d]) / Ls[d]
                K = M - n + 1
                if K <= 0:
                    continue
                h = np.zeros(K, dtype=np.uint64)
                for j in range(n):
                    h = h * B + ids[j : j + K]
                pos = np.nonzero(docidx[:K] == docidx[n - 1 : M])[0]
                if not len(pos):
                    continue
                order = np.lexsort((h[pos], docidx[pos]))
                pv = pos[order]
                hv = h[pv]
                dv = docidx[pv]
                newg = np.empty(len(hv), dtype=bool)
                newg[0] = True
                newg[1:] = (hv[1:] != hv[:-1]) | (dv[1:] != dv[:-1])
                gstart = np.nonzero(newg)[0]
                counts = np.diff(np.append(gstart, len(hv)))
                gdoc = dv[gstart]
                gpos = pv[gstart]
                glen = ctl[gpos + n] - ctl[gpos] - 1
                if top:
                    dstart = np.nonzero(np.r_[True, gdoc[1:] != gdoc[:-1]])[0]
                    maxc_of = np.zeros(D, dtype=np.int64)
                    maxc_of[gdoc[dstart]] = np.maximum.reduceat(counts, dstart)
                    cand = counts == maxc_of[gdoc]
                    cdoc = gdoc[cand].tolist()
                    cst = (ctl[gpos[cand]] - doc_ctl0[gdoc[cand]]).tolist()
                    cln = glen[cand].tolist()
                    best: dict = {}
                    for d, st, ln in zip(cdoc, cst, cln):
                        s = joined_l[d][st : st + ln]
                        if d not in best or s > best[d]:
                            best[d] = s
                    for d, s in best.items():
                        res[d, oc] = maxc_of[d] * len(s) / Ls[d]
                else:
                    dmask = counts > 1
                    if dmask.any():
                        contrib = np.bincount(
                            gdoc[dmask],
                            weights=counts[dmask] * glen[dmask],
                            minlength=D,
                        )
                        nz = np.nonzero(contrib)[0]
                        res[nz, oc] = contrib[nz] / Ls[nz]
            for j, m in enumerate(REPETITION_METRICS):
                pdf[m] = res[:, j]
            yield pdf

    return df.mapInPandas(compute, schema)


# Rae et al. 2021 Table A1 thresholds — the complete published set
GOPHER_REPETITION_THRESHOLDS = {
    "dup_line_frac": 0.30,
    "dup_para_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "dup_para_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_char_frac": 0.15,
    "dup_6gram_char_frac": 0.14,
    "dup_7gram_char_frac": 0.13,
    "dup_8gram_char_frac": 0.12,
    "dup_9gram_char_frac": 0.11,
    "dup_10gram_char_frac": 0.10,
}


def gopher_repetition_filter(df: DataFrame, col: str = "text") -> DataFrame:
    """repetition_stats + `keep_repetition` boolean: True iff every metric
    is at or under its published Gopher threshold."""
    d = repetition_stats(df, col)
    keep = F.lit(True)
    for m, t in GOPHER_REPETITION_THRESHOLDS.items():
        keep = keep & (F.col(m) <= F.lit(t))
    return d.withColumn("keep_repetition", keep)


# the Rae et al. 2021 Table A1 "quality" rules implemented in
# gopher_quality_stats, with their published bounds
GOPHER_QUALITY_THRESHOLDS = {
    "n_words": (50, 100000),
    "mean_word_len": (3.0, 10.0),
    "symbol_word_ratio": (None, 0.1),
    "bullet_line_frac": (None, 0.9),
    "ellipsis_line_frac": (None, 0.3),
    "alpha_word_frac": (0.8, None),
    "stopword_count": (2, None),
}

_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_stats(df: DataFrame, col: str = "text") -> DataFrame:
    """The non-repetition Gopher quality metrics (Rae et al. 2021 Table
    A1), per document, as narrow JVM expressions — no UDFs, no shuffles:

    - n_words (space-run tokens) and mean word length;
    - symbol_word_ratio: '#' / ellipsis ('...' or Unicode) occurrences per
      word;
    - bullet_line_frac / ellipsis_line_frac: lines starting with a bullet
      / ending with an ellipsis;
    - alpha_word_frac: words containing at least one A-Za-z character;
    - stopword_count: distinct hits from the canonical 8-stopword list
      (lowercased exact-token match).

    Counts of multi-char needles use length-difference-after-replace
    (non-overlapping, left-to-right — identical semantics in any engine,
    which keeps the metrics SQL-oracle-able)."""
    c = F.col(col)
    toks = F.split(c, " +")
    n_words = F.size(toks)
    word_chars = F.length(F.regexp_replace(c, " +", ""))
    hash_cnt = F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))
    uni_ell = F.length(c) - F.length(F.replace(c, F.lit("…"), F.lit("")))
    dot_ell = (F.length(c) - F.length(F.replace(c, F.lit("..."), F.lit("")))) / F.lit(3)
    lines = F.split(c, "\n")
    n_lines = F.size(lines)
    bullets = F.size(F.filter(lines, lambda x: x.rlike(r"^\s*[-*•]")))
    ell_lines = F.size(
        F.filter(lines, lambda x: x.endswith("...") | x.endswith("…"))
    )
    alpha_words = F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]")))
    low = F.transform(toks, F.lower)
    # bind the lowered-token array once: the lambda otherwise re-splits and
    # re-lowers the text once PER STOPWORD (operators/dedup.bind_once)
    from ..operators.dedup import bind_once

    stop_hits = bind_once(
        low,
        lambda lw: F.size(
            F.filter(
                F.array(*[F.lit(s) for s in _GOPHER_STOPWORDS]),
                lambda s: F.array_contains(lw, s),
            )
        ),
    )
    return (
        df.withColumn("n_words", n_words)
        .withColumn("mean_word_len", word_chars / n_words.cast("double"))
        .withColumn(
            "symbol_word_ratio", (hash_cnt + uni_ell + dot_ell) / n_words.cast("double")
        )
        .withColumn("bullet_line_frac", bullets / n_lines.cast("double"))
        .withColumn("ellipsis_line_frac", ell_lines / n_lines.cast("double"))
        .withColumn("alpha_word_frac", alpha_words / n_words.cast("double"))
        .withColumn("stopword_count", stop_hits)
    )


def gopher_quality_filter(df: DataFrame, col: str = "text") -> DataFrame:
    """gopher_quality_stats + `keep_quality` boolean: True iff every
    metric sits inside its published bound."""
    d = gopher_quality_stats(df, col)
    keep = F.lit(True)
    for m, (lo, hi) in GOPHER_QUALITY_THRESHOLDS.items():
        if lo is not None:
            keep = keep & (F.col(m) >= F.lit(lo))
        if hi is not None:
            keep = keep & (F.col(m) <= F.lit(hi))
    return d.withColumn("keep_quality", keep)


C4_MIN_WORDS_PER_LINE = 5  # Raffel et al. 2020 §2.2 / TF c4_utils
C4_MIN_SENTENCES = 3


def c4_clean(df: DataFrame, col: str = "text") -> DataFrame:
    """The C4 cleaning recipe (Raffel et al. 2020, "Exploring the Limits
    of Transfer Learning", §2.2) as narrow JVM expressions:

    - line level: keep only lines ending in terminal punctuation
      (. ! ? or closing quote), containing at least 5 space-separated
      words (the paper's MIN_WORDS_PER_LINE), and not mentioning
      'javascript'; `clean_text` is the kept lines re-joined;
    - doc level: `keep_c4` is True iff the cleaned page still has at
      least 3 sentences (the paper's MIN_NUM_SENTENCES) and the ORIGINAL
      text contains neither 'lorem ipsum' nor '{'. A sentence is a
      maximal RUN of terminal punctuation (`[.!?]+`), so an ellipsis
      '...' counts once, not three times (Raffel et al. don't publish
      their sentence splitter; a run-count is the closest shuffle-free
      convention).

    Published rules intentionally NOT implemented here: the "bad words"
    page filter (needs the external List-of-Dirty-Naughty-etc wordlist),
    langdetect English-only filtering (see lang_id for the engine's
    language-ID surface), and three-sentence-span dedup (corpus-level
    deduplication, not a per-document scalar rule — implemented as
    operators.dedup.c4_span_dedup).

    Adds clean_text, n_sentences, keep_c4; never drops rows itself (the
    caller filters on keep_c4) so audits can inspect rejected pages."""
    c = F.col(col)
    lines = F.split(c, "\n")
    kept = F.filter(
        lines,
        lambda x: x.rlike('[.!?"]\\s*$')
        & (F.size(F.split(F.trim(x), " +")) >= C4_MIN_WORDS_PER_LINE)
        & ~F.lower(x).contains("javascript"),
    )
    clean = F.array_join(kept, "\n")
    n_sent = F.regexp_count(clean, F.lit("[.!?]+"))
    keep = (
        (n_sent >= F.lit(C4_MIN_SENTENCES))
        & ~F.lower(c).contains("lorem ipsum")
        & ~c.contains("{")
    )
    return (
        df.withColumn("clean_text", clean)
        .withColumn("n_sentences", n_sent)
        .withColumn("keep_c4", keep)
    )


# C0 controls except \t \n \r, plus DEL — the curation-standard strip set
# (CCNet/Dolma normalize before hashing). RE2-dialect character class.
CONTROL_CHAR_PATTERN = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"


def normalize_text(
    df: DataFrame,
    col: str = "text",
    out_col: str | None = None,
    form: str = "NFC",
    strip_controls: bool = True,
    collapse_ws: bool = False,
) -> DataFrame:
    """Unicode text normalization — the step CCNet/Dolma run BEFORE any
    hashing/dedup so that byte-different, canonically-equal texts ("é" vs
    "e"+U+0301) dedupe together: (1) strip C0 control chars + DEL (keeping
    tab/newline/CR), (2) canonical-normalize to `form` (NFC default), and
    optionally (3) collapse whitespace runs to one space. Order is
    load-bearing: controls are stripped FIRST because a control byte
    sitting between a base char and its combining mark blocks composition
    — strip-then-NFC composes it, NFC-then-strip leaves it decomposed.

    Engine note (discovered r8): this environment's pyarrow 16
    `utf8_normalize` is a silent NO-OP for every form (returns its input
    unchanged — e+U+0301 stays decomposed under form='NFC'), so the
    normalize step uses CPython's `unicodedata.normalize` (the C
    implementation of UAX #15) inside the same Arrow batch pass, with the
    `unicodedata.is_normalized` quick-check so already-NFC (e.g. pure
    ASCII) batches pay one C call per string and zero copies. The regex
    steps stay vectorized RE2 (`pyarrow.compute.replace_substring_regex`).
    Cross-engine oracle: DuckDB's `nfc_normalize` is utf8proc — a THIRD
    independent UAX #15 implementation — so the entry's hash gate
    cross-validates CPython against utf8proc every round.

    Scale shape: one narrow mapInPandas pass — no shuffle, no driver
    state; composes with any downstream dedup/fingerprint. NULL rows stay
    NULL; non-string floats coming out of pandas (NaN for NULL) are
    mapped back to NULL, matching both engines."""
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form: {form}")
    out = out_col or col
    fields = [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
    if out not in df.columns:
        fields.append(f"`{out}` string")
    schema = ", ".join(fields)

    def norm(batches):
        import unicodedata  # noqa: PLC0415 — worker-side import

        import pyarrow as pa  # noqa: PLC0415
        import pyarrow.compute as pc  # noqa: PLC0415

        for pdf in batches:
            arr = pa.Array.from_pandas(pdf[col])
            if strip_controls:
                arr = pc.replace_substring_regex(
                    arr, pattern=CONTROL_CHAR_PATTERN, replacement=""
                )
            vals = arr.to_pylist()
            vals = [
                t
                if t is None or unicodedata.is_normalized(form, t)
                else unicodedata.normalize(form, t)
                for t in vals
            ]
            arr = pa.array(vals, type=pa.string())
            if collapse_ws:
                arr = pc.replace_substring_regex(arr, pattern=r"\s+", replacement=" ")
            pdf[out] = arr.to_pandas()
            yield pdf

    return df.mapInPandas(norm, schema)


# Ordered HTML strip chain (Java-regex ∩ RE2 dialect, like
# DEFAULT_SCRUB_PATTERNS): comments and script/style WITH their content
# first (non-greedy to the first closer), then block-level closers to
# newline (paragraph boundaries survive for sentence-level rules), then
# any remaining tag to a space (so adjacent words never fuse).
HTML_STRIP_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"(?is)<!--.*?-->", " "),
    (r"(?is)<script\b[^>]*>.*?</script\s*>", " "),
    (r"(?is)<style\b[^>]*>.*?</style\s*>", " "),
    (r"(?is)<(br|/p|/div|/li|/h[1-6]|/tr)\b[^>]*>", "\n"),
    (r"(?is)</?[a-z][^>]*>", " "),
)

# One-level named-entity decode, AFTER tag stripping so decoded text can
# never be re-parsed as markup ('&lt;script&gt;' becomes literal
# '<script>' text, not a strippable tag). '&amp;' must decode LAST:
# '&amp;lt;' correctly yields the literal '&lt;'. Numeric entities other
# than &#39; are out of scope (a full decoder needs per-match codepoint
# synthesis, which neither JVM regexp_replace nor the SQL oracle can
# express; documented, not silent).
HTML_ENTITY_REPLACEMENTS: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def strip_html(df: DataFrame, col: str = "text", out_col: str | None = None,
               collapse_ws: bool = True) -> DataFrame:
    """HTML → text extraction for web-crawl curation (the step CCNet runs
    on WET records and Dolma on raw HTML before any quality/dedup rule):
    drop comments and script/style blocks WITH their payloads, convert
    block-level boundaries to newlines, strip remaining tags to spaces,
    decode the common named entities one level, and (default) collapse
    whitespace + trim.

    A regex chain is NOT a browser parser — no numeric-entity synthesis
    (see HTML_ENTITY_REPLACEMENTS), no CDATA, no malformed-nesting
    recovery; for boilerplate-quality extraction (trafilatura/readability)
    plug an external library at this same column boundary. What IS
    guaranteed: stray '<' followed by non-letters survives ('a < b',
    '<3'), a '</p>' hiding inside a script string does not truncate the
    strip (script removal runs first), and decoded entities are inert
    text (decode runs after stripping).

    Scale shape: one narrow whole-stage-codegen projection — an ordered
    JVM regexp_replace/replace chain exactly like scrub_pii, no shuffle,
    no Python. Patterns are Java-regex ∩ RE2 by contract so the DuckDB
    oracle replays them verbatim."""
    out = out_col or col
    expr = F.col(col)
    for pat, repl in HTML_STRIP_PATTERNS:
        expr = F.regexp_replace(expr, pat, repl)
    for ent, ch in HTML_ENTITY_REPLACEMENTS:
        expr = F.replace(expr, F.lit(ent), F.lit(ch))
    if collapse_ws:
        expr = F.trim(F.regexp_replace(expr, r"\s+", " "))
    return df.withColumn(out, expr)


def corpus_datacard(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-source corpus composition report — the 'datacard' table every
    published corpus ships (The Pile §2 component table, Dolma's dataset
    sheet, C4's composition stats): docs, whitespace tokens, length
    moments, language mix, and exact duplicate-text ratio per group.

    One partial-aggregating groupBy over the corpus; every metric is an
    exact aggregate (map-side combine; the distinct-text count uses a
    two-level agg keyed by (group, text-hash) so the corpus-sized distinct
    never builds a per-group hash set driver-side). Scale: output is
    |groups| rows; no window, no UDF, whole-stage codegen."""
    toks = token_count_ws(text_col)
    base = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(toks).alias("total_tokens"),
        F.round(F.avg(toks), 6).alias("avg_tokens"),
        F.round(F.avg(F.length(text_col)), 6).alias("avg_chars"),
        F.countDistinct(lang_col).alias("n_langs"),
        F.round(
            F.avg(F.when(F.col(lang_col) == "en", 1.0).otherwise(0.0)), 6
        ).alias("pct_en"),
    )
    # distinct texts per group via an inner agg on (group, text) — the
    # shuffle key includes the text hash, so a group with 10^9 docs is
    # spread over the cluster, not one task. NULL texts are excluded from
    # the count (SQL count(DISTINCT text) semantics — ADVICE r8: the
    # pre-r9 bucket count scored a NULL-text bucket as one distinct
    # "text"); a group whose every text is NULL still appears, with 0.
    dist = (
        df.groupBy(group_col, F.xxhash64(text_col).alias("_th"))
        .agg(F.max(F.col(text_col).isNotNull()).alias("_nn"))
        .groupBy(group_col)
        .agg(F.count(F.when(F.col("_nn"), 1)).alias("distinct_texts"))
    )
    return base.join(dist, group_col)
