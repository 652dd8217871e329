"""`curate()` — the full published pretraining-cleanup recipe as ONE
composition over the engine's curation operators, with a per-row audit
trail.

The published pipelines (C4 §2.2, CCNet, Gopher/MassiveText §A1.1,
RefinedWeb §3, Dolma) all run the same macro shape:

    language filter → quality heuristics → rule filters (Gopher/C4) →
    exact dedup → near dedup → (budget/mixing)

This module wires the engine's existing operators into that shape behind
a single config, DROPPING NOTHING SILENTLY: every input row lands in the
audit table with either reason NULL (kept) or the FIRST rule that
rejected it (first-match-wins precedence, the dead-letter convention of
job.reject_reason — one reason per row, stable under reordering of the
later checks).

Precedence (fixed): null_text → lang → quality → gopher_quality →
repetition → c4 → exact_dup → near_dup → budget. Filters run before dedup (the
Gopher/RefinedWeb order — deduping rows that filters will kill anyway
wastes the expensive stages), dedup before budget (a budget drawn from
an un-deduped corpus over-represents duplicated content).

Scale shape: the row-local stages (lang/quality/gopher/c4) are narrow —
one reason expression over flag columns, no shuffle beyond what each
operator needs (repetition_stats is the one Arrow pass; the rest are
codegen). The corpus stages reuse the hot-key-safe operators: exact
dedup is keep-min-id via PARTIAL agg + join (not a window — the module
deliberately does NOT reuse dedup_exact's row_number window here so a
hot text can't serialize one task); near-dup is the bucketed
MinHash-LSH or the PPJoin-filtered exact-Jaccard join; budget is
token_budget_sample with its lossless bucket-cutoff defusal available
via config.

Correctness: `tests/test_curate.py` pins composition ≡ applying the
stages manually, reason precedence on planted defect rows, and
parallelism invariance; the `docs_curated` entry runs a 4-stage config
whose every step is SQL-expressible, hash-ORACLED end to end.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REASONS = (
    "null_text",
    "lang",
    "quality",
    "gopher_quality",
    "repetition",
    "c4",
    "exact_dup",
    "near_dup",
    "budget",
)


@dataclass(frozen=True)
class CurationConfig:
    lang: str | None = "en"               # None disables the language filter
    min_quality: float | None = 0.5       # quality_score floor; None disables
    gopher_quality: bool = False          # Rae et al. Table A1 quality bounds
    gopher_repetition: bool = False       # Table A1 repetition thresholds
    c4: bool = False                      # Raffel et al. §2.2 doc-level rules
    exact_dedup: bool = True              # keep-min-id per distinct text
    near_dup: str | None = None           # None | "minhash" | "jaccard"
    near_dup_threshold: float = 0.8
    token_budget_per_group: int | None = None
    group_col: str = "source"
    budget_cutoff_buckets: int | None = None  # token_budget skew defusal
    budget_portable_hash: bool = False  # knuth hash (SQL-replayable) vs xxhash64


def flag_rows(
    df: DataFrame,
    config: CurationConfig = CurationConfig(),
    text_col: str = "text",
) -> DataFrame:
    """Apply the ROW-LOCAL stages (null_text -> lang -> quality ->
    gopher_quality -> repetition -> c4) and return the input columns plus
    `_reason` (NULL = passed every enabled row-local rule). This is the
    per-row half of curate(), shared with streaming.stream_curate — the
    corpus-level stages (dedup/budget) need cross-row state and live in
    curate() / stream_incremental_dedup."""
    from .functions.text import (
        c4_clean,
        gopher_quality_filter,
        gopher_repetition_filter,
        lang_id,
        quality_score,
    )

    cols = df.columns
    d = df
    # NULL text is rejected FIRST (the dead-letter 'null_text' convention):
    # every downstream predicate is NULL-safe-false on NULL input, so
    # without this a NULL row would sail through the filters and then trip
    # the budget stage's non-null weight contract with an opaque error.
    conds: list[tuple] = [("null_text", F.col(text_col).isNull())]
    if config.lang is not None:
        d = d.withColumn("_lang_pred", lang_id(text_col))
        conds.append(("lang", F.col("_lang_pred") != config.lang))
    if config.min_quality is not None:
        # rounded to 6 decimals so the threshold rule is decimal-portable
        # (the oracle replays the same arithmetic in DuckDB; raw-float
        # compares at the boundary would depend on engine float paths)
        d = d.withColumn("_quality", F.round(quality_score(text_col), 6))
        conds.append(("quality", F.col("_quality") < config.min_quality))
    if config.gopher_quality:
        d = gopher_quality_filter(d, text_col)
        conds.append(("gopher_quality", ~F.col("keep_quality")))
    if config.gopher_repetition:
        d = gopher_repetition_filter(d, text_col)
        conds.append(("repetition", ~F.col("keep_repetition")))
    if config.c4:
        d = c4_clean(d, text_col)
        conds.append(("c4", ~F.col("keep_c4")))

    reason = F.lit(None).cast("string")
    for r, cond in reversed(conds):
        reason = F.when(cond, F.lit(r)).otherwise(reason)
    return d.select(*cols, reason.alias("_reason"))


def curate(
    df: DataFrame,
    config: CurationConfig = CurationConfig(),
    text_col: str = "text",
    id_col: str = "doc_id",
    caches: list | None = None,
) -> dict:
    """Run the configured recipe. Returns
    {"kept": <surviving rows, original columns>,
     "audit": <(id, reason) for EVERY input row; kept rows have NULL>,
     "datacard": <corpus_datacard of kept, or None without group_col>}.
    All three are lazy DataFrames sharing one lineage.

    Each stage's survivor frame feeds 2-3 downstream scans (keeper agg +
    drop anti-join + semi-join back), so it is materialized ONCE via
    compute_once — without that the expensive row-local stages (the
    repetition Arrow pass especially) would recompute per scan per stage.
    `caches` as in operators.dedup.compute_once: pass a list for the
    fault-tolerant persist path on long jobs (caller unpersists);
    default is a lazy localCheckpoint."""
    from .functions.text import corpus_datacard, token_count_ws
    from .operators.dedup import compute_once

    if config.near_dup not in (None, "minhash", "jaccard"):
        raise ValueError(f"near_dup must be None|'minhash'|'jaccard', got {config.near_dup!r}")

    cols = df.columns
    flagged = compute_once(flag_rows(df, config, text_col), caches)
    audits = [flagged.filter(F.col("_reason").isNotNull()).select(id_col, F.col("_reason").alias("reason"))]
    surv = flagged.filter(F.col("_reason").isNull()).drop("_reason")

    if config.exact_dedup:
        keep = surv.groupBy(F.xxhash64(F.col(text_col)).alias("_th")).agg(
            F.min(id_col).alias(id_col)
        )
        dropped = surv.join(keep, id_col, "left_anti").select(
            id_col, F.lit("exact_dup").alias("reason")
        )
        audits.append(dropped)
        surv = compute_once(
            surv.withColumn("_th", F.xxhash64(F.col(text_col)))
            .join(keep, ["_th", id_col], "left_semi")
            .drop("_th"),
            caches,
        )

    if config.near_dup is not None:
        if config.near_dup == "minhash":
            from .operators.dedup import near_dup_groups

            groups = near_dup_groups(
                surv, text_col, id_col, threshold=config.near_dup_threshold
            )
        else:
            from .operators.dedup import connected_components, ngram_jaccard_near_dups

            pairs = ngram_jaccard_near_dups(
                surv, text_col, id_col, threshold=config.near_dup_threshold
            )
            labels = connected_components(pairs.select("id_a", "id_b"))
            groups = labels.select(
                F.col("node").alias(id_col),
                (F.col("node") == F.col("label")).alias("keep"),
            )
        drops = groups.filter(~F.col("keep")).select(id_col)
        audits.append(drops.select(id_col, F.lit("near_dup").alias("reason")))
        surv = compute_once(surv.join(drops, id_col, "left_anti"), caches)

    if config.token_budget_per_group is not None:
        from .operators.sampling import KNUTH_M, knuth_hash, token_budget_sample

        hash_kwargs = (
            {"hash_expr": knuth_hash(id_col), "hash_range": KNUTH_M}
            if config.budget_portable_hash
            else {}
        )
        sel = token_budget_sample(
            surv.withColumn("_ntok", token_count_ws(text_col)),
            config.group_col,
            config.token_budget_per_group,
            "_ntok",
            id_col,
            cutoff_buckets=config.budget_cutoff_buckets,
            **hash_kwargs,
        ).drop("_ntok")
        dropped = surv.join(sel.select(id_col), id_col, "left_anti").select(
            id_col, F.lit("budget").alias("reason")
        )
        audits.append(dropped)
        surv = sel

    kept = surv.select(*cols)
    audit = kept.select(id_col, F.lit(None).cast("string").alias("reason"))
    for a in audits:
        audit = audit.unionByName(a)
    datacard = (
        corpus_datacard(kept, group_col=config.group_col, text_col=text_col)
        if config.group_col in cols and "lang" in cols
        else None
    )
    return {"kept": kept, "audit": audit, "datacard": datacard}
