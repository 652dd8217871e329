"""Pure-pandas oracle pipeline: parse → mine → assign → enrich → route →
aggregate, sequentially, in canonical (conv_id, turn_idx) order.

This is the golden truth for the e2e equality tests (SURVEY.md §5.1). It
shares the Drain core (``drain_core``), the hash (``hashing``), the parse
regexes and the thresholds (``config``) with the Spark engine, so any
disagreement isolates a fault in the DISTRIBUTED plumbing (sharding,
ordering, broadcast, UDF batching) rather than in algorithm definitions.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd

from .. import drain_core as dc
from ..config import DETECTED_TS_RE, LEVEL_RE, PipelineConfig
from ..hashing import template_id, xxh64


@dataclass
class OracleResult:
    turns_parsed: pd.DataFrame          # transcripts + template/level/params columns
    templates: pd.DataFrame             # template_id, template_str, token_count, shard_key
    routed: pd.DataFrame                # turns_parsed + enrich + routing columns
    agg_template_tool: pd.DataFrame     # window_start, template_id, tool, n_turns
    sink_counts: pd.DataFrame           # template_class, anomaly_flag, n


def mine_catalogs(texts_by_subshard: dict[tuple[str, int], list[str]], cfg: PipelineConfig) -> dict[str, list[list[str]]]:
    """Pass 1: mine each salted sub-shard sequentially (caller provides
    canonical-order texts), then merge sub-shards per logical shard in salt
    order (deterministic)."""
    pats = dc.compile_patterns(tuple(cfg.preprocess_patterns))
    per_shard: dict[str, list[tuple[int, list[list[str]]]]] = {}
    for (skey, salt), texts in texts_by_subshard.items():
        lines = [dc.preprocess(t, pats) for t in texts]
        cat = dc.mine_shard(lines, cfg.sim_threshold)
        per_shard.setdefault(skey, []).append((salt, cat))
    return {
        skey: dc.merge_catalogs([cat for _, cat in sorted(subs)])
        for skey, subs in per_shard.items()
    }


def run_oracle(
    transcripts: pd.DataFrame,
    tool_lookup: pd.DataFrame,
    role_lookup: pd.DataFrame,
    cfg: PipelineConfig | None = None,
) -> OracleResult:
    cfg = cfg or PipelineConfig()
    df = transcripts.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)

    # --- parse (same regexes the Spark side uses) ---------------------------
    level = df["text"].astype(str).str.extract(LEVEL_RE, expand=False)
    detected_ts = df["text"].astype(str).str.extract(DETECTED_TS_RE, expand=False)

    # --- shard keys + salt ---------------------------------------------------
    texts = df["text"].astype(str).tolist()
    pats = dc.compile_patterns(tuple(cfg.preprocess_patterns))
    skeys = [dc.shard_key_str(t, cfg.depth, pats) for t in texts]
    salts = [xxh64(c) % cfg.salt_buckets for c in df["conv_id"].astype(str)]

    # --- pass 1: mine --------------------------------------------------------
    by_sub: dict[tuple[str, int], list[str]] = {}
    for t, sk, sa in zip(texts, skeys, salts):
        if t == "":
            continue
        by_sub.setdefault((sk, sa), []).append(t)
    catalogs = mine_catalogs(by_sub, cfg)

    # --- pass 2: assign ------------------------------------------------------
    tmpl_strs: list[str] = []
    params_list: list[dict[str, str]] = []
    for t, sk in zip(texts, skeys):
        if t == "":
            tmpl_strs.append(dc.EMPTY_TEMPLATE)
            params_list.append({})
            continue
        toks = dc.tokenize(dc.preprocess(t, pats))
        cat = catalogs[sk]
        idx, _ = dc.assign_line(toks, cat, cfg.sim_threshold)
        if idx < 0:
            # the mining invariant guarantees every non-empty line reaches
            # sim 1.0 vs its final template; a negative index here means the
            # engine/oracle preprocess drifted — fail loudly, never fall
            # through to cat[-1] (a silently wrong golden value)
            raise AssertionError(
                f"oracle mining invariant violated: no template matched "
                f"line {t!r} in shard {sk!r} (catalog size {len(cat)})"
            )
        tpl = cat[idx]
        tmpl_strs.append(" ".join(tpl))
        params_list.append(dc.extract_params(toks, tpl))

    out = df.copy()
    out["level"] = level
    out["detected_ts"] = detected_ts
    out["template_str"] = tmpl_strs
    out["template_id"] = [template_id(s) for s in tmpl_strs]
    out["params"] = params_list

    # --- templates table ------------------------------------------------------
    rows = []
    seen: set[str] = set()
    for sk, cat in sorted(catalogs.items()):
        for tpl in cat:
            s = " ".join(tpl)
            if s in seen:
                continue
            seen.add(s)
            rows.append((template_id(s), s, len(tpl), xxh64(sk)))
    # reserved <EMPTY> template is always in the catalog (engine spec)
    rows.append((template_id(dc.EMPTY_TEMPLATE), dc.EMPTY_TEMPLATE, 0, xxh64("0|")))
    templates = pd.DataFrame(rows, columns=["template_id", "template_str", "token_count", "shard_key"])

    # --- enrich (broadcast-join analog) --------------------------------------
    routed = out.merge(tool_lookup, on="tool", how="left").merge(role_lookup, on="role", how="left")

    # --- rarity over event-time windows --------------------------------------
    routed["window_start"] = routed["ts"].dt.floor("h")
    wc = routed.groupby(["window_start", "template_id"]).size().rename("window_count").reset_index()
    routed = routed.merge(wc, on=["window_start", "template_id"], how="left")
    routed["rarity_score"] = 1.0 / routed["window_count"]
    routed["anomaly_flag"] = routed["window_count"] < cfg.anomaly_min_count

    # --- template class -------------------------------------------------------
    gc = routed.groupby("template_id").size().rename("global_count").reset_index()
    routed = routed.merge(gc, on="template_id", how="left")
    n_params = routed["template_str"].str.count(r"<\*>")
    routed["template_class"] = "parameterized"
    routed.loc[n_params == 0, "template_class"] = "fixed"
    routed.loc[routed["global_count"] < cfg.rare_min_count, "template_class"] = "rare"
    routed = routed.drop(columns=["window_count", "global_count"])

    # --- aggregates -------------------------------------------------------------
    agg = (
        routed.groupby(["window_start", "template_id", "tool"])
        .size()
        .rename("n_turns")
        .reset_index()
        .sort_values(["window_start", "template_id", "tool"])
        .reset_index(drop=True)
    )
    sink_counts = (
        routed.groupby(["template_class", "anomaly_flag"])
        .size()
        .rename("n")
        .reset_index()
        .sort_values(["template_class", "anomaly_flag"])
        .reset_index(drop=True)
    )
    return OracleResult(out, templates, routed, agg, sink_counts)
