"""Drain template mining — pure-Python core shared by the Spark engine and
the pandas oracle.

Implements the published Drain algorithm (He et al., "Drain: An Online Log
Parsing Approach with Fixed Depth Tree", ICWS 2017) with the exact semantics
observed in the reference implementation (cited by file:line below), plus
the determinism fixes this engine specifies (SURVEY.md §7.0):

- preprocess: first-match-wins strip of leading noise patterns
  (reference: src/drain_parser.cpp:112-127; only ONE pattern ever fires).
- tokenize on single space, empty tokens preserved
  (reference: src/drain_parser.cpp:37-48, folly::split semantics).
- ``is_number``: optional leading +/-/. then digits with at most one dot;
  single-char strings must be a digit (reference: src/drain_parser.cpp:50-71).
- tree descent keyed by token count then the first ``depth`` masked tokens,
  ``max_children`` overflow routed to a ``<*>`` child
  (reference: src/drain_parser.cpp:278-336).
- similarity = (#positions exactly equal or template-token ``<*>``) / len;
  match iff >= threshold (reference: src/drain_parser.cpp:338-348,427-439).
- merge: differing positions become ``<*>`` (reference:
  src/drain_parser.cpp:444-481); new clusters pre-mark numeric positions
  as parameters (reference: src/drain_parser.cpp:486-494).

Determinism deviations (shared with the oracle, so equality is checkable):

- empty text maps to a fixed ``<EMPTY>`` template instead of minting a fresh
  cluster per empty line (reference quirk at src/drain_parser.cpp:280-288).
- template ids are content hashes (``hashing.template_id``), not
  arrival-order atomics (reference: src/drain_parser.cpp:547).
- two-pass mine-then-assign: the final per-shard template catalog is mined
  first, then every line is re-matched against the *final* catalog, so the
  assignment is a pure function of (line, catalog) and independent of
  parallelism / arrival order.
- ``max_children`` overflow is modeled ONLY by the sequential ``DrainTree``
  (below, exactly the reference's :317-332 routing). The DISTRIBUTED
  two-pass miner (operators/drain.py) keys every distinct masked prefix to
  its own shard and does NOT overflow-merge: on adversarial data (one
  prefix position with > max_children distinct non-numeric values) the
  reference/DrainTree merges the overflow lines under one ``<*>`` child
  while the distributed catalog keeps one template per distinct prefix.
  Deviation chosen deliberately: overflow routing is ARRIVAL-ORDER state
  (which child filled up first depends on scan order), so modeling it
  distributed would reintroduce the nondeterminism two-pass mining removes.
  Pinned by test_max_children_overflow_divergence.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

WILDCARD = "<*>"
EMPTY_TEMPLATE = "<EMPTY>"

# First-match-wins leading-noise patterns (reference: src/drain_parser.cpp:97-104).
DEFAULT_PREPROCESS_PATTERNS: tuple[str, ...] = (
    r"^\[[^\]]*\]",                                          # leading [...]
    r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2})?",  # ISO-8601
    r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}",                 # YYYY-MM-DD HH:MM:SS
    r"^\d{2}:\d{2}:\d{2}",                                   # HH:MM:SS
    r"^(?:ERROR|WARNING|WARN|INFO|DEBUG|TRACE|FATAL):?",     # leading level token
    r"^(?:Mon|Tue|Wed|Thu|Fri|Sat|Sun) (?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec) +\d{1,2} \d{2}:\d{2}:\d{2} \d{4}",
)

_COMPILED_PATTERNS = [re.compile(p) for p in DEFAULT_PREPROCESS_PATTERNS]

_COMPILE_CACHE: dict[tuple[str, ...], list[re.Pattern]] = {
    DEFAULT_PREPROCESS_PATTERNS: _COMPILED_PATTERNS
}


def compile_patterns(patterns: tuple[str, ...] | None) -> list[re.Pattern]:
    """Compile (and cache) a preprocess pattern set. `None` → the defaults.
    Pattern sets travel as STRINGS (re.Pattern doesn't pickle into Spark
    workers); workers compile once per distinct set via this cache.
    Reference analog: user-supplied patterns replace the defaults
    (src/drain_parser.cpp:256-267)."""
    if patterns is None:
        return _COMPILED_PATTERNS
    key = tuple(patterns)
    if key not in _COMPILE_CACHE:
        _COMPILE_CACHE[key] = [re.compile(p) for p in key]
    return _COMPILE_CACHE[key]


def preprocess(text: str, patterns: list[re.Pattern] | None = None) -> str:
    """Strip leading noise: content after the END of the first matching
    pattern's match, first-match-wins (only one pattern ever fires —
    reference: src/drain_parser.cpp:119-124), then strip one run of leading
    spaces so tokenization isn't polluted by the boundary."""
    pats = patterns if patterns is not None else _COMPILED_PATTERNS
    for pat in pats:
        m = pat.search(text)
        if m:
            return text[m.end():].lstrip(" ")
    return text


def tokenize(text: str) -> list[str]:
    """Split on single space; empty tokens between consecutive spaces are
    preserved (folly::split semantics, reference: src/drain_parser.cpp:37-48)."""
    return text.split(" ")


def is_number(tok: str) -> bool:
    """Exact port of the reference automaton (src/drain_parser.cpp:50-71):
    single-char strings must be a digit; otherwise an optional leading
    +, - or . then digits with at most one dot total; at least one digit."""
    if not tok:
        return False
    if len(tok) == 1:
        return tok.isdigit()
    i = 0
    dots = 0
    if tok[0] in "+-.":
        if tok[0] == ".":
            dots = 1
        i = 1
    saw_digit = False
    for c in tok[i:]:
        if c == ".":
            dots += 1
            if dots > 1:
                return False
        elif c.isdigit():
            saw_digit = True
        else:
            return False
    return saw_digit


def mask_token(tok: str) -> str:
    return WILDCARD if is_number(tok) else tok


def masked_prefix(tokens: list[str], depth: int = 4) -> tuple[str, ...]:
    """The first min(depth, len) masked tokens — together with token count
    this fully determines the reference tree's leaf
    (reference: src/drain_parser.cpp:296-312)."""
    return tuple(mask_token(t) for t in tokens[: min(depth, len(tokens))])


def shard_key_str(text: str, depth: int = 4, patterns: list[re.Pattern] | None = None) -> str:
    """Canonical string form of the shard key (token_count | masked prefix).

    Lines that can ever share a Drain cluster agree on this key, so mining
    state never crosses shards."""
    if text == "":
        return "0|"
    toks = tokenize(preprocess(text, patterns))
    return f"{len(toks)}|" + " ".join(masked_prefix(toks, depth))


def similarity(tokens: list[str], template: list[str]) -> float:
    """(#positions with exact match or template-token <*>) / len
    (reference: src/drain_parser.cpp:427-439). Caller guarantees equal length."""
    n = len(template)
    if n == 0:
        return 1.0
    hits = 0
    for t, c in zip(tokens, template):
        if c == WILDCARD or t == c:
            hits += 1
    return hits / n


@dataclass
class Cluster:
    """One mined cluster: a masked token template."""

    template: list[str]
    count: int = 0

    @property
    def template_str(self) -> str:
        return " ".join(self.template)


@dataclass
class ShardMiner:
    """Sequential Drain restricted to one leaf (one shard).

    Within a shard all lines share (token_count, masked prefix), so the
    fixed-depth tree collapses to a flat cluster list — this IS the
    reference's leaf-level match/merge loop (src/drain_parser.cpp:338-366)."""

    sim_threshold: float = 0.5
    clusters: list[Cluster] = field(default_factory=list)

    def add_line(self, tokens: list[str]) -> int:
        best_i, best_sim = -1, -1.0
        for i, cl in enumerate(self.clusters):
            if len(cl.template) != len(tokens):
                # shard contract guarantees equal token counts; guard anyway
                # (the reference tree guarantees this by keying the root on
                # token count, src/drain_parser.cpp:296-305)
                continue
            s = similarity(tokens, cl.template)
            if s > best_sim:  # strict > keeps earliest-created on ties
                best_i, best_sim = i, s
        if best_i >= 0 and best_sim >= self.sim_threshold:
            cl = self.clusters[best_i]
            # merge: differing positions -> <*> (src/drain_parser.cpp:444-481)
            cl.template = [
                c if (c == WILDCARD or c == t) else WILDCARD
                for t, c in zip(tokens, cl.template)
            ]
            cl.count += 1
            return best_i
        # new cluster: numeric positions pre-masked (src/drain_parser.cpp:486-494)
        self.clusters.append(Cluster([mask_token(t) for t in tokens], count=1))
        return len(self.clusters) - 1


class DrainTree:
    """Full fixed-depth prefix tree for the generic (non-sharded) sequential
    mode — used by the plain `drain parse` source operator and unit tests.

    Reference: src/drain_parser.cpp:278-336 (descent), :317-332
    (max_children overflow to a <*> child)."""

    def __init__(self, depth: int = 4, sim_threshold: float = 0.5, max_children: int = 100):
        self.depth = depth
        self.sim_threshold = sim_threshold
        self.max_children = max_children
        self.root: dict = {}

    def _leaf(self, tokens: list[str]) -> ShardMiner:
        node = self.root.setdefault(len(tokens), {})
        for i in range(min(self.depth, len(tokens))):
            key = mask_token(tokens[i])
            children = node.setdefault("children", {})
            if key not in children and len(children) >= self.max_children:
                key = WILDCARD
            node = children.setdefault(key, {})
        return node.setdefault("leaf", ShardMiner(self.sim_threshold))

    def add_line(self, text: str) -> str:
        """Mine one line; returns the cluster's current template string."""
        if text == "":
            return EMPTY_TEMPLATE
        tokens = tokenize(preprocess(text))
        leaf = self._leaf(tokens)
        i = leaf.add_line(tokens)
        return leaf.clusters[i].template_str

    def templates(self) -> list[str]:
        out: list[str] = []

        def walk(node: dict) -> None:
            if "leaf" in node:
                out.extend(c.template_str for c in node["leaf"].clusters)
            for child in node.get("children", {}).values():
                walk(child)

        for n in self.root.values():
            walk(n)
        return out


def mine_shard(lines: list[str], sim_threshold: float = 0.5) -> list[list[str]]:
    """Pass 1 for one (sub-)shard: sequential Drain over *lines* (caller
    supplies canonical (conv_id, turn_idx) order); returns the FINAL template
    token lists in creation order.

    Unique-line shortcut: each distinct line is mined once, at its FIRST
    occurrence. A repeat occurrence could in principle merge into a
    different (eroded) cluster than its first did, so this is a documented
    deviation from strict one-pass Drain — chosen because parameterized
    logs are duplicate-heavy and the oracle shares this exact function, so
    engine/oracle equality is preserved by construction (and pass 2
    re-assigns every row against the final catalog anyway)."""
    miner = ShardMiner(sim_threshold)
    seen: set[str] = set()
    for line in lines:
        if line in seen:
            continue
        seen.add(line)
        miner.add_line(tokenize(line))
    return [c.template for c in miner.clusters]


def merge_catalogs(catalogs: list[list[list[str]]]) -> list[list[str]]:
    """Merge sub-shard catalogs (salted sub-shards of one logical shard):
    identical masked forms collapse; order = first appearance across
    sub-shards sorted by the caller (deterministic)."""
    seen: dict[tuple[str, ...], list[str]] = {}
    for cat in catalogs:
        for tpl in cat:
            seen.setdefault(tuple(tpl), tpl)
    return list(seen.values())


def assign_line(
    tokens: list[str], catalog: list[list[str]], sim_threshold: float = 0.5
) -> tuple[int, float]:
    """Pass 2: match a line against the FINAL catalog of its shard.

    Returns (index of best template, similarity); (-1, 0.0) if none clears
    the threshold (cannot happen for a line that participated in mining —
    merging never lowers a member line's similarity below 1.0). Ties break
    to the earliest-created template."""
    best_i, best_sim = -1, -1.0
    for i, tpl in enumerate(catalog):
        if len(tpl) != len(tokens):
            continue
        s = similarity(tokens, tpl)
        if s > best_sim:
            best_i, best_sim = i, s
    if best_sim >= sim_threshold:
        return best_i, best_sim
    return -1, 0.0


def extract_params(tokens: list[str], template: list[str]) -> dict[str, str]:
    """param_<idx> -> token for every wildcard position
    (reference: src/drain_parser.cpp:525-535; we keep per-LINE values rather
    than the reference's last-write-wins shared attribute vector)."""
    return {
        f"param_{i}": t
        for i, (t, c) in enumerate(zip(tokens, template))
        if c == WILDCARD
    }
