"""Unit tests for the Drain core semantics (SURVEY.md §2.5 / §5.2)."""

from __future__ import annotations

import re

import pandas as pd
from hypothesis import given
from hypothesis import strategies as st

from log_analysis_ai_spark import drain_core as dc
from log_analysis_ai_spark.operators.drain import NUM_RE, preprocess_series

_NUM = re.compile(NUM_RE)

# C++ truth table cases (reference: src/drain_parser.cpp:50-71, FIXTURES.md §1.1)
TRUTH = {
    "+42": True, "-7": True, ".5": True, "3.14": True, "42": True, "5": True,
    "12.": True, "-5.": True, "+.5": True, "007": True,
    "1.2.3": False, "42a": False, "-": False, "+": False, ".": False,
    "..5": False, "-.": False, "": False, "abc": False, "1e5": False,
    "<*>": False, "--1": False, "++1": False, "1-2": False,
}


def test_is_number_truth_table():
    for tok, expect in TRUTH.items():
        assert dc.is_number(tok) == expect, tok


def test_num_regex_matches_automaton_on_truth_table():
    for tok, expect in TRUTH.items():
        assert bool(_NUM.fullmatch(tok)) == expect, tok


@given(st.text(alphabet="0123456789.+-aZ ", max_size=8))
def test_num_regex_equals_automaton(tok):
    assert bool(_NUM.fullmatch(tok)) == dc.is_number(tok), tok


def test_tokenize_preserves_empty_tokens():
    # folly::split semantics (reference: src/drain_parser.cpp:37-48)
    assert dc.tokenize("a  b") == ["a", "", "b"]
    assert dc.tokenize("") == [""]
    assert dc.tokenize(" x") == ["", "x"]


def test_preprocess_first_match_wins():
    # only ONE pattern ever fires (reference: src/drain_parser.cpp:119-124)
    assert dc.preprocess("[a] 12:00:00 rest") == "12:00:00 rest"
    assert dc.preprocess("INFO: User 1 logged in") == "User 1 logged in"
    assert dc.preprocess("2025-01-01 00:00:00 x") == "x"
    assert dc.preprocess("2025-01-01T00:00:00Z x") == "x"
    assert dc.preprocess("12:00:00 tail") == "tail"
    assert dc.preprocess("no noise here") == "no noise here"
    assert dc.preprocess("WARN disk full") == "disk full"


def test_preprocess_series_matches_scalar():
    texts = [
        "[agent] Task 5 completed", "INFO: ok", "2025-01-01 00:00:00 x",
        "12:00:00 y", "plain", "", "ERROR: bad thing 42",
        "2025-01-01T00:00:00Z Backup 1 completed size 2 mb",
    ]
    got = preprocess_series(pd.Series(texts)).tolist()
    assert got == [dc.preprocess(t) for t in texts]


def test_similarity():
    assert dc.similarity(["a", "b"], ["a", "b"]) == 1.0
    assert dc.similarity(["a", "b"], ["a", "<*>"]) == 1.0
    assert dc.similarity(["a", "b"], ["a", "c"]) == 0.5
    assert dc.similarity([], []) == 1.0


def test_shard_miner_merge_and_split():
    m = dc.ShardMiner(0.5)
    m.add_line(dc.tokenize("alpha beta gamma delta epsilon1 omega"))
    m.add_line(dc.tokenize("alpha beta gamma delta epsilon2 sigma"))
    # 4/6 shared -> merged, differing positions -> <*>
    assert [c.template_str for c in m.clusters] == ["alpha beta gamma delta <*> <*>"]
    m.add_line(dc.tokenize("alpha beta gamma delta p q r s t u"))  # different len: separate
    assert len(m.clusters) == 2


def test_below_threshold_creates_new_cluster():
    m = dc.ShardMiner(0.5)
    m.add_line(dc.tokenize("alpha beta gamma delta p q r s t u"))
    m.add_line(dc.tokenize("alpha beta gamma delta v w x y z zz"))  # 4/10 = 0.4 < 0.5
    assert len(m.clusters) == 2


def test_numbers_premasked_on_creation():
    m = dc.ShardMiner(0.5)
    m.add_line(dc.tokenize("User 42 logged in"))
    assert m.clusters[0].template_str == "User <*> logged in"


def test_assign_is_pure_function_of_catalog():
    cat = [["User", "<*>", "logged", "in"], ["User", "root", "logged", "out"]]
    i, s = dc.assign_line(["User", "7", "logged", "in"], cat)
    assert (i, s) == (0, 1.0)
    # tie -> earliest-created template
    i2, _ = dc.assign_line(["User", "root", "logged", "zz"], cat)
    assert i2 == 0  # sim 0.75 (wildcard counts) vs 0.75 -> first wins


def test_extract_params():
    toks = dc.tokenize("User 42 logged in")
    assert dc.extract_params(toks, ["User", "<*>", "logged", "in"]) == {"param_1": "42"}


def test_drain_tree_max_children_overflow():
    t = dc.DrainTree(depth=1, max_children=2)
    t.add_line("k1 x")
    t.add_line("k2 x")
    t.add_line("k3 x")  # 3rd distinct first-token routes to the <*> child
    assert "<*>" in t.root[2]["children"]


def test_max_children_overflow_divergence():
    """Property-pin the documented sequential-vs-distributed deviation
    (drain_core module docstring; reference: src/drain_parser.cpp:317-332):
    with > max_children distinct non-numeric values at a prefix position,
    the sequential DrainTree overflow-merges the excess lines under one
    <*> child, while the distributed shard key keeps every distinct masked
    prefix separate (overflow routing is arrival-order state — modeling it
    would break parallelism-invariant mining)."""
    n, cap = 10, 3
    lines = [f"svc{i} started worker thread ok" for i in range(n)]

    tree = dc.DrainTree(depth=4, sim_threshold=0.5, max_children=cap)
    for ln in lines:
        tree.add_line(ln)
    final = set(tree.templates())
    # first `cap` distinct first-tokens keep literal leaves; the other
    # n - cap lines share the <*> child and merge into ONE template
    assert "<*> started worker thread ok" in final
    assert len(final) == cap + 1

    # distributed: one shard (and thus one literal template) per line
    keys = {dc.shard_key_str(ln) for ln in lines}
    assert len(keys) == n
    distributed = {" ".join(tpl) for k in keys for tpl in [dc.mine_shard(
        [dc.preprocess(ln) for ln in lines if dc.shard_key_str(ln) == k])[0]]}
    assert distributed == set(lines)  # no overflow merge — the deviation


def test_merge_catalogs_dedupes_in_order():
    a = [["x", "<*>"], ["y", "z"]]
    b = [["y", "z"], ["w", "v"]]
    merged = dc.merge_catalogs([a, b])
    assert merged == [["x", "<*>"], ["y", "z"], ["w", "v"]]
