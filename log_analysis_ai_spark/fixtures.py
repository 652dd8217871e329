"""Deterministic synthetic transcript fixtures (FIXTURES.md).

Content-addressed generation: every field of every row is a pure function of
(conv_id, turn_idx) via xxh64 + splitmix64 mixing — no wall-clock, no global
RNG state — so any slice of the table can be regenerated independently and
two runs at different parallelism produce byte-identical rows. The text
catalog mirrors the shapes in the reference's sample data
(reference: python/samples/sample_logs.jsonl) and the Drain-relevant edge
cases (reference: src/drain_parser.cpp:50-71,97-104).
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

from .hashing import xxh64

EPOCH = dt.datetime(2025, 1, 1, 0, 0, 0)  # naive UTC (session TZ is UTC)
_GOLDEN = 0x9E3779B97F4A7C15
_M64 = 0xFFFFFFFFFFFFFFFF

TOOLS = ["search", "browser", "python", "bash", "editor"]


def _splitmix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public domain, Sebastiano Vigna) — vectorized."""
    z = (x + _GOLDEN) & _M64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _M64
    return z ^ (z >> 31)


# --- text catalog -----------------------------------------------------------
# (weight, format) — format placeholders {a} {b} {c} are filled from three
# deterministic ints; {f} is a float with 2 decimals. Weights are per-mille.
_CATALOG: list[tuple[int, str]] = [
    # fixed-text messages
    (50, "Database connection established"),
    (45, "System health check passed"),
    (40, "Cache flushed successfully"),
    (20, "Shutting down gracefully"),
    # parameterized messages (numbers -> <*> under Drain masking)
    (55, "Server started on port {a}"),
    (60, "User {a} logged in"),
    (45, "User {a} logged out"),
    (45, "Connection dropped for user {a} after {b} seconds"),
    (50, "Slow query detected {a} took {b} ms"),
    (50, "Task {a} completed in {b} ms"),
    (40, "High CPU usage detected {f} percent"),
    (35, "Memory usage at {f} percent on host web{a}"),
    (45, "Request {a} returned status {b} in {c} ms"),
    (30, "Retrying job {a} attempt {b}"),
    (30, "Backup {a} completed size {b} mb"),
    (30, "Disk {a} latency {b} ms"),
    (25, "Rate limit exceeded for client {a} requests {b} limit {c}"),
    # conversation/agent-flavored turns
    (55, "Can you search for topic{a} please"),
    (50, "I found {a} results for topic{b}"),
    (45, "Running tool with args {a} {b}"),
    (45, "Tool output exit code {a}"),
    (35, "Let me analyze item {a} for you"),
    # prefix-splitting case: non-numeric token inside the depth-4 masked
    # prefix -> one shard (and one rare template) per distinct value,
    # exercising the rare/anomaly routing volume
    (5, "Session tag{a} opened briefly"),
    (30, "The answer is {a} based on {b} sources"),
    # leading-noise variants exercising preprocess first-match-wins
    (25, "[agent] Task {a} completed in {b} ms"),
    (20, "[session-{a}] User {b} logged in"),
    (25, "2025-01-01 00:00:00 Server started on port {a}"),
    (20, "12:00:00 Slow query detected {a} took {b} ms"),
    (25, "INFO: User {a} logged in"),
    (20, "ERROR: Connection dropped for user {a} after {b} seconds"),
    (15, "2025-01-01T00:00:00Z Backup {a} completed size {b} mb"),
    # is_number edge tokens (reference truth table, src/drain_parser.cpp:50-71)
    (15, "Metric values +42 -7 .5 recorded"),
    (15, "Metric values {a} {b} 3.14 recorded"),
    (12, "Version 1.2.3 build 42a tag - released"),
    # token-count collisions: same shard (same first-4 masked tokens)
    (15, "alpha beta gamma delta epsilon{a} omega"),      # merges with next (sim 5/6)
    (15, "alpha beta gamma delta epsilon{a} sigma"),
    (10, "alpha beta gamma delta p q r s t u"),           # 4/10 = 0.4 < 0.5:
    (10, "alpha beta gamma delta v w x y z zz"),          #   stays a separate cluster
    # long-tail rare templates (anomaly routing)
    (2, "Rare audit event {a} escalated to tier {b}"),
    (2, "Unexpected token sequence {a} quarantined"),
    (1, "Cold start penalty {a} ms on shard {b}"),
    (1, "Manual override engaged by operator {a}"),
    # empty-text turns (~0.5%): reference quirk case (src/drain_parser.cpp:280-288)
    (5, ""),
]

_WEIGHTS = np.array([w for w, _ in _CATALOG], dtype=np.int64)
_CUM = np.cumsum(_WEIGHTS)
_TOTAL = int(_CUM[-1])
_FORMATS = [f for _, f in _CATALOG]


def _render(fmt: str, a: int, b: int, c: int) -> str:
    if "{" not in fmt:
        return fmt
    return fmt.format(a=a % 10000, b=b % 10000, c=c % 1000, f=f"{(a % 10000) / 100:.2f}")


def gen_transcripts(n_conv: int) -> pd.DataFrame:
    """Generate the transcripts table for conversations [0, n_conv).

    Schema (BASELINE.json input_hint): conv_id string, turn_idx int32,
    role string, text string, tool string, ts timestamp (UTC)."""
    return gen_transcripts_range(0, n_conv)


def gen_transcripts_range(start: int, end: int) -> pd.DataFrame:
    """Rows for conversations [start, end) — content-addressed per
    (conv_id, turn_idx), so any slice equals the same slice of a full run."""
    n_conv = end - start
    conv_ids = [f"conv-{i:08d}" for i in range(start, end)]
    seeds = np.array([xxh64(c) & _M64 for c in conv_ids], dtype=np.uint64)
    ks = (2 + seeds % 19).astype(np.int64)  # turns per conv in [2, 20]
    total = int(ks.sum())

    conv_idx = np.repeat(np.arange(n_conv), ks)
    turn_idx = np.concatenate([np.arange(k) for k in ks]).astype(np.int64)
    mix = _splitmix(seeds[conv_idx].astype(np.uint64) + turn_idx.astype(np.uint64) * np.uint64(_GOLDEN))

    role_r = (mix % 100).astype(np.int64)
    roles = np.where(role_r < 40, "user", np.where(role_r < 80, "assistant", np.where(role_r < 95, "tool", "system")))
    tool_pick = ((mix >> np.uint64(8)) % 5).astype(np.int64)
    tools = np.where(roles == "tool", np.array(TOOLS, dtype=object)[tool_pick], "none")

    tmpl_pick = ((mix >> np.uint64(16)) % np.uint64(_TOTAL)).astype(np.int64)
    tmpl_idx = np.searchsorted(_CUM, tmpl_pick, side="right")
    pa = ((mix >> np.uint64(24)) & np.uint64(0xFFFF)).astype(np.int64)
    pb = ((mix >> np.uint64(40)) & np.uint64(0xFFFF)).astype(np.int64)
    pc = ((mix >> np.uint64(4)) & np.uint64(0xFFFF)).astype(np.int64)
    texts = [_render(_FORMATS[t], int(a), int(b), int(c)) for t, a, b, c in zip(tmpl_idx, pa, pb, pc)]

    conv_offset_s = (seeds % np.uint64(72 * 3600)).astype(np.int64)  # spread over 3 days
    ts_s = conv_offset_s[conv_idx] + 30 * turn_idx
    ts = pd.to_datetime(ts_s, unit="s", origin=pd.Timestamp(EPOCH))

    return pd.DataFrame(
        {
            "conv_id": pd.array([conv_ids[i] for i in conv_idx], dtype="string"),
            "turn_idx": turn_idx.astype("int32"),
            "role": pd.array(roles, dtype="string"),
            "text": pd.array(texts, dtype="string"),
            "tool": pd.array(tools, dtype="string"),
            "ts": ts,  # naive UTC (Spark session TZ is UTC)
        }
    )


def gen_skewed_transcripts_range(start: int, end: int, hot_pct: int = 92) -> pd.DataFrame:
    """ADVERSARIAL skew fixture (VERDICT r4 next-round #3): ~`hot_pct`% of
    turns share ONE template shape — 'Hot worker <*> finished job <*> stage
    ok' — hence ONE Drain shard (one (token_count, depth-4 masked prefix)
    leaf). Without salting, pass-1 mining funnels ~all rows through a
    single task; cfg.salt_buckets is the defusal under test. The remaining
    turns are the normal catalog mix. Deterministic per (conv, turn) like
    gen_transcripts_range (hot membership + params come from the same
    splitmix stream), so any slice equals the same slice of a full run."""
    pdf = gen_transcripts_range(start, end)
    n_conv = end - start
    conv_ids = [f"conv-{i:08d}" for i in range(start, end)]
    seeds = np.array([xxh64(c) & _M64 for c in conv_ids], dtype=np.uint64)
    ks = (2 + seeds % 19).astype(np.int64)
    conv_idx = np.repeat(np.arange(n_conv), ks)
    turn_idx = pdf["turn_idx"].to_numpy().astype(np.int64)
    mix = _splitmix(
        seeds[conv_idx].astype(np.uint64) + turn_idx.astype(np.uint64) * np.uint64(_GOLDEN)
    )
    hot = ((mix >> np.uint64(48)) % np.uint64(100)).astype(np.int64) < hot_pct
    pa = ((mix >> np.uint64(24)) & np.uint64(0xFFFF)).astype(np.int64)
    pb = ((mix >> np.uint64(40)) & np.uint64(0xFFFF)).astype(np.int64)
    texts = pdf["text"].to_numpy(dtype=object)
    for i in np.flatnonzero(hot):
        texts[i] = f"Hot worker {pa[i]} finished job {pb[i]} stage ok"
    out = pdf.copy()
    out["text"] = pd.array(texts, dtype="string")
    return out


def materialize_skewed_transcripts(n_conv: int, cache_dir: str = "/tmp/laas_fixtures") -> str:
    """materialize_transcripts for the adversarial skew corpus."""
    import os

    path = f"{cache_dir}/transcripts_skewed_{n_conv}.parquet"
    if not os.path.exists(path):
        os.makedirs(cache_dir, exist_ok=True)
        tmp = f"{path}.tmp-{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        chunk = 100_000
        for j, start in enumerate(range(0, n_conv, chunk)):
            n = min(chunk, n_conv - start)
            pdf = gen_skewed_transcripts_range(start, start + n)
            pdf.to_parquet(
                f"{tmp}/part-{j:04d}.parquet", index=False,
                coerce_timestamps="us", allow_truncated_timestamps=True,
            )
        os.replace(tmp, path)
    return path


def gen_tool_lookup() -> pd.DataFrame:
    """FIXTURES.md §2 broadcast enrich table."""
    return pd.DataFrame(
        {
            "tool": ["search", "browser", "python", "bash", "editor", "none"],
            "tool_class": ["retrieval", "retrieval", "exec", "exec", "mutation", "na"],
            "tool_cost_tier": pd.array([2, 3, 2, 1, 1, 0], dtype="int32"),
        }
    )


def gen_role_lookup() -> pd.DataFrame:
    """FIXTURES.md §3 broadcast enrich table."""
    return pd.DataFrame(
        {
            "role": ["user", "assistant", "tool", "system"],
            "role_kind": ["human", "model", "machine", "machine"],
        }
    )


# sf ladder (FIXTURES.md §1.1): tiny ~2k turns, small ~60k, bench ~600k
SF_CONVS = {"tiny": 180, "small": 5500, "bench": 55000}


def materialize_transcripts(n_conv: int, cache_dir: str = "/tmp/laas_fixtures") -> str:
    """Write (once) and return the parquet path for an n_conv transcript
    table. Benchmarks read THIS — a driver-resident createDataFrame would
    ship rows from the driver per task and anti-scale.

    Generation is chunked (content-addressed per conversation, so chunks
    are independent) and lands as a directory of parquet files."""
    import os

    path = f"{cache_dir}/transcripts_{n_conv}.parquet"
    if not os.path.exists(path):
        os.makedirs(cache_dir, exist_ok=True)
        tmp = f"{path}.tmp-{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        # ~100k convs (~1.1M turns, ~25MB) per file: enough input splits
        # that the scan stage parallelizes at every bench level
        chunk = 100_000
        for j, start in enumerate(range(0, n_conv, chunk)):
            n = min(chunk, n_conv - start)
            pdf = gen_transcripts_range(start, start + n)
            # microsecond timestamps: Spark cannot read TIMESTAMP(NANOS)
            pdf.to_parquet(
                f"{tmp}/part-{j:04d}.parquet", index=False,
                coerce_timestamps="us", allow_truncated_timestamps=True,
            )
        os.replace(tmp, path)
    return path


def write_fixture_parquet(out_dir: str, size: str = "small") -> str:
    """Materialize transcripts + lookups as parquet under *out_dir*."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    gen_transcripts(SF_CONVS[size]).to_parquet(f"{out_dir}/transcripts.parquet", index=False)
    gen_tool_lookup().to_parquet(f"{out_dir}/tool_lookup.parquet", index=False)
    gen_role_lookup().to_parquet(f"{out_dir}/role_lookup.parquet", index=False)
    return out_dir
