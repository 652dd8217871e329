"""Deterministic sampling / capping operators for training-data curation.

The 100 TB problem with `df.sample()`: Bernoulli sampling draws from a
per-partition RNG stream, so the selected SET depends on partitioning and
task retries — two runs of the same job can ship different corpora, and an
incremental re-run cannot reproduce yesterday's sample. Curation pipelines
need sampling that is a PURE FUNCTION of the row key:

- `deterministic_sample`: keep a row iff hash(key, salt) falls under the
  fraction. Same rows selected at any parallelism, any retry, any day —
  and a DIFFERENT salt draws an independent sample (e.g. train/holdout
  splits that provably never overlap when fractions sum ≤ 1 over disjoint
  hash ranges).
- `stratified_cap`: at most `cap` rows per group (domain, language,
  near-dup cluster …), chosen by deterministic hash order — the standard
  "no domain may dominate the corpus" curation rule. One shuffle on the
  group key; survivors are reproducible, not arrival-ordered.

Both default to xxhash64 (JVM-side, whole-stage codegen). `hash_expr`
is pluggable so a caller (or an exactness oracle) can substitute any
integer expression: the entry queries use a Knuth multiplicative hash
(`knuth_hash`) that DuckDB evaluates identically, making both operators
hash-ORACLED — rare for sampling operators, possible because selection is
a pure row function.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Knuth's multiplicative constant (2654435761 = 2^32 / golden ratio):
# well-mixed low bits for sequential keys. The key is pre-reduced mod 2^31
# BEFORE the multiply so the product stays < 2^62.4 — no 64-bit overflow
# for ANY bigint key, which is what makes the hash evaluable identically
# in ANY engine with 64-bit integer arithmetic (the property the DuckDB
# oracles rely on; engines disagree on silent-wrap semantics, so the
# un-reduced product would break portability for keys ≥ 2^31).
KNUTH_C = 2654435761
KNUTH_M = 1 << 32
_KNUTH_R = 1 << 31  # pre-reduction modulus; identity for keys+salt < 2^31


def knuth_hash(col, salt: int = 0) -> Column:
    """pmod(pmod(key + salt, 2^31) * 2654435761, 2^32) — an engine-portable
    integer hash for integer keys. Weaker mixing than xxhash64 (use that at
    scale); exists so sampling decisions can be reproduced in plain SQL.
    The key is reduced mod 2^31 BEFORE the salt is added (so key+salt can
    never overflow either, even at key = 2^63-1) and once more after, keeping
    every intermediate < 2^63. Identity for 0 ≤ key+salt < 2^31, so small-key
    hashes are unchanged; sequential keys ≥ 2^31 still sample uniformly —
    the reduction only folds the key space, it does not bias the mix."""
    c = F.col(col) if isinstance(col, str) else col
    if not 0 <= salt < _KNUTH_R:
        raise ValueError(f"salt must be in [0, 2^31), got {salt}")
    folded = F.pmod(F.pmod(c, F.lit(_KNUTH_R)) + F.lit(salt), F.lit(_KNUTH_R))
    return F.pmod(folded * F.lit(KNUTH_C), F.lit(KNUTH_M))


def xxhash(cols, salt: int = 0) -> Column:
    """Non-negative xxhash64 over the key columns (the at-scale default)."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    return F.pmod(F.xxhash64(*cols, F.lit(salt)), F.lit(1 << 62))


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    key_cols,
    salt: int = 0,
    hash_expr: Column | None = None,
    hash_range: int = 1 << 62,
) -> DataFrame:
    """Keep rows whose hash(key, salt) < fraction · hash_range — a pure
    row function, so the sample is identical at any parallelism / retry /
    re-run (unlike df.sample's per-partition RNG). Narrow codegen filter,
    no shuffle; pushes down to the scan when the key is a stored column.

    Disjoint fractions of the SAME salt partition the corpus: selecting
    [0, 0.9) for train via fraction=0.9 and the complement for holdout
    (filter the inverse) provably never overlaps."""
    h = hash_expr if hash_expr is not None else xxhash(key_cols, salt)
    return df.filter(h < F.lit(int(fraction * hash_range)))


def stratified_cap(
    df: DataFrame,
    group_cols,
    cap: int,
    key_cols=None,
    salt: int = 0,
    hash_expr: Column | None = None,
    presalt_buckets: int | None = None,
) -> DataFrame:
    """At most `cap` rows per group, chosen by deterministic hash order
    (ties broken by the key columns themselves, so the survivor set is a
    pure function of the data). ONE shuffle on the group key; the
    row_number window is bounded by the group, and partial ordering is
    computed map-side by the sort-based window operator.

    Skew defusal (the 100 TB reading): by default a single hot group
    funnels through one window task. `presalt_buckets=S` adds a LOSSLESS
    pre-prune: stage 1 windows over (group, pmod(hash, S)) and keeps the
    per-bucket cap-smallest rows — a hot group runs as S parallel tasks —
    then stage 2 applies the exact window to the ≤ S·cap survivors per
    group. Every global winner is, within its own bucket, among that
    bucket's cap smallest, so the survivor set is IDENTICAL to the
    single-stage result (given the operator's standing determinism
    precondition: (hash, key_cols) distinct within a group). Cost: one
    extra shuffle of the full input — worth it only when a group can
    exceed ~10^7 rows. For an APPROXIMATE hot-domain guard,
    `deterministic_sample(cap / est_group_size)` per hot key then an
    exact cap remains the cheaper shape."""
    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    key_cols = key_cols if key_cols is not None else group_cols
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    h = hash_expr if hash_expr is not None else xxhash(key_cols, salt)
    order = [h.asc()] + [F.col(c).asc() for c in key_cols]
    if presalt_buckets is not None and presalt_buckets > 1:
        w1 = Window.partitionBy(*group_cols, F.pmod(h, F.lit(presalt_buckets))).orderBy(
            *order
        )
        df = (
            df.withColumn("_rk1", F.row_number().over(w1))
            .filter(F.col("_rk1") <= cap)
            .drop("_rk1")
        )
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= cap)
        .drop("_rk")
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col,
    key_cols,
    salt: int = 0,
    hash_expr: Column | None = None,
    hash_range: int = 1 << 62,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: keep the k rows
    with the largest priority ln(u)/w, where u = (hash(key)+1)/hash_range —
    Efraimidis & Spirakis 2006's A-Res order ("Weighted random sampling with
    a reservoir", IPL 97(5)); ln(u)/w is the monotone log transform of their
    u^(1/w) key, so each row is selected with probability proportional to
    `weight_col` over the exhaustive corpus of draws, yet — because u comes
    from a pure hash, not an RNG — the SAMPLE SET is a pure function of the
    data: identical at any parallelism, any retry, any re-run, and
    reproducible in plain SQL when `hash_expr` is the portable `knuth_hash`.

    The curation use: "sample 1M documents biased toward high quality-score"
    without a seed file or a driver-side RNG state.

    Scale shape: priority is a narrow codegen projection; `orderBy(...).
    limit(k)` plans as TakeOrderedAndProject — each task keeps a k-row heap
    and only k rows per partition ever move, no global sort, no full
    shuffle. Ties (possible only via hash collision) break on `key_cols`,
    keeping the set deterministic. Weights must be strictly positive — rows
    with weight <= 0 are dropped (they have selection probability 0).

    Exactness caveat (documented, inherent): cross-engine reproducibility
    of the SET rests on float `ln`; two rows whose priorities differ by
    <1 ulp could order differently in another engine. With hashed u the
    collision scale is ~1e-15 relative — negligible, and only ever at the
    selection boundary."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    h = hash_expr if hash_expr is not None else xxhash(key_cols, salt)
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = (h.cast("double") + F.lit(1.0)) / F.lit(float(hash_range))
    pri = F.log(u) / w.cast("double")
    return (
        df.filter(w > 0)
        .withColumn("_pri", pri)
        .orderBy(F.col("_pri").desc(), *[F.col(c).asc() for c in key_cols])
        .limit(k)
        .drop("_pri")
    )


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    key_cols,
    salt: int = 0,
    hash_expr: Column | None = None,
    hash_range: int = 1 << 62,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic disjoint train/val/test split: each row's split label
    is the hash band its key falls into (weights partition [0, hash_range)
    into contiguous bands). A pure row function — the same row lands in
    the same split at any parallelism, any retry, any incremental re-run,
    and the splits provably never overlap (disjoint bands of ONE hash).
    Narrow codegen projection: no shuffle, no RNG, no driver state.

    `weights` is ordered name -> weight (normalized over its sum);
    `hash_expr` is pluggable like deterministic_sample's (the entry oracle
    substitutes the engine-portable `knuth_hash` with its matching
    hash_range=2^32)."""
    names = list(weights)
    fracs = [float(weights[n]) for n in names]
    if len(names) < 2:
        raise ValueError("need at least two splits")
    if any(f < 0 for f in fracs) or sum(fracs) <= 0:
        raise ValueError(f"weights must be non-negative with positive sum: {weights}")
    total = sum(fracs)
    h = hash_expr if hash_expr is not None else xxhash(key_cols, salt)
    expr = None
    acc = 0.0
    for name, frac in zip(names[:-1], fracs[:-1]):
        acc += frac
        bound = F.lit(int(acc / total * hash_range))
        expr = F.when(h < bound, name) if expr is None else expr.when(h < bound, name)
    expr = expr.otherwise(names[-1])
    return df.withColumn(split_col, expr)
