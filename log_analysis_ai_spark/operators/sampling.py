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


def token_budget_sample(
    df: DataFrame,
    group_cols,
    budget: int,
    weight_col,
    key_cols,
    salt: int = 0,
    hash_expr: Column | None = None,
    hash_range: int = 1 << 62,
    cutoff_buckets: int | None = None,
    max_driver_rows: int = 4_000_000,
) -> DataFrame:
    """Per-group token-budget selection — the corpus-MIXING primitive
    ("take at most B tokens from each source/domain/language"): within each
    group, rows are ordered by deterministic hash (ties by `key_cols`) and
    a row is kept iff the running `weight_col` total INCLUDING the row is
    <= `budget`. Selection is a pure function of the data: the same corpus
    is drawn at any parallelism, any retry, any day — and expressible in
    plain SQL (`SUM(w) OVER (PARTITION BY g ORDER BY h, key) <= B`), which
    is what the entry oracle runs.

    The prefix rule is strict: the running total is over ALL rows in hash
    order, so once a group's cumulative weight crosses the budget nothing
    later in the order is admitted (no "skip the big row, keep a smaller
    later one" knapsack behavior — that would make selection depend on
    global optimization, not a row-local rule).

    Scale shape (the 100 TB reading): the naive form is ONE window cumsum
    per group — a 50 TB web-crawl domain serializes into one task.
    `cutoff_buckets=S` defuses it LOSSLESSLY with the classic two-pass
    distributed-quantile-by-weight pattern:

      pass 1  aggregate sum(weight) per (group, hash-range bucket) — a
              partial-aggregating groupBy, map-side combine absorbs the
              hot group; G x S rows reach the driver (bounded: raises
              past `max_driver_rows`).
      driver  walk each group's buckets in hash order; find the first
              bucket where the cumulative total crosses the budget
              (cutoff bucket c, remaining budget r entering it).
      pass 2  one window cumsum per (group, bucket) — the hot group now
              runs as S parallel tasks — keep iff bucket < c, or
              bucket = c and the within-bucket running total <= r.
              Groups that never cross keep everything (no window needed,
              but the per-bucket cumsum is computed uniformly; it is
              simply never compared for those groups).

    Losslessness: buckets are CONTIGUOUS hash ranges (bucket = h div
    (hash_range/S)), so hash order = (bucket, within-bucket) lexicographic
    order and the global prefix rule decomposes exactly: a row in bucket
    b < c has global cumsum <= (cum through c-1) <= budget... more
    precisely every row in buckets < c satisfies the rule because c is the
    FIRST bucket whose cumulative total crosses; rows in bucket c satisfy
    it iff their within-bucket cumsum <= r = budget - cum_before_c; rows
    past c never do (the running total is monotone). The entry query runs
    the bucketed path against the UNSALTED single-window oracle SQL, so
    the driver's hash gate re-proves the decomposition every round.

    Cost note: pass 1 + pass 2 are two scans (same two-pass shape as
    `sketches.heavy_hitters`); the bucketed path materializes the
    (input + hash/weight/bucket) projection ONCE via compute_once
    (lazy localCheckpoint) so the weight expression — typically a token
    count over text — is computed a single time and both passes read the
    materialized rows (r9).

    `weight_col` must be non-negative and non-null (raise-free contract:
    NULL weights fail fast with a clear error rather than silently
    vanishing from sums). Reference parallel: the reference engine has no
    mixing sampler; this follows the published data-mixture recipes
    (e.g. Gopher / The Pile fixed token budgets per source).
    """
    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if budget < 0:
        raise ValueError(f"budget must be non-negative, got {budget}")
    h = hash_expr if hash_expr is not None else xxhash(key_cols, salt)
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    w = w.cast("long")
    # fail-fast weight contract: NULL would silently vanish from SUM (both
    # engines skip NULLs — agreeing, but hiding a data defect); negative
    # would break the prefix rule's monotonicity the bucketed decomposition
    # relies on. Stays inside whole-stage codegen.
    w = F.when(w.isNotNull() & (w >= 0), w).otherwise(
        F.raise_error(F.lit("token_budget_sample: weight must be non-null and >= 0")).cast(
            "long"
        )
    )
    order = [F.col("_h").asc()] + [F.col(c).asc() for c in key_cols]
    base = df.withColumn("_h", h).withColumn("_w", w)

    if cutoff_buckets is None or cutoff_buckets <= 1:
        win = Window.partitionBy(*group_cols).orderBy(*order)
        return (
            base.withColumn("_cum", F.sum("_w").over(win))
            .filter(F.col("_cum") <= F.lit(budget))
            .drop("_h", "_w", "_cum")
        )

    S = int(cutoff_buckets)
    width = max(1, hash_range // S)
    bucket = F.floor(F.col("_h") / F.lit(width))
    # materialize (input + _h/_w/_b) ONCE: pass 1's aggregate and pass 2's
    # window otherwise each re-execute the full input lineage — including
    # the weight projection, typically a token count over text (r9; the
    # docstring's "point both passes at the same cached projection" cost
    # note, now done by the operator itself via compute_once)
    from .dedup import compute_once

    base = compute_once(base.withColumn("_b", bucket))

    # pass 1: per-(group, bucket) weight totals -> driver cutoff walk
    totals = (
        base.groupBy(*group_cols, "_b").agg(F.sum("_w").alias("_wsum")).collect()
    )
    if len(totals) > max_driver_rows:
        raise ValueError(
            f"cutoff table has {len(totals)} rows (> max_driver_rows="
            f"{max_driver_rows}); lower cutoff_buckets or raise the cap"
        )
    per_group: dict = {}
    for row in totals:
        g = tuple(row[c] for c in group_cols)
        per_group.setdefault(g, []).append((row["_b"], row["_wsum"]))
    cut_rows = []
    for g, blist in per_group.items():
        blist.sort()
        cum = 0
        for b, wsum in blist:
            if cum + wsum > budget:
                cut_rows.append((*g, b, budget - cum))
                break
            cum += wsum
        # never crossed: no cutoff row; the left join below keeps all rows
    spark = df.sparkSession
    cut_schema = base.select(*group_cols).schema
    from pyspark.sql.types import LongType, StructField, StructType

    cut_schema = StructType(
        list(cut_schema.fields)
        + [StructField("_cut_b", LongType()), StructField("_rem", LongType())]
    )
    cuts = spark.createDataFrame(cut_rows, cut_schema)

    # pass 2: per-(group, bucket) window cumsum -- S-way parallel per group
    win = Window.partitionBy(*group_cols, "_b").orderBy(*order)
    out = (
        base.withColumn("_cum", F.sum("_w").over(win))
        .join(F.broadcast(cuts), on=group_cols, how="left")
        .filter(
            F.col("_cut_b").isNull()
            | (F.col("_b") < F.col("_cut_b"))
            | ((F.col("_b") == F.col("_cut_b")) & (F.col("_cum") <= F.col("_rem")))
        )
        .drop("_h", "_w", "_b", "_cum", "_cut_b", "_rem")
    )
    return out


def upsample_by_weight(
    df: DataFrame,
    weight,
    key_cols,
    salt: int = 0,
    hash_expr: Column | None = None,
    hash_range: int = 1 << 62,
    copy_col: str = "copy_idx",
    max_weight: float = 1000.0,
) -> DataFrame:
    """Deterministic FRACTIONAL upsampling — the 'epochs per source' side
    of corpus mixing (The Pile samples some sources at 1.5-3 epochs;
    Gopher/LLaMA mixtures likewise repeat high-quality sources): each row
    is emitted floor(w) times, plus one extra copy iff hash(key, salt)
    falls under frac(w) — so E[copies] = w exactly, yet the realized copy
    set is a PURE FUNCTION of the data: the same rows are duplicated at
    any parallelism, any retry, any re-run (df.sample-style RNG would
    re-roll the corpus every run), and the whole rule is plain SQL for
    the oracle. `weight` may be a literal or any numeric Column (e.g. a
    per-source epochs map joined on).

    Output adds `copy_col` (0-based copy index) so downstream packing /
    shuffling can distinguish copies. Rows with w <= 0 vanish; w is
    capped by `max_weight` (fail-fast raise inside codegen) because a
    runaway weight column multiplying the corpus 10^6× is a data defect,
    not a mixture.

    Scale shape: a narrow whole-stage-codegen Generate (explode of
    sequence(0, n_copies-1)) — no shuffle, no RNG state, no driver work;
    composes with token_budget_sample for combined up/down mixing."""
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    w = F.col(weight) if isinstance(weight, str) else (
        weight if isinstance(weight, Column) else F.lit(float(weight))
    )
    w = w.cast("double")
    w = F.when(w.isNull() | (w > max_weight), F.raise_error(
        F.lit(f"upsample_by_weight: weight must be non-null and <= {max_weight}")
    ).cast("double")).otherwise(w)
    h = hash_expr if hash_expr is not None else xxhash(key_cols, salt)
    extra = (h < (w - F.floor(w)) * F.lit(float(hash_range))).cast("int")
    n = (F.floor(w).cast("long") + extra).cast("int")
    return (
        df.withColumn("_n_copies", n)
        .filter(F.col("_n_copies") > 0)
        .withColumn(copy_col, F.explode(F.sequence(F.lit(0), F.col("_n_copies") - 1)))
        .drop("_n_copies")
    )


def interleave_by_weight(
    df: DataFrame,
    weights,
    group_col: str = "source",
    key_cols="doc_id",
    salt: int = 0,
    hash_expr: Column | None = None,
    hash_range: int = 1 << 62,
    out_col: str = "mix_key",
) -> DataFrame:
    """Deterministic weighted source INTERLEAVING — the training-order
    side of corpus mixing (torchdata's WeightedSampler / tf.data
    `sample_from_datasets` shape): adds `out_col` such that consuming
    rows in `out_col` order yields each group at an arrival RATE
    proportional to N_group × weight(group), uniformly mixed (not
    bursty), as a PURE FUNCTION of the data — same order at any
    parallelism, any retry.

    mix_key = (hash(key, salt) / hash_range) / w: the normalized hash u
    is uniform on [0,1), so group g's rows fall uniformly on
    [0, 1/w_g) — per unit of key, w_g·N_g rows of g arrive, i.e. a
    weight-2 group is consumed twice as fast (and exhausts at key
    1/w_g; equal-rate-forever mixing wants w ∝ 1/N_g, per-epoch
    weighting wants the Pile-style w from upsample_by_weight — the two
    compose). This is the published RANDOM interleave, made
    deterministic; exact round-robin would need a per-group dense rank
    (one window task per group — the hot-key shape this engine avoids
    everywhere).

    `weights` is a dict {group value -> weight} (broadcast-joined;
    missing group or w <= 0 fails fast inside codegen — a silent
    default would silently mis-mix the corpus) or a numeric column name.

    Scale shape: one broadcast join + narrow arithmetic — no shuffle, no
    window, no RNG. Consume with `interleave_partitions` (range
    partition by mix_key + in-partition sort): globally ordered shards
    with NO single-task global sort."""
    if isinstance(weights, dict):
        wdf = df.sparkSession.createDataFrame(
            [(k, float(v)) for k, v in weights.items()], f"{group_col} string, _w double"
        )
        src = df.join(F.broadcast(wdf), group_col, "left")
        w = F.col("_w")
    else:
        src = df
        w = F.col(weights).cast("double")
    w = F.when(
        w.isNull() | (w <= 0),
        F.raise_error(
            F.lit("interleave_by_weight: every group needs a weight > 0")
        ).cast("double"),
    ).otherwise(w)
    h = hash_expr if hash_expr is not None else xxhash(key_cols, salt)
    u = h.cast("double") / F.lit(float(hash_range))
    out = src.withColumn(out_col, u / w)
    return out.drop("_w") if isinstance(weights, dict) else out


def interleave_partitions(df: DataFrame, num_partitions: int, out_col: str = "mix_key") -> DataFrame:
    """Materialization path for an interleaved corpus: RANGE partition on
    the mix key + sort WITHIN partitions — partition i holds the i-th
    contiguous slice of the global training order, each internally
    ordered, with no single-task global sort anywhere (the write side of
    curriculum mixing: `.write.parquet` of the result is the training
    shard sequence)."""
    return df.repartitionByRange(num_partitions, F.col(out_col)).sortWithinPartitions(out_col)
