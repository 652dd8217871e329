"""Isolate the substring_dedup window-hashing rewrite in the regime it was
built for (Lee et al. 2022's W=50 tokens, ~600-token web docs) — the sf0.1
entry fixture (W=8, ~40-token docs) is overhead-bound and cannot show the
O(W x corpus) character cost the r9 rolling hash removes.

Times three things on a synthetic long-doc corpus (noop sink, guide §1.4):
  old_stream  the r8 per-position `xxhash64(concat_ws(" ", slice(toks,i,W)))`
              HOF chain, reconstructed inline (the code this round deleted)
  new_stream  the r9 JVM token-hash + Arrow rolling-hash window stream
  full_op     the full r9 substring_dedup operator end to end

Usage: python tools/bench_substring_w50.py [n_docs] [tokens_per_doc] [W]
"""

from __future__ import annotations

import os
import sys
import time


def main() -> int:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, here)
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    n_tok = int(sys.argv[2]) if len(sys.argv) > 2 else 600
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from log_analysis_ai_spark.operators.dedup import substring_dedup
    from log_analysis_ai_spark.session import get_spark

    spark = get_spark(
        app_name="bench_substring_w50",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
    )
    # deterministic corpus: per-doc UNIQUE words (w<doc>_<pos> — no
    # accidental cross-doc window collisions), with a shared 80-token
    # boilerplate run on every 7th doc so duplicated windows exist
    words = F.transform(
        F.sequence(F.lit(1), F.lit(n_tok)),
        lambda i: F.concat(
            F.lit("w"),
            F.col("id").cast("string"),
            F.lit("_"),
            i.cast("string"),
        ),
    )
    boiler = " ".join(f"boiler{j}" for j in range(80))
    df = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.when(
                F.col("id") % 7 == 0,
                F.concat(F.array_join(words, " "), F.lit(" " + boiler)),
            )
            .otherwise(F.array_join(words, " "))
            .alias("text"),
        )
        .repartition(cpus)
        .localCheckpoint(eager=True)
    )

    toks = F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), F.lit(0))
    base = df.select(F.col("doc_id").alias("_id"), toks.alias("_toks")).localCheckpoint(
        eager=True
    )

    # --- old r8 window stream, reconstructed ---
    n_win = F.size("_toks") - F.lit(W - 1)
    idxs = F.filter(
        F.sequence(F.lit(1), F.greatest(n_win, F.lit(1))), lambda i: i <= n_win
    )
    wins = F.transform(
        idxs,
        lambda i: F.struct(
            (i - 1).alias("ti"),
            F.xxhash64(F.concat_ws(" ", F.slice("_toks", i, W))).alias("h"),
        ),
    )
    old_ex = base.select("_id", F.explode(wins).alias("_w")).select(
        "_id", F.col("_w.ti").alias("_ti"), F.col("_w.h").alias("_h")
    )

    def t(label, fn, n=3):
        outs = []
        for i in range(n):
            spark.sparkContext.setJobDescription(f"{label}#{i}")
            t0 = time.time()
            fn()
            outs.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        print(label, outs, flush=True)
        return outs

    noop = lambda d: d.write.format("noop").mode("overwrite").save()  # noqa: E731
    t("old_stream", lambda: noop(old_ex))

    # --- new r9 stream: the SHIPPED builder, on the same base table
    from log_analysis_ai_spark.operators.dedup import _window_hash_stream

    t("new_stream", lambda: noop(_window_hash_stream(base, W)))

    # --- full operator end to end for context
    t("full_op", lambda: noop(substring_dedup(df, window_tokens=W)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
