"""Linear bag-of-words text classifier with closed-form distributed
training (multinomial Naive Bayes log-odds).

The standard LLM-data-curation bootstrap (CCNet, FineWeb-Edu, fastText
lang-ID) is: weak-label a slice of the corpus, train a LINEAR bag-of-words
classifier, score everything, keep the high-scoring tail. fastText's
supervised mode is a shallow linear model over token features; with
unigram features its decision function has the same form as multinomial
Naive Bayes log-odds — and NB has a CLOSED-FORM trainer, so training
becomes pure Spark aggregation (no SGD, no iteration, no RNG):

    w(word)  = ln (C_pos(word)+α)/(N_pos+α·V) − ln (C_neg(word)+α)/(N_neg+α·V)
    prior    = ln D_pos/D_neg
    score(d) = prior + Σ_{word ∈ d} w(word)        (sum over TOKENS, with
                                                    multiplicity)
    predict  = score > 0

with Lidstone add-α smoothing, V = distinct vocabulary size over the
whole training set, N_c = total token count in class c, D_c = docs in
class c. Every quantity is a groupBy — the whole trainer is two shuffles
(token×class counts; the rest are model-sized aggregates), and scoring is
one model-sized join. Deterministic end to end, so both trainer and
scorer are hash-ORACLED against DuckDB running the identical arithmetic
(entries round to 6 decimals; cross-engine float-sum slack is ~1e-13
relative, far below the rounding).

Scale shape (the 100 TB reading):
- TRAIN: one explode (narrow codegen Generate) + groupBy(word, label)
  with map-side combine absorbing stopwords — the shuffle is
  vocab-sized, not corpus-sized. Class totals and V are computed FROM
  the (word,label) table (model-sized input). The model can be persisted
  as parquet and reused across batches.
- SCORE: one corpus-sized token stream joined to the model on `word`
  (broadcast when the vocab is small — the common case for a
  quality/lang classifier; otherwise a shuffle hash join whose build
  side is model-sized, AQE skew-splittable on hot stopwords), then one
  partial-aggregating groupBy(id). Unseen words take the α-smoothed
  zero-count weight via coalesce — scoring new data against a frozen
  model needs no retraining.

Reference parallel: the reference engine has no classifier trainer; its
curation surface stops at rule-based quality scores (quality_score,
gopher rules). Rule source is published practice: Joulin et al. 2017
(fastText, "Bag of Tricks for Efficient Text Classification", EACL) for
the linear-BoW shape, CCNet/FineWeb for the weak-label→classifier→score
bootstrap, McCallum & Nigam 1998 for multinomial NB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(df: DataFrame, col: str, *extra: str) -> DataFrame:
    """(extra..., word) token stream: split on single space (the corpus
    convention shared with operators/lm.py), empty tokens dropped so
    empty/NULL texts contribute no feature rows."""
    return (
        df.select(*extra, F.explode(F.split(F.col(col), " ")).alias("word"))
        .filter(F.col("word") != "")
    )


def train_nb(
    df: DataFrame,
    label_col: str = "label",
    col: str = "text",
    alpha: float = 1.0,
) -> tuple[DataFrame, DataFrame]:
    """Closed-form NB training. `label_col` must be boolean-like (cast to
    boolean; NULL-label rows are excluded — unlabeled data is the norm in
    the weak-label bootstrap). Returns (weights, stats):

    - weights: one row per distinct training word — (word, w) with
      w = the log-odds weight under add-α smoothing.
    - stats: ONE row — (prior, w_unseen, n_pos_docs, n_neg_docs) where
      w_unseen is the weight a word absent from training takes (the
      α-smoothed zero-count log-odds; NOT zero), so a frozen model scores
      out-of-vocabulary tokens exactly as the closed form dictates.

    Both classes must be non-empty (raises otherwise — a one-class
    "classifier" would silently emit ±inf weights)."""
    if alpha <= 0:
        raise ValueError(f"alpha must be positive, got {alpha}")
    lab = df.filter(F.col(label_col).isNotNull()).withColumn(
        "_pos", F.col(label_col).cast("boolean")
    )
    tok = _tokens(lab, col, "_pos")
    # vocab-sized shuffle; map-side combine absorbs hot words
    wc = tok.groupBy("word").agg(
        F.sum(F.when(F.col("_pos"), 1).otherwise(0)).alias("cp"),
        F.sum(F.when(F.col("_pos"), 0).otherwise(1)).alias("cn"),
    )
    # everything below is model-sized input (one row per distinct word)
    totals = wc.agg(
        F.sum("cp").alias("Np"),
        F.sum("cn").alias("Nn"),
        F.count(F.lit(1)).alias("V"),
    )
    docs = lab.agg(
        F.sum(F.when(F.col("_pos"), 1).otherwise(0)).alias("n_pos_docs"),
        F.sum(F.when(F.col("_pos"), 0).otherwise(1)).alias("n_neg_docs"),
    )
    a = F.lit(float(alpha))
    weights = (
        wc.crossJoin(F.broadcast(totals))  # 1-row stats broadcast
        .select(
            "word",
            (
                F.log((F.col("cp") + a) / (F.col("Np") + a * F.col("V")))
                - F.log((F.col("cn") + a) / (F.col("Nn") + a * F.col("V")))
            ).alias("w"),
        )
    )
    stats = (
        docs.crossJoin(F.broadcast(totals))  # 1-row × 1-row
        .select(
            (F.log(F.col("n_pos_docs")) - F.log(F.col("n_neg_docs"))).alias("prior"),
            (
                F.log(a / (F.col("Np") + a * F.col("V")))
                - F.log(a / (F.col("Nn") + a * F.col("V")))
            ).alias("w_unseen"),
            "n_pos_docs",
            "n_neg_docs",
        )
    )
    # driver-side check on a 1-row aggregate, not a corpus scan
    row = stats.collect()[0]
    if row.n_pos_docs == 0 or row.n_neg_docs == 0:
        raise ValueError(
            f"train_nb needs both classes non-empty, got pos={row.n_pos_docs} "
            f"neg={row.n_neg_docs}"
        )
    return weights, stats


def nb_score(
    df: DataFrame,
    weights: DataFrame,
    stats: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "nb_score",
) -> DataFrame:
    """Score every row of `df` against a trained model: adds `out_col`
    (the log-odds score) and `{out_col}_pred` (score > 0). Rows whose
    text is NULL or has no tokens keep the PRIOR as their score (zero
    evidence — the closed form's answer, via the left join's NULL sum →
    coalesce to 0). One corpus-sized join on `word` + one partial agg."""
    # collision-safe internal names (ADVICE r8): a caller whose df already
    # carries `prior`/`_evidence` columns would otherwise hit an ambiguous
    # reference (or lose its column to the final drop)
    tok = _tokens(df, col, id_col)
    evid = (
        tok.join(weights, "word", "left")
        .crossJoin(F.broadcast(stats.select(F.col("w_unseen").alias("__nb_w_unseen"))))
        .select(id_col, F.coalesce(F.col("w"), F.col("__nb_w_unseen")).alias("_w"))
        .groupBy(id_col)
        .agg(F.sum("_w").alias("__nb_evidence"))
    )
    return (
        df.join(evid, id_col, "left")
        .crossJoin(F.broadcast(stats.select(F.col("prior").alias("__nb_prior"))))
        .withColumn(
            out_col, F.col("__nb_prior") + F.coalesce(F.col("__nb_evidence"), F.lit(0.0))
        )
        .withColumn(f"{out_col}_pred", F.col(out_col) > 0)
        .drop("__nb_evidence", "__nb_prior")
    )


def nb_classify(
    df: DataFrame,
    label_col: str = "label",
    col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    out_col: str = "nb_score",
) -> DataFrame:
    """Self-trained convenience: train on `df`'s labeled rows, score ALL
    rows (labeled or not) — the weak-label bootstrap shape. For a frozen
    model, call train_nb once, persist `weights`/`stats` as parquet, and
    pass them to nb_score."""
    weights, stats = train_nb(df, label_col, col, alpha)
    return nb_score(df, weights, stats, col, id_col, out_col)
