"""Model-based quality classifier: multinomial Naive Bayes over tokens.

The public LLM-data-pipeline recipe (CCNet / GPT-3 / fastText-supervised
"quality classifier") trains a cheap linear model on labeled documents
(curated = positive, raw crawl = negative) and keeps documents the model
scores positive. The reference engine has no trained classifier (its
keep/drop battery is rule-based; SURVEY.md §2.4), so this operator is part
of the beyond-reference training-data toolkit, built Spark-first:

* **training** is one token-level word count — ``split`` + ``explode`` +
  ``groupBy(token)`` with conditional sums per class (a single shuffle of
  8-byte-count rows, the classic map-side-combined word count). The
  labeled set in this recipe is a curated *sample* (thousands to millions
  of docs), never the 100-TB corpus itself, so the aggregate is small.
* **model** = per-token fixed-point log-likelihood-ratio weights.
  Weights are BIGINT micro-nats (``round(1e6 * llr)``): summing integers
  is exact and associative, so scores are bit-identical across engines,
  partitionings, and row orders — which is what lets the DuckDB oracle
  hash-match the distributed Spark computation (and what makes the
  keep/drop decision reproducible at any cluster size).
* **scoring** has two equivalent paths, pinned to each other by
  ``tests/test_nbquality.py``:
  - ``score_nb`` (JVM path): explode + **broadcast** join against the
    weight table + ``groupBy(doc).sum`` — fully codegen, used by the
    registry query so the SQL oracle can mirror it exactly.
  - ``score_nb_broadcast`` (100-TB path): the weight dict is shipped once
    per executor via ``SparkContext.broadcast`` and applied in one
    Arrow-batched pandas UDF — **zero shuffle**, no explode blow-up of the
    corpus, the shape you want when the corpus side is 10^12 documents.

Smoothing is add-one over the joint vocabulary; the class prior enters as
a constant bias. Unseen tokens at scoring time get the per-class floor
weight (``default_fp``).
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

_FP = 1_000_000  # fixed-point scale: micro-nats per weight unit


@dataclass(frozen=True)
class NBModel:
    """Trained classifier: a small weight table + three scalars."""

    weights: DataFrame  # (tok: string, w_fp: bigint)
    default_fp: int  # weight for tokens unseen in training
    bias_fp: int  # class-prior log-odds
    n_vocab: int
    n_pos_tokens: int
    n_neg_tokens: int


def _tokens(df: DataFrame, text_col: str, sep: str) -> DataFrame:
    return df.withColumn("tok", F.explode(F.split(F.col(text_col), sep))).where(
        F.col("tok") != ""
    )


def train_nb(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    sep: str = " ",
) -> NBModel:
    """Train on a labeled sample. One shuffle (token word-count); the
    totals row and vocabulary size are a single driver-side scalar fetch
    (model metadata, not data — the labeled set is a curated sample)."""
    toks = _tokens(
        labeled.select(F.col(label_col).cast("boolean").alias("lab"), text_col),
        text_col,
        sep,
    )
    counts = toks.groupBy("tok").agg(
        F.sum(F.when(F.col("lab"), F.lit(1)).otherwise(F.lit(0)))
        .cast("long")
        .alias("c_pos"),
        F.sum(F.when(~F.col("lab"), F.lit(1)).otherwise(F.lit(0)))
        .cast("long")
        .alias("c_neg"),
    )
    counts = counts.persist()
    tot = counts.agg(
        F.sum("c_pos").cast("long").alias("t_pos"),
        F.sum("c_neg").cast("long").alias("t_neg"),
        F.count(F.lit(1)).cast("long").alias("v"),
    ).collect()[0]
    t_pos, t_neg, v = int(tot["t_pos"] or 0), int(tot["t_neg"] or 0), int(tot["v"])
    docs = labeled.groupBy().agg(
        F.sum(F.when(F.col(label_col).cast("boolean"), 1).otherwise(0)).alias("np"),
        F.sum(F.when(~F.col(label_col).cast("boolean"), 1).otherwise(0)).alias("nn"),
    ).collect()[0]
    n_pos, n_neg = int(docs["np"] or 0), int(docs["nn"] or 0)
    if n_pos == 0 or n_neg == 0:
        raise ValueError("train_nb needs at least one doc of each class")

    # w(tok) = ln((c_pos+1)/(t_pos+v)) - ln((c_neg+1)/(t_neg+v)), in
    # micro-nats. The same expression shape (two ln's of a double
    # division) is used by the SQL oracle so both engines feed identical
    # doubles to libm.
    w = F.log((F.col("c_pos") + 1).cast("double") / F.lit(float(t_pos + v))) - F.log(
        (F.col("c_neg") + 1).cast("double") / F.lit(float(t_neg + v))
    )
    weights = counts.select(
        "tok", F.round(w * _FP, 0).cast("long").alias("w_fp")
    )
    import math

    default_fp = round(
        _FP * (math.log(1.0 / (t_pos + v)) - math.log(1.0 / (t_neg + v)))
    )
    bias_fp = round(_FP * math.log(float(n_pos) / float(n_neg)))
    return NBModel(weights, default_fp, bias_fp, v, t_pos, t_neg)


def score_nb(
    docs: DataFrame,
    model: NBModel,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = " ",
) -> DataFrame:
    """JVM scoring path: explode + broadcast-join + sum. The weight table
    is a trained artifact (bounded by training vocabulary), so the
    broadcast is always safe; the corpus side shuffles only (id, sum)
    partials for the final per-doc aggregate."""
    toks = _tokens(docs.select(id_col, text_col), text_col, sep)
    joined = toks.join(F.broadcast(model.weights), "tok", "left")
    per_doc = joined.groupBy(id_col).agg(
        F.sum(F.coalesce(F.col("w_fp"), F.lit(model.default_fp)))
        .cast("long")
        .alias("tok_sum_fp")
    )
    out = docs.select(id_col).join(per_doc, id_col, "left")
    score = F.coalesce(F.col("tok_sum_fp"), F.lit(0)) + F.lit(model.bias_fp)
    return out.select(
        F.col(id_col),
        score.cast("long").alias("nb_score_fp"),
        (score >= 0).alias("nb_keep"),
    )


def score_nb_broadcast(
    docs: DataFrame,
    model: NBModel,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = " ",
) -> DataFrame:
    """100-TB scoring path: weights broadcast once per executor, one
    Arrow-batched pandas UDF, zero shuffle, no token-row blow-up of the
    corpus. Bit-identical to ``score_nb`` (integer weights sum exactly in
    any order) — pinned by tests/test_nbquality.py::test_paths_agree."""
    spark = docs.sparkSession
    wmap = {r["tok"]: r["w_fp"] for r in model.weights.collect()}
    bc = spark.sparkContext.broadcast((wmap, model.default_fp, model.bias_fp))

    def _score(texts: pd.Series) -> pd.Series:
        w, dflt, bias = bc.value
        out = []
        for t in texts:
            s = bias
            if t:
                for tok in t.split(sep):
                    if tok:
                        s += w.get(tok, dflt)
            out.append(s)
        return pd.Series(out)

    udf = F.pandas_udf(_score, returnType=LongType())
    score = udf(F.col(text_col))
    return docs.select(
        F.col(id_col),
        score.alias("nb_score_fp"),
        (score >= 0).alias("nb_keep"),
    )
