"""CCNet-style perplexity bucketing: head / middle / tail quality tiers.

The public CCNet recipe (Wenzek et al. 2020, "CCNet: Extracting high
quality monolingual datasets from web crawl data") scores each document
with a per-language LM perplexity and splits every language into three
equal-mass tiers — *head* (lowest perplexity = most fluent), *middle*,
*tail* — so downstream consumers can keep head+middle or reweight tiers.
This module supplies the bucketing machinery; the score plugs in
(``operators/langid.with_word_perplexity`` is the in-engine scorer, but
any numeric column works — NB quality score, toxicity rate, ...).

Spark-first shapes, in scale order:

* ``assign_buckets`` — bucket by EXPLICIT per-group bounds: a broadcast
  join of the (tiny) bounds relation plus a CASE chain, fully
  whole-stage-codegen, zero shuffle on the corpus side.  This is the
  100-TB path: CCNet itself derives its cutoffs from a held-out sample
  (Wikipedia-trained LM percentiles), not from the corpus being
  bucketed, so at scale bounds are a small precomputed artifact exactly
  like the NB weight table or IVF centroids.
* ``bucket_bounds`` — derive the bounds from a corpus/sample with one
  ``percentile_approx`` aggregation per group (single partial-agg
  shuffle of sketch state, no sort).  Approximation error is the
  documented, bounded percentile_approx contract — fine for tier
  cutoffs whose purpose is mass-splitting.
* ``rank_buckets`` — EXACT equal-mass tiers via ``percent_rank`` over a
  per-group sort.  One total sort per group (the whole group lands in
  one window partition), so this is the small-corpus / oracle path; at
  scale use ``bucket_bounds`` + ``assign_buckets``.  Kept because its
  integer-rank semantics are engine-exact: the DuckDB oracle reproduces
  it bit for bit, pinning the tier arithmetic cross-engine.

No reference analogue (rule-based keep/drop only; SURVEY.md §2.4) —
part of the beyond-reference training-data toolkit.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_LABELS = ("head", "middle", "tail")


def _case_chain(
    score: Column, bounds: Sequence[Column], labels: Sequence[str]
) -> Column:
    """label[i] for the first bound with score <= bound[i], else the last
    label.  Bounds are upper-inclusive, matching percent_rank <= frac."""
    expr = None
    for b, lab in zip(bounds, labels[:-1]):
        cond = score <= b
        expr = F.when(cond, lab) if expr is None else expr.when(cond, lab)
    last = F.lit(labels[-1])
    return last if expr is None else expr.otherwise(last)


def bucket_bounds(
    df: DataFrame,
    score_col: str,
    group_col: str | None = None,
    fracs: Sequence[float] = (1.0 / 3.0, 2.0 / 3.0),
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group tier cutoffs: (group?, bounds array<double>).

    One partial-aggregated shuffle of percentile sketches; the result is
    |groups| rows — a broadcastable artifact (persist it next to the
    model artifacts; recomputing per job is a sample-sized cost)."""
    pct = F.percentile_approx(
        F.col(score_col), F.array(*[F.lit(f) for f in fracs]), accuracy
    ).alias("bounds")
    if group_col is None:
        return df.agg(pct)
    return df.groupBy(group_col).agg(pct)


def assign_buckets(
    df: DataFrame,
    score_col: str,
    bounds: "Sequence[float] | DataFrame",
    labels: Sequence[str] = DEFAULT_LABELS,
    group_col: str | None = None,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Bucket by explicit bounds — the zero-corpus-shuffle scale path.

    ``bounds`` is either a plain ascending list (global cutoffs) or the
    ``bucket_bounds`` relation (per-group cutoffs; requires
    ``group_col``), broadcast-joined so every corpus row resolves its
    cutoffs map-side.  Groups absent from the bounds relation fall into
    the last (most conservative) tier — unknown-language documents land
    in ``tail``, never silently in ``head``."""
    n_bounds = len(labels) - 1
    if isinstance(bounds, DataFrame):
        if group_col is None:
            raise ValueError("per-group bounds need group_col")
        # arity check (driver-side peek of the tiny relation): a bounds
        # table built with a different fracs arity would otherwise
        # silently mis-bucket (extra cutoffs ignored / missing ones NULL)
        first = bounds.select(F.size("bounds").alias("n")).first()
        if first is not None and int(first["n"]) != n_bounds:
            raise ValueError(
                f"{len(labels)} labels need {n_bounds} bounds per group, "
                f"but the bounds relation has {int(first['n'])}"
            )
        b = bounds.select(
            group_col,
            *[
                F.col("bounds")[i].alias(f"_b{i}")
                for i in range(n_bounds)
            ],
        )
        joined = df.join(F.broadcast(b), group_col, "left")
        cols = [F.col(f"_b{i}") for i in range(n_bounds)]
        out = joined.withColumn(
            bucket_col, _case_chain(F.col(score_col), cols, labels)
        )
        return out.drop(*[f"_b{i}" for i in range(n_bounds)])
    cols = [F.lit(float(x)) for x in bounds]
    if len(cols) != n_bounds:
        raise ValueError(
            f"{len(labels)} labels need {n_bounds} bounds, got {len(cols)}"
        )
    return df.withColumn(
        bucket_col, _case_chain(F.col(score_col), cols, labels)
    )


def rank_buckets(
    df: DataFrame,
    score_col: str,
    group_col: str | None = None,
    fracs: Sequence[float] = (1.0 / 3.0, 2.0 / 3.0),
    labels: Sequence[str] = DEFAULT_LABELS,
    tie_col: str | None = None,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Exact equal-mass tiers via percent_rank (small-corpus path).

    ``tie_col`` breaks score ties deterministically (use the doc id) so
    the assignment is a pure function of the data, not of partitioning.
    The whole group sorts in one window partition — documented
    non-scale path; see module docstring."""
    order = [F.col(score_col).asc()]
    if tie_col is not None:
        order.append(F.col(tie_col).asc())
    w = (
        Window.partitionBy(group_col) if group_col else Window.partitionBy()
    ).orderBy(*order)
    pr = F.percent_rank().over(w)
    return df.withColumn(
        bucket_col, _case_chain(pr, [F.lit(float(f)) for f in fracs], labels)
    )
