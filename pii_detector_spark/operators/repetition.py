"""Gopher repetition rules: top-n-gram and duplicated-n-gram character
fractions (Rae et al. 2021 §A1.1; PAPERS.md).

Complements ``operators/quality.py`` (which has the line-level
``dup_line_frac``): Gopher additionally gates on

* the fraction of characters inside the MOST COMMON word {2,3,4}-gram, and
* the fraction of characters inside duplicated (count ≥ 2) word
  {5..10}-grams.

Shared cross-engine semantics (pinned by the ``repetition_metrics``
oracle):

* words = ASCII-whitespace runs (the corpus-wide tokenization spec);
  n-grams are the overlapping word n-grams of the single-space-normalized
  text, one per word start.
* gram char length = its normalized string length (words + single
  separating spaces); denominators are ``length(text)`` of the RAW text.
* "most common" ties break to the longer gram (max char fraction) — a
  deterministic refinement of the paper's unspecified tie.
* duplicated-gram fractions count every occurrence (``cnt × len``) without
  overlap correction — deterministic and cheap in both engines; the paper's
  span-marking variant differs only on pathological self-overlapping text.

Scale shape: one regexp pass per n (codegen — the lookahead trick from
``dedup.shingles_col``, NOT interpreted higher-order functions), one union,
ONE wide shuffle keyed (doc_id, n, md5(gram)) carrying 16+33 byte rows —
never text — then a per-doc conditional aggregation. Joins back id-keyed.

The thresholds live in ``config.QualityThresholds.top_ngram_max_frac`` /
``dup_ngram_max_frac`` (Gopher's published values); ``apply_repetition
_rules`` emits the first-failing-rule drop reason. They are a separate
batch operator, not part of the fused pipeline UDF's fixed metric set —
callers opt in per-corpus (the documented Gopher practice of tuning
repetition gates per source).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WS_CLASS = "[ \\t\\n\\r\\f\\u000B]+"

# Gopher §A1.1 published thresholds
TOP_NGRAM_MAX_FRAC: dict[int, float] = {2: 0.20, 3: 0.18, 4: 0.16}
DUP_NGRAM_MAX_FRAC: dict[int, float] = {
    5: 0.15,
    6: 0.14,
    7: 0.13,
    8: 0.12,
    9: 0.11,
    10: 0.10,
}


def ngrams_all_col(n: int, text_col: str = "text") -> Column:
    """ALL overlapping word n-grams (non-distinct, document order) — the
    counting variant of ``dedup.shingles_col``; same codegen lookahead."""
    norm = F.trim(F.regexp_replace(F.col(text_col), WS_CLASS, " "))
    body = " ".join(["[^ ]+"] * n)
    rx = f"(?<![^ ])(?=({body}))"
    return F.regexp_extract_all(norm, F.lit(rx), F.lit(1))


def with_repetition_metrics(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
) -> DataFrame:
    """(doc_id, n_chars, top_{n}gram_char_frac…, dup_{n}gram_char_frac…).

    Docs with no qualifying grams (or empty text) get 0.0 fractions.
    """
    from pii_detector_spark.plans.partitioning import ensure_min_parallelism

    # CPU-bound regex extraction per row: guard against pathologically
    # under-split scans (a one-row-group parquet is ONE task no matter the
    # cores — measured 6x here); well-split inputs pass through untouched
    base = ensure_min_parallelism(
        df.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.length(F.col(text_col)).cast("long").alias("n_chars"),
            F.col(text_col).alias("_text"),
        ),
        "doc_id",
    )
    # all n in ONE corpus scan: a per-n UNION of exploded relations re-reads
    # the text column once per n (9 scans at 100 TB); nesting the n loop
    # into an array-of-structs keeps it to one scan, with the 9 regex
    # passes fused into one codegen projection
    per_n = F.array(
        *[
            F.struct(
                F.lit(n).alias("n"),
                ngrams_all_col(n, "_text").alias("gs"),
            )
            for n in sorted(set(top_ns) | set(dup_ns))
        ]
    )
    grams = (
        base.select("doc_id", F.explode(per_n).alias("x"))
        .select("doc_id", F.col("x.n").alias("n"), F.explode("x.gs").alias("g"))
        .select(
            "doc_id",
            "n",
            # xxhash64, not md5: the key only needs to distinguish grams
            # WITHIN one (doc, n) group (a 64-bit collision there is
            # ~2^-64 × grams² per doc — negligible), and the 8-byte long
            # both hashes faster and shuffles 4× narrower than a 32-char
            # md5 string (measured ~5× end-to-end at sf0.1)
            F.xxhash64("g").alias("gkey"),
            F.length("g").cast("long").alias("glen"),
        )
    )
    counts = grams.groupBy("doc_id", "n", "gkey").agg(
        F.count(F.lit(1)).alias("cnt"), F.max("glen").alias("glen")
    )
    # Two-level aggregation, both fully primitive/codegen:
    # 1. per (doc_id, n): "most common, ties to longer" as ONE max over a
    #    packed long key = cnt·2^31 + glen (glen < 2^31 always — a string
    #    length; the product fits a long), plus the duplicated-gram char
    #    sum. Map-side partial aggregation shrinks the gram-count relation
    #    (tens of millions of rows) to docs×9 partials before the shuffle.
    # 2. per doc_id: pivot the 9 n-values with conditional aggs — now over
    #    the tiny per-(doc,n) relation, not the gram counts. (A single
    #    groupBy(doc_id) with 9 conditional aggs evaluated every condition
    #    against every gram-count row: measured 5x slower at sf0.1; a
    #    max-of-STRUCT form was worse still — ObjectHashAggregate with
    #    interpreted struct comparisons.)
    packed = F.col("cnt") * F.lit(1 << 31).cast("long") + F.col("glen")
    per_dn = counts.groupBy("doc_id", "n").agg(
        F.max(packed).alias("_t"),
        F.sum(
            F.when(F.col("cnt") >= 2, F.col("cnt") * F.col("glen"))
        ).alias("_d"),
    )
    aggs = [
        F.max(F.when(F.col("n") == n, F.col("_t"))).alias(f"_t{n}")
        for n in top_ns
    ] + [
        F.max(F.when(F.col("n") == n, F.col("_d"))).alias(f"_d{n}")
        for n in dup_ns
    ]
    per_doc = per_dn.groupBy("doc_id").agg(*aggs)
    out = base.select("doc_id", "n_chars").join(per_doc, "doc_id", "left")
    nc = F.col("n_chars")
    for n in top_ns:
        t = F.col(f"_t{n}")
        cnt = F.shiftright(t, 31)
        glen = t.bitwiseAND(F.lit((1 << 31) - 1).cast("long"))
        out = out.withColumn(
            f"top_{n}gram_char_frac",
            F.when(
                t.isNotNull() & (nc > 0),
                (cnt * glen) / nc,
            ).otherwise(F.lit(0.0)),
        )
    for n in dup_ns:
        d = F.col(f"_d{n}")
        out = out.withColumn(
            f"dup_{n}gram_char_frac",
            F.when(d.isNotNull() & (nc > 0), d / nc).otherwise(F.lit(0.0)),
        )
    return out.drop(
        *[f"_t{n}" for n in top_ns], *[f"_d{n}" for n in dup_ns]
    )


def apply_repetition_rules(
    metrics: DataFrame,
    top_max: dict[int, float] | None = None,
    dup_max: dict[int, float] | None = None,
) -> DataFrame:
    """First-failing-rule ``rep_drop_reason`` (None = keep) over the
    ``with_repetition_metrics`` output, smallest n first — mirroring
    ``quality.with_keep_decision``'s fixed-order contract."""
    top_max = TOP_NGRAM_MAX_FRAC if top_max is None else top_max
    dup_max = DUP_NGRAM_MAX_FRAC if dup_max is None else dup_max
    reason = None
    for n in sorted(top_max):
        cond = F.col(f"top_{n}gram_char_frac") > top_max[n]
        lit = F.lit(f"top_{n}gram")
        reason = F.when(cond, lit) if reason is None else reason.when(cond, lit)
    for n in sorted(dup_max):
        cond = F.col(f"dup_{n}gram_char_frac") > dup_max[n]
        lit = F.lit(f"dup_{n}gram")
        reason = F.when(cond, lit) if reason is None else reason.when(cond, lit)
    return metrics.withColumn("rep_drop_reason", reason).withColumn(
        "rep_keep", F.col("rep_drop_reason").isNull()
    )
