"""BPE tokenizer: distributed training corpus pass + broadcast encoding.

The public byte-pair-encoding recipe (Sennrich et al. 2016; the
SentencePiece/HF-tokenizers training practice): tokenization quality and
token budgets at corpus scale need a tokenizer trained on the corpus
itself, and the training algorithm is greedy — repeatedly merge the most
frequent adjacent symbol pair.

Scale shape (the part that matters at 100 TB): the merge loop never
touches the corpus.  Training decomposes into

1. ``word_counts`` — ONE distributed word count (map-side-combined
   groupBy of 8-byte count rows), the only corpus-scale pass.  The
   standard practice trains on a *sample* anyway; either way the result
   is a (word, freq) relation bounded by vocabulary, not corpus, size.
2. ``train_bpe`` — the greedy merge loop over that (small) relation,
   driver-side: pair frequencies are weighted by word freq, identical
   to scanning the corpus itself (words are independent under BPE — the
   exact equivalence the public implementations exploit).  Ties break
   lexicographically, so given the same counts the merge sequence is
   fully deterministic — and the counts are exact integers, so training
   is partitioning/order-invariant end to end.
3. ``bpe_encode`` / ``bpe_token_counts`` — scoring ships the merge
   ranks once per executor (broadcast) and applies them in one
   Arrow-batched pandas UDF with a per-batch word cache: **zero
   shuffle**, no corpus explode, same artifact-broadcast pattern as
   [[nbquality]] / [[dsir]].

Word model: whitespace tokens, each ending with an end-of-word marker
(``</w>``) so merges can't cross word boundaries (the original paper's
formulation).  The trained artifact is a plain ordered list of merge
pairs — persist it as a 2-column parquet like the IVF centroid rows.

No reference analogue (SURVEY.md §2.3's token counting is whitespace +
regex); part of the beyond-reference training-data toolkit.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

EOW = "</w>"


import re as _re

_WS_RE = _re.compile("[ \\t\\n\\r\\f\\u000B]+")


def word_counts(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq) over whitespace tokens — the one corpus-scale pass.
    Whitespace-CLASS tokenization (runs of blank chars = one separator,
    the same class as ``textstats``/``dedup``), so multi-line text never
    forms newline-joined pseudo-words."""
    norm = F.trim(
        F.regexp_replace(F.col(text_col), "[ \\t\\n\\r\\f\\u000B]+", " ")
    )
    return (
        df.select(
            F.explode(
                F.filter(F.split(norm, " "), lambda x: x != "")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def _symbols(word: str) -> tuple[str, ...]:
    return tuple(word) + (EOW,)


def train_bpe(
    counts: "DataFrame | list[tuple[str, int]]",
    n_merges: int,
    min_freq: int = 2,
    max_words: int | None = 1_000_000,
) -> list[tuple[str, str]]:
    """Greedy merge sequence from a (word, freq) relation.

    The driver-side loop is pure Python; what reaches the driver is
    BOUNDED before the collect: at web scale the distinct-token relation
    is corpus-like (hapax URLs / hex ids / typos grow near-linearly with
    corpus size), not vocabulary-bounded, so an uncapped collect is a
    driver OOM. ``min_freq`` drops the long tail and ``max_words`` caps
    the vocabulary at the most frequent words (ties broken by word, so
    the cut is deterministic). Both filters apply identically to the
    DataFrame path (in Spark, before the collect) and the in-memory list
    path, keeping the two bit-identical on the same counts. Stops early
    when no pair occurs twice."""
    if isinstance(counts, DataFrame):
        filtered = counts.filter(F.col("freq") >= int(min_freq))
        if max_words is not None:
            # TakeOrdered: only the top-K rows ever reach the driver
            filtered = filtered.orderBy(
                F.col("freq").desc(), F.col("word")
            ).limit(int(max_words))
        rows = [(r["word"], int(r["freq"])) for r in filtered.collect()]
    else:
        # aggregate duplicate word entries BEFORE the frequency filter so
        # the list path sees per-word totals exactly like the (already
        # grouped) word_counts relation
        agg: dict[str, int] = {}
        for w, f in counts:
            agg[w] = agg.get(w, 0) + int(f)
        rows = [(w, f) for w, f in agg.items() if f >= int(min_freq)]
        if max_words is not None:
            rows = sorted(rows, key=lambda wf: (-wf[1], wf[0]))[
                : int(max_words)
            ]
    vocab: dict[tuple[str, ...], int] = {}
    for word, freq in rows:
        if word:
            k = _symbols(word)
            vocab[k] = vocab.get(k, 0) + freq

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, freq in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + freq
        if not pairs:
            break
        # highest freq, ties to the lexicographically smallest pair: a
        # total order → deterministic merge sequence for identical counts
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        a, b = best[0]
        merges.append((a, b))
        merged = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, freq in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            k = tuple(out)
            new_vocab[k] = new_vocab.get(k, 0) + freq
        vocab = new_vocab
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(_symbols(word))
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def encode_text(text: str, ranks: dict[tuple[str, str], int],
                cache: dict | None = None) -> list[str]:
    """Apply the merge ranks to every word (lowest rank first — the BPE
    apply rule); pure function shared by the UDF and tests."""
    out: list[str] = []
    cache = cache if cache is not None else {}
    for w in _WS_RE.split(text or ""):
        if not w:
            continue
        hit = cache.get(w)
        if hit is None:
            hit = _encode_word(w, ranks)
            cache[w] = hit
        out.extend(hit)
    return out


def _ranks(merges: list[tuple[str, str]]) -> dict[tuple[str, str], int]:
    return {pair: i for i, pair in enumerate(merges)}


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "n_bpe_tokens",
) -> DataFrame:
    """Per-document token count under the trained merges — broadcast
    artifact + one Arrow-batched UDF, zero shuffle."""
    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast(list(merges))

    @F.pandas_udf(LongType())
    def count_tokens(texts: pd.Series) -> pd.Series:
        ranks = _ranks([tuple(m) for m in bc.value])
        cache: dict = {}
        return texts.map(lambda t: len(encode_text(t, ranks, cache)))

    return docs.select(id_col, text_col).select(
        id_col, count_tokens(F.col(text_col)).alias(out_col)
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Per-document token array (same shape, returns the tokens)."""
    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast(list(merges))

    @F.pandas_udf("array<string>")
    def encode(texts: pd.Series) -> pd.Series:
        ranks = _ranks([tuple(m) for m in bc.value])
        cache: dict = {}
        return texts.map(lambda t: encode_text(t, ranks, cache))

    return docs.select(id_col, text_col).select(
        id_col, encode(F.col(text_col)).alias(out_col)
    )
