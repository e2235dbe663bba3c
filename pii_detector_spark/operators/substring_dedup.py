"""Exact substring-level dedup: duplicated k-token window removal.

The public exact-substring dedup method for training corpora (Lee et
al., "Deduplicating Training Data Makes Language Models Better"):
any window of ``k`` consecutive tokens that occurs more than once in
the corpus is removed from every occurrence except one canonical one.
The reference engine has no analogue (it dedups whole objects by
content hash, ``app/services/data_analysis_service.py`` chunk md5);
this is the span-level extension an LLM-data pipeline needs — long
quotations, mirrored articles and license blocks survive *document*
dedup because the surrounding bytes differ.

Re-expressed for Spark (the paper builds a monolithic suffix array —
inherently single-machine): the distributed equivalent is the k-gram
fingerprint explode.  Plan shape:

1. window extraction — whole-stage codegen: whitespace-normalize, then
   one ``regexp_extract_all`` with a lookahead capture fires once per
   token start (same device as ``dedup.shingles_col``, avoiding the
   interpreted ``transform(sequence, slice)`` HOF trap); ``posexplode``
   gives (doc, pos, window), keyed by ``md5(window)`` so every later
   stage ships 32-char digests + two ints, never text.
2. duplicated windows — ONE md5-keyed ``groupBy`` with map-side partial
   aggregation: occurrence count + the canonical (min ``(doc_id, pos)``
   struct) occurrence.
3. removal marks — exploded windows joined back on the digest (AQE
   skew-join handles hot boilerplate digests); every non-canonical
   occurrence emits its start position.
4. rebuild — marks collapse to one per-doc position array (bounded by
   tokens/doc), join to the docs, and a single Arrow-batched pandas UDF
   does a numpy difference-array sweep over the coverage intervals and
   rejoins the surviving tokens.  No corpus-wide token explode, no
   driver collection.

Row count through the explode is O(total tokens) — the honest cost of
exact substring dedup at any scale; the shuffle payload per row is the
digest, not the window text.

Output text is whitespace-normalized (tokens rejoined with single
spaces) for EVERY doc, matching the tokenization — same contract as
``remove_boilerplate_lines``.  Overlapping removed windows merge via
interval coverage; a canonical occurrence's tokens survive only where
no *other* duplicated window covers them (exact-range cutting, as in
the paper).  Docs with fewer than ``k`` tokens pass through (rejoined).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

__all__ = [
    "duplicate_window_marks",
    "remove_duplicate_windows",
    "remove_duplicate_windows_py",
]


def _windows_col(k: int, text_col: str) -> Column:
    """All overlapping k-token windows in document order (index i of the
    result = window starting at token i), via one codegen regex pass."""
    norm = F.trim(
        F.regexp_replace(F.col(text_col), "[ \\t\\n\\r\\f\\u000B]+", " ")
    )
    body = " ".join(["[^ ]+"] * k)
    rx = f"(?<![^ ])(?=({body}))"
    return F.regexp_extract_all(norm, F.lit(rx), F.lit(1))


def duplicate_window_marks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
) -> DataFrame:
    """Start positions of duplicated k-token windows to cut.

    Returns (doc_id, pos): every occurrence of a window whose md5 occurs
    more than once corpus-wide, EXCEPT the canonical occurrence — the
    one with the least ``(doc_id, pos)`` (id type preserved; any
    orderable id — long doc ids, url strings — works).  Deterministic
    at any parallelism.
    """
    ex = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(_windows_col(k, text_col)).alias("pos", "w"),
        )
        .select("doc_id", "pos", F.md5("w").alias("h"))
    )
    dup = (
        ex.groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("occ"),
            F.min(F.struct("doc_id", "pos")).alias("canon"),
        )
        .filter(F.col("occ") > 1)
        .select("h", "canon")
    )
    return ex.join(dup, "h").filter(
        (F.col("doc_id") != F.col("canon.doc_id"))
        | (F.col("pos") != F.col("canon.pos"))
    ).select("doc_id", "pos")


def remove_duplicate_windows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
) -> DataFrame:
    """(doc_id, text) with every duplicated k-token window cut from all
    non-canonical occurrences; see the module docstring for semantics
    and the plan shape."""
    import numpy as np
    import pandas as pd

    marks = (
        duplicate_window_marks(df, id_col, text_col, k)
        .groupBy("doc_id")
        .agg(F.collect_list("pos").alias("cut_starts"))
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.filter(
            F.split(F.col(text_col), "[ \\t\\n\\r\\f\\u000B]+"),
            lambda w: w != F.lit(""),
        ).alias("toks"),
    )

    def _rebuild(toks, starts):
        def one(ts, ps):
            ts = list(ts) if ts is not None else []
            if ps is None or len(ps) == 0:
                return " ".join(ts)
            n = len(ts)
            diff = np.zeros(n + 1, dtype=np.int64)
            s = np.asarray(ps, dtype=np.int64)
            np.add.at(diff, s, 1)
            np.add.at(diff, np.minimum(s + k, n), -1)
            covered = np.cumsum(diff[:n]) > 0
            return " ".join(t for t, c in zip(ts, covered) if not c)

        return pd.Series(
            [one(t, p) for t, p in zip(toks, starts)], dtype=object
        )

    rebuild = F.pandas_udf(_rebuild, returnType=StringType())
    return (
        base.join(marks, "doc_id", "left")
        .select("doc_id", rebuild("toks", "cut_starts").alias("text"))
    )


def remove_duplicate_windows_py(
    texts: "dict[int, str]", k: int = 50
) -> "dict[int, str]":
    """Independent pure-Python reference (test oracle): same semantics,
    dict-of-strings in, dict-of-strings out."""
    toks = {i: t.split() for i, t in texts.items()}
    occ: "dict[tuple, list[tuple[int, int]]]" = {}
    for i in sorted(toks):
        ts = toks[i]
        for p in range(len(ts) - k + 1):
            occ.setdefault(tuple(ts[p:p + k]), []).append((i, p))
    out = {}
    cuts: "dict[int, list[int]]" = {}
    for places in occ.values():
        if len(places) > 1:
            for i, p in sorted(places)[1:]:
                cuts.setdefault(i, []).append(p)
    for i, ts in toks.items():
        covered = [False] * len(ts)
        for p in cuts.get(i, ()):
            for j in range(p, min(p + k, len(ts))):
                covered[j] = True
        out[i] = " ".join(t for t, c in zip(ts, covered) if not c)
    return out
