"""Mojibake repair + Unicode normalization for web-crawl text.

Common-Crawl-style corpora are full of cp1252/UTF-8 transcoding damage
("mojibake": ``cafÃ©`` for ``café``, ``â€œ`` for a curly quote),
decomposed combining sequences, CR/CRLF line endings, and stray
control / zero-width characters.  This is the public ftfy/CCNet-style
clean-up step of an LLM-data pipeline, re-expressed for Spark.

IMPORTANT: this operator is deliberately NOT part of the default
pipeline hot path — the engine's extraction contract is *byte-identical
text per url vs the reference* (BASELINE input_hint), and repairing
mojibake would break that invariant.  It is an opt-in post-extraction
pass (``fix_text_column``) for corpus preparation.

Semantics (pure function ``fix_text_py``, the single source of truth —
the Spark path maps it over Arrow batches):

1. cp1252-mojibake repair, at most two rounds: only attempted when a
   mojibake marker (``Ã``, ``Â``, or ``â€``) is present AND the
   cp1252-encode → UTF-8-decode round trip succeeds; otherwise the text
   is left alone (so a legitimate ``Ã la carte`` survives, because
   ``Ã␠`` is not valid UTF-8).  Two rounds undo double-encoding.
2. NFC normalization (combining sequences composed).
3. Newline canonicalization: ``\r\n`` and bare ``\r`` → ``\n``.
4. C0/C1 control characters (except ``\n`` and ``\t``), zero-width
   spaces/joiners (U+200B..U+200D) and BOM (U+FEFF) removed.

Scale design: one Arrow-batched pandas UDF (compiled artifacts are
module-level), applied at scan granularity — no shuffle, no driver
involvement; the per-row Python is unavoidable here because Spark has
no built-in charset-transcode or unicode-normalize expression.
"""
from __future__ import annotations

import re
import unicodedata

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

__all__ = ["fix_text_py", "fix_text_column"]

# cp1252 lead bytes of UTF-8 sequences misread as cp1252: C3/C2 ("Ã"/"Â")
# cover all 2-byte sequences (Latin-1 range), "â€" covers the common
# 3-byte punctuation block (U+2013..U+201E).
_MOJIBAKE_MARKER = re.compile("[ÃÂ]|â€")
_STRIP = re.compile(
    "[\x00-\x08\x0b-\x1f\x7f-\x9f\u200b-\u200d\ufeff]"
)


def fix_text_py(s: str) -> str:
    """Repair + normalize one string (reference semantics)."""
    if s is None:
        return None
    # NFC BEFORE the repair: mojibake that arrives decomposed (e.g. "Ã"
    # as A + combining tilde) must compose to the cp1252 code points for
    # the round trip to see it; NFC again after, since a repair round
    # can itself surface decomposed sequences.
    s = unicodedata.normalize("NFC", s)
    for _ in range(2):
        if not _MOJIBAKE_MARKER.search(s):
            break
        try:
            repaired = s.encode("cp1252").decode("utf-8")
        except (UnicodeEncodeError, UnicodeDecodeError):
            break
        s = repaired
    s = unicodedata.normalize("NFC", s)
    s = s.replace("\r\n", "\n").replace("\r", "\n")
    return _STRIP.sub("", s)


def fix_text_column(col: Column | str) -> Column:
    """``fix_text_py`` over an Arrow-batched pandas UDF."""
    import pandas as pd  # noqa: F401  (worker-side)

    def _fix(batch):
        return batch.map(fix_text_py, na_action="ignore")

    udf = F.pandas_udf(_fix, returnType=StringType())
    return udf(F.col(col) if isinstance(col, str) else col)
