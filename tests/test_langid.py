"""Language-ID model checks, including the planted-corpus invariant the
driver oracle `langid_planted` depends on."""

from __future__ import annotations

from pii_detector_spark.functions.langmodels import LANGS, predict_lang


def test_planted_sentences_predict_their_language():
    # must stay in sync with __spark_entry__._LANG_PLANTS: the DuckDB oracle
    # hardcodes these labels, so the model must actually produce them
    from __spark_entry__ import _LANG_PLANTS

    assert tuple(lang for lang, _ in _LANG_PLANTS) == LANGS
    for lang, sentence in _LANG_PLANTS:
        assert predict_lang(sentence) == lang, (lang, sentence)


def test_seed_language_separation():
    from pii_detector_spark.functions.langmodels import SEED_CORPUS

    for lang, sents in SEED_CORPUS.items():
        for s in sents:
            assert predict_lang(s) == lang, (lang, s)


def _predict_lang_naive(text: str) -> str:
    """The pre-vectorization reference loop: per-trigram dict lookups.
    The fast scorer must reproduce it exactly (same gather order → same
    float sums → same argmax)."""
    import numpy as np

    from pii_detector_spark.functions.langmodels import (
        _combined_profile,
        _trigrams,
    )

    if not text:
        return "unk"
    tris = list(_trigrams(text[:2000]))
    if len(tris) < 5:
        return "unk"
    index, mat = _combined_profile()
    rows = np.fromiter(
        (index.get(t, 0) for t in tris), dtype=np.int64, count=len(tris)
    )
    return LANGS[int(mat[rows].sum(axis=0).argmax())]


def test_fast_scorer_matches_dict_path():
    import random

    from pii_detector_spark.functions.langmodels import SEED_CORPUS

    rng = random.Random(11)
    samples = [s for ss in SEED_CORPUS.values() for s in ss]
    # fuzz: seed sentences, mixed-language mashups, digits, unknown chars,
    # unicode oddities, '?' aliasing probe, short strings
    docs = list(samples)
    for _ in range(200):
        parts = rng.sample(samples, k=rng.randint(1, 3))
        docs.append(" ".join(p[: rng.randint(5, 60)] for p in parts))
    docs += [
        "12345 67890 000",
        "¿dónde está la biblioteca? ¡hola!",
        "文字化けテスト 中文 字符",
        "mixed English و العربية text",
        "question? marks? everywhere???",
        "\x01\x02 control chars the and of",
        "tiny",
        " ",
    ]
    for d in docs:
        assert predict_lang(d) == _predict_lang_naive(d), repr(d)


def _perplexity_naive(text: str) -> float:
    """Pre-vectorization reference loop (sequential dict-get chain)."""
    import math

    from pii_detector_spark.functions.langmodels import _DIGITS, _bigram_lm

    if not text or len(text) < 2:
        return float("inf")
    logp, floors, global_floor = _bigram_lm()
    s = _DIGITS.sub("0", text[:2000].lower())
    total, n = 0.0, 0
    for i in range(len(s) - 1):
        pair = s[i : i + 2]
        lp = logp.get(pair)
        if lp is None:
            lp = floors.get(pair[0], global_floor)
        total += lp
        n += 1
    return math.exp(-total / n)


def test_fast_perplexity_matches_dict_path():
    import random

    from pii_detector_spark.functions.langmodels import (
        SEED_CORPUS,
        perplexity,
    )

    rng = random.Random(23)
    samples = [s for ss in SEED_CORPUS.values() for s in ss]
    docs = list(samples) + [
        "12345 67890", "¿hola? 文字 test", "xy", "\x01\x02 ab the of",
    ]
    for _ in range(100):
        docs.append(" ".join(rng.sample(samples, k=2))[: rng.randint(3, 150)])
    for d in docs:
        a, b = perplexity(d), _perplexity_naive(d)
        # identical per-pair values; only float summation order differs
        assert abs(a - b) <= 1e-9 * max(abs(a), abs(b), 1.0), repr(d)


def test_empty_and_numeric_fall_back_deterministically():
    # empty → 'unk' sentinel; letterless text falls back deterministically
    assert predict_lang("") == "unk"
    assert predict_lang("12345 67890") == predict_lang("12345 67890")
    assert predict_lang("12345 67890") in LANGS + ("unk",)
